// hastio — native host IO for the hast_tpu framework.
//
// The TPU-native analog of the reference's C++ runtime layer
// (gzstream + producer/consumer threads in
// /root/reference/01.classify_stlfr_reads/classify.cpp:129-278): a
// multithreaded fastq/fasta reader that decodes (optionally gzip'd)
// records, packs sequences into fixed-shape zero-padded uint8 batches,
// flags N-containing reads, and dictionary-encodes stLFR barcodes to
// dense int ids — everything the device pipeline needs, produced off
// the Python GIL with a double-buffered prefetch thread.
//
// C ABI (ctypes-friendly), see hast_tpu/io/native.py for the wrapper.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <zlib.h>
#include <stdio.h>

namespace {

constexpr int kReadBuf = 1 << 20;

// streaming line reader over plain or gzip files (".gz" suffix)
class LineReader {
 public:
  explicit LineReader(const std::string& path) {
    gz_ = path.size() > 3 && path.compare(path.size() - 3, 3, ".gz") == 0;
    if (gz_) {
      gzf_ = gzopen(path.c_str(), "rb");
      ok_ = gzf_ != nullptr;
      if (ok_) gzbuffer(gzf_, kReadBuf);
    } else {
      f_ = fopen(path.c_str(), "rb");
      ok_ = f_ != nullptr;
    }
    buf_.resize(kReadBuf);
  }
  ~LineReader() {
    if (gz_ && gzf_) gzclose(gzf_);
    if (!gz_ && f_) fclose(f_);
  }
  bool ok() const { return ok_; }

  // returns false at EOF; line excludes trailing \n (and \r)
  bool getline(std::string* line) {
    line->clear();
    while (true) {
      if (pos_ >= len_) {
        if (!fill()) return !line->empty();
      }
      char* nl = static_cast<char*>(
          memchr(buf_.data() + pos_, '\n', len_ - pos_));
      if (nl) {
        size_t n = nl - (buf_.data() + pos_);
        line->append(buf_.data() + pos_, n);
        pos_ += n + 1;
        if (!line->empty() && line->back() == '\r') line->pop_back();
        return true;
      }
      line->append(buf_.data() + pos_, len_ - pos_);
      pos_ = len_;
    }
  }

 private:
  bool fill() {
    pos_ = 0;
    if (gz_) {
      int n = gzread(gzf_, buf_.data(), buf_.size());
      len_ = n > 0 ? n : 0;
    } else {
      len_ = fread(buf_.data(), 1, buf_.size(), f_);
    }
    return len_ > 0;
  }
  bool gz_ = false, ok_ = false;
  gzFile gzf_ = nullptr;
  FILE* f_ = nullptr;
  std::vector<char> buf_;
  size_t pos_ = 0, len_ = 0;
};

struct Batch {
  std::vector<uint8_t> seqs;    // n_rows * max_len, zero padded
  std::vector<int32_t> lengths;
  std::vector<uint8_t> has_n;
  std::vector<int32_t> barcode_ids;
  int n = 0;
  int max_len = 0;
};

struct Reader {
  LineReader in;
  int batch_size;
  int len_cap;
  bool fastq;
  bool packed = false;  // emit 2-bit packed rows (stride = max_len/4)

  std::unordered_map<std::string, int32_t> barcode_ids;
  std::vector<std::string> barcode_order;
  long truncated = 0;  // reads longer than len_cap (silently capped)

  // double-buffered prefetch
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  Batch ready;
  bool ready_valid = false;
  bool eof = false;
  bool stop = false;

  Reader(const std::string& path, int bs, int cap, bool fq)
      : in(path), batch_size(bs), len_cap(cap), fastq(fq) {}

  int32_t barcode_id(const char* head, size_t n) {
    // classify.cpp:112-119 parseName: between LAST '#' and LAST '/';
    // '/ ' before '#' or missing -> to end of string
    int s = -1, e = -1;
    for (size_t i = 0; i < n; i++) {
      if (head[i] == '#') s = static_cast<int>(i);
      if (head[i] == '/') e = static_cast<int>(i);
    }
    const char* b;
    size_t bl;
    if (e > s) {
      b = head + s + 1;
      bl = e - s - 1;
    } else {
      b = head + s + 1;
      bl = n - s - 1;
    }
    std::string key(b, bl);
    auto it = barcode_ids.find(key);
    if (it != barcode_ids.end()) return it->second;
    int32_t id = static_cast<int32_t>(barcode_order.size());
    barcode_ids.emplace(std::move(key), id);
    barcode_order.push_back(std::string(b, bl));
    return id;
  }

  // produce one batch synchronously (runs on worker thread)
  bool produce(Batch* b) {
    b->n = 0;
    std::vector<std::string> heads, seqs;
    heads.reserve(batch_size);
    seqs.reserve(batch_size);
    std::string head, seq, tmp;
    int max_len = 1;
    while (static_cast<int>(seqs.size()) < batch_size) {
      if (!in.getline(&head)) break;
      if (!in.getline(&seq)) break;
      if (fastq) {
        in.getline(&tmp);
        in.getline(&tmp);
      }
      if (static_cast<int>(seq.size()) > max_len)
        max_len = static_cast<int>(seq.size());
      heads.push_back(head);
      seqs.push_back(std::move(seq));
    }
    if (seqs.empty()) return false;
    if (max_len > len_cap) max_len = len_cap;
    // round max_len up to a 128 bucket so jit shapes stay stable
    max_len = ((max_len + 127) / 128) * 128;
    b->max_len = max_len;
    b->n = static_cast<int>(seqs.size());
    const int stride = packed ? max_len / 4 : max_len;
    b->seqs.assign(static_cast<size_t>(batch_size) * stride, 0);
    b->lengths.assign(batch_size, 0);
    b->has_n.assign(batch_size, 0);
    b->barcode_ids.assign(batch_size, 0);
    for (int i = 0; i < b->n; i++) {
      const std::string& s = seqs[i];
      int L = static_cast<int>(s.size());
      if (L > max_len) {
        L = max_len;
        truncated++;
      }
      uint8_t* row = &b->seqs[static_cast<size_t>(i) * stride];
      if (packed) {
        // 2-bit pack, 4 bases/byte little-endian: the reference
        // encoding (c>>1)&3 on every byte (kmer.h:11-12), matching
        // ops/encode.pack_codes_np bit-for-bit.
        const uint8_t* p = reinterpret_cast<const uint8_t*>(s.data());
        int j = 0;
        for (; j + 4 <= L; j += 4) {
          row[j >> 2] = static_cast<uint8_t>(
              ((p[j] >> 1) & 3) | (((p[j + 1] >> 1) & 3) << 2) |
              (((p[j + 2] >> 1) & 3) << 4) | (((p[j + 3] >> 1) & 3) << 6));
        }
        for (; j < L; j++)
          row[j >> 2] |= static_cast<uint8_t>(((p[j] >> 1) & 3)
                                              << ((j & 3) * 2));
      } else {
        memcpy(row, s.data(), L);
      }
      b->lengths[i] = L;
      b->has_n[i] = memchr(s.data(), 'N', s.size()) != nullptr;
      b->barcode_ids[i] = barcode_id(heads[i].data(), heads[i].size());
    }
    return true;
  }

  void run() {
    while (true) {
      Batch b;
      bool got = produce(&b);
      std::unique_lock<std::mutex> lk(mu);
      cv_empty.wait(lk, [&] { return !ready_valid || stop; });
      if (stop) return;
      if (!got) {
        eof = true;
        cv_full.notify_all();
        return;
      }
      ready = std::move(b);
      ready_valid = true;
      cv_full.notify_all();
    }
  }

  void start() {
    worker = std::thread([this] { run(); });
  }

  bool next(Batch* out) {
    std::unique_lock<std::mutex> lk(mu);
    cv_full.wait(lk, [&] { return ready_valid || eof; });
    if (!ready_valid) return false;
    *out = std::move(ready);
    ready_valid = false;
    cv_empty.notify_all();
    return true;
  }

  ~Reader() {
    {
      std::unique_lock<std::mutex> lk(mu);
      stop = true;
      cv_empty.notify_all();
    }
    if (worker.joinable()) worker.join();
  }
};

}  // namespace

extern "C" {

void* hastio_open(const char* path, int batch_size, int len_cap,
                  int fastq) {
  auto* r = new Reader(path, batch_size, len_cap, fastq != 0);
  if (!r->in.ok()) {
    delete r;
    return nullptr;
  }
  r->start();
  return r;
}

// packed != 0: seqs rows are 2-bit packed, stride = max_len/4 bytes
// (*max_len_out from hastio_next_batch still reports BASES).
void* hastio_open_packed(const char* path, int batch_size, int len_cap,
                         int fastq, int packed) {
  auto* r = new Reader(path, batch_size, len_cap, fastq != 0);
  r->packed = packed != 0;
  if (!r->in.ok()) {
    delete r;
    return nullptr;
  }
  r->start();
  return r;
}

// Fills caller buffers sized batch_size*len_cap / batch_size.
// Returns #reads (0 on EOF).  *max_len_out is the padded row stride
// actually used (<= len_cap, multiple of 128).
long hastio_next_batch(void* handle, uint8_t* seqs, int32_t* lengths,
                       uint8_t* has_n, int32_t* barcode_ids,
                       int32_t* max_len_out) {
  auto* r = static_cast<Reader*>(handle);
  Batch b;
  if (!r->next(&b)) return 0;
  memcpy(seqs, b.seqs.data(), b.seqs.size());
  memcpy(lengths, b.lengths.data(), b.lengths.size() * sizeof(int32_t));
  memcpy(has_n, b.has_n.data(), b.has_n.size());
  memcpy(barcode_ids, b.barcode_ids.data(),
         b.barcode_ids.size() * sizeof(int32_t));
  *max_len_out = b.max_len;
  return b.n;
}

long hastio_num_barcodes(void* handle) {
  return static_cast<Reader*>(handle)->barcode_order.size();
}

// reads whose sequence exceeded len_cap so far (capped, not dropped)
long hastio_truncated(void* handle) {
  return static_cast<Reader*>(handle)->truncated;
}

// newline-joined barcode strings in id order; returns bytes written
// (or required size if buf == nullptr)
long hastio_get_barcodes(void* handle, char* buf, long cap) {
  auto* r = static_cast<Reader*>(handle);
  long need = 0;
  for (const auto& s : r->barcode_order) need += s.size() + 1;
  if (!buf) return need;
  if (need > cap) return -1;
  long off = 0;
  for (const auto& s : r->barcode_order) {
    memcpy(buf + off, s.data(), s.size());
    off += s.size();
    buf[off++] = '\n';
  }
  return off;
}

void hastio_close(void* handle) { delete static_cast<Reader*>(handle); }

}  // extern "C"

// ---------------------------------------------------------------------------
// quartering: route fastq records into 4 bins by barcode class
// (quartering_fastq.awk semantics, see hast_tpu/pipeline/partition.py)
// ---------------------------------------------------------------------------

#include <unordered_set>
#include <string>

namespace {

bool load_set(const char* path, std::unordered_set<std::string>* out) {
  LineReader in(path);
  if (!in.ok()) return false;
  std::string line;
  while (in.getline(&line)) {
    // strip whitespace-only lines like the python loader
    size_t a = line.find_first_not_of(" \t");
    if (a == std::string::npos) continue;
    out->insert(line);
  }
  return true;
}

}  // namespace

extern "C" {

// Returns 0 on success.  stats_out: total, no, pa, ma, ho, un.
// Unknown barcodes are reported on stderr exactly like the awk.
int hastio_quarter(const char* fastq_path, const char* prefix,
                   const char* pat_list, const char* mat_list,
                   const char* homo_list, const char* log_path,
                   long* stats_out) {
  std::unordered_set<std::string> pat, mat, homo;
  if (!load_set(pat_list, &pat) || !load_set(mat_list, &mat) ||
      !load_set(homo_list, &homo))
    return 1;
  LineReader in(fastq_path);
  if (!in.ok()) return 2;

  std::string pfx(prefix);
  FILE* outs[4] = {nullptr, nullptr, nullptr, nullptr};
  const char* suffix[4] = {".nobarcode.fastq", ".paternal.fastq",
                           ".maternal.fastq", ".homozygous.fastq"};
  long total = 0, no = 0, pa = 0, ma = 0, ho = 0, un = 0;

  FILE* log = fopen(log_path, "ab");
  if (!log) return 3;
  // awk sees FILENAME="-" when fed from `gzip -dc |`
  size_t n = strlen(fastq_path);
  bool gz = n > 3 && strcmp(fastq_path + n - 3, ".gz") == 0;
  fprintf(log, "%s\n", gz ? "-" : fastq_path);

  std::string head, seq, plus, qual;
  std::vector<char> buf;
  while (in.getline(&head)) {
    if (!in.getline(&seq)) break;
    in.getline(&plus);
    in.getline(&qual);
    total++;
    // awk -F '#|/': fields split on single '#' or '/', empties kept
    size_t s1 = head.find_first_of("#/");
    int rt;  // 0 nobarcode, 1 pat, 2 mat, 3 homo, -1 unknown
    std::string bc;
    if (s1 == std::string::npos) {
      rt = 0;  // NF == 1
      no++;
    } else {
      size_t s2 = head.find_first_of("#/", s1 + 1);
      bc = head.substr(s1 + 1, (s2 == std::string::npos ? head.size() : s2)
                                   - s1 - 1);
      if (bc == "0_0_0") {
        rt = 0;
        no++;
      } else if (pat.count(bc)) {
        rt = 1;
        pa++;
      } else if (mat.count(bc)) {
        rt = 2;
        ma++;
      } else if (homo.count(bc)) {
        rt = 3;
        ho++;
      } else {
        fprintf(stderr, "ERROR : unclassify barcode : %s\n", bc.c_str());
        un++;
        rt = -1;
      }
    }
    if (rt >= 0) {
      if (!outs[rt]) {
        std::string name = pfx + suffix[rt];
        outs[rt] = fopen(name.c_str(), "wb");
        if (!outs[rt]) {
          fclose(log);
          return 4;
        }
        setvbuf(outs[rt], nullptr, _IOFBF, 1 << 20);
      }
      FILE* f = outs[rt];
      fwrite(head.data(), 1, head.size(), f);
      fputc('\n', f);
      fwrite(seq.data(), 1, seq.size(), f);
      fputc('\n', f);
      fwrite(plus.data(), 1, plus.size(), f);
      fputc('\n', f);
      fwrite(qual.data(), 1, qual.size(), f);
      fputc('\n', f);
    }
  }
  fprintf(log, "#Total reads                : %ld \n", total);
  fprintf(log, "#Reads without barcode      : %ld \n", no);
  fprintf(log, "#Paternal reads             : %ld \n", pa);
  fprintf(log, "#Maternal reads             : %ld \n", ma);
  fprintf(log, "#Homozygous reads           : %ld \n", ho);
  fclose(log);
  for (FILE* f : outs)
    if (f) fclose(f);
  if (stats_out) {
    stats_out[0] = total;
    stats_out[1] = no;
    stats_out[2] = pa;
    stats_out[3] = ma;
    stats_out[4] = ho;
    stats_out[5] = un;
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// phased.barcodes formatter: bulk "bc\thap\tc0\tc1\n" rows
// (the print loop of classify.cpp:93-102; rows arrive pre-sorted)
// ---------------------------------------------------------------------------

namespace {

inline char* put_i64(char* p, long long v) {
  if (v < 0) { *p++ = '-'; v = -v; }
  char tmp[24];
  int n = 0;
  do { tmp[n++] = char('0' + v % 10); v /= 10; } while (v);
  while (n) *p++ = tmp[--n];
  return p;
}

}  // namespace

extern "C" {

// bcs: n rows of fixed width `w`, NUL-padded (numpy S dtype).  Writes
// formatted rows into out (cap bytes); returns bytes written or -1 if
// out would overflow.
long hastio_format_phased(const char* bcs, long n, int w,
                          const int32_t* hap, const int64_t* c0,
                          const int64_t* c1, char* out, long cap) {
  char* p = out;
  char* end = out + cap;
  for (long i = 0; i < n; ++i) {
    const char* bc = bcs + i * w;
    int len = 0;
    while (len < w && bc[len]) ++len;
    if (p + len + 3 + 3 * 21 + 1 > end) return -1;
    memcpy(p, bc, len);
    p += len;
    *p++ = '\t';
    p = put_i64(p, hap[i]);
    *p++ = '\t';
    p = put_i64(p, c0[i]);
    *p++ = '\t';
    p = put_i64(p, c1[i]);
    *p++ = '\n';
  }
  return p - out;
}

}  // extern "C"
