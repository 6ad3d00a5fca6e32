"""Stage 01 — filial stLFR read classification (the hot path).

TPU-native replacement for the reference's ``classify`` binary
(/root/reference/01.classify_stlfr_reads/classify.cpp): reads stream
from the host as 2-bit-packable ASCII batches, canonical k-mers are
extracted vectorized on device, probed against a single combined
marker table (payload bit0 = hap0/paternal, bit1 = hap1/maternal), and
per-read votes reduce into a per-barcode tally on the host.

Observable-behavior parity targets:
  * votes: per read, vote[h] = number of k-mer positions whose canonical
    k-mer is in marker set h (a position can hit both)
    (classify.cpp:186-209); N-containing reads short-circuit to the
    "-1" bucket before voting (classify.cpp:190-192).
  * decision getHap (classify.cpp:66-86): null barcodes 0/0_0/0_0_0 are
    -1; both sides present -> compare count/set_size*weight in double,
    strict >, tie -1; one-sided -> that hap; none -> -1.
  * adaptor k-mers are erased from the sets BEFORE classification and
    the normalization set sizes shrink accordingly
    (classify.cpp:314-339 InitAdaptor).
  * output: one line per barcode, lexicographically sorted
    (std::map iteration), "barcode\\thap\\tcount0\\tcount1"
    (classify.cpp:93-102).

Divergence (documented): the reference *asserts* (crashes) on reads
shorter than k (kmer.h:171); we count them as both-zero votes -> the
-1 bucket.
"""

from __future__ import annotations

import dataclasses
import functools
import sys
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from hast_tpu.ops import encode as E
from hast_tpu.ops import hashtable as H
from hast_tpu.io import fastq as FQ

ADAPTOR_F = "CTGTCTCTTATACACATCTTAGGAAGACAAGCACTGACGACATGA"
ADAPTOR_R = "TCTGCTGAGTCGAGAACGTCTCTGTGAGCCAAGGAGTTGCTCTGG"
NULL_BARCODES = (b"0_0_0", b"0_0", b"0")


def load_marker_table(hap0_path: str, hap1_path: str,
                      load: float = 0.7,
                      snapshot: bool = True,
                      fmt: str = "auto") -> H.KmerTable:
    """Load two one-kmer-per-line marker files into one combined table.

    k is inferred from the first line of hap0 (classify.cpp:35-37);
    set sizes are the DISTINCT canonical k-mer counts per haplotype
    (the reference's unordered_set sizes).

    With snapshot=True the built table is cached next to the hap0 file
    (.probetable.npz keyed on both files' size+mtime) — the framework's
    analog of jellyfish's binary DB files; text parsing + canonical
    packing + bucket placement are skipped on re-runs.
    """
    import os
    if fmt != "auto":
        snapshot = False   # forced-format tables never reuse snapshots
    cache_path = hap0_path + ".probetable.npz"
    key = tuple(
        float(x) for p in (hap0_path, hap1_path)
        for x in (os.path.getsize(p), int(os.path.getmtime(p)))
    ) + (load, 5.0)  # 5.0 = table format version (quotient 4B slots
    #                  when they fit, full 8B slots otherwise)
    if snapshot and os.path.exists(cache_path):
        try:
            z = np.load(cache_path, allow_pickle=False)
            if tuple(z["key"].tolist()) == key:
                table = H.KmerTable(
                    data=z["data"], n_buckets=int(z["n_buckets"]),
                    max_probe=int(z["max_probe"]), k=int(z["k"]),
                    n_keys=int(z["n_keys"]),
                    set_sizes=tuple(int(x) for x in z["set_sizes"]),
                    fmt=str(z["fmt"]) if "fmt" in z else "full")
                table.cache_key = key
                for h, n in enumerate(z["line_counts"].tolist()):
                    print(f"Recorded {n} haplotype {h} specific "
                          f"{table.k}-mers", file=sys.stderr)
                return table
        except Exception as e:
            from hast_tpu.utils.profiling import notice_fallback
            notice_fallback("probetable snapshot load", e)
    h0_hi, h0_lo, k = E.load_mer_file(hap0_path)
    h1_hi, h1_lo, k1 = E.load_mer_file(hap1_path, k_expect=k)
    del k1
    n0 = np.unique((h0_hi.astype(np.uint64) << np.uint64(32))
                   | h0_lo.astype(np.uint64)).size
    n1 = np.unique((h1_hi.astype(np.uint64) << np.uint64(32))
                   | h1_lo.astype(np.uint64)).size
    hi = np.concatenate([h0_hi, h1_hi])
    lo = np.concatenate([h0_lo, h1_lo])
    pay = np.concatenate([np.ones(h0_hi.size, np.uint32),
                          np.full(h1_hi.size, 2, np.uint32)])
    table = H.build_table(hi, lo, pay, k, load=load, set_sizes=(n0, n1),
                          fmt=fmt)
    table.cache_key = key
    print(f"Recorded {h0_hi.size} haplotype 0 specific {k}-mers",
          file=sys.stderr)
    print(f"Recorded {h1_hi.size} haplotype 1 specific {k}-mers",
          file=sys.stderr)
    if snapshot:
        try:
            np.savez(cache_path, data=table.data,
                     n_buckets=table.n_buckets, max_probe=table.max_probe,
                     k=table.k, n_keys=table.n_keys,
                     set_sizes=np.asarray(table.set_sizes),
                     line_counts=np.asarray([h0_hi.size, h1_hi.size]),
                     key=np.asarray(key), fmt=table.fmt)
        except Exception:
            pass
    return table


def erase_adaptors(table: H.KmerTable,
                   adaptor_f: str = ADAPTOR_F,
                   adaptor_r: str = ADAPTOR_R) -> None:
    """Erase adaptor k-mers from both marker sets (InitAdaptor parity)."""
    print(f"Adaptor forward :{adaptor_f}", file=sys.stderr)
    print(f"Adaptor reverse :{adaptor_r}", file=sys.stderr)
    k = table.k
    for adaptor in (adaptor_f, adaptor_r):
        if len(adaptor) < k:
            continue
        codes = E.encode_np(np.frombuffer(adaptor.encode(), np.uint8))
        hi, lo = E.canonical_kmers_np(codes[None, :], k)
        cleared = H.remove_keys(table, hi[0], lo[0], payload_mask=3)
        for chi, clo, bits in cleared:
            for hap in (0, 1):
                if bits & (1 << hap):
                    print(" INFO : erase a adaptor kmer from hap "
                          f"{hap} ; kmer= {E.kmer_to_str(chi, clo, k)}",
                          file=sys.stderr)


@functools.partial(jax.jit, static_argnames=("k", "max_probe", "fmt"))
def vote_kernel(data: jax.Array, seqs_u8: jax.Array, lengths: jax.Array,
                k: int, max_probe: int, fmt: str = "full"):
    """Per-read haplotype votes for a padded ASCII batch.

    Returns (v0, v1) int32 (B,): number of k-mer positions of each read
    whose canonical k-mer carries marker payload bit 0 / bit 1.
    """
    codes = E.encode_bases(seqs_u8)
    hi, lo = E.canonical_kmers(codes, k)
    good = jnp.ones(seqs_u8.shape, bool)
    valid = E.window_valid(good, lengths, k)
    pay = H.probe_table(data, hi, lo, k, fmt, max_probe)
    pay = jnp.where(valid, pay, 0)
    v0 = jnp.sum(pay & 1, axis=-1, dtype=jnp.int32)
    v1 = jnp.sum((pay >> 1) & 1, axis=-1, dtype=jnp.int32)
    return v0, v1


@functools.partial(jax.jit, static_argnames=("k", "max_probe", "fmt"))
def vote_kernel_multi(data: jax.Array, seqs_u8: jax.Array,
                      lengths: jax.Array, k: int, max_probe: int,
                      fmt: str = "full"):
    """Super-batched votes: (S, B, L) reads -> (S, B, 2) int32.

    One host->device transfer, one dispatch and one device->host fetch
    cover S*B reads; lax.map keeps the compiled probe at the per-batch
    shape where XLA's gather stays in VMEM (large single batches spill
    and run ~20x slower on v5e).
    """

    def one(args):
        seqs, lens = args
        v0, v1 = vote_kernel(data, seqs, lens, k, max_probe, fmt)
        return jnp.stack([v0, v1], axis=-1)

    return jax.lax.map(one, (seqs_u8, lengths))


pack_codes_np = E.pack_codes_np  # host packing lives with the codec


class _StrideBudget:
    """Bound the distinct batch strides (= compiled shapes) per run.

    Batch rows arrive rounded to 16-base strides (best padding, fastest
    warm probe) but every new stride costs a ~22s XLA compile; on
    mixed-length inputs that multiplies (the BENCH_r02 cold regression).
    The first `budget` distinct strides pass through exactly; after
    that, new strides round UP to `coarse`-unit multiples (128 bases:
    32 for packed-byte strides, 128 for ASCII base strides), capping
    total compiles at budget + 8 for len_cap 1024.
    """

    def __init__(self, budget: int = 3, coarse: int = 32):
        self.budget = budget
        self.coarse = coarse
        self.seen: set[int] = set()

    def round(self, stride: int) -> int:
        if stride in self.seen:
            return stride
        if len(self.seen) < self.budget:
            self.seen.add(stride)
            return stride
        c = self.coarse
        coarse = -(-stride // c) * c
        self.seen.add(coarse)
        return coarse


@functools.partial(jax.jit, static_argnames=("k", "max_probe", "fmt"),
                   donate_argnums=(1,))
def tally_step(data: jax.Array, acc: jax.Array, packed: jax.Array,
               lengths: jax.Array, ids: jax.Array, has_n: jax.Array,
               k: int, max_probe: int, fmt: str = "full") -> jax.Array:
    """Vote one packed super-batch and scatter-add into the device tally.

    acc: (cap, 3) int32 per-barcode-id [c0, c1, unknown] accumulator
    (donated: updated in place across dispatches).  ids: (S, B) int32
    dense barcode ids from the native reader; pad rows carry id -1 and
    are dropped by the scatter.  has_n: (S, B) uint8/bool — N-containing
    reads short-circuit to the unknown bucket before voting
    (classify.cpp:190-192).

    Keeping the whole reduction on device means the only
    device->host fetch is ONE (cap, 3) copy per file — per-batch vote
    fetches are murder on remote-attached devices (seconds of tunnel
    latency each).
    """

    def one(args):
        p, lens = args
        b, lp = p.shape
        shifts = jnp.arange(4, dtype=jnp.int32) * 2
        codes = ((p.astype(jnp.int32)[:, :, None] >> shifts[None, None, :])
                 & 3).reshape(b, lp * 4)
        hi, lo = E.canonical_kmers(codes, k)
        good = jnp.ones(codes.shape, bool)
        valid = E.window_valid(good, lens, k)
        pay = H.probe_table(data, hi, lo, k, fmt, max_probe)
        pay = jnp.where(valid, pay, 0)
        v0 = jnp.sum(pay & 1, axis=-1, dtype=jnp.int32)
        v1 = jnp.sum((pay >> 1) & 1, axis=-1, dtype=jnp.int32)
        return jnp.stack([v0, v1], axis=-1)

    votes = jax.lax.map(one, (packed, lengths))     # (S, B, 2) int32
    hn = has_n.astype(bool)
    v0 = jnp.where(hn, 0, votes[..., 0])
    v1 = jnp.where(hn, 0, votes[..., 1])
    unk = (hn | ((v0 == 0) & (v1 == 0))).astype(jnp.int32)
    upd = jnp.stack([v0, v1, unk], axis=-1).reshape(-1, 3)
    flat_ids = ids.reshape(-1)
    return acc.at[flat_ids].add(
        upd, mode="drop", indices_are_sorted=False, unique_indices=False)


@jax.jit
def _grow_acc(acc: jax.Array, zeros: jax.Array) -> jax.Array:
    return jnp.concatenate([acc, zeros], axis=0)


@jax.jit
def _pack_acc(acc: jax.Array):
    """uint8 and uint16 low-byte images of the int32 tally + scalar
    overflow counts.  The final tally fetch is the one unavoidable
    d2h of the streaming path (~6 MB of uint16 at 1M barcodes — ~0.3 s
    on the ~20 MB/s tunnel); most workloads' per-barcode counts fit a
    byte (a barcode needs >255 marker-hit positions to overflow), so
    the uint8 image (3 MB) is tried first, the uint16 one fetched only
    when some entry >= 256, and the raw int32 tally only above 65535.

    (A sparse nonzero-built high-half list was tried in r02 and
    removed: its first execution stalled ~100 s on this backend.)
    """
    lo8 = (acc & 0xFF).astype(jnp.uint8)
    n_over8 = jnp.sum((acc >> 8) != 0, dtype=jnp.int32)
    lo16 = (acc & 0xFFFF).astype(jnp.uint16)
    n_over16 = jnp.sum((acc >> 16) != 0, dtype=jnp.int32)
    return lo8, n_over8, lo16, n_over16


def _fetch_acc_start(acc: jax.Array):
    """Kick off the packed tally d2h; returns a handle for _finish.
    Split so callers can do host work (e.g. the barcode name sort)
    while the copy drains."""
    lo8, n_over8, lo16, n_over16 = _pack_acc(acc)
    try:
        lo8.copy_to_host_async()
    except Exception:
        pass
    return acc, lo8, n_over8, lo16, n_over16


def _fetch_acc_finish(state) -> np.ndarray:
    acc, lo8, n_over8, lo16, n_over16 = state
    if not int(np.asarray(n_over8)):
        return np.asarray(lo8).astype(np.int64)
    if not int(np.asarray(n_over16)):
        return np.asarray(lo16).astype(np.int64)
    return np.asarray(acc).astype(np.int64)


def _fetch_acc(acc: jax.Array) -> np.ndarray:
    """Fetch the device tally as int64, via the packed fast path."""
    return _fetch_acc_finish(_fetch_acc_start(acc))


@functools.partial(jax.jit, static_argnames=("k", "max_probe", "fmt"))
def vote_kernel_packed(data: jax.Array, packed: jax.Array,
                       lengths: jax.Array, k: int, max_probe: int,
                       fmt: str = "full"):
    """Super-batched votes over 2-bit packed reads: (S, B, L/4) uint8.

    Same results as :func:`vote_kernel_multi`; the unpack is a few VPU
    shifts, far cheaper than shipping ASCII over the interconnect.
    """

    def one(args):
        p, lens = args
        b, lp = p.shape
        shifts = jnp.arange(4, dtype=jnp.int32) * 2
        codes = ((p.astype(jnp.int32)[:, :, None] >> shifts[None, None, :])
                 & 3).reshape(b, lp * 4)
        hi, lo = E.canonical_kmers(codes, k)
        good = jnp.ones(codes.shape, bool)
        valid = E.window_valid(good, lens, k)
        pay = H.probe_table(data, hi, lo, k, fmt, max_probe)
        pay = jnp.where(valid, pay, 0)
        v0 = jnp.sum(pay & 1, axis=-1, dtype=jnp.int32)
        v1 = jnp.sum((pay >> 1) & 1, axis=-1, dtype=jnp.int32)
        # uint16 halves the device->host vote traffic; votes are
        # bounded by read length (<= len_cap - k + 1 < 2^16)
        return jnp.stack([v0, v1], axis=-1).astype(jnp.uint16)

    return jax.lax.map(one, (packed, lengths))


@dataclasses.dataclass
class BarcodeTally:
    """barcode -> (count_hap0, count_hap1, count_unknown) accumulator.

    The merge of the reference's per-thread BarcodeCaches
    (classify.cpp:50-64) collapses to plain integer adds — the
    reduction is commutative, so device batch order doesn't matter.

    Two ingestion paths share the structure: the python reader adds
    per-batch barcode *lists* through the dict index (add_batch), the
    native reader folds whole per-file count tables keyed by S-dtype
    name arrays (merge_names) with no per-barcode python.  finalize()
    reconciles both into one (names, counts) pair.
    """

    index: dict[bytes, int] = dataclasses.field(default_factory=dict)
    counts: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((1024, 3), np.int64))
    _pending: list = dataclasses.field(default_factory=list)
    # (names, order) computed while a device drain was in flight; only
    # honored when finalize() returns that identical names array
    order_hint: tuple | None = None

    def _ids(self, barcodes: list[bytes]) -> np.ndarray:
        idx = self.index
        ids = np.empty(len(barcodes), np.int64)
        for i, bc in enumerate(barcodes):
            v = idx.get(bc)
            if v is None:
                v = len(idx)
                idx[bc] = v
            ids[i] = v
        if len(idx) > self.counts.shape[0]:
            grow = max(len(idx), 2 * self.counts.shape[0])
            self.counts = np.vstack(
                [self.counts, np.zeros((grow - self.counts.shape[0], 3),
                                       np.int64)])
        return ids

    def add_batch(self, barcodes: list[bytes], v0: np.ndarray,
                  v1: np.ndarray, has_n: np.ndarray) -> None:
        ids = self._ids(barcodes)
        v0 = np.where(has_n, 0, v0.astype(np.int64))
        v1 = np.where(has_n, 0, v1.astype(np.int64))
        unknown = (has_n | ((v0 == 0) & (v1 == 0))).astype(np.int64)
        np.add.at(self.counts[:, 0], ids, v0)
        np.add.at(self.counts[:, 1], ids, v1)
        np.add.at(self.counts[:, 2], ids, unknown)

    def add_tally(self, other: "BarcodeTally") -> None:
        """Cross-shard reduce (the *correct* mergeResult semantics)."""
        names, counts = other.finalize()
        self.merge_names(names, counts)

    def merge_ids(self, barcodes: list[bytes], counts: np.ndarray) -> None:
        """Fold a reader-local (n_barcodes, 3) count table in by name."""
        names = np.array(barcodes, dtype=bytes)
        self.merge_names(names, np.asarray(counts[:names.size], np.int64))

    def merge_names(self, names: np.ndarray, counts: np.ndarray) -> None:
        """Fold a (n,) S-dtype name array + (n, 3) count table in.

        Vectorized: parts are queued and reconciled in finalize() with
        one np.unique over the union — no per-barcode python.
        """
        if names.size:
            self._pending.append((names, counts))

    def finalize(self) -> tuple[np.ndarray, np.ndarray]:
        """Deduplicated (names S-array, (n, 3) int64 counts), unsorted."""
        parts = list(self._pending)
        if self.index:
            names = np.array(list(self.index.keys()), dtype=bytes)
            parts.append((names, self.counts[:names.size]))
        if not parts:
            return np.empty(0, "S1"), np.zeros((0, 3), np.int64)
        if len(parts) == 1:
            return parts[0]
        width = max(p[0].dtype.itemsize for p in parts)
        all_names = np.concatenate(
            [p[0].astype(f"S{width}") for p in parts])
        all_counts = np.concatenate([p[1] for p in parts]).astype(np.int64)
        order = None
        try:
            from hast_tpu.io import native as N
            order = N.argsort_fixed(all_names)
        except Exception as e:
            from hast_tpu.utils.profiling import notice_fallback
            notice_fallback("native argsort_fixed", e)
        if order is None:
            order = np.argsort(all_names, kind="stable")
        s = all_names[order]
        new = np.empty(s.size, bool)
        new[0] = True
        new[1:] = s[1:] != s[:-1]
        uniq = s[new]
        counts = np.add.reduceat(all_counts[order],
                                 np.flatnonzero(new), axis=0)
        self._pending = [(uniq, counts)]
        self.index = {}
        self.counts = np.zeros((1024, 3), np.int64)
        return uniq, counts

    def items(self):
        names, counts = self.finalize()
        for bc, c in zip(names.tolist(), counts):
            yield bc, int(c[0]), int(c[1]), int(c[2])


def get_hap(barcode: bytes, c0: int, c1: int, size0: int, size1: int,
            w0: float = 1.0, w1: float = 1.0) -> int:
    """The getHap decision (classify.cpp:66-86), exact double math."""
    if barcode in NULL_BARCODES:
        return -1
    if c0 > 0 and c1 > 0:
        df0 = (float(c0) / float(size0)) * w0
        df1 = (float(c1) / float(size1)) * w1
        if df0 > df1:
            return 0
        if df1 > df0:
            return 1
        return -1
    if c0 > 0:
        return 0
    if c1 > 0:
        return 1
    return -1


def classify_fastqs(table: H.KmerTable, paths: Iterable[str],
                    batch_size: int = 1 << 15,
                    tally: BarcodeTally | None = None,
                    super_batch: int | None = None,
                    engine: str = "auto") -> BarcodeTally:
    """Stream fastq files through the device vote kernel into a tally.

    Batches are grouped into super-batches of `super_batch`; each
    device interaction (transfer, dispatch, fetch) covers
    super_batch*batch_size reads.  Defaults were swept on a v5e behind
    a remote tunnel: 64k reads per interaction keeps ~8 super-batches
    in flight over a 1M-read file, so reader, host->device copies,
    device compute and drains all overlap (one giant super-batch
    serializes the whole chain and runs ~1.6x slower).
    All dispatches stay async; results are drained with a lag.

    engine: "native" uses the C++ hastio reader (decode + pack +
    barcode dictionary off the GIL with a prefetch thread), "python"
    the pure-python reader, "auto" native when the shared library is
    available.  Outputs are identical.

    super_batch: batches per device interaction (results identical for
    any value — unused slices carry id -1 and are dropped by the
    scatter).  Default 2, or HAST_CLASSIFY_SUPER; each interaction is
    ~4 host->device transfers, so remote tunnels with high per-RPC
    latency favor larger S.
    """
    if super_batch is None:
        import os
        super_batch = int(os.environ.get("HAST_CLASSIFY_SUPER", "2"))
    if engine in ("auto", "native"):
        try:
            from hast_tpu.io import native as N
            if N.get_lib() is not None:
                return _classify_fastqs_device_tally(
                    table, paths, batch_size, tally, super_batch, N)
            if engine == "native":
                raise RuntimeError("libhastio.so unavailable")
        except ImportError:
            if engine == "native":
                raise
    tally = tally or BarcodeTally()
    data = table.data if isinstance(table.data, jax.Array) \
        else jnp.asarray(table.data)
    k, mp, fmt = table.k, table.max_probe, table.fmt
    S = super_batch

    pending = None  # (device votes (S,B,2), [batch meta])
    buf: list[FQ.ReadBatch] = []

    def drain(p):
        votes = np.asarray(p[0])
        for s, batch in enumerate(p[1]):
            nb = len(batch.barcodes)
            tally.add_batch(batch.barcodes, votes[s, :nb, 0],
                            votes[s, :nb, 1], batch.has_n[:nb])

    strides = _StrideBudget(coarse=128)  # ASCII strides are in bases

    def flush():
        nonlocal pending, buf
        if not buf:
            return
        L = strides.round(max(b.seqs.shape[1] for b in buf))
        B = buf[0].seqs.shape[0]
        seqs = np.zeros((S, B, L), np.uint8)
        lengths = np.zeros((S, B), np.int32)
        for s, b in enumerate(buf):
            seqs[s, :, :b.seqs.shape[1]] = b.seqs
            lengths[s] = b.lengths
        votes = vote_kernel_packed(data, jnp.asarray(pack_codes_np(seqs)),
                                   jnp.asarray(lengths), k, mp, fmt)
        meta = buf
        buf = []
        if pending is not None:
            drain(pending)
        pending = (votes, meta)

    for path in paths:
        print(f"__process read: {path}", file=sys.stderr)
        for batch in FQ.fastq_batches(path, batch_size):
            buf.append(batch)
            if len(buf) >= S:
                flush()
        print("__process read done__", file=sys.stderr)
    flush()
    if pending is not None:
        drain(pending)
    return tally


def _classify_fastqs_device_tally(table, paths, batch_size, tally,
                                  super_batch, N) -> BarcodeTally:
    """Native reader + device-resident per-barcode tally.

    The per-read votes never leave the device: each super-batch
    scatter-adds into a (cap, 3) int32 accumulator (donated buffer, so
    XLA updates it in place), and the only device->host fetch is the
    final accumulator copy per file.  On remote-attached devices this
    removes every per-batch round trip; on local devices it removes the
    host-side bincount folds (which fight the reader threads for CPU).

    Counts accumulate in int32 on device (the reference's BarcodeCache
    is `int` too); they widen to int64 in the host tally.
    """
    tally = tally or BarcodeTally()
    data = table.data if isinstance(table.data, jax.Array) \
        else jnp.asarray(table.data)
    k, mp, fmt = table.k, table.max_probe, table.fmt
    S = super_batch
    for path in paths:
        print(f"__process read: {path}", file=sys.stderr)
        reader = N.NativeFastqReader(path, batch_size, len_cap=1024,
                                     packed=True)
        cap = 1 << 20
        acc = jnp.zeros((cap, 3), jnp.int32)
        buf: list = []
        max_id = -1
        strides = _StrideBudget(coarse=32)   # packed strides: bytes

        def flush():
            nonlocal buf, acc, cap
            if not buf:
                return
            Lp = strides.round(max(b.seqs.shape[1] for b in buf))
            seqs = np.zeros((S, batch_size, Lp), np.uint8)
            lengths = np.zeros((S, batch_size), np.int32)
            ids = np.full((S, batch_size), -1, np.int32)
            has_n = np.zeros((S, batch_size), np.uint8)
            for s, b in enumerate(buf):
                n = b.n
                seqs[s, :, :b.seqs.shape[1]] = b.seqs
                lengths[s] = b.lengths
                ids[s, :n] = b.barcode_ids[:n]
                has_n[s, :n] = b.has_n[:n]
            buf = []
            while max_id >= cap:
                grow = cap  # double
                acc = _grow_acc(acc, jnp.zeros((grow, 3), jnp.int32))
                cap += grow
            acc = tally_step(data, acc, jnp.asarray(seqs),
                             jnp.asarray(lengths), jnp.asarray(ids),
                             jnp.asarray(has_n), k, mp, fmt)

        for batch in reader:
            nb_max = int(batch.barcode_ids[:batch.n].max(initial=-1))
            if nb_max > max_id:
                max_id = nb_max
            buf.append(batch)
            if len(buf) >= S:
                flush()
        flush()
        # start the packed tally d2h, then sort the barcode names on
        # the host WHILE the copy drains — the lexicographic order
        # depends only on names, so write_phased_barcodes gets it for
        # free (order_hint) instead of paying it after the fetch
        fetch = _fetch_acc_start(acc)
        names = reader.barcodes_array()
        order = None
        try:
            order = N.argsort_fixed(names)
        except Exception as e:
            from hast_tpu.utils.profiling import notice_fallback
            notice_fallback("native argsort_fixed", e)
        local = _fetch_acc_finish(fetch)
        reader.close()
        tally.merge_names(names, local[:names.size])
        if order is not None:
            tally.order_hint = (names, order)
        print("__process read done__", file=sys.stderr)
    return tally


def _classify_fastqs_native(table, paths, batch_size, tally, super_batch,
                            N, vote_fn=None) -> BarcodeTally:
    """Native-reader fast path: identical tallies, no per-read python."""
    tally = tally or BarcodeTally()
    data = table.data if isinstance(table.data, jax.Array) \
        else jnp.asarray(table.data)
    k, mp, fmt = table.k, table.max_probe, table.fmt
    if vote_fn is None:
        vote_fn = lambda packed, lengths: vote_kernel_packed(
            data, packed, lengths, k, mp, fmt)
    S = super_batch
    for path in paths:
        print(f"__process read: {path}", file=sys.stderr)
        reader = N.NativeFastqReader(path, batch_size, len_cap=1024,
                                     packed=True)
        local = np.zeros((1 << 12, 3), np.int64)
        inflight: list = []  # [(device votes, [native batch meta])]
        buf: list = []
        strides = _StrideBudget(coarse=32)   # packed strides: bytes
        # drained per-read rows, folded into `local` in bulk: three
        # bincounts per ~4M reads instead of per batch (each bincount
        # walks the whole barcode range, so batch-wise folding is
        # O(batches * n_barcodes))
        acc: list = []       # [(ids, v0, v1, unk)]
        acc_reads = 0

        def grow(max_id):
            nonlocal local
            if max_id >= local.shape[0]:
                new = max(max_id + 1, 2 * local.shape[0])
                local = np.vstack(
                    [local, np.zeros((new - local.shape[0], 3), np.int64)])

        def fold():
            nonlocal acc, acc_reads
            if not acc:
                return
            ids = np.concatenate([a[0] for a in acc])
            v0 = np.concatenate([a[1] for a in acc])
            v1 = np.concatenate([a[2] for a in acc])
            unk = np.concatenate([a[3] for a in acc])
            acc = []
            acc_reads = 0
            if ids.size == 0:
                return
            grow(int(ids.max()))
            nb = local.shape[0]
            # float64 sums of these small ints are exact (<< 2^53)
            local[:, 0] += np.bincount(
                ids, weights=v0, minlength=nb).astype(np.int64)
            local[:, 1] += np.bincount(
                ids, weights=v1, minlength=nb).astype(np.int64)
            local[:, 2] += np.bincount(
                ids, weights=unk, minlength=nb).astype(np.int64)

        def drain(p):
            nonlocal acc_reads
            votes = np.asarray(p[0])
            for s, b in enumerate(p[1]):
                n = b.n
                ids = b.barcode_ids[:n]
                v0 = votes[s, :n, 0].astype(np.int64)
                v1 = votes[s, :n, 1].astype(np.int64)
                hn = b.has_n[:n]
                v0 = np.where(hn, 0, v0)
                v1 = np.where(hn, 0, v1)
                unk = (hn | ((v0 == 0) & (v1 == 0))).astype(np.int64)
                acc.append((ids, v0, v1, unk))
                acc_reads += n
            if acc_reads >= (1 << 22):
                fold()

        def flush():
            nonlocal buf
            if not buf:
                return
            # rows arrive 2-bit packed from the native reader; zero
            # pad bytes decode to A, same as the ASCII zero-pad path
            Lp = strides.round(max(b.seqs.shape[1] for b in buf))
            seqs = np.zeros((S, batch_size, Lp), np.uint8)
            lengths = np.zeros((S, batch_size), np.int32)
            for s, b in enumerate(buf):
                seqs[s, :, :b.seqs.shape[1]] = b.seqs
                lengths[s] = b.lengths
            votes = vote_fn(jnp.asarray(seqs), jnp.asarray(lengths))
            # start the device->host copy now; collect at the end so
            # every super-batch stays in flight (latency hiding on
            # remote-attached devices)
            try:
                votes.copy_to_host_async()
            except Exception:
                pass
            # keep only what drain needs; the packed seq buffers are
            # large views and must not be pinned by the inflight queue
            slim = [type("M", (), dict(n=b.n, barcode_ids=b.barcode_ids,
                                       has_n=b.has_n))() for b in buf]
            inflight.append((votes, slim))
            buf = []
            # bound memory: drain the oldest once a few are queued
            if len(inflight) > 6:
                drain(inflight.pop(0))

        for batch in reader:
            buf.append(batch)
            if len(buf) >= S:
                flush()
        flush()
        for p in inflight:
            drain(p)
        fold()
        names = reader.barcodes_array()
        reader.close()
        tally.merge_names(names, local[:names.size])
        print("__process read done__", file=sys.stderr)
    return tally


def decide_haps(bcs_s: np.ndarray, c0: np.ndarray, c1: np.ndarray,
                size0: int, size1: int,
                w0: float = 1.0, w1: float = 1.0) -> np.ndarray:
    """Vectorized getHap (classify.cpp:66-86): same double math as
    :func:`get_hap`, over S-dtype barcode + int count arrays."""
    with np.errstate(divide="ignore", invalid="ignore"):
        df0 = (c0.astype(np.float64) / float(size0)) * w0
        df1 = (c1.astype(np.float64) / float(size1)) * w1
    hap = np.full(bcs_s.shape, -1, np.int64)
    both = (c0 > 0) & (c1 > 0)
    hap[both & (df0 > df1)] = 0
    hap[both & (df1 > df0)] = 1
    hap[(c0 > 0) & (c1 <= 0)] = 0
    hap[(c1 > 0) & (c0 <= 0)] = 1
    null = np.zeros(bcs_s.shape, bool)
    for nb in NULL_BARCODES:  # 3 vector compares beat np.isin's sort
        null |= bcs_s == nb
    hap[null] = -1
    return hap


def write_phased_barcodes(tally: BarcodeTally, table: H.KmerTable,
                          out, w0: float = 1.0, w1: float = 1.0) -> None:
    """Emit phased.barcodes lines, lexicographically sorted by barcode.

    The decision is :func:`decide_haps` (bit-equal to the scalar
    get_hap); numpy S-dtype sorting is bytewise like std::map's
    std::string order, so row order matches the reference.
    """
    size0, size1 = table.set_sizes
    bcs, counts = tally.finalize()
    if bcs.size == 0:
        return
    order = buf = None
    # a sort computed while the tally drain was in flight applies only
    # if finalize returned that exact names array (single-part tally)
    hint = getattr(tally, "order_hint", None)
    if hint is not None and hint[0] is bcs:
        order = hint[1]
    try:
        from hast_tpu.io import native as N
        if order is None:
            order = N.argsort_fixed(bcs)
        if order is not None:
            buf = N.decide_format_phased(
                bcs, order, np.ascontiguousarray(counts[:, 0]),
                np.ascontiguousarray(counts[:, 1]), size0, size1, w0, w1)
    except Exception as e:
        from hast_tpu.utils.profiling import notice_fallback
        notice_fallback("native decide_format_phased", e)
    if buf is None:  # pure-python fallback (identical output)
        if order is None:
            order = np.argsort(bcs, kind="stable")
        bcs = bcs[order]
        c0 = counts[order, 0]
        c1 = counts[order, 1]
        hap = decide_haps(bcs, c0, c1, size0, size1, w0, w1)
        lines = [b"%s\t%d\t%d\t%d" % t for t in
                 zip(bcs.tolist(), hap.tolist(), c0.tolist(), c1.tolist())]
        buf = b"\n".join(lines) + b"\n" if lines else b""
    out.write(buf)


# one-slot reuse of the uploaded (post-adaptor-erasure) device table:
# repeat classify calls against the same marker files skip the
# host->device copy, which costs seconds on remote-attached devices
# (and ~150s for a human-scale 4.3 GB table at ~29 MB/s h2d); the slot
# also keeps the whole post-erasure KmerTable + its load-time stderr,
# so a repeat run skips the snapshot read too (4.3 GB npz = 14-25 s)
_DEVICE_TABLE: dict = {}


def _device_table(table: H.KmerTable, adaptor_f: str,
                  adaptor_r: str) -> None:
    key = (table.cache_key, adaptor_f, adaptor_r)
    if table.cache_key and _DEVICE_TABLE.get("key") == key:
        table.data = _DEVICE_TABLE["data"]
        return
    table.device_put()
    if table.cache_key:
        _DEVICE_TABLE["key"] = key
        _DEVICE_TABLE["data"] = table.data


def _marker_files_key(hap0_path: str, hap1_path: str,
                      load: float = 0.7):
    """The snapshot cache key of load_marker_table, computable without
    touching the marker text or snapshot."""
    import os
    return tuple(
        float(x) for p in (hap0_path, hap1_path)
        for x in (os.path.getsize(p), int(os.path.getmtime(p)))
    ) + (load, 5.0)


def _cached_device_table(hap0: str, hap1: str, adaptor_f: str,
                         adaptor_r: str) -> "H.KmerTable | None":
    """Return the resident post-erasure table when this process already
    loaded+uploaded these exact marker files (replaying the load-time
    stderr for output parity); None on any miss."""
    try:
        key = (_marker_files_key(hap0, hap1), adaptor_f, adaptor_r)
    except OSError:
        return None
    if _DEVICE_TABLE.get("key") == key and "table" in _DEVICE_TABLE:
        sys.stderr.write(_DEVICE_TABLE.get("stderr", ""))
        sys.stderr.flush()
        return _DEVICE_TABLE["table"]
    return None


class _TeeStderr:
    """Context manager: mirror stderr writes into a buffer."""

    def __enter__(self):
        import io
        self._real = sys.stderr
        self._buf = io.StringIO()
        outer = self

        class W(io.TextIOBase):
            def write(self, s):
                outer._real.write(s)
                outer._buf.write(s)
                return len(s)

            def flush(self):
                outer._real.flush()

        sys.stderr = W()
        return self._buf

    def __exit__(self, *exc):
        sys.stderr = self._real
        return False


def _start_device_warmup() -> "object":
    """Absorb per-process attachment and first-execution stalls on a
    background thread while the host parses marker text (the reference
    pays its unordered_set load at the same point, classify.cpp:30-46).

    Remote-attached backends stall 100s+ on a program's first output
    fetch (PERF.md §6-7) even when the executable comes from the
    persistent compile cache; running tiny-shape instances of the hot
    programs (both table formats) plus one dummy fetch here moves that
    cost off the timed classify stream.  No workload data is touched.
    """
    import threading

    def work():
        try:
            S, B = 1, 8
            packed = jnp.zeros((S, B, 32), jnp.uint8)
            lengths = jnp.zeros((S, B), jnp.int32)
            ids = jnp.zeros((S, B), jnp.int32)
            has_n = jnp.zeros((S, B), jnp.uint8)
            for fmt in ("quot", "full"):
                data = jnp.zeros((64, 4), jnp.uint32)
                # PRODUCTION-size accumulator: _pack_acc and its fetch
                # are the per-program stall point, and their shape
                # ((cap, 3), cap = 1<<20) is static — warming the
                # exact executable absorbs the production fetch stall,
                # not just a toy one (measured: a warm process's first
                # real fetch still stalled 70 s with a toy-shape warm)
                acc = jnp.zeros((1 << 20, 3), jnp.int32)
                acc = tally_step(data, acc, packed, lengths, ids,
                                 has_n, 21, 2, fmt)
                np.asarray(_pack_acc(acc)[0])   # the stall-prone fetch
        except Exception:
            pass   # warmup is best-effort; real dispatches will pay

    t = threading.Thread(target=work, daemon=True, name="hast-warmup")
    t.start()
    return t


def run_classify(hap0: str, hap1: str, reads: list[str], out,
                 w0: float = 1.0, w1: float = 1.0,
                 adaptor_f: str = ADAPTOR_F, adaptor_r: str = ADAPTOR_R,
                 batch_size: int = FQ.DEFAULT_BATCH,
                 mesh=None, timer=None) -> BarcodeTally:
    """Full stage-01 classify: the reference binary's main().

    mesh: optional jax.sharding.Mesh — probes run dp×tp-sharded
    (classify_fastqs_mesh) instead of single-device.
    timer: optional PhaseTimer — callers (bench.py) pass one to read
    the per-phase breakdown back; a fresh one is made otherwise."""
    from hast_tpu.utils.profiling import PhaseTimer
    timer = timer if timer is not None else PhaseTimer()
    print("__START__", file=sys.stderr)
    print(f" use hap0 weight {w0:g}", file=sys.stderr)
    print(f" use hap1 weight {w1:g}", file=sys.stderr)
    with timer.phase("load_markers"):
        table = None
        if mesh is None:
            table = _cached_device_table(hap0, hap1, adaptor_f, adaptor_r)
        if table is None:
            _start_device_warmup()
            with _TeeStderr() as cap:
                table = load_marker_table(hap0, hap1)
                erase_adaptors(table, adaptor_f, adaptor_r)
            if mesh is None:   # the mesh path shards the table itself
                _device_table(table, adaptor_f, adaptor_r)
                if table.cache_key:
                    _DEVICE_TABLE["table"] = table
                    _DEVICE_TABLE["stderr"] = cap.getvalue()
    with timer.phase("classify"):
        if mesh is not None:
            tally = classify_fastqs_mesh(mesh, table, reads, batch_size)
        else:
            tally = classify_fastqs(table, reads, batch_size)
    print("__print result__", file=sys.stderr)
    with timer.phase("decide_write"):
        write_phased_barcodes(tally, table, out, w0, w1)
    print("__END__", file=sys.stderr)
    timer.report()
    return tally


def classify_fastqs_mesh(mesh, table: H.KmerTable, paths: Iterable[str],
                         batch_size: int = FQ.DEFAULT_BATCH,
                         tally: BarcodeTally | None = None,
                         super_batch: int = 8) -> BarcodeTally:
    """Multi-device classify: table tp-sharded, read batches dp-split.

    Identical tallies to :func:`classify_fastqs`; the probe runs on a
    jax.sharding.Mesh via parallel.mesh.sharded_vote_step (barcode
    dictionary + reduction stay host-side).  batch_size must be a
    multiple of the mesh's dp extent.
    """
    from hast_tpu.io import native as N
    from hast_tpu.parallel import mesh as PM

    if N.get_lib() is None:
        raise RuntimeError("mesh classify requires libhastio.so")
    assert batch_size % mesh.shape["dp"] == 0, (batch_size, dict(mesh.shape))
    tdata = PM.shard_table(mesh, table)
    k, mp, nb, fmt = table.k, table.max_probe, table.n_buckets, table.fmt

    def vote_fn(packed, lengths):
        return PM.sharded_vote_step(mesh, tdata, packed, lengths, k, mp,
                                    nb, fmt)

    return _classify_fastqs_native(table, paths, batch_size, tally,
                                   super_batch, N, vote_fn=vote_fn)
