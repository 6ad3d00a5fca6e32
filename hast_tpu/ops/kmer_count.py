"""Sort-based canonical k-mer counting (stage-00 engine).

TPU-native replacement for jellyfish's lock-free counting hash
(/root/reference/00.build_unshare_kmers_by_jellyfish/build_unshared_kmers.sh:188):
instead of a concurrent hash table, read chunks are 2-bit packed, their
canonical k-mers extracted vectorized, and counted by device sort +
run-length encoding — the XLA-friendly formulation (no atomics).  Chunk
results merge on the host as sorted (uint64 key, count) runs, mirroring
meryl's shard -> count -> union-sum map-reduce
(/root/reference/00.dev_build_unshare_kmers_by_meryl/meryl-1.0/meryl.sh:6-24).

Canonicalization matches the reference classify kernel (A=0,C=1,T=2,G=3
order), NOT jellyfish's A<C<G<T order — the canonical *sets* are
identical, only the emitted representative strand may differ, which no
consumer observes (classify re-canonicalizes on load).  Text dumps use
jellyfish-style representatives (min(s, revcomp(s)) in ASCII order) for
easier eyeballing against jellyfish output.

Validity matches jellyfish: a k-mer window counts iff all its bases are
ACGT/acgt; anything else (N, IUPAC codes) breaks the window.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from hast_tpu.ops import encode as E

_ACGT = np.zeros(256, bool)
for _c in b"ACGTacgt":
    _ACGT[_c] = True


@functools.partial(jax.jit, static_argnames=("k",))
def chunk_sorted_kmers(seqs_u8: jax.Array, lengths: jax.Array, k: int):
    """All valid canonical k-mers of a padded batch, sorted ascending.

    Invalid windows (non-ACGT base, out of read) become the SENTINEL
    pair so they sort to the end.  Returns (hi, lo) sorted by (hi, lo).
    """
    codes = E.encode_bases(seqs_u8)
    hi, lo = E.canonical_kmers(codes, k)
    good = jnp.asarray(_ACGT)[seqs_u8.astype(jnp.int32)]
    valid = E.window_valid(good, lengths, k)
    hi = jnp.where(valid, hi, jnp.uint32(0xFFFFFFFF)).reshape(-1)
    lo = jnp.where(valid, lo, jnp.uint32(0xFFFFFFFF)).reshape(-1)
    hi, lo = jax.lax.sort((hi, lo), num_keys=2)
    return hi, lo


@functools.partial(jax.jit, static_argnames=("k",))
def count_kernel_multi(packed: jax.Array, good_packed: jax.Array,
                       lengths: jax.Array, k: int):
    """Super-batched sorted-kmer extraction over 2-bit packed reads.

    packed: (S, B, L/4) uint8 2-bit codes; good_packed: (S, B, L/8)
    uint8 bitmask of ACGT-validity per base (bit j of byte m = base
    m*8+j); lengths: (S, B).  Returns (S, B*(L-k+1)) hi/lo sorted per
    slice — one device interaction covers S batches.
    """

    def one(args):
        p, g, lens = args
        b, lp = p.shape
        shifts = jnp.arange(4, dtype=jnp.int32) * 2
        codes = ((p.astype(jnp.int32)[:, :, None] >> shifts[None, None, :])
                 & 3).reshape(b, lp * 4)
        bit = jnp.arange(8, dtype=jnp.int32)
        good = (((g.astype(jnp.int32)[:, :, None] >> bit[None, None, :])
                 & 1) == 1).reshape(b, lp * 4)
        hi, lo = E.canonical_kmers(codes, k)
        valid = E.window_valid(good, lens, k)
        hi = jnp.where(valid, hi, jnp.uint32(0xFFFFFFFF)).reshape(-1)
        lo = jnp.where(valid, lo, jnp.uint32(0xFFFFFFFF)).reshape(-1)
        return jax.lax.sort((hi, lo), num_keys=2)

    return jax.lax.map(one, (packed, good_packed, lengths))


def pack_good_np(seqs_u8: np.ndarray) -> np.ndarray:
    """(…, L) ASCII -> (…, L/8) uint8 ACGT-validity bitmask."""
    good = _ACGT[seqs_u8].astype(np.uint8)
    out = good[..., 0::8]
    for j in range(1, 8):
        out = out | (good[..., j::8] << np.uint8(j))
    return out


def _rle_sorted(words: np.ndarray, weights: np.ndarray | None = None):
    """Run-length encode a sorted uint64 array -> (unique, counts)."""
    if words.size == 0:
        return words, np.zeros(0, np.int64)
    new = np.empty(words.size, bool)
    new[0] = True
    np.not_equal(words[1:], words[:-1], out=new[1:])
    idx = np.flatnonzero(new)
    if weights is None:
        counts = np.diff(np.append(idx, words.size)).astype(np.int64)
    else:
        csum = np.concatenate([[0], np.cumsum(weights, dtype=np.int64)])
        counts = csum[np.append(idx[1:], words.size)] - csum[idx]
    return words[idx], counts


@dataclasses.dataclass
class CountTable:
    """Sorted (canonical k-mer -> count) table, host resident.

    words: uint64 = (hi << 32) | lo, strictly ascending.
    """

    words: np.ndarray
    counts: np.ndarray
    k: int

    @property
    def n_distinct(self) -> int:
        return int(self.words.size)

    @property
    def total(self) -> int:
        return int(self.counts.sum())

    def histo(self, low: int = 1, high: int = 10000) -> np.ndarray:
        """jellyfish-histo bins: index v holds #kmers with count v for
        v in [low, high]; index high+1 lumps every count > high.
        Index 0..low-1 unused (jellyfish lumps < low into low-1; the
        reference never uses low > 1)."""
        clipped = np.clip(self.counts, 0, high + 1)
        return np.bincount(clipped, minlength=high + 2)

    def filter_range(self, lower: int, upper: int) -> "CountTable":
        """Keep counts in [lower, upper] inclusive (jellyfish dump -L -U)."""
        m = (self.counts >= lower) & (self.counts <= upper)
        return CountTable(self.words[m], self.counts[m], self.k)

    def difference(self, other: "CountTable") -> "CountTable":
        """Keys of self not present in other (meryl difference)."""
        m = ~np.isin(self.words, other.words, assume_unique=True)
        return CountTable(self.words[m], self.counts[m], self.k)

    def intersect_keys(self, other: "CountTable") -> "CountTable":
        m = np.isin(self.words, other.words, assume_unique=True)
        return CountTable(self.words[m], self.counts[m], self.k)

    def to_strings(self) -> np.ndarray:
        """Decode to jellyfish-style canonical strings ((n,) bytes)."""
        return words_to_strings(self.words, self.k)

    def dump_mer_text(self, path: str) -> int:
        """Write one-kmer-per-line text (the .mer interface file)."""
        s = self.to_strings()
        with open(path, "wb") as f:
            if s.size:
                f.write(b"\n".join(s.tolist()) + b"\n")
        return int(s.size)


def words_to_strings(words: np.ndarray, k: int) -> np.ndarray:
    """uint64 canonical words -> jellyfish-representative byte strings."""
    n = words.size
    arr = np.empty((n, k), np.uint8)
    int2base = np.frombuffer(b"ACTG", np.uint8)  # HAST encoding order
    for i in range(k):
        arr[:, k - 1 - i] = int2base[
            (words >> np.uint64(2 * i)).astype(np.uint32) & 3]
    # jellyfish emits min(s, revcomp(s)) under ASCII (A<C<G<T) order
    comp = np.zeros(256, np.uint8)
    for a, b in zip(b"ACGT", b"TGCA"):
        comp[a] = b
    rc = comp[arr[:, ::-1]]
    fwd_b = np.ascontiguousarray(arr).view(f"S{k}").reshape(n)
    rc_b = np.ascontiguousarray(rc).view(f"S{k}").reshape(n)
    return np.where(fwd_b <= rc_b, fwd_b, rc_b)


class Counter:
    """Streaming counter: feed device-sorted chunks, finalize to a table.

    Keeps per-chunk RLE runs and merges them once at the end (single
    lexsort over distinct-per-chunk keys) — the union-sum reduce.
    """

    def __init__(self, k: int, compact_above: int = 200_000_000):
        self.k = k
        self._runs: list[tuple[np.ndarray, np.ndarray]] = []
        self._pending = 0
        # bound host memory: merge accumulated runs once they exceed
        # this many distinct-per-chunk entries (meryl's union-sum of
        # intermediate DBs, build_unshared_kmers.sh chunking analog)
        self._compact_above = compact_above

    def add_sorted_chunk(self, hi: np.ndarray, lo: np.ndarray) -> None:
        words = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
        # sentinel pads sort to the end; trim them
        n_valid = int(np.searchsorted(words, np.uint64(0xFFFFFFFFFFFFFFFF)))
        u, c = _rle_sorted(words[:n_valid])
        if u.size:
            self._runs.append((u, c))
            self._pending += u.size
            if self._pending > self._compact_above:
                self.finalize()
                self._pending = self._runs[0][0].size if self._runs else 0

    def merge(self, other: "Counter") -> None:
        self._runs.extend(other._runs)

    def add_table(self, table: "CountTable") -> None:
        """Union-sum a finalized table into this counter."""
        if table.words.size:
            self._runs.append((table.words, table.counts))

    def finalize(self) -> CountTable:
        if not self._runs:
            return CountTable(np.zeros(0, np.uint64), np.zeros(0, np.int64),
                              self.k)
        words = np.concatenate([u for u, _ in self._runs])
        counts = np.concatenate([c for _, c in self._runs])
        order = np.argsort(words, kind="stable")
        u, c = _rle_sorted(words[order], counts[order])
        self._runs = [(u, c)]
        return CountTable(u, c, self.k)


def count_batches(batches: Iterable, k: int,
                  super_batch: int = 8) -> CountTable:
    """Count canonical k-mers over an iterable of ReadBatches.

    Batches group into super-batches so each device interaction
    (packed upload, dispatch, fetch) covers super_batch batches —
    mirrors the classify pipeline's latency hiding.
    """
    counter = Counter(k)
    S = super_batch
    buf: list = []
    pending = None

    def drain(p):
        rhi = np.asarray(p[0])
        rlo = np.asarray(p[1])
        for s in range(p[2]):
            counter.add_sorted_chunk(rhi[s], rlo[s])

    def flush():
        nonlocal pending, buf
        if not buf:
            return
        B = buf[0].seqs.shape[0]
        L = max(b.seqs.shape[1] for b in buf)
        seqs = np.zeros((S, B, L), np.uint8)
        lengths = np.zeros((S, B), np.int32)
        for s, b in enumerate(buf):
            seqs[s, :, :b.seqs.shape[1]] = b.seqs
            lengths[s] = b.lengths
        res = count_kernel_multi(jnp.asarray(E.pack_codes_np(seqs)),
                                 jnp.asarray(pack_good_np(seqs)),
                                 jnp.asarray(lengths), k)
        n_used = len(buf)
        buf = []
        if pending is not None:
            drain(pending)
        pending = (res[0], res[1], n_used)

    for batch in batches:
        buf.append(batch)
        if len(buf) >= S:
            flush()
    flush()
    if pending is not None:
        drain(pending)
    return counter.finalize()
