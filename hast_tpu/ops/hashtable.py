"""Static 2-choice bucketized k-mer membership table for TPU probing.

Replaces the reference's two ``std::unordered_set<Kmer>`` marker sets
(/root/reference/01.classify_stlfr_reads/classify.cpp:27,196-201) with a
single HBM-resident table: one table holds BOTH haplotypes' markers
with a 2-bit membership payload, so the inner loop does a fixed TWO
row-gathers per k-mer (the reference does ~2 hash probes per set, 4
chains total).

Layout
------
``data``: (n_buckets, 2*BUCKET) uint32.  Bucket row = BUCKET slots of
(hi_word, lo_word) pairs, interleaved ``[hi0, lo0, hi1, lo1, ...]`` so a
single row-gather fetches a whole bucket.  A slot's hi word packs the
canonical k-mer's high 2k-32 bits (< 2**30 for k <= 31) plus the 2-bit
payload at bits 30..31.  Empty slot = (0xFFFFFFFF, 0xFFFFFFFF), which no
canonical k-mer can equal (poly-G is never canonical), so empty slots
can never match a query and need no explicit emptiness test.

BUCKET=2 (16-byte rows) is chosen from a measured v5e gather-cost
curve: XLA's row gather is dominated by per-row latency but still
scales with row bytes (64B rows: 122M gathers/s; 16B rows: 199M/s;
8B: 207M/s).  Two slots per bucket keeps the (2,2)-cuckoo build easy
(load threshold ~0.9) at ~96% of the 8-byte-row probe speed.

Placement is 2-choice hashing: a key lives in bucket ``hash1 & mask``
or ``hash2 & mask`` — lookups are exactly two row-gathers regardless of
load (XLA unrolls both; no data-dependent loop).  Insertion is
host-side numpy: round 0 fills home buckets vectorized, round 1 spills
the overflow to the alternate bucket; the few stragglers (avg bucket
occupancy is <= load) go through a classic cuckoo random-walk eviction
loop, and only if an eviction chain exceeds its kick budget does the
table double and retry.  Build cost is one-time and snapshot-cached
(.probetable.npz).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

BUCKET = 2
PAYLOAD_SHIFT = np.uint32(30)
HI_MASK = np.uint32((1 << 30) - 1)
EMPTY = np.uint32(0xFFFFFFFF)

_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)
_GOLD = np.uint32(0x9E3779B9)
_GOLD2 = np.uint32(0xC2B2AE3D)


def _mix(h, xp):
    """murmur3 fmix32; identical semantics under numpy and jnp uint32."""
    h = h ^ (h >> xp.uint32(16))
    h = (h * _M1).astype(xp.uint32) if xp is np else h * _M1
    h = h ^ (h >> xp.uint32(13))
    h = (h * _M2).astype(xp.uint32) if xp is np else h * _M2
    h = h ^ (h >> xp.uint32(16))
    return h


def kmer_hash(hi, lo, xp=np):
    """uint32 hash #1 of a (hi, lo) k-mer pair (host & device agree)."""
    hi = xp.asarray(hi, xp.uint32)
    lo = xp.asarray(lo, xp.uint32)
    if xp is np:
        h = (lo + (hi * _GOLD).astype(np.uint32)).astype(np.uint32)
    else:
        h = lo + hi * _GOLD
    return _mix(h, xp)


def kmer_hash2(hi, lo, xp=np):
    """Independent uint32 hash #2 (the alternate bucket choice)."""
    hi = xp.asarray(hi, xp.uint32)
    lo = xp.asarray(lo, xp.uint32)
    if xp is np:
        h = ((lo ^ _GOLD2) + (hi * _M2).astype(np.uint32)).astype(np.uint32)
    else:
        h = (lo ^ _GOLD2) + hi * _M2
    return _mix(h ^ xp.uint32(0x5BD1E995), xp)


def _hash_round(rnd: int, hi, lo, xp=np):
    return kmer_hash(hi, lo, xp) if rnd == 0 else kmer_hash2(hi, lo, xp)


@dataclasses.dataclass
class KmerTable:
    """Host handle for a built table (device arrays + static metadata)."""

    data: np.ndarray          # (n_buckets, 2*BUCKET) uint32
    n_buckets: int            # power of two
    max_probe: int            # hash choices scanned by lookups (== 2)
    k: int
    n_keys: int               # distinct canonical keys stored
    set_sizes: tuple[int, ...] = ()  # per-haplotype set size (for getHap)
    cache_key: tuple = ()     # snapshot identity (device-upload reuse)

    def device_put(self, sharding=None):
        self.data = jax.device_put(jnp.asarray(self.data), sharding)
        return self


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def _try_place(hi, lo, hi_packed, n_buckets: int):
    """One 2-round placement attempt; returns table or None."""
    mask = np.uint32(n_buckets - 1)
    data = np.full((n_buckets, 2 * BUCKET), EMPTY, np.uint32)
    occupancy = np.zeros(n_buckets, np.int64)
    pending = np.arange(hi.size)
    for rnd in (0, 1):
        if not pending.size:
            break
        b = _hash_round(rnd, hi[pending], lo[pending]) & mask
        order = np.argsort(b, kind="stable")
        pend_s, b_s = pending[order], np.asarray(b[order], np.int64)
        first = np.empty(b_s.size, bool)
        if b_s.size:
            first[0] = True
            first[1:] = b_s[1:] != b_s[:-1]
        grp_start = np.maximum.accumulate(
            np.where(first, np.arange(b_s.size), 0))
        rank = np.arange(b_s.size) - grp_start
        free = BUCKET - occupancy[b_s]
        place = rank < free
        slot = occupancy[b_s] + rank
        tgt_b, tgt_s, keys = b_s[place], slot[place], pend_s[place]
        data[tgt_b, 2 * tgt_s] = hi_packed[keys]
        data[tgt_b, 2 * tgt_s + 1] = lo[keys]
        np.add.at(occupancy, b_s[place], 1)
        pending = pend_s[~place]
    if pending.size == 0:
        return data
    if _evict_place(data, hi, lo, hi_packed, pending, n_buckets):
        return data
    return None


def _evict_place(data, hi, lo, hi_packed, pending, n_buckets: int,
                 max_rounds: int = 4096) -> bool:
    """Cuckoo random-walk insertion for the greedy rounds' stragglers.

    Vectorized bulk rounds: every round, ONE pending key per bucket
    (the "actor") either takes a free slot or evicts a random occupant
    (which joins the pending set headed for its other choice); the
    rest flip to their alternate bucket and retry.  All numpy — builds
    stay fast even when the pow2 table lands at ~0.85 load (the scalar
    per-key walk took tens of seconds there).  Deterministic (seeded
    by n_buckets).  Returns False if the walk exhausts max_rounds
    (caller doubles the table).
    """
    mask = np.int64(n_buckets - 1)
    rng = np.random.default_rng(n_buckets)  # deterministic builds
    cur_hp = hi_packed[pending].copy()
    cur_lo = lo[pending].copy()
    rnd = np.zeros(pending.size, np.int8)
    for _ in range(max_rounds):
        if cur_hp.size == 0:
            return True
        cur_hi = cur_hp & HI_MASK
        b0 = (kmer_hash(cur_hi, cur_lo).astype(np.int64)) & mask
        b1 = (kmer_hash2(cur_hi, cur_lo).astype(np.int64)) & mask
        b = np.where(rnd == 0, b0, b1)
        # one actor per bucket: first pending key targeting it
        order = np.argsort(b, kind="stable")
        b_s = b[order]
        first = np.ones(b_s.size, bool)
        first[1:] = b_s[1:] != b_s[:-1]
        actors = order[first]
        ab = b[actors]
        rows = data[ab]                       # (A, 2*BUCKET)
        free = (rows[:, 0::2] == EMPTY) & (rows[:, 1::2] == EMPTY)
        has_free = free.any(axis=1)
        slot = np.where(has_free, np.argmax(free, axis=1),
                        rng.integers(0, BUCKET, actors.size))
        ev_hp = data[ab, 2 * slot].copy()
        ev_lo = data[ab, 2 * slot + 1].copy()
        data[ab, 2 * slot] = cur_hp[actors]
        data[ab, 2 * slot + 1] = cur_lo[actors]
        # evicted keys re-enter headed for their OTHER choice
        kicked = ~has_free
        k_hp, k_lo, k_b = ev_hp[kicked], ev_lo[kicked], ab[kicked]
        k_b0 = (kmer_hash(k_hp & HI_MASK, k_lo).astype(np.int64)) & mask
        k_rnd = np.where(k_b0 == k_b, 1, 0).astype(np.int8)
        # survivors: everyone who wasn't an actor, alternated
        keep = np.ones(cur_hp.size, bool)
        keep[actors] = False
        cur_hp = np.concatenate([cur_hp[keep], k_hp])
        cur_lo = np.concatenate([cur_lo[keep], k_lo])
        rnd = np.concatenate([rnd[keep] ^ 1, k_rnd])
    return False


def build_table(hi, lo, payload, k: int, load: float = 0.35,
                set_sizes: tuple[int, ...] = ()) -> KmerTable:
    """Build a probe table from canonical k-mer arrays.

    Duplicate keys are merged by OR-ing payloads (a marker present in
    both haplotype sets gets payload 3 — the reference keeps it in both
    unordered_sets, which is the same observable behavior).
    """
    hi = np.asarray(hi, np.uint32)
    lo = np.asarray(lo, np.uint32)
    payload = np.asarray(payload, np.uint32)
    if hi.size:
        # dedupe, OR payloads of duplicates
        order = np.lexsort((lo, hi))
        hi, lo, payload = hi[order], lo[order], payload[order]
        new = np.empty(hi.size, bool)
        new[0] = True
        new[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
        group = np.cumsum(new) - 1
        pay = np.zeros(int(group[-1]) + 1, np.uint32)
        np.bitwise_or.at(pay, group, payload)
        hi, lo, payload = hi[new], lo[new], pay
    n = hi.size
    n_buckets = _next_pow2(max(1, int(np.ceil(n / (BUCKET * load)))))
    hi_packed = hi | (payload << PAYLOAD_SHIFT)
    while True:
        data = _try_place(hi, lo, hi_packed, n_buckets)
        if data is not None:
            break
        n_buckets *= 2
    return KmerTable(data=data, n_buckets=n_buckets, max_probe=2,
                     k=k, n_keys=n, set_sizes=tuple(set_sizes))


@functools.partial(jax.jit, static_argnames=("max_probe",))
def probe(data: jax.Array, q_hi: jax.Array, q_lo: jax.Array,
          max_probe: int = 2) -> jax.Array:
    """Membership payload for each query k-mer (0 = not present).

    data: (n_buckets, 2*BUCKET) uint32;  q_hi/q_lo: any equal shape.
    Returns int32 payloads, same shape as q_hi.  Exactly two
    row-gathers per query (the 2-choice buckets).
    """
    n_buckets = data.shape[0]
    mask = jnp.uint32(n_buckets - 1)
    shape = q_hi.shape
    q_hi = q_hi.reshape(-1).astype(jnp.uint32)
    q_lo = q_lo.reshape(-1).astype(jnp.uint32)
    res = jnp.zeros(q_hi.shape, jnp.uint32)
    for rnd in range(max_probe):
        b = _hash_round(rnd, q_hi, q_lo, jnp) & mask
        rows = jnp.take(data, b.astype(jnp.int32), axis=0)  # (N, 2*BUCKET)
        slot_hi = rows[:, 0::2]
        slot_lo = rows[:, 1::2]
        hit = ((slot_hi & HI_MASK) == q_hi[:, None]) & (slot_lo == q_lo[:, None])
        pay = slot_hi >> PAYLOAD_SHIFT
        res = res | jnp.max(jnp.where(hit, pay, 0), axis=1)
    return res.astype(jnp.int32).reshape(shape)


def probe_np(table: KmerTable, q_hi, q_lo):
    """Host-side twin of :func:`probe` (for tests and small inputs)."""
    q_hi = np.asarray(q_hi, np.uint32).reshape(-1)
    q_lo = np.asarray(q_lo, np.uint32).reshape(-1)
    mask = np.uint32(table.n_buckets - 1)
    res = np.zeros(q_hi.shape, np.uint32)
    for rnd in range(table.max_probe):
        b = (_hash_round(rnd, q_hi, q_lo) & mask).astype(np.int64)
        rows = table.data[b]
        slot_hi, slot_lo = rows[:, 0::2], rows[:, 1::2]
        hit = ((slot_hi & HI_MASK) == q_hi[:, None]) & (slot_lo == q_lo[:, None])
        pay = slot_hi >> PAYLOAD_SHIFT
        res |= np.max(np.where(hit, pay, 0), axis=1).astype(np.uint32)
    return res.astype(np.int32)


def remove_keys(table: KmerTable, hi, lo, payload_mask: int,
                set_sizes_delta: list[int] | None = None) -> list[tuple[int, int, int]]:
    """Clear payload bits of given keys in-place (adaptor erasure).

    Mirrors InitAdaptor (classify.cpp:314-339): adaptor k-mers are
    erased from the marker sets *and* the normalization set sizes
    shrink.  Returns [(hi, lo, cleared_bits)] for logging parity.
    A slot whose payload becomes 0 stays physically present (it can
    never be reported since its payload is 0).
    """
    hi = np.asarray(hi, np.uint32).reshape(-1)
    lo = np.asarray(lo, np.uint32).reshape(-1)
    mask = np.uint32(table.n_buckets - 1)
    cleared = []
    sizes = list(table.set_sizes)
    seen = set()
    for i in range(hi.size):
        key = (int(hi[i]), int(lo[i]))
        if key in seen:
            continue
        seen.add(key)
        for rnd in range(table.max_probe):
            b = int(_hash_round(rnd, hi[i:i + 1], lo[i:i + 1])[0] & mask)
            row = table.data[b]
            for s in range(BUCKET):
                if (int(row[2 * s]) & int(HI_MASK)) == key[0] and \
                        int(row[2 * s + 1]) == key[1]:
                    pay = int(row[2 * s]) >> int(PAYLOAD_SHIFT)
                    bits = pay & payload_mask
                    if bits:
                        new_pay = pay & ~payload_mask
                        table.data[b, 2 * s] = np.uint32(
                            key[0] | (new_pay << int(PAYLOAD_SHIFT)))
                        cleared.append((key[0], key[1], bits))
                        for hap in range(len(sizes)):
                            if bits & (1 << hap):
                                sizes[hap] -= 1
    table.set_sizes = tuple(sizes)
    return cleared
