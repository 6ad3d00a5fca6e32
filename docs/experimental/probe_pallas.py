"""Experimental Pallas probe kernel (double-buffered HBM streaming).

The production probe (ops/hashtable.probe) uses XLA's native gather —
the right primitive for random HBM access on TPU, measured at ~2.5G
probes/s on a v5e.  This module explores the alternative formulation
for the case where XLA's gather is NOT available or when the probe
should fuse with other work: the table streams through VMEM in chunks
via double-buffered DMA, and each chunk is compared against the whole
query block (a "broadcast join").  That is O(n_table/chunk) passes per
query block, so it only wins when the marker table is small enough
that a pass costs less than the queries' worth of random gathers —
i.e. small panels (adaptor sets, targeted marker panels), not the
genome-scale tables.

Kept here as the Pallas reference implementation + a correctness test
hook (interpret mode); `probe_small_table` picks it only for tiny
tables and is otherwise unused by the pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hast_tpu.ops import hashtable as H

# keys are compared in sorted-key form: the broadcast join needs the
# table as plain (n, 2) uint32 arrays (hi with payload in top bits)


def _broadcast_probe_kernel(thi_ref, tlo_ref, qhi_ref, qlo_ref, out_ref):
    """One grid step: compare a table chunk against the query block.

    Grid dim 0 walks table chunks; outputs accumulate with max so a
    query's payload survives across steps.
    """
    import jax.experimental.pallas as pl

    thi = thi_ref[:]           # (C,) uint32 — keys with payload bits
    tlo = tlo_ref[:]
    qhi = qhi_ref[:]           # (Q,) uint32
    qlo = qlo_ref[:]
    # (Q, C) compare — VPU-heavy, fine for small tables
    hit = ((thi[None, :] & H.HI_MASK) == qhi[:, None]) & \
        (tlo[None, :] == qlo[:, None])
    pay = (thi >> H.PAYLOAD_SHIFT)[None, :].astype(jnp.uint32)
    found = jnp.max(jnp.where(hit, pay, 0), axis=1).astype(jnp.uint32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = found

    @pl.when(pl.program_id(0) != 0)
    def _accum():
        out_ref[:] = jnp.maximum(out_ref[:], found)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def pallas_broadcast_probe(table_hi: jax.Array, table_lo: jax.Array,
                           q_hi: jax.Array, q_lo: jax.Array,
                           chunk: int = 2048,
                           interpret: bool = False) -> jax.Array:
    """Membership payloads via the Pallas broadcast join.

    table_hi/lo: (n,) uint32 key arrays (hi holds payload bits);
    q_hi/lo: (Q,) uint32 queries.  Returns (Q,) int32 payloads.
    """
    import jax.experimental.pallas as pl

    n = table_hi.shape[0]
    pad = (-n) % chunk
    if pad:
        table_hi = jnp.concatenate(
            [table_hi, jnp.full((pad,), H.EMPTY, jnp.uint32)])
        table_lo = jnp.concatenate(
            [table_lo, jnp.full((pad,), H.EMPTY, jnp.uint32)])
    grid = (table_hi.shape[0] // chunk,)
    out = pl.pallas_call(
        _broadcast_probe_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,)),
            pl.BlockSpec((chunk,), lambda i: (i,)),
            pl.BlockSpec(q_hi.shape, lambda i: (0,)),
            pl.BlockSpec(q_lo.shape, lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec(q_hi.shape, lambda i: (0,)),
        out_shape=jax.ShapeDtypeStruct(q_hi.shape, jnp.uint32),
        interpret=interpret,
    )(table_hi, table_lo, q_hi.astype(jnp.uint32), q_lo.astype(jnp.uint32))
    return out.astype(jnp.int32)


def table_key_arrays(table: H.KmerTable):
    """Flatten a bucketized table into (hi, lo) key arrays (with
    payload bits retained in hi; empty slots stay EMPTY).  Full-format
    tables only (quotient slots don't carry raw keys)."""
    assert table.fmt == "full", "broadcast join needs full-format slots"
    data = np.asarray(table.data)
    return data[:, 0::2].reshape(-1), data[:, 1::2].reshape(-1)
