#!/usr/bin/env python
"""Decisive gather configs for the pair-view probe redesign.

Finding from round 1 of this sweep: (2, W) slice gathers run at ~1 M/s
(XLA serializes multi-row slices), so fetching a 2-row window needs a
DOUBLED pair-view table — every adjacent row pair stored contiguously
(even-start pairs in the first half, odd-start pairs in the second),
making the window fetch a single aligned row gather.

Measures (best-of-3 chains, scalar fetches only):
  * (1, W) row gathers at the pair-view candidate shapes
  * 1-D flat gathers with slice_sizes (8,)/(16,) u32 (the no-doubling
    alternative, if XLA lowers them well)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ITERS = 6
REPS = 3


def timed_chain(step, *args):
    t0 = time.perf_counter()
    carry = jnp.uint32(0)
    out = step(carry, *args)
    _ = int(np.asarray(out))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        carry = jnp.uint32(1)
        for _ in range(ITERS):
            carry = step(carry, *args)
        _ = int(np.asarray(carry))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best, compile_s


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    Q = 1 << 22

    configs = [
        (21, 4),    # 32MB: today's 2-choice table shape (A does 2 of these)
        (20, 8),    # 32MB: pair-view, S=2 quotient / wide rows
        (21, 8),    # 64MB: pair-view of S=2 8B-slot logical rows
        (20, 16),   # 64MB: pair-view of S=4 8B-slot logical rows
        (19, 16),   # 32MB: pair-view S=4 4B quotient slots
        (18, 16),   # 16MB
    ]
    for rows_log2, row_u32 in configs:
        n_rows = 1 << rows_log2
        idx = jnp.asarray(rng.integers(0, n_rows, Q, dtype=np.int32))
        table = jnp.asarray(
            rng.integers(0, 2**32, (n_rows, row_u32), dtype=np.uint32))
        mb = n_rows * row_u32 * 4 / (1 << 20)

        @jax.jit
        def g1(carry, table, idx):
            ix = (idx + carry.astype(jnp.int32)) & (table.shape[0] - 1)
            rows = jnp.take(table, ix, axis=0)
            return jnp.sum(rows, dtype=jnp.uint32) | (carry & 1)

        dt, cs = timed_chain(g1, table, idx)
        print(f"(1,W) rows=2^{rows_log2} x{4*row_u32:3d}B ({mb:6.0f} MB): "
              f"{Q/dt/1e6:7.1f} M/s  [compile {cs:.0f}s]", flush=True)

    flat = jnp.asarray(rng.integers(0, 2**32, (1 << 24,), dtype=np.uint32))
    for sl in (8, 16):
        idx = jnp.asarray(
            rng.integers(0, (1 << 24) - sl, Q, dtype=np.int32))

        @jax.jit
        def gf(carry, flat, idx, sl=sl):
            ix = (idx + carry.astype(jnp.int32)) & ((1 << 24) - 1 - sl)
            out = lax.gather(
                flat, ix[:, None],
                lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(),
                    start_index_map=(0,)),
                slice_sizes=(sl,), mode=lax.GatherScatterMode.CLIP)
            return jnp.sum(out, dtype=jnp.uint32) | (carry & 1)

        dt, cs = timed_chain(gf, flat, idx)
        print(f"1-D slice ({sl*4}B) on 64MB flat: {Q/dt/1e6:7.1f} M/s  "
              f"[compile {cs:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
