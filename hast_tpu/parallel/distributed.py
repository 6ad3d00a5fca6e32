"""Multi-host bring-up and distributed stage-00 counting.

The reference's only "cluster" interface is the filesystem plus a user
manually running shards (SURVEY.md §5).  Here: `initialize()` wires
`jax.distributed` (ICI within a slice, DCN across hosts), and
`count_files_sharded` runs stage-00 counting over a device mesh — each
host streams its own input shard, canonical k-mers route to their
hash-range owner via all_to_all, and per-device sorted runs reduce into
one CountTable (meryl's shard -> count -> union-sum over the fabric).
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np

from hast_tpu.io import fastq as FQ
from hast_tpu.ops import kmer_count as KC
from hast_tpu.parallel import mesh as PM


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed bring-up with env fallbacks (no-op if single)."""
    coordinator_address = coordinator_address or os.environ.get(
        "HAST_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("HAST_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("HAST_PROCESS_ID", "0"))
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def shard_paths(paths: Sequence[str]) -> list[str]:
    """Static input-file sharding across hosts (round-robin)."""
    n = jax.process_count()
    i = jax.process_index()
    return [p for j, p in enumerate(paths) if j % n == i]


def count_files_sharded(mesh, paths: Sequence[str], k: int,
                        batch_size: int = FQ.DEFAULT_BATCH) -> KC.CountTable:
    """Device-mesh k-mer counting (config 5 in BASELINE.json).

    Reads stream host-side in dp-sized slabs; the device step extracts,
    hash-routes (all_to_all over dp) and sorts; hosts RLE their local
    shard rows and union-sum at the end.  On a multi-host mesh each
    host only materializes its own devices' rows.
    """
    dp = mesh.shape["dp"]
    counter = KC.Counter(k)
    import jax.numpy as jnp
    dropped_total = 0
    for path in paths:
        for batch in FQ.sequence_batches(path, k, batch_size):
            b = batch.seqs.shape[0]
            rows = (b // dp) * dp
            rhi, rlo, dropped = PM.sharded_count_chunk(
                mesh, jnp.asarray(batch.seqs[:rows]),
                jnp.asarray(batch.lengths[:rows]), k)
            dropped_total += int(np.asarray(dropped).sum())
            rhi = np.asarray(rhi)
            rlo = np.asarray(rlo)
            for d in range(rhi.shape[0]):
                counter.add_sorted_chunk(rhi[d], rlo[d])
            # leftover rows (batch not divisible by dp) count host-side
            if rows < b:
                t = KC.count_batches([type("B", (), dict(
                    seqs=batch.seqs[rows:],
                    lengths=batch.lengths[rows:]))()], k)
                counter.add_table(t)
    if dropped_total:
        raise RuntimeError(
            f"{dropped_total} k-mers dropped by all_to_all capacity; "
            "increase capacity slack")
    return counter.finalize()
