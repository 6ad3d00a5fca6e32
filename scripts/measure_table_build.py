#!/usr/bin/env python
"""Measure host-side probe-table build at human marker scale.

VERDICT r03 item 4: at ~2-4e8 markers the numpy 2-choice placement +
cuckoo walk (ops/hashtable.build_table) and the .probetable.npz
snapshot are a one-time but potentially minutes-long serial host cost;
the reference's analogous cost is the unordered_set load
(01.classify_stlfr_reads/classify.cpp:30-46).  This script times both
on the same box and prints a PERF.md-ready row.

Usage: python scripts/measure_table_build.py [n_keys] [--ref]
  n_keys default 2e8.  --ref also times the reference classify binary's
  marker load (needs the bench cache's compiled binary + a generated
  .mer file of n_keys lines, which costs disk space ~22B/key).
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 200_000_000
    k = 21
    from hast_tpu.ops import hashtable as H

    rng = np.random.default_rng(0)
    # uniform random 2k-bit canonical-looking keys are the right model:
    # build cost depends only on key count and hash mixing, not on
    # biological structure
    print(f"generating {n:,} random keys ...", flush=True)
    hi = rng.integers(0, 1 << (2 * k - 32), n, dtype=np.uint64) \
        .astype(np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    pay = rng.integers(1, 3, n).astype(np.uint32)

    t0 = time.perf_counter()
    table = H.build_table(hi, lo, pay, k)
    build_s = time.perf_counter() - t0
    print(f"build_table: {build_s:.1f}s for {table.n_keys:,} distinct "
          f"keys -> fmt={table.fmt} n_buckets={table.n_buckets:,} "
          f"table={table.data.nbytes / 1e9:.2f} GB "
          f"({table.n_keys / build_s / 1e6:.1f} Mkeys/s)", flush=True)

    with tempfile.TemporaryDirectory() as td:
        snap = os.path.join(td, "t.npz")
        t0 = time.perf_counter()
        np.savez(snap, data=table.data, n_buckets=table.n_buckets,
                 max_probe=table.max_probe, k=table.k,
                 n_keys=table.n_keys,
                 set_sizes=np.asarray(table.set_sizes))
        save_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        z = np.load(snap, allow_pickle=False)
        _ = z["data"][:]
        load_s = time.perf_counter() - t0
        print(f"snapshot save: {save_s:.1f}s  load: {load_s:.1f}s",
              flush=True)

    if "--ref" in sys.argv:
        _time_reference_load(n, k)

    print(f"SUMMARY n={n:,} build={build_s:.1f}s save={save_s:.1f}s "
          f"load={load_s:.1f}s")


def _time_reference_load(n, k):
    """Time the reference classify binary's marker load on n/2 keys per
    hap (it loads two sets).  Uses a tiny read file so the classify
    phase itself is negligible."""
    import subprocess

    from hast_tpu.ops import kmer_count as KC

    exe = "/tmp/hast_bench_cache/classify"
    if not os.path.exists(exe):
        print("reference binary not built (run bench.py once); skipping")
        return
    rng = np.random.default_rng(1)
    half = n // 2
    with tempfile.TemporaryDirectory() as td:
        for hap in (0, 1):
            words = (rng.integers(0, 1 << (2 * k - 32), half,
                                  dtype=np.uint64) << np.uint64(32)) \
                | rng.integers(0, 1 << 32, half, dtype=np.uint64)
            path = os.path.join(td, f"hap{hap}.mer")
            with open(path, "wb", buffering=1 << 22) as f:
                step = 1 << 22
                for s in range(0, half, step):
                    chunk = KC.words_to_strings(words[s:s + step], k)
                    f.write(b"\n".join(chunk.tolist()) + b"\n")
            print(f"wrote hap{hap}.mer ({half:,} lines)", flush=True)
        reads = os.path.join(td, "r.fq")
        open(reads, "w").write("@r#1_1_1/1\n" + "A" * 50 + "\n+\n"
                               + "F" * 50 + "\n")
        t0 = time.perf_counter()
        subprocess.run([exe, "--hap0", os.path.join(td, "hap0.mer"),
                        "--hap1", os.path.join(td, "hap1.mer"),
                        "--read", reads, "--thread", "2"],
                       check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        ref_s = time.perf_counter() - t0
        print(f"reference classify total (load-dominated): {ref_s:.1f}s "
              f"for 2 x {half:,} markers", flush=True)


if __name__ == "__main__":
    main()
