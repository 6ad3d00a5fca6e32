#!/usr/bin/env python
"""Secondary benchmark: raw k-mer counting vs one `jellyfish count`.

Not the driver's headline bench.  bench.py measures the FULL stage 00
(device-resident marker build vs the reference's complete
build_unshared_kmers.sh); this file isolates just the count+fetch leg
(host engine, full-table d2h — deliberately the tunnel-bound path) for
apples-to-apples with a single jellyfish count invocation:
  {"metric": "count_kmers_per_s", ...}
"""

import json
import os
import pathlib
import subprocess
import sys
import time

CACHE = pathlib.Path(os.environ.get("HAST_BENCH_CACHE",
                                    "/tmp/hast_bench_cache"))
JELLY = ("/root/reference/00.build_unshare_kmers_by_jellyfish/"
         "jellyfish-linux")
K = 21


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from bench import ensure_inputs

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(CACHE / "jax_ccache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    _, _, reads = ensure_inputs()
    from hast_tpu.pipeline.markers import count_files

    t0 = time.perf_counter()
    table = count_files([reads], K)
    ours_s = time.perf_counter() - t0
    log(f"ours (cold): {ours_s:.2f}s  total={table.total} "
        f"distinct={table.n_distinct}")
    t0 = time.perf_counter()
    table = count_files([reads], K)
    ours_s = time.perf_counter() - t0
    kmers = table.total
    log(f"ours (warm): {ours_s:.2f}s -> {kmers / ours_s:,.0f} kmers/s")

    threads = os.cpu_count() or 8
    t0 = time.perf_counter()
    subprocess.run([JELLY, "count", "-m", str(K), "-s", "1G",
                    "-t", str(threads), "-C", "-o",
                    str(CACHE / "bench.jf"), reads], check=True)
    jf_s = time.perf_counter() - t0
    log(f"jellyfish count: {jf_s:.2f}s -> {kmers / jf_s:,.0f} kmers/s")

    print(json.dumps({"metric": "count_kmers_per_s",
                      "value": round(kmers / ours_s),
                      "unit": "kmers/s",
                      "vs_baseline": round(jf_s / ours_s, 3)}))


if __name__ == "__main__":
    main()
