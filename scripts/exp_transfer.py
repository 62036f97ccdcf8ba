"""Round-4 headline diagnosis: is the k=1000 headline purely result-transfer
bound, and can we buy bandwidth with fewer bytes or parallel fetch streams?

Experiments (real v5e over the axon tunnel):
  1. raw device->host bandwidth: one 10 MB blob, sequential vs 4-thread parallel
  2. one_pass k=1000 vs k=500 vs k=250 (result bytes halve each step; device
     compute is nearly unchanged -- the tiered sort is k-independent)
Writes progress straight to stdout (pipe to a file per CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             ".bench_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.join(cache_dir, "jax_cache"))
    print("devices:", jax.devices(), flush=True)

    # ---- raw bandwidth
    blob = jax.device_put(np.random.default_rng(0).integers(
        0, 255, size=(4, 2_560_000), dtype=np.uint8))
    np.asarray(blob)  # warm
    for trial in range(3):
        t0 = time.perf_counter()
        np.asarray(blob)
        dt = time.perf_counter() - t0
        print(f"seq 10MB: {dt*1e3:.0f} ms = {10.24/dt:.1f} MB/s", flush=True)
    import concurrent.futures as cf

    parts = [blob[i] for i in range(4)]
    for p in parts:
        np.asarray(p)
    with cf.ThreadPoolExecutor(4) as ex:
        for trial in range(3):
            t0 = time.perf_counter()
            list(ex.map(np.asarray, parts))
            dt = time.perf_counter() - t0
            print(f"par4 10MB: {dt*1e3:.0f} ms = {10.24/dt:.1f} MB/s", flush=True)

    # ---- headline scaling with k
    from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine

    data = bench.synth_index()
    engine = ScoringEngine(DeviceIndex(data))
    queries = bench._make_queries(data, seed=1)
    for k in (1000, 500, 250):
        bench.one_pass(engine, queries, k, "exhaustive")  # compile+warm
        times = [bench.one_pass(engine, queries, k, "exhaustive") for _ in range(4)]
        best = min(times)
        print(f"k={k}: best {best*1e3:.0f} ms = {bench.NUM_QUERIES/best:.0f} q/s "
              f"(all: {[round(t*1e3) for t in times]})", flush=True)


if __name__ == "__main__":
    main()
