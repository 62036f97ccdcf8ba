"""Round-5: headline batch-size sweep at k=1000.

exp_roofline_r5 decomposed the 2048-query pass into ~8 x 27 ms of
dispatch-serialized time (the scalar-result ceiling) + ~81 ms of visible
result transfer. If per-batch dispatch is the binding term, halving the batch
count by doubling BATCH should move the headline directly — r3 settled on 256
under the OLD payload sizes, re-decided here post-diet.

Run: python scripts/exp_batch_sweep_r5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             ".bench_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.join(cache_dir, "jax_cache"))
    print("devices:", jax.devices(), flush=True)

    from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine

    data = bench.synth_index()
    engine = ScoringEngine(DeviceIndex(data))
    queries = bench._make_queries(data, seed=1)

    for batch in (256, 512, 1024, 128):
        bench.BATCH = batch
        bench.one_pass(engine, queries, 1000, "exhaustive")  # warm shape bucket
        times = sorted(bench.one_pass(engine, queries, 1000, "exhaustive")
                       for _ in range(6))
        print(f"BATCH={batch:5d}: best {times[0]*1e3:5.0f} ms = "
              f"{bench.NUM_QUERIES/times[0]:6.0f} q/s, median "
              f"{bench.NUM_QUERIES/times[len(times)//2]:6.0f} "
              f"(all {[round(bench.NUM_QUERIES/t) for t in times]})", flush=True)
    bench.BATCH = 256


if __name__ == "__main__":
    main()
