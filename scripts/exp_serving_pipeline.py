"""Measure the MicroBatcher's pipelined dispatch on the real chip.

The round-4 serving capture showed saturated coalesced throughput of ~278-300
q/s through the batcher vs a 16-23k q/s raw-engine ceiling: the worker ran
strictly serial blocking engine calls, so every batch paid the full tunnel
round-trip with nothing overlapped. Services now expose
``search_async(queries, k) -> collect`` and the batcher keeps up to
``pipeline_depth`` batches in flight.

This script A/Bs pipeline_depth = 1 (the old serial behavior) vs 2 / 4 over
the bench corpus at k=10, saturated arrivals (256 pre-submitted queries).

Usage:  python scripts/exp_serving_pipeline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine
from capreolus_tpu.serving_http import MicroBatcher


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                   ".bench_cache", "jax_cache"))
    data = bench.synth_index()
    engine = ScoringEngine(DeviceIndex(data))
    queries = bench._make_queries(data, seed=1)

    svc = bench.BenchEngineService(engine)
    # warm every qt bucket the batcher can hit (incl. the max_batch sweep's)
    for size in (1, 3, 6, 12, 24, 48, 64, 128, 256):
        svc.search(queries[:size], k=10)
    print("warm", flush=True)

    for depth, max_batch in ((1, 64), (2, 64), (4, 64), (4, 128), (4, 256),
                             (1, 64), (2, 64), (4, 64), (4, 128), (4, 256)):
        # interleaved reps: same tunnel weather. max_batch > batch_size lets a
        # saturated backlog coalesce into bigger engine calls (the service
        # chunks internally at batch_size, all chunks dispatched before any
        # collect — intra-call pipelining); idle latency is unaffected since
        # big batches only form under backlog.
        mb = MicroBatcher(svc, window_ms=2.0, pipeline_depth=depth, max_batch=max_batch)
        try:
            # saturated: all 512 queries queued before the first collect
            for rep in range(3):
                slots = [mb.submit(queries[i % 512], k=10) for i in range(512)]
                t0 = time.perf_counter()
                for s in slots:
                    mb.result(s)
                dt = time.perf_counter() - t0
                print(f"depth={depth} max_batch={max_batch} rep={rep} coalesced "
                      f"{512 / dt:.1f} q/s ({dt * 1e3:.0f} ms)", flush=True)
        finally:
            mb.close()

    # batch-1 idle-arrival latency must NOT regress with pipelining enabled
    for depth in (1, 2):
        mb = MicroBatcher(svc, window_ms=2.0, pipeline_depth=depth)
        try:
            lat = []
            for i in range(40):
                t0 = time.perf_counter()
                mb.search(queries[i % len(queries)], k=10)
                lat.append(time.perf_counter() - t0)
            lat.sort()
            print(f"depth={depth} batch-1 p50 {lat[len(lat) // 2] * 1e3:.1f} ms "
                  f"max {lat[-1] * 1e3:.1f} ms", flush=True)
        finally:
            mb.close()


if __name__ == "__main__":
    main()
