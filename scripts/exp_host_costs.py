"""Measure host-side per-batch costs of the tiered engine (no TPU needed):
exhaustive unit build vs pruned span build + unit build, on the bench corpora.

Round-4 diagnosis for VERDICT #2: at clustered k=10 the pipelined pruned mode
ran 0.586x — is the host bound work (spans + units) larger than the whole
exhaustive batch wall (7 ms at 36k q/s)?
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import bench
from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine

for name, build, seed in (("random", bench.synth_index, 1), ("clustered", bench.synth_clustered_index, 4)):
    data = build()
    engine = ScoringEngine(DeviceIndex(data))
    rng = np.random.Generator(np.random.PCG64(seed))
    df = data.df_array
    cand = np.where((df > 50) & (df < bench.NUM_DOCS // 10))[0]
    queries = [[(int(t), 1.0) for t in rng.choice(cand, size=4, replace=False)]
               for _ in range(bench.NUM_QUERIES)]
    batches = [queries[i:i + 256] for i in range(0, len(queries), 256)]
    params = {"k1": 0.9, "b": 0.4}

    for topk in (10, 1000):
        # exhaustive: flat terms + unit build
        t0 = time.perf_counter()
        for b in batches:
            engine._build_tiered(b, "bm25")
        t_exh = (time.perf_counter() - t0) / len(batches)

        # pruned: span build
        t0 = time.perf_counter()
        spans = [engine._build_prune_spans(b, "bm25", params, topk) for b in batches]
        t_span = (time.perf_counter() - t0) / len(batches)
        st = engine.last_prune_stats
        kept_tiles = st["kept_tiles"] / max(1, st["total_tiles"])

        # pruned: unit build from spans
        n_spans = 0
        t0 = time.perf_counter()
        for b, s in zip(batches, spans):
            if s is not None:
                engine._build_tiered(b, "bm25", spans=s)
                n_spans += len(s[0])
        t_unit = (time.perf_counter() - t0) / len(batches)

        print(f"{name} k={topk}: exhaustive_units {t_exh*1e3:.1f} ms/batch | "
              f"span_build {t_span*1e3:.1f} ms | pruned_units {t_unit*1e3:.1f} ms | "
              f"kept_tiles {kept_tiles:.2f} | spans/batch {n_spans/len(batches):.0f}",
              flush=True)
