"""Experiment: exact block-max pruning at the corpus scale it exists for.

On the 200k-doc bench corpus the host-side bound work (~0.3 ms/query) exceeds
the device work pruning saves, so the A/B probe correctly keeps exhaustive
scoring. The economics flip with corpus size: per-query device work grows
linearly with df while the bound tables stay capped at ~4096 ranges. This
measures pruned vs exhaustive on a 2M-doc topically-clustered corpus (10x the
bench corpus; ~1.5 GB of HBM tiles — Robust04x4 scale) on the real chip.

Run: python scripts/exp_prune_scale.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                               ".bench_cache", "jax_cache"))

NUM_DOCS = 2_000_000
NUM_TERMS = 200_000
AVG_UNIQUE = 100
NUM_QUERIES = 512
BATCH = 64
CACHE = "/tmp/prune_scale_corpus.npz"


def corpus():
    from capreolus_tpu.index.synth import synth_clustered_index

    print("generating clustered corpus (cached per layout version)...", flush=True)
    return synth_clustered_index(NUM_DOCS, NUM_TERMS, AVG_UNIQUE, seed=9,
                                 n_topics=2000, topic_vocab_size=1500, cache_fn=CACHE)


def main():
    from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine

    data = corpus()
    print(f"tiles {len(data.doc_ids) * 8 / 1e9:.2f} GB; uploading to HBM...", flush=True)
    engine = ScoringEngine(DeviceIndex(data))
    df = data.df_array
    cands = np.where((df > 500) & (df < NUM_DOCS // 10))[0]
    rng = np.random.Generator(np.random.PCG64(5))
    queries = [[(int(t), 1.0) for t in rng.choice(cands, size=4, replace=False)]
               for _ in range(NUM_QUERIES)]
    params = {"k1": 0.9, "b": 0.4}

    def one_pass(topk, pruned):
        start = time.perf_counter()
        pending = []
        for i in range(0, NUM_QUERIES, BATCH):
            b = queries[i : i + BATCH]
            if pruned:
                spans = engine._build_prune_spans(b, "bm25", params, topk)  # native C++ builder
                p = engine.search(b, model="bm25", params=params, topk=topk,
                                  prune_spans=spans, exact_topk=False,
                                  materialize=False, score_dtype="bfloat16", pack_ords=False)
            else:
                p = engine.search(b, model="bm25", params=params, topk=topk,
                                  exact_topk=False, materialize=False,
                                  score_dtype="bfloat16", pack_ords=False)
            pending.append(p)
        for p in pending:
            p.get()
        return time.perf_counter() - start

    for topk in (10, 100, 1000):
        for pruned in (False, True):
            one_pass(topk, pruned)  # warmup/compile
        t_ex = min(one_pass(topk, False) for _ in range(3))
        t_pr = min(one_pass(topk, True) for _ in range(3))
        st = engine.last_prune_stats
        print(f"k={topk}: exhaustive {NUM_QUERIES/t_ex:7.1f} q/s | pruned {NUM_QUERIES/t_pr:7.1f} q/s "
              f"| speedup {t_ex/t_pr:5.2f}x | kept lanes {st['kept_lanes']/st['total_lanes']:.1%} "
              f"tiles {st['kept_tiles']/st['total_tiles']:.1%}", flush=True)

    # exactness spot check at scale
    es, eo = engine.search(queries[:BATCH], model="bm25", params=params, topk=100, exact_topk=False)
    ps, po = engine.search_pruned(queries[:BATCH], model="bm25", params=params, topk=100)
    print("bit-identical at scale:", np.array_equal(np.asarray(eo), np.asarray(po))
          and np.array_equal(np.asarray(es), np.asarray(ps)))


if __name__ == "__main__":
    main()
