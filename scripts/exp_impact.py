"""Learned-sparse impact search vs BM25 on the real chip: same tiled postings
engine, different elementwise formula (impact = w1*tf vs the BM25 kernel).

Uses the standard synthetic bench corpus machinery (capreolus_tpu/index/synth.py)
with SYNTHETIC quantized impacts (uniform 1..255 int payloads replacing tfs):
this measures the ENGINE path a trained uniCOIL/SPLADE index rides — encoder
cost is offline/index-time and amortized, so serving q/s is the number that
matters. Expectation: impact >= BM25 q/s at identical shapes (fewer VPU ops per
lane, same gathers/sorts/transfers).

Env overrides: EXP_DOCS (200000), EXP_TERMS (50000), EXP_Q (2048), EXP_K (1000).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                                   ".bench_cache", "jax_cache"))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

PASSES = 5


def main():
    import jax

    if os.environ.get("EXP_CPU"):  # CPU smoke mode (the tunnel probe protocol)
        jax.config.update("jax_platforms", "cpu")

    import capreolus_tpu

    capreolus_tpu.load_all_modules()
    from capreolus_tpu.index.synth import synth_uniform_index
    from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine

    print(f"devices: {jax.devices()}", flush=True)
    N = int(os.environ.get("EXP_DOCS", 200_000))
    T = int(os.environ.get("EXP_TERMS", 50_000))
    Q = int(os.environ.get("EXP_Q", 2048))
    K = int(os.environ.get("EXP_K", 1000))

    data = synth_uniform_index(N, T, avg_unique=52, seed=0)
    # impact payload: replace tfs with uniform 8-bit quantized impacts. The
    # synth index's prune_tables and impact-desc posting order were built from
    # the ORIGINAL tfs and are now stale — null the tables so block-max
    # pruning (and anything reading them) cannot use wrong bounds; this script
    # also never uses maxpostings, whose head spans assume impact-desc order.
    rng = np.random.Generator(np.random.PCG64(7))
    data.tfs = rng.integers(1, 256, size=len(data.tfs)).astype(np.int32)
    data.prune_tables = None
    engine = ScoringEngine(DeviceIndex(data))

    qrng = np.random.Generator(np.random.PCG64(1))
    df = np.diff(data.term_offsets)
    heavy = np.argsort(-df)[: T // 10]
    queries_imp = [[(int(t), float(qrng.random() * 3 + 0.1)) for t in qrng.choice(heavy, 4, replace=False)]
                   for _ in range(Q)]
    queries_bm = [[(t, 1.0) for t, _ in ql] for ql in queries_imp]

    def run(model, queries, params):
        res = engine.search(queries[:256], model=model, params=params, topk=K)  # warm
        best = np.inf
        for _ in range(PASSES):
            t0 = time.perf_counter()
            engine.search(queries, model=model, params=params, topk=K,
                          score_dtype="bfloat16", pack_ords=True)
            best = min(best, time.perf_counter() - t0)
        return Q / best

    bm25 = run("bm25", queries_bm, {"k1": 0.9, "b": 0.4})
    imp = run("impact", queries_imp, {})
    print(f"BM25    : {bm25:8.0f} q/s")
    print(f"impact  : {imp:8.0f} q/s  ({imp / bm25:.2f}x BM25)")


if __name__ == "__main__":
    main()
