"""IVF probe-limited dense search vs exact brute force on the real chip.

Drives the production code paths: DenseSearcher._ivf_topk (searcher/ivf.py
spherical k-means + cluster-major probing) vs the exact brute-force topk
(_dense_scores + topkmode select). Also reports IVF's recall of the exact
top-10 on the same topically-clustered corpus the other dense experiments use
(the structure trained embeddings actually have).

Shapes (override with EXP_N / EXP_K / EXP_NPROBE): 4M docs x dim 768 bf16
(6.1 GB HBM), K = 2048 cells, nprobe = 32, batch 256 queries, top-100.
Build cost (one-time): 10 Lloyd iterations = 10 MXU matmuls over the corpus.
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
HITS = 100


def bench(fn, args, n_queries):
    s, o = fn(*args)  # compile + warm
    np.asarray(s)
    best = np.inf
    for _ in range(PASSES):
        t0 = time.perf_counter()
        s, o = fn(*args)
        np.asarray(s)  # honest sync through the tunnel
        best = min(best, time.perf_counter() - t0)
    return n_queries / best, best, np.asarray(o)


def main():
    import jax

    if os.environ.get("BENCH_SMOKE"):  # CPU validation of the measurement logic
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import capreolus_tpu

    capreolus_tpu.load_all_modules()
    from capreolus_tpu.searcher import Searcher
    from capreolus_tpu.searcher.dense import _dense_scores

    print(f"devices: {jax.devices()}", flush=True)

    N = int(os.environ.get("EXP_N", 4_000_000))
    K = int(os.environ.get("EXP_K", 2048))
    NPROBE = int(os.environ.get("EXP_NPROBE", 32))
    DIM, Q = 768, int(os.environ.get("EXP_Q", 256))
    rng = np.random.Generator(np.random.PCG64(0))
    n_topics = 2000
    centroids = rng.standard_normal((n_topics, DIM), dtype=np.float32)
    docs = centroids[rng.integers(0, n_topics, N)] + \
        0.5 * rng.standard_normal((N, DIM), dtype=np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = centroids[rng.integers(0, n_topics, Q)] + \
        0.5 * rng.standard_normal((Q, DIM), dtype=np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    d_bf16 = jnp.asarray(docs, jnp.bfloat16)
    q_d = jnp.asarray(q)

    searcher = Searcher.create("dense", {
        "pretrained": "tiny", "clusters": K, "nprobe": NPROBE,
        "topkmode": "approx", "index": {"collection": {"name": "dummy"}}})

    select = searcher._topk_fn(HITS)

    @jax.jit
    def exact_topk(q_emb, docs_m):
        return select(_dense_scores(q_emb, docs_m))

    qs_ex, ms_ex, o_ex = bench(exact_topk, (q_d, d_bf16), Q)
    print(f"exact      : {qs_ex:,.0f} q/s over {N:,} docs x {DIM} "
          f"({ms_ex * 1e3:.1f} ms / {Q} queries)", flush=True)

    t0 = time.perf_counter()
    ivf_topk, meta = searcher._ivf_topk(d_bf16, N, HITS)
    # honest sync (CLAUDE.md: block_until_ready can no-op on the tunneled
    # backend): pull a scalar that depends on the permuted corpus itself
    emb = meta["docs"]["emb"] if isinstance(meta["docs"], dict) else meta["docs"]
    np.asarray(emb[0, 0])
    build_s = time.perf_counter() - t0
    print(f"IVF build  : {build_s:.1f} s (K={K}, 10 Lloyd iterations + permute)",
          flush=True)

    qs_ivf, ms_ivf, o_ivf = bench(ivf_topk, (q_d, meta), Q)
    rec = float(np.mean([len(set(o_ex[i][:10]) & set(o_ivf[i])) / 10.0
                         for i in range(Q)]))
    print(f"IVF nprobe={NPROBE}: {qs_ivf:,.0f} q/s ({ms_ivf * 1e3:.1f} ms) = "
          f"{qs_ivf / qs_ex:.2f}x exact, recall@10 of exact top-10 = {rec:.3f}",
          flush=True)

    if os.environ.get("EXP_SERVING"):
        # IVF's claimed lane (PERF.md round 3): SMALL-BATCH serving latency,
        # where exact still pays the full corpus read per call but IVF touches
        # only nprobe x cell rows. Sequential per-call latency, exact vs IVF,
        # at serving batch sizes; interleaved so both see the same weather.
        reps = int(os.environ.get("EXP_REPS", 40))
        for bs in (1, 8):
            qb = jnp.asarray(q[:bs])
            for name, fn, args in (("exact", exact_topk, (qb, d_bf16)),
                                   ("ivf  ", ivf_topk, (qb, meta))):
                s, _ = fn(*args)
                np.asarray(s)  # compile + warm outside the timed loop
            lat = {"exact": [], "ivf  ": []}
            for _ in range(reps):
                for name, fn, args in (("exact", exact_topk, (qb, d_bf16)),
                                       ("ivf  ", ivf_topk, (qb, meta))):
                    t0 = time.perf_counter()
                    s, _ = fn(*args)
                    np.asarray(s)
                    lat[name].append(time.perf_counter() - t0)
            for name, xs in lat.items():
                xs.sort()
                print(f"serving batch={bs} {name}: p50 {xs[len(xs) // 2] * 1e3:.1f} ms "
                      f"min {xs[0] * 1e3:.1f} ms p90 {xs[int(0.9 * len(xs))] * 1e3:.1f} ms",
                      flush=True)


if __name__ == "__main__":
    main()
