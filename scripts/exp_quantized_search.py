"""int8 corpus quantization throughput on the real chip (dense + ColBERT).

Measures the production scoring math of searcher/dense.py (_dense_scores) and
searcher/late_interaction.py (chunked MaxSim) in bf16 vs int8 corpus modes
(ops/quantization.py): per-row symmetric scales, int8 x int8 MXU contraction
with int32 accumulation, rank-1 dequantization. The v5e MXU runs int8 at twice
the bf16 MAC rate and the int8 corpus is half the HBM.

Shapes: dense = 1M docs x dim 768 (bf16 1.5 GB vs int8 0.77 GB), batch 256
queries, approx_max_k top-100. maxsim = 200k docs x 64 tokens x dim 128
(bf16 3.3 GB vs int8 1.6 GB), batch 32 queries x 32 tokens, chunk 500.
Also reports the int8 top-10 overlap vs the bf16 ranking on topical data.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                                   ".bench_cache", "jax_cache"))

PASSES = 5
HITS = 100


def bench(fn, args, n_queries):
    import jax

    s, o = fn(*args)  # compile + warm
    np.asarray(s)
    best = np.inf
    for _ in range(PASSES):
        t0 = time.perf_counter()
        s, o = fn(*args)
        np.asarray(s)  # honest sync through the tunnel
        best = min(best, time.perf_counter() - t0)
    return n_queries / best, best, np.asarray(o)


def overlap10(o_ref, o_test):
    return float(np.mean([len(set(o_ref[i][:10]) & set(o_test[i][:10])) / 10.0
                          for i in range(len(o_ref))]))


def dense_experiment():
    import jax
    import jax.numpy as jnp

    from capreolus_tpu.ops.quantization import int8_mips_scores, quantize_rows

    N = int(os.environ.get("EXP_N", 1_000_000))
    DIM, Q = 768, 256
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
    d_i8_np, dscale_np = quantize_rows(docs)
    d_i8, dscale = jnp.asarray(d_i8_np), jnp.asarray(dscale_np)
    q_d = jnp.asarray(q)

    @jax.jit
    def topk_bf16(q_emb, docs_m):
        s = jnp.einsum("qd,nd->qn", q_emb.astype(jnp.bfloat16), docs_m,
                       preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(s, HITS, recall_target=0.95)

    @jax.jit
    def topk_int8(q_emb, docs_m, sc):
        return jax.lax.approx_max_k(int8_mips_scores(q_emb, docs_m, sc), HITS,
                                    recall_target=0.95)

    qs_bf, ms_bf, o_bf = bench(topk_bf16, (q_d, d_bf16), Q)
    print(f"dense bf16 : {qs_bf:,.0f} q/s over {N:,} docs x {DIM} "
          f"({ms_bf * 1e3:.1f} ms / {Q} queries)", flush=True)
    qs_i8, ms_i8, o_i8 = bench(topk_int8, (q_d, d_i8, dscale), Q)
    print(f"dense int8 : {qs_i8:,.0f} q/s ({ms_i8 * 1e3:.1f} ms) = "
          f"{qs_i8 / qs_bf:.2f}x bf16, top-10 overlap {overlap10(o_bf, o_i8):.3f}",
          flush=True)


def maxsim_experiment():
    import jax
    import jax.numpy as jnp

    from capreolus_tpu.ops.quantization import quantize_rows, quantize_rows_jnp

    N = int(os.environ.get("EXP_N_MAXSIM", 200_000))
    LD, DIM, Q, LQ, CHUNK = 64, 128, 32, 32, 500
    rng = np.random.Generator(np.random.PCG64(1))
    n_topics = 1000
    centroids = rng.standard_normal((n_topics, DIM), dtype=np.float32)
    docs = (centroids[rng.integers(0, n_topics, N)][:, None, :]
            + 0.7 * rng.standard_normal((N, LD, DIM), dtype=np.float32))
    docs /= np.linalg.norm(docs, axis=-1, keepdims=True)
    dmask = np.ones((N, LD), np.int8)
    dmask[:, LD // 2:] = (rng.random((N, LD - LD // 2)) > 0.3)
    q = (centroids[rng.integers(0, n_topics, Q)][:, None, :]
         + 0.7 * rng.standard_normal((Q, LQ, DIM), dtype=np.float32))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)

    d_bf16 = jnp.asarray(docs, jnp.bfloat16)
    d_i8_np, dscale_np = quantize_rows(docs)
    d_i8, dscale = jnp.asarray(d_i8_np), jnp.asarray(dscale_np)
    dmask_d = jnp.asarray(dmask)
    q_d = jnp.asarray(q)
    nchunks = N // CHUNK

    @jax.jit
    def exact_bf16(q_emb, docs_t, dmask_t):
        dr = docs_t.reshape(nchunks, CHUNK, LD, DIM)
        mr = dmask_t.reshape(nchunks, CHUNK, LD)

        def chunk_scores(args):
            d, m = args
            sim = jnp.einsum("qle,cke->qclk", q_emb.astype(jnp.bfloat16), d,
                             preferred_element_type=jnp.float32)
            sim = jnp.where(m[None, :, None, :] > 0, sim, -1e9)
            return sim.max(axis=-1).sum(axis=-1)

        scores = jax.lax.map(chunk_scores, (dr, mr))
        return jax.lax.top_k(jnp.moveaxis(scores, 0, 1).reshape(Q, -1), HITS)

    @jax.jit
    def exact_int8(q_emb, docs_t, dmask_t, sc):
        # production layout (late_interaction.py chunk_scores_q): flat 2D int8
        # dot_general (MXU int8 path) with bf16 sims written in the epilogue
        q_i8, qscale = quantize_rows_jnp(q_emb)
        q2d = q_i8.reshape(Q * LQ, DIM)
        dr = docs_t.reshape(nchunks, CHUNK, LD, DIM)
        mr = dmask_t.reshape(nchunks, CHUNK, LD)
        scr = sc.reshape(nchunks, CHUNK)

        def chunk_scores(args):
            d, m, s_ = args
            sim = jax.lax.dot_general(q2d, d.reshape(CHUNK * LD, DIM),
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.bfloat16)
            sim = sim.reshape(Q, LQ, CHUNK, LD)
            sim = jnp.where(m[None, None, :, :] > 0, sim, jnp.bfloat16(-1e9))
            return sim.max(axis=-1).astype(jnp.float32).sum(axis=1) \
                * qscale[:, None] * s_[None, :]

        scores = jax.lax.map(chunk_scores, (dr, mr, scr))
        return jax.lax.top_k(jnp.moveaxis(scores, 0, 1).reshape(Q, -1), HITS)

    qs_bf, ms_bf, o_bf = bench(exact_bf16, (q_d, d_bf16, dmask_d), Q)
    print(f"maxsim bf16: {qs_bf:,.1f} q/s over {N:,} docs x {LD} tokens "
          f"({ms_bf * 1e3:.1f} ms / {Q} queries)", flush=True)
    qs_i8, ms_i8, o_i8 = bench(exact_int8, (q_d, d_i8, dmask_d, dscale), Q)
    print(f"maxsim int8: {qs_i8:,.1f} q/s ({ms_i8 * 1e3:.1f} ms) = "
          f"{qs_i8 / qs_bf:.2f}x bf16, top-10 overlap {overlap10(o_bf, o_i8):.3f}",
          flush=True)


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("dense", "both"):
        dense_experiment()
    if which in ("maxsim", "both"):
        maxsim_experiment()


if __name__ == "__main__":
    main()
