"""Late-interaction (ColBERT MaxSim) search throughput on the real chip.

Measures the two retrieval modes of searcher/late_interaction.py at a
realistic shape — 200k docs x 64 tokens x dim 128 bf16 token embeddings
(3.3 GB HBM), batch 32 queries x 32 tokens — using synthetic L2-normalized
embeddings (the kernel cost is shape-dependent, not value-dependent):

  exact   : chunked [Q*Lq, dim] x [dim, C*Ld] MXU matmuls over the corpus
  prefilt : PLAID-pattern two-stage (pooled [Q,dim]x[dim,N] + exact on top-N)

Reports q/s per mode + stage-1 candidate recall of the exact top-10.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                                   ".bench_cache", "jax_cache"))

N, LD, DIM = 200_000, 64, 128
Q, LQ = 32, 32
HITS = 100
CHUNK = 500
PREFILTER = 1024
PASSES = 5


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.Generator(np.random.PCG64(0))
    # TOPICAL structure (what trained ColBERT embeddings have; on fully random
    # vectors a pooled first pass is provably uninformative): each doc's tokens
    # = its topic centroid + noise, each query targets one topic. Kernel COST
    # is shape-dependent only; the structure makes the recall column meaningful.
    n_topics = 1000
    centroids = rng.standard_normal((n_topics, DIM), dtype=np.float32)
    topic_of_doc = rng.integers(0, n_topics, size=N)
    docs = (centroids[topic_of_doc][:, None, :]
            + 0.7 * rng.standard_normal((N, LD, DIM), dtype=np.float32))
    docs /= np.linalg.norm(docs, axis=-1, keepdims=True)
    dmask = np.ones((N, LD), np.int8)
    dmask[:, LD // 2:] = (rng.random((N, LD - LD // 2)) > 0.3)  # variable doc lengths
    q = (centroids[rng.integers(0, n_topics, size=Q)][:, None, :]
         + 0.7 * rng.standard_normal((Q, LQ, DIM), dtype=np.float32))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)

    docs_d = jnp.asarray(docs, jnp.bfloat16)
    dmask_d = jnp.asarray(dmask)
    q_d = jnp.asarray(q)

    assert N % CHUNK == 0
    nchunks = N // CHUNK

    @jax.jit
    def exact_topk(q_emb, docs, dmask):
        dr = docs.reshape(nchunks, CHUNK, LD, DIM)
        mr = dmask.reshape(nchunks, CHUNK, LD)

        def chunk_scores(args):
            d, m = args
            sim = jnp.einsum("qle,cke->qclk", q_emb.astype(jnp.bfloat16), d,
                             preferred_element_type=jnp.float32)
            sim = jnp.where(m[None, :, None, :] > 0, sim, -1e9)
            return sim.max(axis=-1).sum(axis=-1)

        scores = jax.lax.map(chunk_scores, (dr, mr))
        return jax.lax.top_k(jnp.moveaxis(scores, 0, 1).reshape(Q, -1), HITS)

    @jax.jit
    def prefilter_topk(q_emb, docs, dmask):
        m = (dmask > 0).astype(jnp.bfloat16)[..., None]
        pooled = (docs * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        qsum = q_emb.astype(jnp.bfloat16).sum(axis=1)
        s1 = jnp.einsum("qe,ne->qn", qsum, pooled, preferred_element_type=jnp.float32)
        _, cand = jax.lax.top_k(s1, PREFILTER)
        cch = 256
        cand_r = jnp.moveaxis(cand.reshape(Q, PREFILTER // cch, cch), 1, 0)

        def chunk_scores(c_slice):
            d = docs[c_slice]
            mm = dmask[c_slice]
            sim = jnp.einsum("qle,qcke->qclk", q_emb.astype(jnp.bfloat16), d,
                             preferred_element_type=jnp.float32)
            sim = jnp.where(mm[:, :, None, :] > 0, sim, -1e9)
            return sim.max(axis=-1).sum(axis=-1)

        s2 = jax.lax.map(chunk_scores, cand_r)
        s2 = jnp.moveaxis(s2, 0, 1).reshape(Q, -1)
        ms, idx = jax.lax.top_k(s2, HITS)
        return ms, jnp.take_along_axis(cand, idx, axis=1)

    results = {}
    for name, fn in (("exact", exact_topk), ("prefilter", prefilter_topk)):
        s, o = fn(q_d, docs_d, dmask_d)  # compile + warm
        np.asarray(s)
        best = np.inf
        for _ in range(PASSES):
            t0 = time.perf_counter()
            s, o = fn(q_d, docs_d, dmask_d)
            np.asarray(s)  # honest sync
            best = min(best, time.perf_counter() - t0)
        results[name] = (Q / best, np.asarray(o))
        print(f"{name}: {Q / best:.1f} q/s over {N:,} docs x {LD} tokens "
              f"({best * 1e3:.1f} ms / {Q} queries)", flush=True)

    exact_top10 = results["exact"][1][:, :10]
    pre_all = results["prefilter"][1]
    overlap = np.mean([len(set(exact_top10[i]) & set(pre_all[i])) / 10.0 for i in range(Q)])
    print(f"prefilter top-{HITS} recall of exact top-10: {overlap:.3f} "
          f"(PREFILTER={PREFILTER})", flush=True)


if __name__ == "__main__":
    main()
