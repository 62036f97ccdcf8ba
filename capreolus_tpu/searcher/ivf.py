"""IVF (inverted-file) clustering for dense retrieval: spherical k-means on
the MXU + probe-limited exact scoring.

Brute-force MIPS (searcher/dense.py) is exact and already fast at TREC scale,
but its per-query FLOPs grow linearly with the corpus. IVF bounds them: a
spherical k-means over the (L2-normalized) document embeddings — Lloyd's
iterations whose assignment step is itself one [N, D] x [D, K] MXU matmul —
partitions the corpus into K cells; at search time each query scores the K
centroids (one small matmul), probes only the ``nprobe`` best cells, and runs
exact scoring over just those cells' documents. With nprobe/K ~ 1/32 that is a
~30x FLOP cut at the measured >=0.9 recall@10 on clustered corpora
(tests/test_dense.py::test_dense_ivf_*). nprobe=K degenerates to exact search
(every cell probed), which the equality test pins.

The reference has no dense retrieval at all (its nearest analogue is a static
TCT-ColBERT run file, reference capreolus/searcher/special.py:170-212); this
is the TPU-native scalability tier above the exact searcher, the same role
FAISS IVF plays for CPU/GPU stacks.

Layout: documents are permuted cluster-major once at build (``order``), so a
cell's documents are a contiguous [start, start+size) slice — each probe's
gather is one dynamic slice + batched einsum, bounded to the largest cell.
"""

from __future__ import annotations

import numpy as np

from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)


def spherical_kmeans(docs_f, k, iters=10, seed=0):
    """Spherical k-means over [N, D] embeddings (device array, any float dtype).

    Returns (centroids [K, D] f32 L2-normalized, assign [N] int32). Lloyd's
    with cosine assignment: both the assignment (argmax of [N, D] x [D, K])
    and the update (segment-sum + renormalize) run on device. Empty clusters
    keep their previous centroid (they can re-acquire docs later).
    """
    import jax
    import jax.numpy as jnp

    n = docs_f.shape[0]
    k = int(min(k, n))
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.permutation(key, n)[:k]

    @jax.jit
    def init_centroids(docs):
        c = docs[init_idx].astype(jnp.float32)
        return c / jnp.maximum(jnp.linalg.norm(c, axis=1, keepdims=True), 1e-9)

    @jax.jit
    def lloyd_step(docs, centroids):
        sims = jnp.einsum("nd,kd->nk", docs.astype(jnp.bfloat16),
                          centroids.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        assign = jnp.argmax(sims, axis=1).astype(jnp.int32)
        sums = jax.ops.segment_sum(docs.astype(jnp.float32), assign, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), assign, num_segments=k)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        new = new / jnp.maximum(jnp.linalg.norm(new, axis=1, keepdims=True), 1e-9)
        centroids = jnp.where((counts > 0)[:, None], new, centroids)
        return centroids, assign

    centroids = init_centroids(docs_f)
    assign = None
    for _ in range(max(1, int(iters))):
        centroids, assign = lloyd_step(docs_f, centroids)
    return centroids, assign


def build_cells(assign_np, k):
    """Cluster-major permutation + per-cell extents from an assignment vector.

    Returns (order [N] int64, starts [K] int32, sizes [K] int32, max_size int).
    """
    order = np.argsort(assign_np, kind="stable")
    sizes = np.bincount(assign_np, minlength=k).astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(sizes[:-1])]).astype(np.int32)
    max_size = int(sizes.max()) if len(sizes) else 0
    return order, starts, sizes, max_size
