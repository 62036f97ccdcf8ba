"""int8 embedding quantization for retrieval (dense MIPS and ColBERT MaxSim).

The v5e MXU multiplies int8 at twice the bf16 rate and an int8 corpus tensor
occupies half the HBM of bf16 — so quantizing the *stored document embeddings*
both doubles the corpus a chip can hold and speeds up the scoring matmul. The
reference has no dense retrieval at all (its nearest analogue is the static
TCT-ColBERT run file, reference capreolus/searcher/special.py:170-212); this
path serves the same role natively and is validated by top-k-overlap referee
tests against the exact bf16 scorer (tests/test_dense.py, tests/test_colbert.py).

Scheme: symmetric per-row scales (one f32 scale per document, or per document
for the [N, T, D] ColBERT token tensor). Queries are quantized per-row at
search time with the same rule, scores accumulate in int32 on the MXU, and the
float score is recovered as ``int_score * qscale * dscale`` — a rank-1 scaling
that preserves each row's score ORDER exactly up to the rounding of the inputs
(measured top-10 overlap >=9/10 on clustered corpora; see PERF.md).
"""

from __future__ import annotations

import numpy as np


def quantize_rows(emb: np.ndarray, slab_rows: int = 65536):
    """[N, D] (or [N, T, D]) float -> (int8 same-shape, f32 [N] per-row scales).

    Symmetric: scale = amax(|row|)/127, q = round(x/scale). All-zero rows get
    scale 1 to avoid 0/0 (their quantized row is all zeros anyway).

    Processes ``slab_rows`` rows at a time so peak host memory is one f32 slab
    plus the int8 output — a whole-corpus f32 cast + division would need ~2.3x
    the corpus in f32 at exactly the >HBM scales this composes with
    (hbmbudget streaming; round-3 review finding).
    """
    emb = np.asarray(emb)
    n = emb.shape[0]
    out = np.empty(emb.shape, np.int8)
    scale = np.empty((n,), np.float32)
    for s0 in range(0, max(n, 1), slab_rows):
        slab = np.asarray(emb[s0 : s0 + slab_rows], dtype=np.float32)
        reduce_axes = tuple(range(1, slab.ndim))
        amax = np.max(np.abs(slab), axis=reduce_axes) if slab.size else np.zeros((0,))
        sc = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q = np.round(slab / sc.reshape((-1,) + (1,) * (slab.ndim - 1)))
        out[s0 : s0 + slab_rows] = np.clip(q, -127, 127).astype(np.int8)
        scale[s0 : s0 + slab_rows] = sc
    return out, scale


def quantize_rows_jnp(emb):
    """Device-side per-row symmetric quantization (for query batches inside jit)."""
    import jax.numpy as jnp

    reduce_axes = tuple(range(1, emb.ndim))
    amax = jnp.max(jnp.abs(emb.astype(jnp.float32)), axis=reduce_axes)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.round(emb / scale.reshape((-1,) + (1,) * (emb.ndim - 1)))
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def int8_mips_scores(q_emb, docs_i8, dscale):
    """[Q, D] float queries x ([N, D] int8, [N] f32) docs -> [Q, N] f32 scores.

    Both operands int8 so XLA lowers the contraction onto the double-rate int8
    MXU path; accumulation in int32, dequantized by the rank-1 outer scale.
    """
    import jax.numpy as jnp

    q_i8, qscale = quantize_rows_jnp(q_emb)
    iscores = jnp.einsum("qd,nd->qn", q_i8, docs_i8, preferred_element_type=jnp.int32)
    return iscores.astype(jnp.float32) * qscale[:, None] * dscale[None, :]
