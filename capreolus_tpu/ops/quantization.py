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


def quantize_rows(emb: np.ndarray):
    """[N, D] (or [N, T, D]) float -> (int8 same-shape, f32 [N] per-row scales).

    Symmetric: scale = amax(|row|)/127, q = round(x/scale). All-zero rows get
    scale 1 to avoid 0/0 (their quantized row is all zeros anyway).
    """
    emb = np.asarray(emb, dtype=np.float32)
    reduce_axes = tuple(range(1, emb.ndim))
    amax = np.max(np.abs(emb), axis=reduce_axes)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.round(emb / scale.reshape((-1,) + (1,) * (emb.ndim - 1)))
    return np.clip(q, -127, 127).astype(np.int8), scale


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
