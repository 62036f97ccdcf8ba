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


def quantize_rows_int4(emb: np.ndarray, slab_rows: int = 65536):
    """[N, D] float -> (uint8 [N, ceil(D/2)] packed nibble pairs, f32 [N] scales).

    Symmetric to [-7, 7]: scale = amax(|row|)/7. Two's-complement nibbles, low
    nibble = even dims, high nibble = odd dims; odd D is zero-padded (zero dims
    contribute nothing to the dot product, so scores are unaffected). A packed
    corpus is HALF the int8 bytes — 4x the rows per HBM byte vs bf16, and half
    the host->device stream on the transfer-bound hbmbudget path.
    """
    emb = np.asarray(emb)
    n, d = emb.shape[0], emb.shape[-1]
    d_pad = d + (d % 2)
    out = np.empty((n, d_pad // 2), np.uint8)
    scale = np.empty((n,), np.float32)
    for s0 in range(0, max(n, 1), slab_rows):
        slab = np.asarray(emb[s0 : s0 + slab_rows], dtype=np.float32)
        amax = np.max(np.abs(slab), axis=1) if slab.size else np.zeros((0,))
        sc = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
        q = np.clip(np.round(slab / sc[:, None]), -7, 7).astype(np.int8)
        if d % 2:
            q = np.concatenate([q, np.zeros((len(q), 1), np.int8)], axis=1)
        lo = (q[:, 0::2].astype(np.uint8)) & 0xF
        hi = (q[:, 1::2].astype(np.uint8)) & 0xF
        out[s0 : s0 + slab_rows] = lo | (hi << 4)
        scale[s0 : s0 + slab_rows] = sc
    return out, scale


def unpack_int4_jnp(packed):
    """uint8 [..., P] packed nibbles -> int8 [..., 2P] (device, inside jit)."""
    import jax.numpy as jnp

    lo = (packed & 0xF).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    return jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], packed.shape[-1] * 2)


def int4_mips_scores(q_emb, docs_p4, dscale, row_chunk: int = 131072):
    """[Q, D] float queries x ([N, P] packed int4, [N] f32) docs -> [Q, N] f32.

    Queries quantize to int8 (activations keep 8 bits; only the STORED corpus
    is 4-bit), documents unpack to int8 chunk-by-chunk inside a lax.map so the
    transient int8 corpus never materializes wholesale (peak device memory =
    packed corpus + one chunk + the score matrix). int8 x int8 contraction on
    the MXU double-rate path, int32 accumulation, rank-1 dequantization — the
    same exact-factoring scheme as int8_mips_scores.
    """
    import jax
    import jax.numpy as jnp

    q_i8, qscale = quantize_rows_jnp(q_emb)
    d_up = docs_p4.shape[-1] * 2
    if q_i8.shape[-1] < d_up:  # odd-D corpora are zero-padded at pack time
        q_i8 = jnp.pad(q_i8, ((0, 0), (0, d_up - q_i8.shape[-1])))
    n = docs_p4.shape[0]
    if n <= row_chunk:
        iscores = jnp.einsum("qd,nd->qn", q_i8, unpack_int4_jnp(docs_p4),
                             preferred_element_type=jnp.int32)
        return iscores.astype(jnp.float32) * qscale[:, None] * dscale[None, :]
    # chunk by dynamic_slice from the ORIGINAL packed array — padding +
    # reshaping it would materialize a full second copy of the packed corpus
    # in HBM, doubling the footprint the hbmbudget accounting sized. The last
    # chunk's start is clamped to n - row_chunk, so its leading rows overlap
    # the previous chunk; dynamic_update_slice rewrites those score columns
    # with identical values (same rows, same math) — exactness is unaffected.
    nch = (n + row_chunk - 1) // row_chunk
    p_cols = docs_p4.shape[-1]

    def score_chunk(i, out):
        start = jnp.minimum(i * row_chunk, n - row_chunk)
        p = jax.lax.dynamic_slice(docs_p4, (start, 0), (row_chunk, p_cols))
        s = jax.lax.dynamic_slice(dscale, (start,), (row_chunk,))
        isc = jnp.einsum("qd,nd->qn", q_i8, unpack_int4_jnp(p),
                         preferred_element_type=jnp.int32)
        return jax.lax.dynamic_update_slice(
            out, isc.astype(jnp.float32) * s[None, :], (0, start))

    out = jax.lax.fori_loop(
        0, nch, score_chunk, jnp.zeros((q_emb.shape[0], n), jnp.float32))
    return out * qscale[:, None]


def int8_mips_scores(q_emb, docs_i8, dscale):
    """[Q, D] float queries x ([N, D] int8, [N] f32) docs -> [Q, N] f32 scores.

    Both operands int8 so XLA lowers the contraction onto the double-rate int8
    MXU path; accumulation in int32, dequantized by the rank-1 outer scale.
    """
    import jax.numpy as jnp

    q_i8, qscale = quantize_rows_jnp(q_emb)
    iscores = jnp.einsum("qd,nd->qn", q_i8, docs_i8, preferred_element_type=jnp.int32)
    return iscores.astype(jnp.float32) * qscale[:, None] * dscale[None, :]
