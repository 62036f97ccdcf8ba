"""Fused Pallas kernel: similarity matrix + RBF kernel pooling (KNRM soft-TF).

The XLA path materializes the [B, K, Q, D] kernel tensor in HBM; this kernel keeps
each query-block similarity tile in VMEM, applies the K RBF kernels and the
doc-axis reduction in-register, and writes only the pooled [B, K] features —
turning an HBM-bandwidth-bound op into an MXU matmul plus fused VPU math
(BASELINE.json north star: "Pallas kernels for similarity-matrix + RBF kernel
pooling").

Falls back to the XLA implementation off-TPU; both paths are numerically
equivalent (tested in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from capreolus_tpu.reranker.common import KNRM_MUS, KNRM_SIGMAS, knrm_pool, similarity_matrix


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _knrm_kernel(q_ref, d_ref, qtok_ref, dtok_ref, mus_ref, sigmas_ref, out_ref, *, num_kernels):
    """One batch element: fused simmat + kernel pooling.

    q_ref [1, Qp, Ep] normalized query embeddings (zero rows for pad/OOV)
    d_ref [1, Dp, Ep] normalized doc embeddings
    qtok/dtok [1, Qp]/[1, Dp] token ids (0 pad, negative OOV)
    out_ref [1, K] pooled features
    """
    q = q_ref[0]  # [Qp, Ep]
    d = d_ref[0]  # [Dp, Ep]
    qtok = qtok_ref[0]  # [Qp]
    dtok = dtok_ref[0]  # [Dp]

    # cosine channel on the MXU (embeddings pre-normalized; pad rows are zero)
    sim = jnp.dot(q, d.T, preferred_element_type=jnp.float32)  # [Qp, Dp]
    # exact-match channel for negative (OOV) ids
    exact = (qtok[:, None] == dtok[None, :]) & (qtok[:, None] < 0) & (dtok[None, :] < 0)
    valid = (qtok[:, None] != 0) & (dtok[None, :] != 0)
    sim = jnp.where(valid, sim + exact.astype(jnp.float32), 0.0)

    # RBF kernel bank + doc-axis reduction, accumulated per kernel
    row_mask = sim.sum(axis=1) != 0.0  # [Qp] query positions with any signal
    for k in range(num_kernels):
        mu = mus_ref[0, k]
        sigma = sigmas_ref[0, k]
        adj = sim - mu
        kern = jnp.exp(-0.5 * adj * adj / (sigma * sigma))
        kern = jnp.where(valid, kern, 0.0)
        ksum = kern.sum(axis=1)  # [Qp]
        pooled = jnp.where(row_mask, jnp.log(ksum + 1e-6), 0.0).sum()
        out_ref[0, k] = pooled


@functools.partial(jax.jit, static_argnames=("interpret",))
def _knrm_pool_pallas(q_emb, d_emb, qtok, dtok, mus, sigmas, interpret=False):
    from jax.experimental import pallas as pl

    b, q, e = q_emb.shape
    d = d_emb.shape[1]
    qp, dp, ep = _round_up(q, 8), _round_up(d, 128), _round_up(e, 128)
    k = mus.shape[0]

    q_emb = jnp.pad(q_emb, ((0, 0), (0, qp - q), (0, ep - e)))
    d_emb = jnp.pad(d_emb, ((0, 0), (0, dp - d), (0, ep - e)))
    qtok = jnp.pad(qtok, ((0, 0), (0, qp - q)))
    dtok = jnp.pad(dtok, ((0, 0), (0, dp - d)))
    mus_b = jnp.broadcast_to(mus[None], (b, k))
    sigmas_b = jnp.broadcast_to(sigmas[None], (b, k))

    out = pl.pallas_call(
        functools.partial(_knrm_kernel, num_kernels=k),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, qp, ep), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, dp, ep), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, qp), lambda i: (i, 0)),
            pl.BlockSpec((1, dp), lambda i: (i, 0)),
            pl.BlockSpec((1, k), lambda i: (i, 0)),
            pl.BlockSpec((1, k), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, k), jnp.float32),
        interpret=interpret,
    )(q_emb, d_emb, qtok, dtok, mus_b, sigmas_b)
    return out


def knrm_simmat_pool(embedding, querytoks, doctoks, mus, sigmas, use_pallas=None, interpret=False):
    """KNRM pooled features [B, K] from token ids, fused on TPU.

    Equivalent to similarity_matrix + knrm_pool (reranker.common); the OOV
    exact-match convention (negative ids) is preserved.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas and not interpret:
        sim = similarity_matrix(embedding, querytoks, doctoks)
        return knrm_pool(sim, mus, sigmas)

    def norm_embed(toks):
        emb = jnp.take(embedding, jnp.maximum(toks, 0), axis=0)
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-9)
        # zero out pad and OOV rows so the MXU matmul contributes nothing for them
        return jnp.where((toks > 0)[..., None], emb, 0.0)

    q_emb = norm_embed(querytoks)
    d_emb = norm_embed(doctoks)
    return _knrm_pool_pallas(q_emb, d_emb, querytoks.astype(jnp.int32), doctoks.astype(jnp.int32),
                             jnp.asarray(mus, jnp.float32), jnp.asarray(sigmas, jnp.float32),
                             interpret=interpret)
