"""Pallas flash attention for the cross-encoder stack.

IO-aware attention: Q/K/V tiles are streamed through VMEM with an online softmax so
the [L, L] score matrix is never materialized in HBM. Used by the BERT encoder
(capreolus_tpu.reranker.bert) for the per-passage transformer; passage decomposition
keeps sequences short (maxseqlen 256 by default, extractor/bertpassage parity), so a
single kv-block pass usually suffices — the kernel still tiles for longer sequences.

Falls back to a fused XLA implementation off-TPU (tests run on CPU).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_Q = 128
BLOCK_K = 128
NEG_INF = -1e30


def _xla_attention(q, k, v, mask=None, dropout_rate=0.0, dropout_rng=None):
    """Batched attention: [B, H, L, D] inputs, optional [B, L] key mask.

    Scores are kept in the input dtype (bf16 under the mixed_bfloat16 policy the
    reference also uses on TPU, trainer/tensorflow.py:107-109) — the [L, L] score
    tensor dominates HBM traffic at f32. Mask fill is bf16-safe. Attention-prob
    dropout (training only: dropout_rng given) matches HF BERT's
    attention_probs_dropout_prob regularization.
    """
    scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=q.dtype) * scale
    if mask is not None:
        fill = jnp.asarray(-30000.0 if scores.dtype == jnp.bfloat16 else NEG_INF, dtype=scores.dtype)
        scores = jnp.where(mask[:, None, None, :], scores, fill)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int, seq_len: int):
    """One (batch*head, q-block) program: stream kv blocks with online softmax.

    The key mask arrives reshaped [1, seq_len/block_k, block_k] (Mosaic requires
    full trailing block dims), one row per kv block.
    """
    from jax.experimental import pallas as pl

    q = q_ref[0]  # [BLOCK_Q, D]
    scale = 1.0 / math.sqrt(q.shape[-1])
    q = (q * scale).astype(jnp.float32)

    num_kv = seq_len // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)  # [BK, D]
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        kv_mask = mask_ref[0, i]  # [BK]

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [BQ, BK]
        s = jnp.where(kv_mask[None, :] != 0, s, NEG_INF)

        m_cur = jnp.max(s, axis=1)  # [BQ]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])  # [BQ, BK]
        l_new = l_prev * alpha + p.sum(axis=1)
        acc = acc * alpha[:, None] + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((q.shape[0], v_ref.shape[-1]), dtype=jnp.float32)
    m0 = jnp.full((q.shape[0],), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((q.shape[0],), dtype=jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_attention_tpu(q, k, v, mask, block_q=BLOCK_Q, block_k=BLOCK_K):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, l, d = q.shape
    bh = b * h
    q_ = q.reshape(bh, l, d)
    k_ = k.reshape(bh, l, d)
    v_ = v.reshape(bh, l, d)
    num_kv = l // block_k
    mask_ = jnp.broadcast_to(mask[:, None, :], (b, h, l)).reshape(bh, num_kv, block_k).astype(jnp.int32)

    grid = (bh, l // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, seq_len=l),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, num_kv, block_k), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, l, d), q.dtype),
    )(q_, k_, v_, mask_)
    return out.reshape(b, h, l, d)


def multihead_attention(q, k, v, mask=None, use_pallas=None, dropout_rate=0.0, dropout_rng=None):
    """Multi-head attention [B, H, L, D] with optional [B, L] key mask.

    XLA is the production path at every length: measured on v5e at BERT-base
    geometry (H=12, D=64, bf16, constant token volume), XLA batched attention
    beats the Pallas flash kernel at L=128 (5.3 vs 8.6 ms), 256 (5.8 vs 10.6),
    512 (7.4 vs 15.4), 1024 (11.3 vs 24.6) and 2048 (17.9 vs 43.6) — XLA's own
    attention fusion on TPU already avoids materializing [L, L] scores in HBM
    (scripts/exp_attn.py; PERF.md round 2). The Pallas kernel remains available
    as an explicit opt-in (CAPREOLUS_FLASH_ATTENTION=1 or use_pallas=True) for
    memory-pressure scenarios; a head-batched variant that lost to XLA at all
    shapes was removed.
    """
    if dropout_rate > 0.0 and dropout_rng is not None:
        use_pallas = False  # the opt-in Pallas kernel has no dropout support
    if use_pallas is None:
        import os

        env = os.environ.get("CAPREOLUS_FLASH_ATTENTION", "")
        use_pallas = (
            env in ("1", "true")
            and jax.default_backend() == "tpu"
            and q.shape[2] % BLOCK_Q == 0
            and q.shape[3] in (32, 64, 128, 256)
        )
    if use_pallas and mask is not None:
        return _flash_attention_tpu(q, k, v, mask)
    return _xla_attention(q, k, v, mask, dropout_rate=dropout_rate, dropout_rng=dropout_rng)
