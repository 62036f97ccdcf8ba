"""Fused Pallas kernel for ColBERT MaxSim scoring.

The XLA path (searcher/late_interaction.py chunked_scores) materializes the
[Q, Lq, C, Ld] similarity tensor in HBM — at production shapes (32 queries x
32 tokens, 500-doc chunks x 64 tokens) that is a 131 MB f32 intermediate whose
write+read traffic, not the matmul (43 us of FLOPs), dominates the measured
~0.8 ms per chunk (PERF.md round-3 int8 section). This kernel keeps the
similarity tile in VMEM: docs are laid out [Ld, C, dim] so the max over doc
tokens becomes a running ``jnp.maximum`` across Ld MXU matmuls of
[Q*Lq, dim] x [dim, BC], and the sum over query tokens is a major-dim reshape
+ reduction — only the [Q, C] scores ever leave the chip.

Masking: a per-token additive bias (0 valid, -1e9 masked) rides the same
[Ld, C] layout; fully-masked (pad) docs surface as <= -1e9 scores and are
gated to -inf by the caller, matching the XLA path's semantics exactly.

Falls back to the XLA formulation off-TPU; interpret-mode equality is pinned
in tests/test_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _maxsim_kernel(q_ref, d_ref, bias_ref, out_ref, *, n_q, lq, ld):
    """One doc block: q_ref [Q*Lq, dim], d_ref [Ld, BC, dim], bias_ref [Ld, BC],
    out_ref [Q, BC]."""
    q = q_ref[:]  # [Q*Lq, dim]
    bc = out_ref.shape[1]

    def body(k, m):
        d_k = d_ref[k]  # [BC, dim]
        s_k = jax.lax.dot_general(q, d_k, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # [Q*Lq, BC]
        return jnp.maximum(m, s_k + bias_ref[k][None, :])

    m = jax.lax.fori_loop(0, ld, body, jnp.full((q.shape[0], bc), -jnp.inf, jnp.float32))
    out_ref[:, :] = m.reshape(n_q, lq, bc).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("interpret", "block_docs"))
def _maxsim_pallas(q_emb, docs_t, bias_t, interpret=False, block_docs=256):
    """q_emb [Q, Lq, dim] bf16/f32; docs_t [Ld, C, dim] bf16; bias_t [Ld, C] f32
    -> [Q, C] f32 MaxSim scores (sum over Lq of max over Ld of q.d + bias)."""
    from jax.experimental import pallas as pl

    n_q, lq, dim = q_emb.shape
    ld, c = docs_t.shape[0], docs_t.shape[1]
    dim_p = _round_up(dim, 128)
    c_p = _round_up(c, block_docs)
    # pad the query-token axis so Q*Lq meets the bf16 sublane tile (16): padded
    # zero-embedding tokens contribute max_k(0 + bias) = 0 to every valid doc's
    # sum (and only push already-gated fully-masked docs further down)
    lq_p = _round_up(lq, 16)
    if lq_p != lq:
        q_emb = jnp.pad(q_emb, ((0, 0), (0, lq_p - lq), (0, 0)))
        lq = lq_p
    qlq = n_q * lq

    q2d = q_emb.astype(jnp.bfloat16).reshape(qlq, dim)
    if dim_p != dim:
        q2d = jnp.pad(q2d, ((0, 0), (0, dim_p - dim)))
        docs_t = jnp.pad(docs_t, ((0, 0), (0, 0), (0, dim_p - dim)))
    if c_p != c:  # pad docs get a -1e9 bias on every token: never win, gated out
        docs_t = jnp.pad(docs_t, ((0, 0), (0, c_p - c), (0, 0)))
        bias_t = jnp.pad(bias_t, ((0, 0), (0, c_p - c)), constant_values=-1e9)

    out = pl.pallas_call(
        functools.partial(_maxsim_kernel, n_q=n_q, lq=lq, ld=ld),
        grid=(c_p // block_docs,),
        in_specs=[
            pl.BlockSpec((qlq, dim_p), lambda i: (0, 0)),
            pl.BlockSpec((ld, block_docs, dim_p), lambda i: (0, i, 0)),
            pl.BlockSpec((ld, block_docs), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((n_q, block_docs), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((n_q, c_p), jnp.float32),
        interpret=interpret,
    )(q2d, docs_t.astype(jnp.bfloat16), bias_t.astype(jnp.float32))
    return out[:, :c]


def maxsim_scores_ref(q_emb, docs, dmask):
    """XLA reference: [Q, C] = sum_lq max_ld (q . d) with masked tokens at -1e9
    and fully-masked docs at -inf (the searcher's chunk_scores math)."""
    sim = jnp.einsum("qle,cke->qclk", q_emb.astype(jnp.bfloat16),
                     docs.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    sim = jnp.where(dmask[None, :, None, :] > 0, sim, -1e9)
    per_q_token = sim.max(axis=-1)
    valid = dmask.any(axis=-1)[None, :]
    return jnp.where(valid, per_q_token.sum(axis=-1), -jnp.inf)


def maxsim_scores(q_emb, docs_t, bias_t, valid, use_pallas=None, interpret=False,
                  block_docs=256):
    """Fused MaxSim over a transposed corpus block.

    q_emb [Q, Lq, dim]; docs_t [Ld, C, dim] (token-major layout); bias_t
    [Ld, C] additive mask bias (0 valid / -1e9 masked); valid [C] bool (any
    valid token). Returns [Q, C] f32 with fully-masked docs at -inf.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas and not interpret:
        docs = jnp.moveaxis(docs_t, 0, 1)  # [C, Ld, dim]
        dmask = (jnp.moveaxis(bias_t, 0, 1) >= 0).astype(jnp.int8)
        return maxsim_scores_ref(q_emb, docs, dmask)
    s = _maxsim_pallas(q_emb, docs_t, bias_t, interpret=interpret, block_docs=block_docs)
    return jnp.where(valid[None, :], s, -jnp.inf)
