"""Shared model layers and loss functions (JAX/Flax).

Capability parity with /root/reference/capreolus/reranker/common.py: the similarity
matrix with OOV exact-match channel (:143-182), stacked simmats for CEDR (:187-221),
RBF kernel banks (:224-250), and the pairwise hinge / softmax / cross-entropy / LCE
losses (:71-103) — all as pure functions on jnp arrays so the one JAX trainer works
for every model.

These ops are MXU/VPU friendly by construction: the cosine channel is a batched
matmul over normalized embeddings, and kernel pooling is elementwise work XLA fuses
into the surrounding reductions. A fused Pallas simmat+pooling kernel lives in
capreolus_tpu.ops for the hot path.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# KNRM / CEDR kernel bank defaults (Xiong et al. SIGIR'17)
KNRM_MUS = (-0.9, -0.7, -0.5, -0.3, -0.1, 0.1, 0.3, 0.5, 0.7, 0.9, 1.0)
KNRM_SIGMAS = (0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.001)

PAD = 0


# ------------------------------------------------------------------ similarity matrices
def exact_match_matrix(query_tok, doc_tok):
    """1.0 where non-padding tokens match exactly, else 0 ([B, Q, D])."""
    sim = (query_tok[:, :, None] == doc_tok[:, None, :]).astype(jnp.float32)
    return _mask_padding(sim, query_tok, doc_tok)


def _mask_padding(sim, query_tok, doc_tok):
    sim = jnp.where(query_tok[:, :, None] == PAD, 0.0, sim)
    sim = jnp.where(doc_tok[:, None, :] == PAD, 0.0, sim)
    return sim


def cosine_similarity_matrix(q_emb, d_emb, query_tok, doc_tok, eps=1e-9):
    """Cosine similarity [B, Q, D] with padding masked to 0 (parity: common.py:160-167).

    The norm is clamped BELOW the sqrt (``sqrt(max(sum_sq, eps^2))``) rather than
    added after it: ``jnp.linalg.norm`` has a NaN gradient at an exactly-zero
    vector (d sqrt(u)/du -> inf at u=0, then 0*inf), and the all-zero padding
    embedding row sits in every batch — with trainable embeddings (KNRM
    finetune=True) one step poisons all params. The clamp's gradient is zero
    below eps, matching torch ``cosine_similarity``'s clamp_min semantics that
    the reference relies on.
    """
    q_norm = jnp.sqrt(jnp.maximum(jnp.sum(q_emb * q_emb, axis=2, keepdims=True), eps * eps))
    d_norm = jnp.sqrt(jnp.maximum(jnp.sum(d_emb * d_emb, axis=2, keepdims=True), eps * eps))
    sim = jnp.einsum("bqe,bde->bqd", q_emb, d_emb, preferred_element_type=jnp.float32)
    sim = sim / q_norm / jnp.swapaxes(d_norm, 1, 2)
    return _mask_padding(sim, query_tok, doc_tok)


def similarity_matrix(embedding_matrix, query_tok, doc_tok):
    """Cosine channel on in-vocab ids + exact-match channel on negative OOV ids.

    Parity with SimilarityMatrix.forward (common.py:169-182): padding is 0, OOV
    terms carry negative ids; the two channels are summed.
    """
    exact = exact_match_matrix(jnp.minimum(query_tok, 0), jnp.minimum(doc_tok, 0))
    q_ids = jnp.maximum(query_tok, 0)
    d_ids = jnp.maximum(doc_tok, 0)
    q_emb = jnp.take(embedding_matrix, q_ids, axis=0)
    d_emb = jnp.take(embedding_matrix, d_ids, axis=0)
    cos = cosine_similarity_matrix(q_emb, d_emb, q_ids, d_ids)
    return exact + cos


def stacked_similarity_matrix(query_embeds: Sequence, doc_embeds: Sequence, query_tok, doc_tok):
    """Per-layer cosine simmats stacked on axis 1 -> [B, L, Q, D] (parity: common.py:187-221)."""
    sims = [
        cosine_similarity_matrix(q_emb, d_emb, query_tok, doc_tok)
        for q_emb, d_emb in zip(query_embeds, doc_embeds)
    ]
    return jnp.stack(sims, axis=1)


# ------------------------------------------------------------------ kernel pooling
def rbf_kernel_bank(simmat, mus, sigmas):
    """exp(-0.5 (x - mu)^2 / sigma^2) for each kernel -> [B, K, ...] (parity: common.py:237-250)."""
    x = simmat[:, None]  # [B, 1, ...]
    mus = jnp.reshape(jnp.asarray(mus, dtype=simmat.dtype), (1, -1) + (1,) * (simmat.ndim - 1))
    sigmas = jnp.reshape(jnp.asarray(sigmas, dtype=simmat.dtype), (1, -1) + (1,) * (simmat.ndim - 1))
    adj = x - mus
    return jnp.exp(-0.5 * adj * adj / (sigmas * sigmas))


def knrm_pool(simmat, mus, sigmas, log_scale=True):
    """KNRM soft-TF pooling: kernels -> sum over doc -> (log) -> sum over query.

    Returns [B, K]. Query positions whose simmat row is entirely zero (padding)
    are excluded, matching KNRM_class.forward (KNRM.py:39-53).
    """
    kernels = rbf_kernel_bank(simmat, mus, sigmas)  # [B, K, Q, D]
    result = kernels.sum(axis=3)  # [B, K, Q]
    mask = (simmat.sum(axis=2) != 0.0)[:, None, :]  # [B, 1, Q]
    if log_scale:
        result = jnp.where(mask, jnp.log(result + 1e-6), 0.0)
    else:
        result = jnp.where(mask, result, 0.0)
    return result.sum(axis=2)  # [B, K]


# ------------------------------------------------------------------ losses
def pair_hinge_loss(pos_neg_scores, *args):
    """Margin-1 pairwise hinge (parity: torch MarginRankingLoss use, common.py:101-103)."""
    pos, neg = pos_neg_scores
    return jnp.mean(jax.nn.relu(1.0 - (pos - neg)))


def pair_softmax_loss(pos_neg_scores, *args):
    """1 - P(pos) under a 2-way softmax (parity: common.py:96-98)."""
    scores = jnp.stack(pos_neg_scores, axis=1)
    return jnp.mean(1.0 - jax.nn.softmax(scores, axis=1)[:, 0])


def crossentropy_loss(scores_2way, labels_2way):
    """Categorical CE over [B, 2] scores vs one-hot labels (parity: common.py:79-86)."""
    logprobs = jax.nn.log_softmax(scores_2way, axis=-1)
    return -jnp.mean(jnp.sum(labels_2way * logprobs, axis=-1))


def lce_loss(group_scores, labels=None):
    """Localized contrastive estimation: CE with the positive at index 0 ([B, 1+nneg])."""
    logprobs = jax.nn.log_softmax(group_scores, axis=-1)
    return -jnp.mean(logprobs[:, 0])


def infonce_loss(logits, labels):
    """In-batch-negative contrastive loss (InfoNCE — the DPR/GTR dense-retrieval
    recipe): ``logits`` is a [B, C] similarity matrix whose row i has its
    positive at column ``labels[i]`` and every other column is another
    example's document (plus optional hard negatives); the loss is categorical
    CE against that index. Under the trainer's GSPMD data sharding the matrix
    spans the GLOBAL batch, so cross-device negatives come from the sharded
    matmul itself (XLA inserts the all-gather over ICI)."""
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logprobs, labels[:, None], axis=1))


def margin_mse_loss(pos, neg, teacher_margin):
    """Margin-MSE knowledge distillation (Hofstaetter et al. 2020): the student
    matches the TEACHER's pos-neg score margin instead of a fixed hinge margin.
    The standard recipe for distilling a cross-encoder into a bi-encoder."""
    return jnp.mean(((pos - neg) - teacher_margin) ** 2)


LOSS_FUNCTIONS = {
    "pairwise_hinge_loss": pair_hinge_loss,
    "pair_hinge_loss": pair_hinge_loss,
    "pair_softmax_loss": pair_softmax_loss,
    "crossentropy": crossentropy_loss,
    "lce": lce_loss,
    # margin_mse is special-cased by the trainer: it needs the per-triple
    # teacher margin from the batch (sampler.name=distill provides it)
    "margin_mse": margin_mse_loss,
    # infonce is special-cased by the trainer: it needs embeddings (not pair
    # scores) from a reranker exposing encode() — see jax_trainer compute_loss
    "infonce": infonce_loss,
}
