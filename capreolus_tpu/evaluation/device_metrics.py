"""On-device ranking metrics (jnp): nDCG@k, AP, P@k, recall@k, reciprocal rank.

The north-star design computes evaluation on device so the benchmark loop
(first-stage -> rerank -> eval) never leaves the TPU (BASELINE.json). These are
batched pure functions over [Q, k] gain matrices; ``eval_runs_device`` is a
drop-in for evaluation.eval_runs that stages qrel gains once and evaluates whole
run batches in a single jit call. Semantics match the trec_eval-compatible host
implementation (tested for equality in tests/test_device_metrics.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from capreolus_tpu.evaluation.metrics import rank_run


@functools.partial(jax.jit, static_argnames=("k",))
def dcg_at_k(gains, k):
    """[Q, >=k] gains in rank order -> [Q] DCG@k with log2(rank+1) discounts."""
    ranks = jnp.arange(1, k + 1, dtype=jnp.float32)
    discounts = 1.0 / jnp.log2(ranks + 1.0)
    return (gains[:, :k] * discounts[None, :]).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def ndcg_at_k(gains, ideal_gains, k):
    dcg = dcg_at_k(gains, k)
    idcg = dcg_at_k(ideal_gains, k)
    return jnp.where(idcg > 0, dcg / jnp.maximum(idcg, 1e-9), 0.0)


@jax.jit
def average_precision(rel_flags, num_rel):
    """[Q, D] binary relevance in rank order, [Q] total relevant -> [Q] AP."""
    hits = jnp.cumsum(rel_flags, axis=1)
    ranks = jnp.arange(1, rel_flags.shape[1] + 1, dtype=jnp.float32)
    precisions = hits / ranks[None, :]
    ap = (precisions * rel_flags).sum(axis=1) / jnp.maximum(num_rel, 1.0)
    return jnp.where(num_rel > 0, ap, 0.0)


@functools.partial(jax.jit, static_argnames=("k",))
def precision_at_k(rel_flags, k):
    return rel_flags[:, :k].sum(axis=1) / k


@functools.partial(jax.jit, static_argnames=("k",))
def recall_at_k(rel_flags, num_rel, k):
    return jnp.where(num_rel > 0, rel_flags[:, :k].sum(axis=1) / jnp.maximum(num_rel, 1.0), 0.0)


@functools.partial(jax.jit, static_argnames=("k",))
def reciprocal_rank(rel_flags, k=0):
    """First-relevant reciprocal rank; k > 0 caps the considered depth (MRR@k)."""
    depth = rel_flags.shape[1] if k == 0 else min(k, rel_flags.shape[1])
    flags = rel_flags[:, :depth]
    ranks = jnp.arange(1, depth + 1, dtype=jnp.float32)
    first = jnp.argmax(flags > 0, axis=1)
    found = flags.max(axis=1) > 0
    return jnp.where(found, 1.0 / ranks[first], 0.0)


def eval_runs_device(runs, qrels, metrics, relevance_level=1):
    """Device-evaluated equivalent of evaluation.eval_runs for supported metrics.

    Host work is limited to staging per-query gain vectors (rank order follows
    trec_eval's score-then-reverse-docid sort); all metric math runs on device.
    """
    qids = [q for q in runs if q in qrels
            and any(g >= relevance_level for g in qrels[q].values())]
    if not qids:
        return {m: 0.0 for m in metrics}

    depth = max(max((len(runs[q]) for q in qids), default=1), 1)
    max_judged = max(len(qrels[q]) for q in qids)
    metric_ks = [int(m.rsplit("_", 1)[1]) for m in metrics if "_" in m and m.rsplit("_", 1)[1].isdigit()]
    pad_to = max([depth, max_judged] + metric_ks)

    gains = np.zeros((len(qids), pad_to), dtype=np.float32)
    flags = np.zeros((len(qids), pad_to), dtype=np.float32)
    ideal = np.zeros((len(qids), pad_to), dtype=np.float32)
    num_rel = np.zeros(len(qids), dtype=np.float32)
    for i, qid in enumerate(qids):
        ranked = rank_run(runs[qid])
        for j, docid in enumerate(ranked):
            grade = qrels[qid].get(docid, 0)
            gains[i, j] = max(0, grade)
            flags[i, j] = 1.0 if grade >= relevance_level else 0.0
        judged = sorted((max(0, g) for g in qrels[qid].values()), reverse=True)
        ideal[i, : len(judged)] = judged
        num_rel[i] = sum(1 for g in qrels[qid].values() if g >= relevance_level)

    gains, flags, ideal, num_rel = map(jnp.asarray, (gains, flags, ideal, num_rel))
    out = {}
    for metric in metrics:
        if metric == "map":
            vals = average_precision(flags, num_rel)
        elif metric == "recip_rank":
            vals = reciprocal_rank(flags)
        elif metric == "MRR@10":
            vals = reciprocal_rank(flags, k=10)
        elif metric.startswith("ndcg_cut_"):
            vals = ndcg_at_k(gains, ideal, int(metric.split("_")[2]))
        elif metric.startswith("P_"):
            vals = precision_at_k(flags, int(metric.split("_")[1]))
        elif metric.startswith("recall_"):
            vals = recall_at_k(flags, num_rel, int(metric.split("_")[1]))
        else:
            raise ValueError(f"metric {metric!r} not supported on device")
        out[metric] = float(jnp.mean(vals))
    return out

DEVICE_SUPPORTED = ("map", "recip_rank", "MRR@10")


def device_supported(metrics):
    """Whether every metric in the list can be evaluated on device."""
    import re

    return all(
        m in DEVICE_SUPPORTED or re.match(r"^(ndcg_cut|P|recall)_\d+$", m)
        for m in metrics
    )
