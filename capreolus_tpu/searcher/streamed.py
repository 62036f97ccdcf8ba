"""Shared running-top-k merge for host-streaming corpora (dense + ColBERT).

One implementation of the fixed-shape upload loop and the running on-device
top-k merge, so the pad-safety invariant — out-of-range rows masked to -inf
BEFORE the local top-k — exists in exactly one place. A zero-pad row scores 0,
which beats real negative cosines; masking only after selection silently
evicts real docs from a partial final chunk (round-3 review finding, regression
tests test_dense_streamed_pad_rows_never_win / the colbert streaming equality
test). Used by searcher/dense.py and searcher/late_interaction.py; the sparse
engine's analogue is scoring.py _stream_working_set.
"""

from __future__ import annotations

import numpy as np


def streamed_topk(make_chunk, score_chunk, n, upload, hits, local_select=None):
    """Build a ``topk(q_emb, *ignored) -> ([Q, hits] f32 scores, [Q, hits] i32
    global ordinals)`` over a host-resident corpus of ``n`` rows.

    ``make_chunk(start)`` uploads rows [start, start+upload) as a device pytree
    padded to the fixed shape (one compiled executable for every chunk);
    ``score_chunk(q_emb, chunk)`` returns [Q, upload] scores;
    ``local_select(scores, k)`` optionally overrides the per-chunk top-k
    (e.g. approx_max_k). Async dispatch pipelines the upload of chunk i+1
    under the scoring of chunk i.
    """
    import jax
    import jax.numpy as jnp

    local_k = min(hits, upload)
    if local_select is None:
        local_select = lambda s, k: jax.lax.top_k(s, k)

    @jax.jit
    def merge_step(q_emb, chunk, base, run_s, run_o):
        scores = score_chunk(q_emb, chunk).astype(jnp.float32)
        # THE pad invariant: mask out-of-range rows before selection
        cols = jnp.arange(scores.shape[1])[None, :]
        scores = jnp.where(cols + base < n, scores, -jnp.inf)
        s, o = local_select(scores, local_k)
        o = o + base
        cs = jnp.concatenate([run_s, s], axis=1)
        co = jnp.concatenate([run_o, o], axis=1)
        ms, idx = jax.lax.top_k(cs, hits)
        return ms, jnp.take_along_axis(co, idx, axis=1)

    def topk(q_emb, *_ignored):
        nq = q_emb.shape[0]
        run_s = jnp.full((nq, hits), -jnp.inf, jnp.float32)
        run_o = jnp.zeros((nq, hits), jnp.int32)
        for start in range(0, n, upload):
            run_s, run_o = merge_step(q_emb, make_chunk(start), np.int32(start), run_s, run_o)
        return run_s, run_o

    return topk


def pad_rows(arr, rows, fill=0):
    """Pad a leading-axis slice up to ``rows`` with ``fill`` (fixed shapes)."""
    if arr.shape[0] >= rows:
        return arr
    pad = np.full((rows - arr.shape[0], *arr.shape[1:]), fill, arr.dtype)
    return np.concatenate([arr, pad])
