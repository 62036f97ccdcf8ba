"""Multi-chip sharded search (any scoring model).

The new first-class component called for by SURVEY.md §2.3: the reference holds a
single Lucene index; here the postings are partitioned by document range across a
``shard`` mesh axis, each chip scores its own document range and computes a local
top-k, and the per-shard candidate lists are merged with an all_gather over ICI
(BASELINE.json north star).

Round 2 rework (VERDICT #5): the per-shard kernel now uses the same
accumulator-free sort design as the single-chip tiered engine
(searcher/scoring.py, PERF.md round 2) instead of a dense [Q, docs_per_shard]
accumulator — each query's shard-local postings tiles are padded to a uniform
unit width so candidate rows are reshapes; duplicate-doc runs are merged with
log2(R) masked shifts after a doc sort; ranking sorts by (score desc, doc asc).
Work-unit building is vectorized numpy (the round-1 per-term python loop is
gone), and shard_map comes from jax.shard_map (the jax.experimental import is
deprecated).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from capreolus_tpu.searcher.scoring import SCORING_MODELS, TILE, _W2_SOURCE, _bucket
from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)


class ShardedDeviceIndex:
    """Document-partitioned postings, one contiguous doc range per shard.

    All shards are padded to identical tile counts / row counts so the arrays
    stack into leading-shard-axis arrays that shard cleanly over the mesh.
    """

    def __init__(self, index_data, mesh: Mesh, axis: str = "shard"):
        self.mesh = mesh
        self.axis = axis
        num_shards = mesh.shape[axis]
        self.num_shards = num_shards
        self.num_docs = index_data.num_docs
        self.avgdl = float(index_data.avgdl)

        docs_per_shard = -(-self.num_docs // num_shards)
        self.docs_per_shard = docs_per_shard

        # vectorized doc-range split: postings are doc-sorted within impact class,
        # not globally, so partition by boolean masks per shard (one pass each)
        doc_ids = index_data.doc_ids
        tfs = index_data.tfs
        offsets = index_data.term_offsets
        num_terms = index_data.num_terms
        shard_of = doc_ids // docs_per_shard
        term_of = np.repeat(np.arange(num_terms, dtype=np.int64), np.diff(offsets))

        shard_docs, shard_tfs, shard_offsets = [], [], []
        for sh in range(num_shards):
            m = shard_of == sh
            shard_docs.append((doc_ids[m] - sh * docs_per_shard).astype(np.int32))
            shard_tfs.append(tfs[m].astype(np.float32))
            counts = np.bincount(term_of[m], minlength=num_terms)
            off = np.zeros(num_terms + 1, dtype=np.int64)
            np.cumsum(counts, out=off[1:])
            shard_offsets.append(off)

        max_nnz = max(len(d) for d in shard_docs)
        n_tiles = max(1, -(-max_nnz // TILE))
        padded = n_tiles * TILE

        doc_tiles = np.full((num_shards, padded), docs_per_shard, dtype=np.int32)
        tf_tiles = np.zeros((num_shards, padded), dtype=np.float32)
        # posting-aligned doc lengths (same trick as DeviceIndex)
        norm_dl_tiles = np.ones((num_shards, padded), dtype=np.float32)
        exact_dl_tiles = np.ones((num_shards, padded), dtype=np.float32)
        for sh in range(num_shards):
            n = len(shard_docs[sh])
            doc_tiles[sh, :n] = shard_docs[sh]
            tf_tiles[sh, :n] = shard_tfs[sh]
            lo = sh * docs_per_shard
            hi = min(self.num_docs, (sh + 1) * docs_per_shard)
            ndl = np.append(index_data.norm_doclens[lo:hi].astype(np.float32),
                            np.ones(docs_per_shard - (hi - lo) + 1, np.float32))
            edl = np.append(index_data.doclens[lo:hi].astype(np.float32),
                            np.ones(docs_per_shard - (hi - lo) + 1, np.float32))
            norm_dl_tiles[sh, :n] = ndl[shard_docs[sh]]
            exact_dl_tiles[sh, :n] = edl[shard_docs[sh]]

        spec = NamedSharding(mesh, P(axis))
        self.doc_tiles = jax.device_put(doc_tiles.reshape(num_shards, n_tiles, TILE), spec)
        self.tf_tiles = jax.device_put(tf_tiles.reshape(num_shards, n_tiles, TILE), spec)
        self.norm_dl_tiles = jax.device_put(norm_dl_tiles.reshape(num_shards, n_tiles, TILE), spec)
        self.exact_dl_tiles = jax.device_put(exact_dl_tiles.reshape(num_shards, n_tiles, TILE), spec)
        self.term_offsets = np.stack(shard_offsets)  # [S, V+1], host-side

        n = float(self.num_docs)
        df = index_data.df_array.astype(np.float64)
        self.df = df
        self.cf = index_data.cf_array.astype(np.float64)
        self.total_terms = float(index_data.total_term_count)
        with np.errstate(divide="ignore"):
            self.idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        self.stats = {"avgdl": self.avgdl, "num_docs": n, "total_terms": self.total_terms}

    # ------------------------------------------------------------------ host work units
    def build_work_units(self, term_lists: Sequence[Sequence[Tuple[int, float]]], model: str = "bm25"):
        """Vectorized per-shard unit building in the uniform row layout.

        Every query gets ``uw`` unit slots per shard (uw = max units over all
        (shard, query) pairs, bucketed), so per-query candidate rows on device
        are pure reshapes. Returns ([S, 5, nq*uw] packed int32, uw, r_max).
        """
        w2_source = _W2_SOURCE[model]
        nq = len(term_lists)
        r_max = _bucket(max((len(t) for t in term_lists), default=1), minimum=4)

        tids = np.fromiter((t for terms in term_lists for t, _ in terms), dtype=np.int64)
        qw = np.fromiter((w for terms in term_lists for _, w in terms), dtype=np.float64)
        qix = np.fromiter((q for q, terms in enumerate(term_lists) for _ in terms),
                          dtype=np.int32, count=len(tids))
        if model == "bm25":
            w1_all = (qw * self.idf[tids]).astype(np.float32)
            w2_all = np.zeros(len(tids), dtype=np.float32)
        else:
            w1_all = qw.astype(np.float32)
            if w2_source == "ptc":
                w2_all = (np.maximum(self.cf[tids], 1.0) / self.total_terms).astype(np.float32)
            elif w2_source == "df":
                w2_all = np.maximum(self.df[tids], 1.0).astype(np.float32)
            elif w2_source == "cf":
                w2_all = np.maximum(self.cf[tids], 1.0).astype(np.float32)
            else:
                w2_all = np.zeros(len(tids), dtype=np.float32)

        per_shard = []
        uw = 1
        for sh in range(self.num_shards):
            offsets = self.term_offsets[sh]
            starts = offsets[tids]
            ends = offsets[tids + 1]
            keep = ends > starts
            s_tids, s_qix, s_w1, s_w2 = tids[keep], qix[keep], w1_all[keep], w2_all[keep]
            s_starts, s_ends = starts[keep], ends[keep]
            t0 = s_starts // TILE
            t1 = (s_ends - 1) // TILE if len(s_ends) else t0
            counts = (t1 - t0 + 1).astype(np.int64)
            total = int(counts.sum())
            group_start = np.cumsum(counts) - counts
            within = np.arange(total, dtype=np.int64) - np.repeat(group_start, counts)
            tile = (np.repeat(t0, counts) + within).astype(np.int64)
            rs, re = np.repeat(s_starts, counts), np.repeat(s_ends, counts)
            lo = np.maximum(0, rs - tile * TILE).astype(np.int32)
            hi = np.minimum(TILE, re - tile * TILE).astype(np.int32)
            uq = np.repeat(s_qix, counts)
            units_per_q = np.bincount(uq, minlength=nq)
            uw = max(uw, int(units_per_q.max()) if nq else 1)
            slot_in_q = np.arange(total, dtype=np.int64) - np.searchsorted(uq, uq)
            per_shard.append((tile, uq, np.repeat(s_w1, counts), np.repeat(s_w2, counts),
                              lo, hi, slot_in_q))

        uw = _bucket(uw, minimum=4)
        packed = np.zeros((self.num_shards, 5, nq * uw), dtype=np.int32)
        for sh, (tile, uq, w1, w2, lo, hi, slot_in_q) in enumerate(per_shard):
            dest = uq.astype(np.int64) * uw + slot_in_q
            packed[sh, 0, dest] = tile
            packed[sh, 1, dest] = w1.view(np.int32)
            packed[sh, 2, dest] = w2.view(np.int32)
            packed[sh, 3, dest] = lo
            packed[sh, 4, dest] = hi  # pad units keep hi = 0 -> fully masked
        return packed, uw, r_max


def sharded_search(sindex: ShardedDeviceIndex, work_units, num_queries: int, topk: int,
                   model: str = "bm25", params: dict = None, materialize: bool = True):
    """shard_map scoring (any model): local sort-based top-k per shard, then
    allgather-merge over ICI. Returns (scores [Q, topk], global doc ordinals) —
    numpy when ``materialize`` (blocking), device arrays otherwise so a
    pipelining caller (serving search_async) can dispatch the next batch while
    this one's results cross the link.
    """
    params = {k: jnp.asarray(v, jnp.float32) for k, v in dict(params or {}).items()}
    packed, uw, r_max = work_units
    mesh, axis = sindex.mesh, sindex.axis
    docs_per_shard = sindex.docs_per_shard
    stats = sindex.stats
    model_fn = SCORING_MODELS[model]
    local_k = min(topk, docs_per_shard, uw * TILE)
    width = uw * TILE
    dl_tiles_all = sindex.norm_dl_tiles if model == "bm25" else sindex.exact_dl_tiles

    def shard_fn(doc_tiles, tf_tiles, dl_tiles, units):
        # leading shard axis of size 1 inside shard_map; drop it
        doc_tiles, tf_tiles, dl_tiles, units = doc_tiles[0], tf_tiles[0], dl_tiles[0], units[0]
        tile_idx = units[0]
        w1 = jax.lax.bitcast_convert_type(units[1], jnp.float32)
        w2 = jax.lax.bitcast_convert_type(units[2], jnp.float32)
        lo, hi = units[3], units[4]

        docs = jnp.take(doc_tiles, tile_idx, axis=0)
        tfs = jnp.take(tf_tiles, tile_idx, axis=0)
        dl = jnp.take(dl_tiles, tile_idx, axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 1)
        mask = (pos >= lo[:, None]) & (pos < hi[:, None])
        s = model_fn(tfs, dl, w1[:, None], w2[:, None], params, stats)
        s = jnp.where(mask, s, -1.0)
        docs = jnp.where(mask, docs, docs_per_shard)

        # accumulator-free dedup: doc sort + masked shift merge (scoring.py design)
        docv, vals = jax.lax.sort((docs.reshape(num_queries, width),
                                   s.reshape(num_queries, width)), num_keys=1)
        merged = vals
        shift = 1
        while shift < r_max:
            same = jnp.concatenate(
                [docv[:, shift:] == docv[:, :-shift],
                 jnp.zeros((num_queries, shift), bool)], axis=1)
            shifted = jnp.concatenate(
                [merged[:, shift:], jnp.zeros((num_queries, shift), merged.dtype)], axis=1)
            merged = merged + jnp.where(same, shifted, 0.0)
            shift *= 2
        first = jnp.concatenate(
            [jnp.ones((num_queries, 1), bool), docv[:, 1:] != docv[:, :-1]], axis=1)
        merged = jnp.where(first & (merged > 0), merged, -1.0)
        _, docv, merged = jax.lax.sort((-merged, docv, merged), num_keys=2)
        local_scores = merged[:, :local_k]
        local_ords = docv[:, :local_k]

        shard_id = jax.lax.axis_index(axis)
        global_ords = jnp.where(local_scores > 0,
                                local_ords + shard_id * docs_per_shard,
                                sindex.num_docs)

        # allgather candidate lists over ICI and merge on every chip
        all_scores = jax.lax.all_gather(local_scores, axis)  # [S, Q, local_k]
        all_ords = jax.lax.all_gather(global_ords, axis)
        all_scores = jnp.moveaxis(all_scores, 0, 1).reshape(num_queries, -1)
        all_ords = jnp.moveaxis(all_ords, 0, 1).reshape(num_queries, -1)
        k = min(topk, all_scores.shape[1])
        # merge with the same (score desc, doc asc) tie-break as the local sorts
        m_neg, m_ords, m_scores = jax.lax.sort(
            (-all_scores, all_ords, all_scores), num_keys=2)
        return m_scores[:, :k][None], m_ords[:, :k][None]

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    units_sharded = jax.device_put(packed, NamedSharding(mesh, P(axis)))
    scores, ords = jax.jit(fn)(sindex.doc_tiles, sindex.tf_tiles, dl_tiles_all, units_sharded)
    # every shard holds the same merged result; take shard 0's copy
    if not materialize:
        return scores[0], ords[0]
    return np.asarray(scores[0]), np.asarray(ords[0])


def sharded_bm25_topk(sindex: ShardedDeviceIndex, work_units, num_queries: int, topk: int,
                      k1: float = 0.9, b: float = 0.4):
    """BM25 convenience wrapper over sharded_search."""
    return sharded_search(sindex, work_units, num_queries, topk, model="bm25",
                          params={"k1": k1, "b": b})
