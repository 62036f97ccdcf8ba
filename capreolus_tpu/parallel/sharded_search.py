"""Multi-chip sharded BM25 search.

The new first-class component called for by SURVEY.md §2.3: the reference holds a
single Lucene index; here the postings are partitioned by document range across a
``shard`` mesh axis, each chip scores its own document range, computes a local
top-k, and the per-shard candidate lists are merged with an all_gather over ICI
(BASELINE.json north star).

Implementation: shard_map over the shard axis. Work units target shard-local tiles
(host builds per-shard work-unit arrays, padded to a common length); the merge
gathers [S, Q, k] score/ordinal blocks and re-top-ks on every chip.
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

        # slice each term's postings by doc range into per-shard CSR arrays
        shard_docs = [[] for _ in range(num_shards)]
        shard_tfs = [[] for _ in range(num_shards)]
        shard_offsets = [[0] for _ in range(num_shards)]
        num_terms = index_data.num_terms
        doc_ids = index_data.doc_ids
        tfs = index_data.tfs
        offsets = index_data.term_offsets
        shard_of = doc_ids // docs_per_shard

        for tid in range(num_terms):
            s, e = offsets[tid], offsets[tid + 1]
            term_shards = shard_of[s:e]
            for sh in range(num_shards):
                m = term_shards == sh
                shard_docs[sh].append(doc_ids[s:e][m] - sh * docs_per_shard)
                shard_tfs[sh].append(tfs[s:e][m])
                shard_offsets[sh].append(shard_offsets[sh][-1] + int(m.sum()))

        max_nnz = max(sum(len(a) for a in docs) for docs in shard_docs)
        n_tiles = max(1, -(-max_nnz // TILE))
        padded = n_tiles * TILE

        doc_tiles = np.full((num_shards, padded), docs_per_shard, dtype=np.int32)
        tf_tiles = np.zeros((num_shards, padded), dtype=np.float32)
        for sh in range(num_shards):
            flat_d = np.concatenate(shard_docs[sh]) if shard_docs[sh] else np.zeros(0, np.int32)
            flat_t = np.concatenate(shard_tfs[sh]) if shard_tfs[sh] else np.zeros(0, np.float32)
            doc_tiles[sh, : len(flat_d)] = flat_d
            tf_tiles[sh, : len(flat_t)] = flat_t

        norm_dl = np.zeros((num_shards, docs_per_shard + 1), dtype=np.float32)
        exact_dl = np.zeros((num_shards, docs_per_shard + 1), dtype=np.float32)
        norm_dl[:, -1] = 1.0
        exact_dl[:, -1] = 1.0
        for sh in range(num_shards):
            lo = sh * docs_per_shard
            hi = min(self.num_docs, (sh + 1) * docs_per_shard)
            if hi > lo:
                norm_dl[sh, : hi - lo] = index_data.norm_doclens[lo:hi]
                exact_dl[sh, : hi - lo] = index_data.doclens[lo:hi]

        spec = NamedSharding(mesh, P(axis))
        self.doc_tiles = jax.device_put(doc_tiles.reshape(num_shards, n_tiles, TILE), spec)
        self.tf_tiles = jax.device_put(tf_tiles.reshape(num_shards, n_tiles, TILE), spec)
        self.norm_dl = jax.device_put(norm_dl, spec)
        self.exact_dl = jax.device_put(exact_dl, spec)
        self.term_offsets = np.stack([np.asarray(o, dtype=np.int64) for o in shard_offsets])  # [S, V+1]

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
        """Per-shard (tile_idx, qidx, w1, w2, lo, hi) arrays padded to a common length."""
        w2_source = _W2_SOURCE[model]
        per_shard = []
        for sh in range(self.num_shards):
            offsets = self.term_offsets[sh]
            tiles, qidxs, w1s, w2s, los, his = [], [], [], [], [], []
            for q, terms in enumerate(term_lists):
                for tid, qweight in terms:
                    start, end = int(offsets[tid]), int(offsets[tid + 1])
                    if start == end:
                        continue
                    if model == "bm25":
                        w1, w2 = qweight * self.idf[tid], 0.0
                    else:
                        w1 = qweight
                        if w2_source == "ptc":
                            w2 = max(self.cf[tid], 1.0) / self.total_terms
                        elif w2_source == "df":
                            w2 = max(self.df[tid], 1.0)
                        elif w2_source == "cf":
                            w2 = max(self.cf[tid], 1.0)
                        else:
                            w2 = 0.0
                    for t in range(start // TILE, (end - 1) // TILE + 1):
                        tiles.append(t)
                        qidxs.append(q)
                        w1s.append(w1)
                        w2s.append(w2)
                        los.append(max(0, start - t * TILE))
                        his.append(min(TILE, end - t * TILE))
            per_shard.append((tiles, qidxs, w1s, w2s, los, his))

        u_pad = _bucket(max(max(len(p[0]) for p in per_shard), 1))
        out = np.zeros((self.num_shards, 6, u_pad), dtype=np.float32)
        out[:, 3, :] = 1.0  # w2 pad avoids div-by-zero in masked lanes
        for sh, (tiles, qidxs, w1s, w2s, los, his) in enumerate(per_shard):
            n = len(tiles)
            out[sh, 0, :n] = tiles
            out[sh, 1, :n] = qidxs
            out[sh, 2, :n] = w1s
            out[sh, 3, :n] = w2s
            out[sh, 4, :n] = los
            out[sh, 5, :n] = his
        return out


def sharded_search(sindex: ShardedDeviceIndex, work_units, num_queries: int, topk: int,
                   model: str = "bm25", params: dict = None):
    """shard_map scoring (any model): local scoring + local top-k, then
    allgather-merge over ICI. Returns (scores [Q, topk], global doc ordinals).
    """
    params = dict(params or {})
    mesh, axis = sindex.mesh, sindex.axis
    docs_per_shard = sindex.docs_per_shard
    stats = sindex.stats
    model_fn = SCORING_MODELS[model]
    local_k = min(topk, docs_per_shard)
    dl_table = sindex.norm_dl if model == "bm25" else sindex.exact_dl

    def shard_fn(doc_tiles, tf_tiles, norm_dl, units):
        # leading shard axis of size 1 inside shard_map; drop it
        doc_tiles, tf_tiles, norm_dl, units = doc_tiles[0], tf_tiles[0], norm_dl[0], units[0]
        tile_idx = units[0].astype(jnp.int32)
        qidx = units[1].astype(jnp.int32)
        w1 = units[2]
        w2 = units[3]
        lo = units[4].astype(jnp.int32)
        hi = units[5].astype(jnp.int32)

        docs = jnp.take(doc_tiles, tile_idx, axis=0)
        tfs = jnp.take(tf_tiles, tile_idx, axis=0)
        dl = jnp.take(norm_dl, docs, axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 1)
        mask = (pos >= lo[:, None]) & (pos < hi[:, None])
        s = model_fn(tfs, dl, w1[:, None], w2[:, None], params, stats)
        s = jnp.where(mask, s, 0.0)

        n_rows = docs_per_shard + 1
        lin = qidx[:, None] * n_rows + docs
        acc = jnp.zeros(num_queries * n_rows, dtype=jnp.float32)
        acc = acc.at[lin.reshape(-1)].add(s.reshape(-1), mode="drop")
        scores = acc.reshape(num_queries, n_rows)[:, :docs_per_shard]

        local_scores, local_ords = jax.lax.top_k(scores, local_k)
        shard_id = jax.lax.axis_index(axis)
        global_ords = local_ords + shard_id * docs_per_shard

        # allgather candidate lists over ICI and merge on every chip
        all_scores = jax.lax.all_gather(local_scores, axis)  # [S, Q, local_k]
        all_ords = jax.lax.all_gather(global_ords, axis)
        all_scores = jnp.moveaxis(all_scores, 0, 1).reshape(num_queries, -1)
        all_ords = jnp.moveaxis(all_ords, 0, 1).reshape(num_queries, -1)
        merged_scores, merged_pos = jax.lax.top_k(all_scores, min(topk, all_scores.shape[1]))
        merged_ords = jnp.take_along_axis(all_ords, merged_pos, axis=1)
        return merged_scores[None], merged_ords[None]

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_rep=False,
    )
    scores, ords = jax.jit(fn)(sindex.doc_tiles, sindex.tf_tiles, dl_table, work_units)
    # every shard holds the same merged result; take shard 0's copy
    return np.asarray(scores[0]), np.asarray(ords[0])


def sharded_bm25_topk(sindex: ShardedDeviceIndex, work_units, num_queries: int, topk: int,
                      k1: float = 0.9, b: float = 0.4):
    """BM25 convenience wrapper over sharded_search."""
    return sharded_search(sindex, work_units, num_queries, topk, model="bm25",
                          params={"k1": k1, "b": b})
