"""TPU-resident batched scoring engine over the inverted index.

Design (TPU-first, replacing Anserini's Lucene SearchCollection subprocess,
/root/reference/capreolus/searcher/anserini.py:26-83):

The CSR postings arrays (doc ids + term freqs) are reshaped into fixed-size tiles
``[n_tiles, TILE]`` and placed in HBM once. A term's postings span a contiguous tile
range; edge tiles are handled with on-device masks, so storage has zero padding waste.
A query batch is flattened host-side into "work units" — one (query, tile) pair each,
carrying the per-term weights and the valid [lo, hi) range — so the transfer per batch
is a few small int/float vectors, not postings. On device:

    gather tiles -> elementwise scoring model (VPU) -> flat scatter-add into
    per-query accumulators -> top-k

All scoring models (BM25, QL-Dirichlet, QL-JM, DFR INL2, SPL, F2Exp, F2Log) share
this engine and differ only in the elementwise formula, so parameter grid search
vmaps over the parameter axis while sharing the gathers.

Lucene parity notes: BM25 uses the quantized doc length (see index/smallfloat.py) and
the Lucene 8+ formula without the (k1+1) numerator; ties are broken by ascending
internal doc ordinal, matching Lucene's docid tie-break.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)

TILE = 512


# --------------------------------------------------------------------- scoring models
# Each model maps elementwise (tf, dl, w1, w2, params) -> score contribution.
# w1/w2 are per-term scalars baked host-side (idf, qtf, collection probability, df...).


def _bm25(tf, dl, w1, w2, params, stats):
    # w1 = qtf * idf;  Lucene 8+ BM25: idf * tf / (tf + k1*(1 - b + b*dl/avgdl)).
    # tf/dl may arrive as (exactly-representable) bf16 payloads; compute in f32.
    tf = tf.astype(jnp.float32)
    dl = dl.astype(jnp.float32)
    k1, b = params["k1"], params["b"]
    denom = tf + k1 * (1.0 - b + b * dl / stats["avgdl"])
    return w1 * tf / denom


def _qld(tf, dl, w1, w2, params, stats):
    # w1 = qtf, w2 = P(t|C);  Lucene LMDirichletSimilarity with per-term floor at 0
    tf = tf.astype(jnp.float32)
    dl = dl.astype(jnp.float32)
    mu = params["mu"]
    score = jnp.log1p(tf / (mu * w2)) + jnp.log(mu / (dl + mu))
    return w1 * jnp.maximum(score, 0.0)


def _qljm(tf, dl, w1, w2, params, stats):
    # w1 = qtf, w2 = P(t|C);  Lucene LMJelinekMercerSimilarity
    tf = tf.astype(jnp.float32)
    dl = dl.astype(jnp.float32)
    lam = params["lam"]
    dl = jnp.maximum(dl, 1.0)
    return w1 * jnp.log1p(((1.0 - lam) / lam) * (tf / dl) / w2)


def _inl2(tf, dl, w1, w2, params, stats):
    # DFR I(n)L2: tfn = tf * log2(1 + c*avgdl/dl); w1 = qtf, w2 = df
    tf = tf.astype(jnp.float32)
    dl = dl.astype(jnp.float32)
    c = params["c"]
    dl = jnp.maximum(dl, 1.0)
    tfn = tf * (jnp.log1p(c * stats["avgdl"] / dl) / jnp.log(2.0))
    info = jnp.log((stats["num_docs"] + 1.0) / (w2 + 0.5)) / jnp.log(2.0)
    return w1 * (1.0 / (tfn + 1.0)) * tfn * info


def _spl(tf, dl, w1, w2, params, stats):
    # SPL (smoothed power law, Clinchant & Gaussier): w1 = qtf, w2 = cf (collection tf)
    tf = tf.astype(jnp.float32)
    dl = dl.astype(jnp.float32)
    c = params["c"]
    dl = jnp.maximum(dl, 1.0)
    tfn = tf * jnp.log1p(c * stats["avgdl"] / dl) / jnp.log(2.0)
    lam = w2 / stats["num_docs"]
    lam = jnp.clip(lam, 1e-9, 1.0 - 1e-9)
    score = -jnp.log((jnp.power(lam, tfn / (tfn + 1.0)) - lam) / (1.0 - lam) + 1e-30)
    return w1 * jnp.where(tf > 0, jnp.maximum(score, 0.0), 0.0)


def _f2exp(tf, dl, w1, w2, params, stats):
    # axiomatic F2EXP: w1 = qtf, w2 = df
    tf = tf.astype(jnp.float32)
    dl = dl.astype(jnp.float32)
    s = params["s"]
    tfs = tf / (tf + s + s * dl / stats["avgdl"])
    return w1 * tfs * jnp.power((stats["num_docs"] + 1.0) / w2, params.get("k", 0.35))


def _f2log(tf, dl, w1, w2, params, stats):
    # axiomatic F2LOG: w1 = qtf, w2 = df
    tf = tf.astype(jnp.float32)
    dl = dl.astype(jnp.float32)
    s = params["s"]
    tfs = tf / (tf + s + s * dl / stats["avgdl"])
    return w1 * tfs * jnp.log((stats["num_docs"] + 1.0) / w2)


SCORING_MODELS = {
    "bm25": _bm25,
    "qld": _qld,
    "qljm": _qljm,
    "inl2": _inl2,
    "spl": _spl,
    "f2exp": _f2exp,
    "f2log": _f2log,
}

# which statistic feeds the w2 channel for each model
_W2_SOURCE = {
    "bm25": "none",
    "qld": "ptc",
    "qljm": "ptc",
    "inl2": "df",
    "spl": "cf",
    "f2exp": "df",
    "f2log": "df",
}


def unpack_doc_ords(packed: np.ndarray) -> np.ndarray:
    """Inverse of the device-side 3-byte ordinal packing ([..., 3] uint8 -> int32)."""
    packed = packed.astype(np.int32)
    return packed[..., 0] | (packed[..., 1] << 8) | (packed[..., 2] << 16)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bucket(n: int, minimum: int = 64) -> int:
    """Round n up to the next power of two (bounded below) to limit recompilation."""
    size = minimum
    while size < n:
        size *= 2
    return size


class DeviceIndex:
    """HBM-resident tiled postings + statistics tables."""

    def __init__(self, index_data, device=None):
        self.host = index_data
        nnz = len(index_data.doc_ids)
        n_tiles = max(1, (nnz + TILE - 1) // TILE)
        padded = n_tiles * TILE

        doc_ids = np.full(padded, index_data.num_docs, dtype=np.int32)
        doc_ids[:nnz] = index_data.doc_ids
        tfs = np.zeros(padded, dtype=np.float32)
        tfs[:nnz] = index_data.tfs

        put = functools.partial(jax.device_put, device=device)
        self.doc_tiles = put(doc_ids.reshape(n_tiles, TILE))

        # bf16 posting payloads where exact: SmallFloat-quantized doc lengths keep
        # <= 4 significant bits (always bf16-exact); term freqs are bf16-exact up
        # to 256 (guarded per index). Halves the hot-path gather bandwidth.
        def compact_f(arr):
            if arr.max() <= 256 or (arr == arr.astype(np.float32).astype(jnp.bfloat16).astype(np.float32)).all():
                return jnp.asarray(arr, dtype=jnp.bfloat16)
            return jnp.asarray(arr, dtype=jnp.float32)

        self.tf_tiles = put(compact_f(tfs.reshape(n_tiles, TILE)))
        # posting-aligned doc lengths: avoids a 1-element-per-posting random gather
        # on the hot path (one extra value per posting in HBM)
        norm_dl_table = np.append(index_data.norm_doclens.astype(np.float32), 1.0)
        exact_dl_table = np.append(index_data.doclens.astype(np.float32), 1.0)
        self.norm_dl_tiles = put(compact_f(norm_dl_table[doc_ids].reshape(n_tiles, TILE)))
        self.exact_dl_tiles = put(exact_dl_table[doc_ids].reshape(n_tiles, TILE).astype(np.float32))
        self.norm_dl = put(norm_dl_table)
        self.exact_dl = put(exact_dl_table)

        self.num_docs = index_data.num_docs
        self.num_terms = index_data.num_terms
        self.avgdl = float(index_data.avgdl)
        self.total_terms = float(index_data.total_term_count)
        self.term_offsets = index_data.term_offsets  # host-side for work-unit building
        self.df = index_data.df_array.astype(np.float64)
        self.cf = index_data.cf_array.astype(np.float64)
        # Lucene BM25 idf
        n = float(self.num_docs)
        with np.errstate(divide="ignore"):
            self.idf = np.log(1.0 + (n - self.df + 0.5) / (self.df + 0.5))
        self.stats = {"avgdl": self.avgdl, "num_docs": float(self.num_docs), "total_terms": self.total_terms}


class ScoringEngine:
    """Batched multi-model scoring with fused top-k over a DeviceIndex."""

    def __init__(self, device_index: DeviceIndex):
        self.dindex = device_index

    def _check_accumulator_bounds(self, num_queries: int):
        # the flat accumulator index qidx * (num_docs+1) + doc is int32 on device;
        # fail loudly instead of silently wrapping on oversized corpora
        if num_queries * (self.dindex.num_docs + 1) >= 2**31:
            raise ValueError(
                f"query batch of {num_queries} over {self.dindex.num_docs} docs overflows the "
                f"int32 flat accumulator (need num_queries*(num_docs+1) < 2^31); "
                f"use smaller batches or shard the index (searcher.shards)"
            )

    # ------------------------------------------------------------- work-unit building
    def _build_work_units(self, term_lists: Sequence[Sequence[Tuple[int, float]]], model: str):
        """Flatten a batch of queries into per-(query, tile) work units (vectorized).

        term_lists[q] = [(term_id, query_weight), ...]
        Returns numpy arrays (tile_idx, qidx, w1, w2, lo, hi) and the unit count.
        """
        d = self.dindex
        w2_source = _W2_SOURCE[model]

        # flatten (query, term) pairs
        tids = np.fromiter((t for terms in term_lists for t, _ in terms), dtype=np.int64)
        qw = np.fromiter((w for terms in term_lists for _, w in terms), dtype=np.float64)
        qix = np.fromiter(
            (q for q, terms in enumerate(term_lists) for _ in terms), dtype=np.int32, count=len(tids)
        )
        empty = (np.zeros(0, np.int32),) * 2 + (np.zeros(0, np.float32),) * 2 + (np.zeros(0, np.int32),) * 2
        if len(tids) == 0:
            return (*empty, 0)

        starts = d.term_offsets[tids]
        ends = d.term_offsets[tids + 1]
        nonempty = ends > starts
        tids, qw, qix, starts, ends = tids[nonempty], qw[nonempty], qix[nonempty], starts[nonempty], ends[nonempty]
        if len(tids) == 0:
            return (*empty, 0)

        if model == "bm25":
            w1 = (qw * d.idf[tids]).astype(np.float32)
            w2 = np.zeros(len(tids), dtype=np.float32)
        else:
            w1 = qw.astype(np.float32)
            if w2_source == "ptc":
                w2 = (np.maximum(d.cf[tids], 1.0) / d.total_terms).astype(np.float32)
            elif w2_source == "df":
                w2 = np.maximum(d.df[tids], 1.0).astype(np.float32)
            elif w2_source == "cf":
                w2 = np.maximum(d.cf[tids], 1.0).astype(np.float32)
            else:
                w2 = np.zeros(len(tids), dtype=np.float32)

        # expand each (query, term) into its covered tile range
        t0 = starts // TILE
        t1 = (ends - 1) // TILE
        counts = (t1 - t0 + 1).astype(np.int64)
        total = int(counts.sum())
        group_start = np.cumsum(counts) - counts
        within = np.arange(total, dtype=np.int64) - np.repeat(group_start, counts)
        tile = (np.repeat(t0, counts) + within).astype(np.int64)
        rs = np.repeat(starts, counts)
        re = np.repeat(ends, counts)
        lo = np.maximum(0, rs - tile * TILE).astype(np.int32)
        hi = np.minimum(TILE, re - tile * TILE).astype(np.int32)
        return (
            tile.astype(np.int32),
            np.repeat(qix, counts),
            np.repeat(w1, counts),
            np.repeat(w2, counts),
            lo,
            hi,
            total,
        )

    # ------------------------------------------------------------------ device kernels
    @functools.partial(jax.jit,
                       static_argnames=("self", "model", "num_queries", "topk", "param_axes", "exact",
                                        "cand_pad", "max_dup", "score_dtype", "pack_ords"))
    def _score_and_topk(self, model, num_queries, topk, param_axes, exact, cand_pad, max_dup,
                        score_dtype, pack_ords, packed_units, params):
        """Returns (scores [*param_axes, Q, topk], doc_ords [*param_axes, Q, topk]).

        Two top-k strategies:
          exact: dense [Q, N] accumulator + lax.top_k (small corpora / parity tests)
          compact: the dense accumulator holds the summed scores, but top-k runs
            over the per-query *candidate* layout [Q, cand_pad] (each work unit owns
            a TILE-wide column block) — orders of magnitude fewer elements than N.
            Duplicate (query, doc) candidates from multi-term matches are resolved
            on device with a scatter-max ownership pass. Scores are exact; only the
            order of exact score TIES can differ from the dense path (candidate
            position vs doc ordinal) — trec_eval re-sorts ties anyway.

        Work units arrive packed as one [7, U] int32 array (floats bitcast) so a
        batch costs a single host->device transfer instead of seven round-trips.
        """
        tile_idx = packed_units[0]
        qidx = packed_units[1]
        w1 = jax.lax.bitcast_convert_type(packed_units[2], jnp.float32)
        w2 = jax.lax.bitcast_convert_type(packed_units[3], jnp.float32)
        lo = packed_units[4]
        hi = packed_units[5]
        dest_base = packed_units[6]
        d = self.dindex
        n_rows = d.num_docs + 1  # +1 sentinel slot for padding docids

        docs = jnp.take(d.doc_tiles, tile_idx, axis=0)  # [U, TILE]
        tfs = jnp.take(d.tf_tiles, tile_idx, axis=0)  # [U, TILE]
        dl = jnp.take(d.norm_dl_tiles if model == "bm25" else d.exact_dl_tiles, tile_idx, axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 1)
        mask = (pos >= lo[:, None]) & (pos < hi[:, None])
        lin = qidx[:, None] * n_rows + docs  # flat accumulator index [U, TILE]
        model_fn = SCORING_MODELS[model]

        if not exact:
            cand_lin = dest_base[:, None] + pos  # [U, TILE] unique candidate slots
            # ownership: the highest cand_lin among duplicates of a (q, doc) wins
            owner = jnp.zeros(num_queries * n_rows, dtype=jnp.int32)
            owner = owner.at[lin.reshape(-1)].max(
                jnp.where(mask, cand_lin + 1, 0).reshape(-1), mode="drop"
            )

        def score_with(p):
            s = model_fn(tfs, dl, w1[:, None], w2[:, None], p, d.stats)
            s = jnp.where(mask, s, 0.0)
            acc = jnp.zeros(num_queries * n_rows, dtype=jnp.float32)
            acc = acc.at[lin.reshape(-1)].add(s.reshape(-1), mode="drop")
            if exact:
                scores = acc.reshape(num_queries, n_rows)[:, : d.num_docs]
                return jax.lax.top_k(scores, topk)

            summed = jnp.take(acc, lin.reshape(-1), axis=0).reshape(lin.shape)  # [U, TILE]
            keep = mask & (jnp.take(owner, lin.reshape(-1), axis=0).reshape(lin.shape) == cand_lin + 1)
            vals = jnp.where(keep, summed, -1.0)

            cand = jnp.full(num_queries * cand_pad, -1.0, dtype=jnp.float32)
            cand = cand.at[cand_lin.reshape(-1)].set(vals.reshape(-1), mode="drop", unique_indices=True)
            cand_docs = jnp.full(num_queries * cand_pad, d.num_docs, dtype=jnp.int32)
            cand_docs = cand_docs.at[cand_lin.reshape(-1)].set(docs.reshape(-1), mode="drop", unique_indices=True)

            cand = cand.reshape(num_queries, cand_pad)
            cand_docs = cand_docs.reshape(num_queries, cand_pad)
            k = min(topk, cand_pad)
            top_scores, top_pos = jax.lax.top_k(cand, k)
            top_docs = jnp.take_along_axis(cand_docs, top_pos, axis=1)
            if k < topk:  # pad out to the requested depth
                pad_n = topk - k
                top_scores = jnp.concatenate([top_scores, jnp.full((num_queries, pad_n), -1.0)], axis=1)
                top_docs = jnp.concatenate(
                    [top_docs, jnp.full((num_queries, pad_n), d.num_docs, dtype=jnp.int32)], axis=1)
            # narrower result dtype halves the device->host result transfer (useful
            # on tunneled devices); ranking order is decided on device beforehand
            if pack_ords:
                # 3-byte doc ordinals (num_docs < 2^24): 25% fewer ord bytes
                top_docs = jnp.stack([
                    (top_docs & 0xFF).astype(jnp.uint8),
                    ((top_docs >> 8) & 0xFF).astype(jnp.uint8),
                    ((top_docs >> 16) & 0xFF).astype(jnp.uint8),
                ], axis=-1)
            return top_scores.astype(jnp.dtype(score_dtype)), top_docs

        # vmap over each grid-searched parameter axis (shared gathers);
        # build inside-out so the first sorted param becomes the outermost result axis
        fn = score_with
        for axis_name in reversed(param_axes):
            inner = fn

            def fn(p, _inner=inner, _axis=axis_name):
                return jax.vmap(lambda v: _inner({**p, _axis: v}))(p[_axis])

        return fn(params)

    @functools.partial(jax.jit,
                       static_argnames=("self", "model", "num_queries", "topk", "cand_pad", "score_dtype"))
    def _score_many(self, model, num_queries, topk, cand_pad, score_dtype, stacked_units, params):
        """lax.scan over S stacked work-unit batches in ONE executable: amortizes
        per-launch latency and coalesces result transfers (see PERF.md). Compact
        top-k only; same math as _score_and_topk's non-exact branch."""
        d = self.dindex
        n_rows = d.num_docs + 1
        model_fn = SCORING_MODELS[model]
        k = min(topk, cand_pad)

        def step(_, packed_units):
            tile_idx = packed_units[0]
            qidx = packed_units[1]
            w1 = jax.lax.bitcast_convert_type(packed_units[2], jnp.float32)
            w2 = jax.lax.bitcast_convert_type(packed_units[3], jnp.float32)
            lo = packed_units[4]
            hi = packed_units[5]
            dest_base = packed_units[6]

            docs = jnp.take(d.doc_tiles, tile_idx, axis=0)
            tfs = jnp.take(d.tf_tiles, tile_idx, axis=0)
            dl = jnp.take(d.norm_dl_tiles if model == "bm25" else d.exact_dl_tiles, tile_idx, axis=0)
            pos = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 1)
            mask = (pos >= lo[:, None]) & (pos < hi[:, None])
            lin = qidx[:, None] * n_rows + docs
            cand_lin = dest_base[:, None] + pos

            owner = jnp.zeros(num_queries * n_rows, dtype=jnp.int32)
            owner = owner.at[lin.reshape(-1)].max(
                jnp.where(mask, cand_lin + 1, 0).reshape(-1), mode="drop")
            s = model_fn(tfs, dl, w1[:, None], w2[:, None], params, d.stats)
            s = jnp.where(mask, s, 0.0)
            acc = jnp.zeros(num_queries * n_rows, dtype=jnp.float32)
            acc = acc.at[lin.reshape(-1)].add(s.reshape(-1), mode="drop")
            summed = jnp.take(acc, lin.reshape(-1), axis=0).reshape(lin.shape)
            keep = mask & (jnp.take(owner, lin.reshape(-1), axis=0).reshape(lin.shape) == cand_lin + 1)
            vals = jnp.where(keep, summed, -1.0)

            cand = jnp.full(num_queries * cand_pad, -1.0, dtype=jnp.float32)
            cand = cand.at[cand_lin.reshape(-1)].set(vals.reshape(-1), mode="drop", unique_indices=True)
            cand_docs = jnp.full(num_queries * cand_pad, d.num_docs, dtype=jnp.int32)
            cand_docs = cand_docs.at[cand_lin.reshape(-1)].set(docs.reshape(-1), mode="drop", unique_indices=True)
            top_scores, top_pos = jax.lax.top_k(cand.reshape(num_queries, cand_pad), k)
            top_docs = jnp.take_along_axis(cand_docs.reshape(num_queries, cand_pad), top_pos, axis=1)
            return None, (top_scores.astype(jnp.dtype(score_dtype)), top_docs)

        _, (scores, doc_ords) = jax.lax.scan(step, None, stacked_units)
        return scores, doc_ords

    def search_fused(self, term_list_batches, model="bm25", params=None, topk=1000,
                     score_dtype="float32"):
        """Score S equally-sized query batches in one device call (compact top-k).

        Returns (scores [S, Q, k'], doc_ords [S, Q, k']) as numpy arrays, where
        k' = min(topk, common candidate width).
        """
        params = {k_: jnp.asarray(v, dtype=jnp.float32) for k_, v in (params or {}).items()}
        num_queries = len(term_list_batches[0])
        assert all(len(b) == num_queries for b in term_list_batches)
        self._check_accumulator_bounds(num_queries)

        built = [self._build_work_units(b, model) for b in term_list_batches]
        u_pad = _bucket(max(max(b[-1] for b in built), 1))
        cand_pad = TILE
        prepared = []
        for (tile_idx, qidx, w1, w2, lo, hi, n), batch in zip(built, term_list_batches):
            unit_rank = np.arange(n, dtype=np.int64) - np.searchsorted(qidx[:n], qidx[:n])
            cols = int(unit_rank.max() + 1) if n else 1
            cand_pad = max(cand_pad, _bucket(max(cols * TILE, min(topk, self.dindex.num_docs)), minimum=TILE))
            prepared.append((tile_idx, qidx, w1, w2, lo, hi, n, unit_rank))

        stacked = np.zeros((len(built), 7, u_pad), dtype=np.int32)
        for si, (tile_idx, qidx, w1, w2, lo, hi, n, unit_rank) in enumerate(prepared):
            dest = qidx[:n].astype(np.int64) * cand_pad + unit_rank * TILE
            stacked[si, 0, :n] = tile_idx[:n]
            stacked[si, 1, :n] = qidx[:n]
            stacked[si, 2, :n] = w1[:n].view(np.int32)
            stacked[si, 3, :n] = w2[:n].view(np.int32)
            stacked[si, 4, :n] = lo[:n]
            stacked[si, 5, :n] = hi[:n]
            stacked[si, 6, :n] = dest.astype(np.int32)
            stacked[si, 6, n:] = num_queries * cand_pad  # dropped by scatter mode="drop"

        scores, doc_ords = self._score_many(
            model, num_queries, min(topk, self.dindex.num_docs), int(cand_pad), str(score_dtype),
            stacked, params)
        return np.asarray(scores), np.asarray(doc_ords)

    # ------------------------------------------------------------------ public API
    def search(
        self,
        term_lists: Sequence[Sequence[Tuple[int, float]]],
        model: str = "bm25",
        params: Dict[str, float] = None,
        grid: Dict[str, Sequence[float]] = None,
        topk: int = 1000,
        exact_topk: bool = None,
        materialize: bool = True,
        score_dtype: str = "float32",
        pack_ords: bool = False,
    ):
        """Score a batch of queries; returns (scores, doc_ords) numpy arrays.

        Without ``grid``: shapes [Q, topk]. With ``grid`` (param -> list of values):
        shapes [len(v1), ..., len(vk), Q, topk] with axes ordered by sorted param name.
        """
        if model not in SCORING_MODELS:
            raise ValueError(f"unknown scoring model {model!r}; known: {sorted(SCORING_MODELS)}")
        params = dict(params or {})
        grid = dict(grid or {})
        num_queries = len(term_lists)
        self._check_accumulator_bounds(num_queries)
        topk = min(topk, self.dindex.num_docs)

        tile_idx, qidx, w1, w2, lo, hi, n = self._build_work_units(term_lists, model)
        u_pad = _bucket(max(n, 1))
        pad = u_pad - n
        if pad:
            # padded units point at tile 0 with an empty [0, 0) range
            tile_idx = np.concatenate([tile_idx, np.zeros(pad, np.int32)])
            qidx = np.concatenate([qidx, np.zeros(pad, np.int32)])
            w1 = np.concatenate([w1, np.zeros(pad, np.float32)])
            w2 = np.concatenate([w2, np.ones(pad, np.float32)])
            lo = np.concatenate([lo, np.zeros(pad, np.int32)])
            hi = np.concatenate([hi, np.zeros(pad, np.int32)])

        if exact_topk is None:
            # exact dense top-k for small corpora (cheap + parity tests); the compact
            # candidate layout on large corpora where dense top_k dominates latency
            exact_topk = self.dindex.num_docs <= 65536

        # candidate layout: each work unit owns a TILE-wide column block within its query
        if exact_topk:
            dest_base = np.zeros(u_pad, dtype=np.int32)
            cand_pad = TILE
        else:
            unit_rank = np.arange(n, dtype=np.int64) - np.searchsorted(qidx[:n], qidx[:n])
            cols_per_query = int(unit_rank.max() + 1) if n else 1
            cand_pad = _bucket(max(cols_per_query * TILE, topk), minimum=TILE)
            dest_base = np.zeros(u_pad, dtype=np.int64)
            dest_base[:n] = qidx[:n].astype(np.int64) * cand_pad + unit_rank * TILE
            if pad:
                # padded units target out-of-range slots; scatter mode="drop" discards them
                dest_base[n:] = num_queries * cand_pad
            dest_base = dest_base.astype(np.int32)

        param_axes = tuple(sorted(grid))
        device_params = {k: jnp.asarray(v, dtype=jnp.float32) for k, v in params.items()}
        for k in param_axes:
            device_params[k] = jnp.asarray(np.asarray(grid[k], dtype=np.float32))

        # duplicates of a (query, doc) candidate are bounded by the query's term
        # count; bucketed to limit recompiles
        max_dup = _bucket(max((len(t) for t in term_lists), default=1), minimum=4)
        packed_units = np.stack([
            tile_idx, qidx, w1.view(np.int32), w2.view(np.int32), lo, hi, dest_base,
        ])
        pack_ords = bool(pack_ords) and not exact_topk and self.dindex.num_docs < (1 << 24)
        scores, doc_ords = self._score_and_topk(
            model, num_queries, topk, param_axes, bool(exact_topk), int(cand_pad), int(max_dup),
            str(score_dtype), pack_ords, packed_units, device_params
        )
        if not materialize:
            # async: return device arrays so callers can pipeline batches (jax
            # dispatch is non-blocking; np.asarray forces a sync)
            return scores, doc_ords
        doc_ords = np.asarray(doc_ords)
        if pack_ords:
            doc_ords = unpack_doc_ords(doc_ords)
        return np.asarray(scores), doc_ords
