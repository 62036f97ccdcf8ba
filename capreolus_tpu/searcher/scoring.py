"""TPU-resident batched scoring engine over the inverted index.

Design (TPU-first, replacing Anserini's Lucene SearchCollection subprocess,
/root/reference/capreolus/searcher/anserini.py:26-83):

The CSR postings arrays (doc ids + term freqs) are reshaped into fixed-size tiles
``[n_tiles, TILE]`` and placed in HBM once. A term's postings span a contiguous tile
range; edge tiles are handled with on-device masks, so storage has zero padding waste.
A query batch is flattened host-side into "work units" — one (query, tile) pair each,
carrying the per-term weights and the valid [lo, hi) range — so the transfer per batch
is a few small int/float vectors, not postings. On device (tiered path, the default
for large corpora — see ScoringEngine docstring and PERF.md round 2):

    gather tiles -> elementwise scoring model (VPU) -> per-tier row reshape ->
    sort by doc -> duplicate-run merge -> sort by (score desc, doc asc) -> slice k

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
        # exact (unquantized) posting-aligned doc lengths are only needed by the
        # QL/DFR model family; materialize lazily so BM25-only deployments keep
        # 8 B/posting in HBM instead of 12 (PERF.md index-memory section)
        self._exact_dl_tiles = None
        self._exact_dl_src = (exact_dl_table, doc_ids.reshape(n_tiles, TILE), put)
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

    @property
    def exact_dl_tiles(self):
        if self._exact_dl_tiles is None:
            exact_dl_table, doc_tile_ids, put = self._exact_dl_src
            self._exact_dl_tiles = put(exact_dl_table[doc_tile_ids].astype(np.float32))
        return self._exact_dl_tiles


class TieredResult:
    """Pending device results of a tiered search; fetches are started eagerly
    (copy_to_host_async) so transfers overlap subsequent batches' compute."""

    def __init__(self, engine, outs, tier_layout, inv_order, num_queries, topk,
                 grid_shape, score_dtype, pack_ords):
        self.engine = engine
        self.outs = outs  # [(scores, ords)] per non-empty tier
        self.tier_layout = tier_layout  # [(qbase, qt_real)] per non-empty tier
        self.inv_order = inv_order
        self.num_queries = num_queries
        self.topk = topk
        self.grid_shape = tuple(grid_shape)
        self.score_dtype = score_dtype
        self.pack_ords = pack_ords
        for s, o in outs:
            s.copy_to_host_async()
            o.copy_to_host_async()

    def get(self):
        """Assemble ([*grid, Q, topk] scores, [...] doc ords) numpy arrays."""
        d = self.engine.dindex
        shape = self.grid_shape + (self.num_queries, self.topk)
        scores = np.full(shape, -1.0, dtype=np.dtype(self.score_dtype))
        ords = np.full(shape, d.num_docs, dtype=np.int32)
        for (qbase, qt), (s, o) in zip(self.tier_layout, self.outs):
            s = np.asarray(s)
            o = np.asarray(o)
            if self.pack_ords:
                o = unpack_doc_ords(o)
            scores[..., qbase:qbase + qt, :] = s[..., :qt, :]
            ords[..., qbase:qbase + qt, :] = o[..., :qt, :]
        # un-permute the tier-sorted query axis
        scores = np.take(scores, self.inv_order, axis=-2)
        ords = np.take(ords, self.inv_order, axis=-2)
        return scores, ords


class ScoringEngine:
    """Batched multi-model scoring with exact top-k over a DeviceIndex.

    Two paths:
      exact: dense [Q, N] accumulator + lax.top_k (small corpora / parity tests)
      tiered (default for large corpora): queries are host-sorted by candidate
        volume into row tiers; every query's postings tiles are padded to its
        tier's fixed unit width, so per-query candidate rows are pure reshapes
        (no scatter). One map kernel scores all lanes; per tier the rows are
        sorted by doc ordinal, duplicate-doc runs are merged with log2(R) masked
        shift-adds (exact sums - this replaces a dense accumulator + ownership
        pass, see PERF.md round 2), non-first copies are masked, and a final
        (score desc, doc asc) sort yields the exact Lucene docid tie-break.

    Both paths produce identical rankings (ties included); the tiered path is
    ~4x faster on TPU than the round-1 candidate-scatter design because TPU row
    sorts are cheap while random scatter/gather into a [Q*N] accumulator is not
    (lax.top_k itself lowers to a full k-independent row sort).
    """

    # tier row sizes start here and grow 4x per tier
    TIER_BASE_LANES = 2048

    def __init__(self, device_index: DeviceIndex):
        self.dindex = device_index

    def _check_accumulator_bounds(self, num_queries: int):
        # the exact path's flat accumulator index qidx * (num_docs+1) + doc is
        # int32 on device; fail loudly instead of silently wrapping
        if num_queries * (self.dindex.num_docs + 1) >= 2**31:
            raise ValueError(
                f"query batch of {num_queries} over {self.dindex.num_docs} docs overflows the "
                f"int32 flat accumulator (need num_queries*(num_docs+1) < 2^31); "
                f"use smaller batches or the tiered path (exact_topk=False)"
            )

    # ------------------------------------------------------------------- exact path
    def _build_work_units(self, term_lists: Sequence[Sequence[Tuple[int, float]]], model: str,
                          max_postings: int = 0):
        """Flatten a batch of queries into per-(query, tile) work units (vectorized).

        Returns numpy arrays (tile_idx, qidx, w1, w2, lo, hi) and the unit count.
        ``max_postings`` is threaded explicitly (never instance state) so
        interleaved searches with different caps cannot race (ADVICE round 2).
        """
        d = self.dindex
        w2_source = _W2_SOURCE[model]

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
        if max_postings > 0:
            ends = np.minimum(ends, starts + max_postings)
        nonempty = ends > starts
        tids, qw, qix, starts, ends = tids[nonempty], qw[nonempty], qix[nonempty], starts[nonempty], ends[nonempty]
        if len(tids) == 0:
            return (*empty, 0)

        w1, w2 = self._term_weights(model, w2_source, tids, qw)

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

    def _term_weights(self, model, w2_source, tids, qw):
        d = self.dindex
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
        return w1, w2

    @functools.partial(jax.jit, static_argnames=("self", "model", "num_queries", "topk", "param_axes"))
    def _score_exact(self, model, num_queries, topk, param_axes, packed_units, params):
        """Dense [Q, N] accumulator + lax.top_k: returns ([*grid, Q, topk] scores, ords)."""
        tile_idx = packed_units[0]
        qidx = packed_units[1]
        w1 = jax.lax.bitcast_convert_type(packed_units[2], jnp.float32)
        w2 = jax.lax.bitcast_convert_type(packed_units[3], jnp.float32)
        lo = packed_units[4]
        hi = packed_units[5]
        d = self.dindex
        n_rows = d.num_docs + 1  # +1 sentinel slot for padding docids

        docs = jnp.take(d.doc_tiles, tile_idx, axis=0)  # [U, TILE]
        tfs = jnp.take(d.tf_tiles, tile_idx, axis=0)
        dl = jnp.take(d.norm_dl_tiles if model == "bm25" else d.exact_dl_tiles, tile_idx, axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 1)
        mask = (pos >= lo[:, None]) & (pos < hi[:, None])
        lin = qidx[:, None] * n_rows + docs
        model_fn = SCORING_MODELS[model]

        def score_with(p):
            s = model_fn(tfs, dl, w1[:, None], w2[:, None], p, d.stats)
            s = jnp.where(mask, s, 0.0)
            acc = jnp.zeros(num_queries * n_rows, dtype=jnp.float32)
            acc = acc.at[lin.reshape(-1)].add(s.reshape(-1), mode="drop")
            scores = acc.reshape(num_queries, n_rows)[:, : d.num_docs]
            return jax.lax.top_k(scores, topk)

        fn = score_with
        for axis_name in reversed(param_axes):
            inner = fn

            def fn(p, _inner=inner, _axis=axis_name):
                return jax.vmap(lambda v: _inner({**p, _axis: v}))(p[_axis])

        return fn(params)

    # ------------------------------------------------------------------ tiered path
    def _tier_ladder(self, max_units: int, r_pad: int):
        """Unit widths per tier: ceil(base*4^i / TILE) + r_pad edge-tile allowance."""
        tiers = []
        lanes = self.TIER_BASE_LANES
        while True:
            uw = lanes // TILE + r_pad
            tiers.append(uw)
            if uw >= max_units:
                return tuple(tiers)
            lanes *= 4

    def _build_tiered(self, term_lists, model, max_postings: int = 0):
        """Host side: tier-sort queries, pad each query's units to its tier width.

        Returns (packed [5, u_pad], tiers [(uw, qt_real)], u0s, inv_order, r_max).
        ``max_postings`` is an explicit parameter, not instance state (ADVICE round 2).
        """
        d = self.dindex
        nq = len(term_lists)
        w2_source = _W2_SOURCE[model]
        r_max = _bucket(max((len(t) for t in term_lists), default=1), minimum=4)

        tids = np.fromiter((t for terms in term_lists for t, _ in terms), dtype=np.int64)
        qw = np.fromiter((w for terms in term_lists for _, w in terms), dtype=np.float64)
        qix = np.fromiter((q for q, terms in enumerate(term_lists) for _ in terms),
                          dtype=np.int32, count=len(tids))
        if len(tids):
            starts = d.term_offsets[tids]
            ends = d.term_offsets[tids + 1]
            if max_postings > 0:
                # impact-ordered early termination: keep each term's high-impact prefix
                ends = np.minimum(ends, starts + max_postings)
            keep = ends > starts
            tids, qw, qix, starts, ends = tids[keep], qw[keep], qix[keep], starts[keep], ends[keep]
        else:
            starts = ends = np.zeros(0, np.int64)
        w1, w2 = self._term_weights(model, w2_source, tids, qw)

        t0 = starts // TILE
        t1 = (ends - 1) // TILE
        counts = (t1 - t0 + 1).astype(np.int64)
        units_per_q = np.bincount(qix, weights=counts, minlength=nq).astype(np.int64)

        ladder = self._tier_ladder(int(units_per_q.max()) if nq else 1, r_max)
        tier_of = np.searchsorted(np.asarray(ladder), units_per_q)
        order = np.argsort(tier_of, kind="stable")
        inv_order = np.argsort(order)
        q_tier = tier_of[order]
        tier_counts = np.bincount(q_tier, minlength=len(ladder))

        total = int(counts.sum())
        group_start = np.cumsum(counts) - counts
        within = np.arange(total, dtype=np.int64) - np.repeat(group_start, counts)
        tile = (np.repeat(t0, counts) + within).astype(np.int64)
        rs, re = np.repeat(starts, counts), np.repeat(ends, counts)
        lo = np.maximum(0, rs - tile * TILE).astype(np.int32)
        hi = np.minimum(TILE, re - tile * TILE).astype(np.int32)
        uq_old = np.repeat(qix, counts)
        uw1 = np.repeat(w1, counts)
        uw2 = np.repeat(w2, counts)

        # destination unit slot: per-query base (tier-sorted) + running slot
        newq = inv_order[uq_old] if total else uq_old
        slot_in_q = np.arange(total, dtype=np.int64) - np.searchsorted(uq_old, uq_old)
        tier_widths = np.asarray(ladder)[q_tier]
        qbase_units = np.cumsum(tier_widths) - tier_widths
        dest_unit = (qbase_units[newq] + slot_in_q) if total else np.zeros(0, np.int64)

        total_units = int(tier_widths.sum()) if nq else 1
        u_pad = _bucket(total_units)
        packed = np.zeros((5, u_pad), dtype=np.int32)
        packed[0, dest_unit] = tile
        packed[1, dest_unit] = uw1.view(np.int32)
        packed[2, dest_unit] = uw2.view(np.int32)
        packed[3, dest_unit] = lo
        packed[4, dest_unit] = hi  # pad units keep hi = 0 -> fully masked

        # per-tier unit offsets (traced scalars, not compile keys)
        tub = np.cumsum(np.concatenate([[0], tier_counts * np.asarray(ladder)]))
        tiers = []
        u0s = []
        qbase = 0
        for t, uw in enumerate(ladder):
            qt = int(tier_counts[t])
            if qt == 0:
                continue
            tiers.append((int(uw), _bucket(qt, minimum=4), qt, qbase))
            u0s.append(int(tub[t]))
            qbase += qt
        return packed, tiers, np.asarray(u0s, np.int32), inv_order, r_max

    @functools.partial(jax.jit, static_argnames=(
        "self", "model", "topk", "param_axes", "r_max", "tier_shapes", "score_dtype", "pack_ords"))
    def _score_tiered(self, model, topk, param_axes, r_max, tier_shapes, score_dtype,
                      pack_ords, packed, u0s, params):
        """Fused per-batch executable: score all lanes, then per-tier sort-dedup-rank.

        tier_shapes: ((unit_width, qt_pad), ...) static; u0s: per-tier unit offsets.
        Returns a list of (scores [*grid, qt_pad, topk], ords) per tier.
        """
        d = self.dindex
        tile_idx = packed[0]
        w1 = jax.lax.bitcast_convert_type(packed[1], jnp.float32)
        w2 = jax.lax.bitcast_convert_type(packed[2], jnp.float32)
        lo, hi = packed[3], packed[4]
        docs = jnp.take(d.doc_tiles, tile_idx, axis=0)
        tfs = jnp.take(d.tf_tiles, tile_idx, axis=0)
        dl = jnp.take(d.norm_dl_tiles if model == "bm25" else d.exact_dl_tiles, tile_idx, axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 1)
        mask = (pos >= lo[:, None]) & (pos < hi[:, None])
        docs = jnp.where(mask, docs, d.num_docs)
        model_fn = SCORING_MODELS[model]

        def one_tier(s, ti, uw, qt):
            width = uw * TILE
            u0 = u0s[ti]
            st = jax.lax.dynamic_slice_in_dim(s, u0, qt * uw, axis=0).reshape(qt, width)
            dt = jax.lax.dynamic_slice_in_dim(docs, u0, qt * uw, axis=0).reshape(qt, width)
            docv, vals = jax.lax.sort((dt, st), num_keys=1)
            # duplicate-doc runs (length <= r_max) are adjacent after the doc sort;
            # masked doubling shifts put each run's exact sum on its first element
            merged = vals
            shift = 1
            while shift < r_max:
                same = jnp.concatenate(
                    [docv[:, shift:] == docv[:, :-shift], jnp.zeros((qt, shift), bool)], axis=1)
                shifted = jnp.concatenate(
                    [merged[:, shift:], jnp.zeros((qt, shift), merged.dtype)], axis=1)
                merged = merged + jnp.where(same, shifted, 0.0)
                shift *= 2
            first = jnp.concatenate([jnp.ones((qt, 1), bool), docv[:, 1:] != docv[:, :-1]], axis=1)
            merged = jnp.where(first & (merged > 0), merged, -1.0)
            # rank: score desc, doc ord asc (Lucene docid tie-break)
            _, docv, merged = jax.lax.sort((-merged, docv, merged), num_keys=2)
            k = min(topk, width)
            top_scores = merged[:, :k]
            top_docs = jnp.where(top_scores > 0, docv[:, :k], d.num_docs)
            if k < topk:
                top_scores = jnp.concatenate(
                    [top_scores, jnp.full((qt, topk - k), -1.0)], axis=1)
                top_docs = jnp.concatenate(
                    [top_docs, jnp.full((qt, topk - k), d.num_docs, jnp.int32)], axis=1)
            if pack_ords:
                top_docs = jnp.stack([
                    (top_docs & 0xFF).astype(jnp.uint8),
                    ((top_docs >> 8) & 0xFF).astype(jnp.uint8),
                    ((top_docs >> 16) & 0xFF).astype(jnp.uint8),
                ], axis=-1)
            return top_scores.astype(jnp.dtype(score_dtype)), top_docs

        def score_with(p):
            s = model_fn(tfs, dl, w1[:, None], w2[:, None], p, d.stats)
            s = jnp.where(mask, s, -1.0)
            return tuple(one_tier(s, ti, uw, qt) for ti, (uw, qt) in enumerate(tier_shapes))

        fn = score_with
        for axis_name in reversed(param_axes):
            inner = fn

            def fn(p, _inner=inner, _axis=axis_name):
                return jax.vmap(lambda v: _inner({**p, _axis: v}))(p[_axis])

        return fn(params)

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
        max_postings_per_term: int = 0,
    ):
        """Score a batch of queries; returns (scores, doc_ords) numpy arrays.

        ``max_postings_per_term`` > 0 enables impact-ordered early termination:
        only each term's highest-impact prefix of that many postings is scored
        (postings are impact-sorted at index build, index/tpu.py). APPROXIMATE —
        returned scores are partial sums (always <= the exact score); recall
        degrades gracefully with the cap. 0 = exact (default).

        Without ``grid``: shapes [Q, topk]. With ``grid`` (param -> list of values):
        shapes [len(v1), ..., len(vk), Q, topk] with axes ordered by sorted param name.
        With ``materialize=False`` a TieredResult is returned whose ``.get()``
        yields the same arrays; device->host copies start immediately so callers
        can pipeline batches (used by bench.py).
        """
        if model not in SCORING_MODELS:
            raise ValueError(f"unknown scoring model {model!r}; known: {sorted(SCORING_MODELS)}")
        params = dict(params or {})
        grid = dict(grid or {})
        num_queries = len(term_lists)
        topk = min(topk, self.dindex.num_docs)
        max_postings = int(max_postings_per_term or 0)
        if model != "bm25":
            _ = self.dindex.exact_dl_tiles  # lazy QL/DFR payload: materialize OUTSIDE jit

        if exact_topk is None:
            # exact dense top-k for small corpora (cheap + parity tests); the tiered
            # sort path on large corpora where a dense [Q, N] top_k dominates latency
            exact_topk = self.dindex.num_docs <= 65536

        param_axes = tuple(sorted(grid))
        device_params = {k: jnp.asarray(v, dtype=jnp.float32) for k, v in params.items()}
        for k in param_axes:
            device_params[k] = jnp.asarray(np.asarray(grid[k], dtype=np.float32))
        grid_shape = tuple(len(grid[k]) for k in param_axes)

        if exact_topk:
            self._check_accumulator_bounds(num_queries)
            tile_idx, qidx, w1, w2, lo, hi, n = self._build_work_units(term_lists, model, max_postings)
            u_pad = _bucket(max(n, 1))
            pad = u_pad - n
            if pad:
                tile_idx = np.concatenate([tile_idx, np.zeros(pad, np.int32)])
                qidx = np.concatenate([qidx, np.zeros(pad, np.int32)])
                w1 = np.concatenate([w1, np.zeros(pad, np.float32)])
                w2 = np.concatenate([w2, np.ones(pad, np.float32)])
                lo = np.concatenate([lo, np.zeros(pad, np.int32)])
                hi = np.concatenate([hi, np.zeros(pad, np.int32)])
            packed_units = np.stack([tile_idx, qidx, w1.view(np.int32), w2.view(np.int32), lo, hi])
            scores, doc_ords = self._score_exact(
                model, num_queries, topk, param_axes, packed_units, device_params)
            if not materialize:
                return scores, doc_ords
            return np.asarray(scores).astype(np.dtype(score_dtype)), np.asarray(doc_ords)

        pack_ords = bool(pack_ords) and self.dindex.num_docs < (1 << 24)
        packed, tiers, u0s, inv_order, r_max = self._build_tiered(term_lists, model, max_postings)
        tier_shapes = tuple((uw, qt_pad) for uw, qt_pad, _, _ in tiers)
        outs = self._score_tiered(model, topk, param_axes, r_max, tier_shapes,
                                  str(score_dtype), pack_ords, packed, u0s, device_params)
        result = TieredResult(self, list(outs), [(qbase, qt) for _, _, qt, qbase in tiers],
                              inv_order, num_queries, topk, grid_shape,
                              score_dtype, pack_ords)
        if not materialize:
            return result
        return result.get()

    def search_fused(self, term_list_batches, model="bm25", params=None, topk=1000,
                     score_dtype="float32"):
        """Score S equally-sized query batches with pipelined dispatch.

        Returns (scores [S, Q, topk], doc_ords [S, Q, topk]) as numpy arrays.
        (Round 1 used a lax.scan mega-executable here; the tiered engine with
        eager async fetches supersedes it - see PERF.md.)
        """
        num_queries = len(term_list_batches[0])
        assert all(len(b) == num_queries for b in term_list_batches)
        pending = [
            self.search(b, model=model, params=params, topk=topk, materialize=False,
                        score_dtype=score_dtype, exact_topk=False)
            for b in term_list_batches
        ]
        results = [p.get() if isinstance(p, TieredResult) else p for p in pending]
        scores = np.stack([np.asarray(s) for s, _ in results])
        ords = np.stack([np.asarray(o) for _, o in results])
        return scores, ords
