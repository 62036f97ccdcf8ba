"""Variant S prototype: exact-packed candidates + tiered rows + sort dedup.

Pipeline per 256-query batch:
  kernel1 (whole batch): gather tiles -> score -> scatter-add acc -> gather sums
  kernel2 (per tier): scatter (sum, doc) hole-free into [Qt, W] -> sort by doc ->
     dedup keep-first -> sort by (score desc, doc asc) -> slice k -> pack
Queries are host-sorted by total candidate count into tiers; results unpermuted.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/capreolus_tpu_jax_cache")

import bench
from capreolus_tpu.searcher.scoring import TILE, DeviceIndex, ScoringEngine, _bm25, _bucket, unpack_doc_ords

Q = 256
K = 1000
NQ = 2048
TIERS = (2048, 8192, 32768, 131072)


def make_queries(data):
    rng = np.random.Generator(np.random.PCG64(1))
    df = data.df_array
    cand = np.where((df > 50) & (df < bench.NUM_DOCS // 10))[0]
    return [[(int(t), 1.0) for t in rng.choice(cand, size=4, replace=False)] for _ in range(NQ)]


def timeit(fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return best


class SEngine:
    def __init__(self, dindex):
        self.d = dindex

    def build(self, term_lists):
        """Host side: tier-sorted queries, exact-packed work units."""
        d = self.d
        nq = len(term_lists)
        tids = np.fromiter((t for terms in term_lists for t, _ in terms), dtype=np.int64)
        qw = np.fromiter((w for terms in term_lists for _, w in terms), dtype=np.float64)
        qix = np.fromiter((q for q, terms in enumerate(term_lists) for _ in terms),
                          dtype=np.int32, count=len(tids))
        starts = d.term_offsets[tids]
        ends = d.term_offsets[tids + 1]
        keep = ends > starts
        tids, qw, qix, starts, ends = tids[keep], qw[keep], qix[keep], starts[keep], ends[keep]
        w1 = (qw * d.idf[tids]).astype(np.float32)
        df = (ends - starts).astype(np.int64)

        # per-query total candidates -> tier
        totals = np.bincount(qix, weights=df, minlength=nq).astype(np.int64)
        tier_of = np.searchsorted(np.asarray(TIERS), totals)  # 0..len(TIERS)-1 (totals<=last tier)
        order = np.argsort(tier_of, kind="stable")  # queries sorted by tier
        inv_order = np.argsort(order)
        newpos = inv_order  # newpos[oldq] = position in tier-sorted order
        q_tier = tier_of[order]  # tier of each sorted query

        # remap query indices and sort (query, term) pairs by sorted order
        qix2 = newpos[qix]
        o2 = np.argsort(qix2, kind="stable")
        tids, qw, qix2, starts, ends, w1, df = (tids[o2], qw[o2], qix2[o2], starts[o2],
                                                ends[o2], w1[o2], df[o2])

        # expand to tile units
        t0 = starts // TILE
        t1 = (ends - 1) // TILE
        counts = (t1 - t0 + 1).astype(np.int64)
        total = int(counts.sum())
        group_start = np.cumsum(counts) - counts
        within = np.arange(total, dtype=np.int64) - np.repeat(group_start, counts)
        tile = (np.repeat(t0, counts) + within).astype(np.int64)
        rs, re = np.repeat(starts, counts), np.repeat(ends, counts)
        lo = np.maximum(0, rs - tile * TILE).astype(np.int32)
        hi = np.minimum(TILE, re - tile * TILE).astype(np.int32)
        uq = np.repeat(qix2, counts)
        uw1 = np.repeat(w1, counts)
        # exact lane packing: cumulative (hi-lo) within each query
        width = (hi - lo).astype(np.int64)
        cum = np.cumsum(width) - width
        qstart = cum[np.searchsorted(uq, np.arange(nq))]  # first unit's cum per query (nq entries)
        lane_base = (cum - qstart[uq]).astype(np.int32)  # per-unit offset within its query row

        u_pad = _bucket(max(total, 1))
        packed = np.zeros((6, u_pad), dtype=np.int32)
        packed[0, :total] = tile
        packed[1, :total] = uq
        packed[2, :total] = uw1.view(np.int32)
        packed[3, :total] = lo
        packed[4, :total] = hi
        packed[5, :total] = lane_base
        packed[1, total:] = nq  # dropped

        # tier group boundaries over sorted queries and over units
        tier_counts = np.bincount(q_tier, minlength=len(TIERS))
        qbounds = np.cumsum(np.concatenate([[0], tier_counts]))
        ubounds = np.searchsorted(uq, qbounds)
        unit_ranges = [(int(ubounds[t]), int(ubounds[t + 1])) for t in range(len(TIERS))]
        return packed, tier_counts, unit_ranges, order, inv_order

    @functools.partial(jax.jit, static_argnames=("self", "nq"))
    def kernel1(self, nq, packed, params):
        """Whole batch: scores summed per (q, doc); returns packed lane arrays."""
        d = self.d
        n_rows = d.num_docs + 1
        tile_idx, qidx = packed[0], packed[1]
        w1 = jax.lax.bitcast_convert_type(packed[2], jnp.float32)
        lo, hi, lane_base = packed[3], packed[4], packed[5]
        docs = jnp.take(d.doc_tiles, tile_idx, axis=0)
        tfs = jnp.take(d.tf_tiles, tile_idx, axis=0)
        dl = jnp.take(d.norm_dl_tiles, tile_idx, axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 1)
        mask = (pos >= lo[:, None]) & (pos < hi[:, None]) & (qidx[:, None] < nq)
        lin = jnp.where(mask, qidx[:, None] * n_rows + docs, nq * n_rows)
        s = _bm25(tfs, dl, w1[:, None], w1[:, None], params, d.stats)
        s = jnp.where(mask, s, 0.0)
        acc = jnp.zeros(nq * n_rows, dtype=jnp.float32)
        acc = acc.at[lin.reshape(-1)].add(s.reshape(-1), mode="drop")
        summed = jnp.take(acc, lin.reshape(-1), axis=0).reshape(lin.shape)
        # per-lane destination within the query row (hole-free)
        lane = lane_base[:, None] + (pos - lo[:, None])
        return summed, docs, jnp.where(mask, lane, -1), qidx

    @functools.partial(jax.jit, static_argnames=("self", "qt", "width", "topk", "tu"))
    def kernel2(self, qt, width, topk, tu, summed, docs, lane, qidx, u0, qbase):
        """Tier: slice this tier's units, scatter hole-free rows, sort-dedup, rank."""
        d = self.d
        summed = jax.lax.dynamic_slice_in_dim(summed, u0, tu, axis=0)
        docs = jax.lax.dynamic_slice_in_dim(docs, u0, tu, axis=0)
        lane = jax.lax.dynamic_slice_in_dim(lane, u0, tu, axis=0)
        qidx = jax.lax.dynamic_slice_in_dim(qidx, u0, tu, axis=0)
        # destination in [qt, width]; lanes of other tiers or holes -> dropped
        row = (qidx - qbase)[:, None]
        ok = (lane >= 0) & (row >= 0) & (row < qt) & (lane < width)
        dest = jnp.where(ok, row * width + lane, qt * width)
        vals = jnp.full(qt * width, -1.0, dtype=jnp.float32)
        vals = vals.at[dest.reshape(-1)].set(summed.reshape(-1), mode="drop", unique_indices=True)
        docv = jnp.full(qt * width, d.num_docs, dtype=jnp.int32)
        docv = docv.at[dest.reshape(-1)].set(docs.reshape(-1), mode="drop", unique_indices=True)
        vals = vals.reshape(qt, width)
        docv = docv.reshape(qt, width)
        # sort by doc asc; dedup: keep first copy (copies hold identical sums)
        docv, vals = jax.lax.sort((docv, vals), num_keys=1)
        first = jnp.concatenate([jnp.ones((qt, 1), bool), docv[:, 1:] != docv[:, :-1]], axis=1)
        vals = jnp.where(first, vals, -1.0)
        # rank: score desc then doc asc (Lucene tie-break)
        neg, docv, vals = jax.lax.sort((-vals, docv, vals), num_keys=2)
        k = min(topk, width)
        top_scores = vals[:, :k]
        top_docs = jnp.where(top_scores > 0, docv[:, :k], d.num_docs)
        if k < topk:
            top_scores = jnp.concatenate(
                [top_scores, jnp.full((qt, topk - k), -1.0)], axis=1)
            top_docs = jnp.concatenate(
                [top_docs, jnp.full((qt, topk - k), d.num_docs, jnp.int32)], axis=1)
        top_docs = jnp.stack([(top_docs & 0xFF).astype(jnp.uint8),
                              ((top_docs >> 8) & 0xFF).astype(jnp.uint8),
                              ((top_docs >> 16) & 0xFF).astype(jnp.uint8)], axis=-1)
        return top_scores.astype(jnp.bfloat16), top_docs

    def search(self, term_lists, params, topk=K):
        nq = len(term_lists)
        packed, tier_counts, unit_ranges, order, inv_order = self.build(term_lists)
        dev_params = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
        summed, docs, lane, qidx = self.kernel1(nq, packed, dev_params)
        outs = []
        qbase = 0
        for t, w in enumerate(TIERS):
            qt = int(tier_counts[t])
            if qt == 0:
                continue
            u0, u1 = unit_ranges[t]
            tu = _bucket(max(u1 - u0, 1), minimum=64)
            qt_pad = _bucket(qt, minimum=4)
            outs.append((qbase, qt, self.kernel2(qt_pad, w, topk, tu, summed, docs, lane,
                                                 qidx, u0, qbase)))
            qbase += qt
        return outs, inv_order

    def materialize(self, outs, inv_order, nq, topk=K):
        scores = np.full((nq, topk), -1.0, np.float32)
        ords = np.full((nq, topk), self.d.num_docs, np.int32)
        for qbase, qt, (s, o) in outs:
            scores[qbase:qbase + qt] = np.asarray(s).astype(np.float32)[:qt]
            ords[qbase:qbase + qt] = unpack_doc_ords(np.asarray(o))[:qt]
        return scores[inv_order], ords[inv_order]


def main():
    data = bench.synth_index()
    dindex = DeviceIndex(data)
    engine = ScoringEngine(dindex)
    s_eng = SEngine(dindex)
    queries = make_queries(data)
    params = {"k1": 0.9, "b": 0.4}

    def run(mode="async"):
        pend = [s_eng.search(queries[i:i + Q], params) for i in range(0, NQ, Q)]
        if mode == "compute":
            return [float(outs[-1][2][0][0, 0]) for outs, _ in pend]
        if mode == "async":
            for outs, _ in pend:
                for _, _, (s, o) in outs:
                    s.copy_to_host_async()
                    o.copy_to_host_async()
        return [s_eng.materialize(outs, inv, Q) for outs, inv in pend]

    run()  # compile
    t_async = timeit(lambda: run("async"))
    t_comp = timeit(lambda: run("compute"))
    t_host = timeit(lambda: [s_eng.build(queries[i:i + Q]) for i in range(0, NQ, Q)])
    print(f"[S] async: {t_async*1000:.0f} ms ({NQ/t_async:.0f} q/s); "
          f"compute: {t_comp*1000:.0f} ms; host build: {t_host*1000:.0f} ms")

    ref_s, ref_o = engine.search(queries[:Q], model="bm25", params=params, topk=K)
    s, o = run()[0]
    real = ref_s > 0
    mm = (o != ref_o) & real
    ties = np.allclose(s[mm], ref_s[mm], rtol=1e-2, atol=1e-3) if mm.any() else True
    print(f"  ord match (real): {(o == ref_o)[real].mean():.4f} "
          f"score close {np.allclose(s[real], ref_s[real], rtol=1e-2, atol=1e-3)} "
          f"mismatches are ties: {ties}")


def stages():
    data = bench.synth_index()
    dindex = DeviceIndex(data)
    s_eng = SEngine(dindex)
    queries = make_queries(data)
    dev_params = {"k1": jnp.asarray(0.9, jnp.float32), "b": jnp.asarray(0.4, jnp.float32)}

    built = [s_eng.build(queries[i:i + Q]) for i in range(0, NQ, Q)]

    @functools.partial(jax.jit, static_argnames=("nq", "stage"))
    def k1_staged(nq, stage, packed, params):
        d = s_eng.d
        n_rows = d.num_docs + 1
        tile_idx, qidx = packed[0], packed[1]
        w1 = jax.lax.bitcast_convert_type(packed[2], jnp.float32)
        lo, hi, lane_base = packed[3], packed[4], packed[5]
        docs = jnp.take(d.doc_tiles, tile_idx, axis=0)
        tfs = jnp.take(d.tf_tiles, tile_idx, axis=0)
        dl = jnp.take(d.norm_dl_tiles, tile_idx, axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 1)
        mask = (pos >= lo[:, None]) & (pos < hi[:, None]) & (qidx[:, None] < nq)
        s = _bm25(tfs, dl, w1[:, None], w1[:, None], params, d.stats)
        s = jnp.where(mask, s, 0.0)
        if stage == 0:
            return s.sum()
        lin = jnp.where(mask, qidx[:, None] * n_rows + docs, nq * n_rows)
        acc = jnp.zeros(nq * n_rows, dtype=jnp.float32)
        acc = acc.at[lin.reshape(-1)].add(s.reshape(-1), mode="drop")
        if stage == 1:
            return acc[0]
        summed = jnp.take(acc, lin.reshape(-1), axis=0).reshape(lin.shape)
        return summed.sum()

    @functools.partial(jax.jit, static_argnames=("qt", "width", "tu", "stage"))
    def k2_staged(qt, width, tu, stage, summed, docs, lane, qidx, u0, qbase):
        d = s_eng.d
        summed = jax.lax.dynamic_slice_in_dim(summed, u0, tu, axis=0)
        docs = jax.lax.dynamic_slice_in_dim(docs, u0, tu, axis=0)
        lane = jax.lax.dynamic_slice_in_dim(lane, u0, tu, axis=0)
        qidx = jax.lax.dynamic_slice_in_dim(qidx, u0, tu, axis=0)
        row = (qidx - qbase)[:, None]
        ok = (lane >= 0) & (row >= 0) & (row < qt) & (lane < width)
        dest = jnp.where(ok, row * width + lane, qt * width)
        vals = jnp.full(qt * width, -1.0, dtype=jnp.float32)
        vals = vals.at[dest.reshape(-1)].set(summed.reshape(-1), mode="drop", unique_indices=True)
        docv = jnp.full(qt * width, d.num_docs, dtype=jnp.int32)
        docv = docv.at[dest.reshape(-1)].set(docs.reshape(-1), mode="drop", unique_indices=True)
        vals = vals.reshape(qt, width)
        docv = docv.reshape(qt, width)
        if stage == 0:
            return vals[0, 0] + docv[0, 0].astype(jnp.float32)
        docv, vals = jax.lax.sort((docv, vals), num_keys=1)
        first = jnp.concatenate([jnp.ones((qt, 1), bool), docv[:, 1:] != docv[:, :-1]], axis=1)
        vals = jnp.where(first, vals, -1.0)
        if stage == 1:
            return vals[0, 0]
        neg, docv, vals = jax.lax.sort((-vals, docv, vals), num_keys=2)
        return vals[0, 0] + docv[0, 0].astype(jnp.float32)

    import time as _t
    for stage in range(3):
        def runk1():
            outs = [k1_staged(Q, stage, p, dev_params) for p, *_ in built]
            return float(outs[-1])
        runk1()
        t = timeit(runk1)
        print(f"  k1 stage {stage}: {t*1000:.0f} ms")

    # full k1 once to get inputs for k2
    full = [s_eng.kernel1(Q, p, dev_params) for p, *_ in built]
    for stage in range(3):
        def runk2():
            outs = []
            for (p, tier_counts, unit_ranges, order, inv), (summed, docs, lane, qidx) in zip(built, full):
                qbase = 0
                for t, w in enumerate(TIERS):
                    qt = int(tier_counts[t])
                    if qt == 0:
                        continue
                    u0, u1 = unit_ranges[t]
                    tu = _bucket(max(u1 - u0, 1), minimum=64)
                    outs.append(k2_staged(_bucket(qt, minimum=4), w, tu, stage,
                                          summed, docs, lane, qidx, u0, qbase))
                    qbase += qt
            return float(outs[-1])
        runk2()
        t = timeit(runk2)
        print(f"  k2 stage {stage} (cumulative scatter/sort1/sort2): {t*1000:.0f} ms")

if __name__ == "__main__":
    if "stages" in sys.argv:
        stages()
    else:
        main()


