"""BM25 engine experiments on the real chip (round 2 perf work).

Measures phase isolation (compute vs transfer vs host) and kernel variants:
  A: per-term-rank scatters with unique_indices=True (XLA fast scatter path)
  B: no-ownership overfetch (host dedup; exact via distinct-count check)
Run: python scripts/exp_bm25.py [exp...]
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


# ---------------------------------------------------------------- variant kernels
class VariantEngine:
    """Per-term-rank work units: [R, 7, U_pad] so each rank's scatter has unique
    (query, doc) indices -> unique_indices=True fast path."""

    def __init__(self, dindex):
        self.d = dindex

    def build_units(self, term_lists, max_ranks):
        d = self.d
        per_rank = [[] for _ in range(max_ranks)]
        # vectorized: flatten with rank ids
        tids = np.fromiter((t for terms in term_lists for t, _ in terms), dtype=np.int64)
        qw = np.fromiter((w for terms in term_lists for _, w in terms), dtype=np.float64)
        qix = np.fromiter((q for q, terms in enumerate(term_lists) for _ in terms), dtype=np.int32, count=len(tids))
        rank = np.fromiter((r for terms in term_lists for r, _ in enumerate(terms)), dtype=np.int32, count=len(tids))

        starts = d.term_offsets[tids]
        ends = d.term_offsets[tids + 1]
        keep = ends > starts
        tids, qw, qix, rank, starts, ends = tids[keep], qw[keep], qix[keep], rank[keep], starts[keep], ends[keep]
        w1 = (qw * d.idf[tids]).astype(np.float32)

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
        uq = np.repeat(qix, counts)
        ur = np.repeat(rank, counts)
        uw1 = np.repeat(w1, counts)

        # per-query candidate column layout (same as compact path): unit_rank within query
        order = np.lexsort((tile, ur, uq))
        tile, uq, ur, uw1, lo, hi = tile[order], uq[order], ur[order], uw1[order], lo[order], hi[order]
        unit_rank = np.arange(total, dtype=np.int64) - np.searchsorted(uq, uq)
        cols = int(unit_rank.max() + 1) if total else 1
        cand_pad = _bucket(max(cols * TILE, K), minimum=TILE)
        dest = uq.astype(np.int64) * cand_pad + unit_rank * TILE

        # partition by rank, pad each rank to the common bucket
        u_max = _bucket(max(int((ur == r).sum()) for r in range(max_ranks)))
        packed = np.zeros((max_ranks, 7, u_max), dtype=np.int32)
        for r in range(max_ranks):
            sel = ur == r
            n = int(sel.sum())
            packed[r, 0, :n] = tile[sel]
            packed[r, 1, :n] = uq[sel]
            packed[r, 2, :n] = uw1[sel].view(np.int32)
            packed[r, 4, :n] = lo[sel]
            packed[r, 5, :n] = hi[sel]
            packed[r, 6, :n] = dest[sel].astype(np.int32)
            packed[r, 6, n:] = len(term_lists) * cand_pad  # dropped
        return packed, int(cand_pad)

    @functools.partial(jax.jit, static_argnames=("self", "num_queries", "topk", "cand_pad", "with_owner"))
    def score(self, num_queries, topk, cand_pad, with_owner, packed, params):
        d = self.d
        n_rows = d.num_docs + 1
        drop_base = num_queries * n_rows
        R = packed.shape[0]

        acc = jnp.zeros(num_queries * n_rows, dtype=jnp.float32)
        owner = jnp.zeros(num_queries * n_rows, dtype=jnp.int32) if with_owner else None
        lins, cand_lins, masks, docss = [], [], [], []
        for r in range(R):
            tile_idx, qidx = packed[r, 0], packed[r, 1]
            w1 = jax.lax.bitcast_convert_type(packed[r, 2], jnp.float32)
            lo, hi, dest = packed[r, 4], packed[r, 5], packed[r, 6]
            docs = jnp.take(d.doc_tiles, tile_idx, axis=0)
            tfs = jnp.take(d.tf_tiles, tile_idx, axis=0)
            dl = jnp.take(d.norm_dl_tiles, tile_idx, axis=0)
            pos = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 1)
            mask = (pos >= lo[:, None]) & (pos < hi[:, None])
            flat = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 0) * TILE + pos
            lin = jnp.where(mask, qidx[:, None] * n_rows + docs, drop_base + flat)
            s = _bm25(tfs, dl, w1[:, None], jnp.zeros_like(w1)[:, None], params, d.stats)
            acc = acc.at[lin.reshape(-1)].add(s.reshape(-1), mode="drop", unique_indices=True)
            cand_lin = dest[:, None] + pos
            if with_owner:
                owner = owner.at[lin.reshape(-1)].set((cand_lin + 1).reshape(-1), mode="drop",
                                                      unique_indices=True)
            lins.append(lin)
            cand_lins.append(cand_lin)
            masks.append(mask)
            docss.append(docs)

        cand = jnp.full(num_queries * cand_pad, -1.0, dtype=jnp.float32)
        cand_docs = jnp.full(num_queries * cand_pad, d.num_docs, dtype=jnp.int32)
        for r in range(R):
            summed = jnp.take(acc, lins[r].reshape(-1), axis=0).reshape(lins[r].shape)
            if with_owner:
                keep = masks[r] & (jnp.take(owner, lins[r].reshape(-1), axis=0).reshape(lins[r].shape)
                                   == cand_lins[r] + 1)
            else:
                keep = masks[r]
            vals = jnp.where(keep, summed, -1.0)
            cand = cand.at[cand_lins[r].reshape(-1)].set(vals.reshape(-1), mode="drop", unique_indices=True)
            cand_docs = cand_docs.at[cand_lins[r].reshape(-1)].set(docss[r].reshape(-1), mode="drop",
                                                                   unique_indices=True)

        top_scores, top_pos = jax.lax.top_k(cand.reshape(num_queries, cand_pad), topk)
        top_docs = jnp.take_along_axis(cand_docs.reshape(num_queries, cand_pad), top_pos, axis=1)
        top_docs = jnp.stack([
            (top_docs & 0xFF).astype(jnp.uint8),
            ((top_docs >> 8) & 0xFF).astype(jnp.uint8),
            ((top_docs >> 16) & 0xFF).astype(jnp.uint8),
        ], axis=-1)
        return top_scores.astype(jnp.bfloat16), top_docs


def main():
    exps = sys.argv[1:] or ["phase", "A"]
    data = bench.synth_index()
    dindex = DeviceIndex(data)
    engine = ScoringEngine(dindex)
    queries = make_queries(data)
    params = {"k1": 0.9, "b": 0.4}
    dev_params = {k: jnp.asarray(v, dtype=jnp.float32) for k, v in params.items()}

    def run_current(materialize=True, batch=Q):
        pending = []
        for i in range(0, NQ, batch):
            pending.append(engine.search(queries[i:i + batch], model="bm25", params=params,
                                         topk=K, materialize=False, score_dtype="bfloat16", pack_ords=True))
        if materialize:
            return [(np.asarray(s), np.asarray(o)) for s, o in pending]
        # force execution but fetch only a scalar per batch
        return [float(s[0, 0]) for s, _ in pending]

    if "phase" in exps:
        run_current()  # warmup
        t_full = timeit(lambda: run_current(True))
        t_comp = timeit(lambda: run_current(False))
        print(f"[phase] full pipeline: {t_full*1000:.0f} ms  ({NQ/t_full:.0f} q/s)")
        print(f"[phase] compute+scalar sync: {t_comp*1000:.0f} ms  ({NQ/t_comp:.0f} q/s)")
        # host-only: work-unit building
        t0 = time.perf_counter()
        for i in range(0, NQ, Q):
            engine._build_work_units(queries[i:i + Q], "bm25")
        t_host = time.perf_counter() - t0
        print(f"[phase] host work-unit building: {t_host*1000:.0f} ms")

    for variant, with_owner in (("A", True), ("B", False)):
        if variant not in exps:
            continue
        v = VariantEngine(dindex)
        batches = []
        for i in range(0, NQ, Q):
            batches.append(v.build_units(queries[i:i + Q], 4))
        cand_pad = max(c for _, c in batches)

        def run_variant(materialize=True):
            pending = [v.score(Q, K, cand_pad, with_owner, p, dev_params) for p, _ in batches]
            if materialize:
                return [(np.asarray(s), np.asarray(o)) for s, o in pending]
            return [float(s[0, 0]) for s, _ in pending]

        run_variant()  # warmup/compile
        t_full = timeit(lambda: run_variant(True))
        t_comp = timeit(lambda: run_variant(False))
        print(f"[{variant}] full: {t_full*1000:.0f} ms ({NQ/t_full:.0f} q/s); "
              f"compute: {t_comp*1000:.0f} ms ({NQ/t_comp:.0f} q/s)")

        if variant == "A":
            # equality vs current engine on the first batch
            ref_s, ref_o = engine.search(queries[:Q], model="bm25", params=params, topk=K)
            s, o = run_variant(True)[0]
            o0 = unpack_doc_ords(o)
            s0 = s.astype(np.float32)
            # compare sets at each k (tie order may differ)
            match = (o0 == ref_o).mean()
            smatch = np.allclose(np.sort(s0, axis=1), np.sort(ref_s.astype(np.float32), axis=1),
                                 rtol=2e-2, atol=1e-2)
            print(f"[{variant}] ord match {match:.4f}, score-multiset close: {smatch}")





# ---------------------------------------------------------- blocked top-k variants
def wide_topk(cand, k, block=32768):
    """Exact top-k over wide rows via per-block top-k + merge; preserves
    lax.top_k's lowest-index tie-break (see proof in scoring.py)."""
    q, w = cand.shape
    if w <= block:
        return jax.lax.top_k(cand, k)
    nb = w // block
    s1, p1 = jax.lax.top_k(cand.reshape(q * nb, block), k)
    off = (jnp.arange(nb, dtype=jnp.int32) * block).repeat(k)[None, :]
    s1 = s1.reshape(q, nb * k)
    gpos = p1.reshape(q, nb * k) + off
    s2, p2 = jax.lax.top_k(s1, k)
    return s2, jnp.take_along_axis(gpos, p2, axis=1)


def run_cd_experiments(dindex, engine, queries, dev_params):
    d = dindex
    n_rows = d.num_docs + 1

    def build(batch_q, need_owner):
        tile_idx, qidx, w1, w2, lo, hi, n = engine._build_work_units(batch_q, "bm25")
        u_pad = _bucket(max(n, 1))
        pad = u_pad - n
        if pad:
            tile_idx = np.concatenate([tile_idx, np.zeros(pad, np.int32)])
            qidx = np.concatenate([qidx, np.zeros(pad, np.int32)])
            w1 = np.concatenate([w1, np.zeros(pad, np.float32)])
            lo = np.concatenate([lo, np.zeros(pad, np.int32)])
            hi = np.concatenate([hi, np.zeros(pad, np.int32)])
        unit_rank = np.arange(n, dtype=np.int64) - np.searchsorted(qidx[:n], qidx[:n])
        cols = int(unit_rank.max() + 1) if n else 1
        cand_pad = _bucket(max(cols * TILE, K), minimum=TILE)
        dest = np.zeros(u_pad, dtype=np.int64)
        dest[:n] = qidx[:n].astype(np.int64) * cand_pad + unit_rank * TILE
        dest[n:] = Q * cand_pad
        packed = np.stack([tile_idx, qidx, w1.view(np.int32), np.zeros(u_pad, np.int32),
                           lo, hi, dest.astype(np.int32)])
        return packed, cand_pad

    @functools.partial(jax.jit, static_argnames=("cand_pad", "kprime", "with_owner"))
    def kernel(cand_pad, kprime, with_owner, packed, params):
        tile_idx, qidx = packed[0], packed[1]
        w1 = jax.lax.bitcast_convert_type(packed[2], jnp.float32)
        lo, hi, dest = packed[4], packed[5], packed[6]
        docs = jnp.take(d.doc_tiles, tile_idx, axis=0)
        tfs = jnp.take(d.tf_tiles, tile_idx, axis=0)
        dl = jnp.take(d.norm_dl_tiles, tile_idx, axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 1)
        mask = (pos >= lo[:, None]) & (pos < hi[:, None])
        lin = qidx[:, None] * n_rows + docs
        cand_lin = dest[:, None] + pos
        s = _bm25(tfs, dl, w1[:, None], w1[:, None], params, d.stats)
        s = jnp.where(mask, s, 0.0)
        acc = jnp.zeros(Q * n_rows, dtype=jnp.float32)
        acc = acc.at[lin.reshape(-1)].add(s.reshape(-1), mode="drop")
        summed = jnp.take(acc, lin.reshape(-1), axis=0).reshape(lin.shape)
        if with_owner:
            owner = jnp.zeros(Q * n_rows, dtype=jnp.int32)
            owner = owner.at[lin.reshape(-1)].max(
                jnp.where(mask, cand_lin + 1, 0).reshape(-1), mode="drop")
            keep = mask & (jnp.take(owner, lin.reshape(-1), axis=0).reshape(lin.shape) == cand_lin + 1)
        else:
            keep = mask
        vals = jnp.where(keep, summed, -1.0)
        cand = jnp.full(Q * cand_pad, -1.0, dtype=jnp.float32)
        cand = cand.at[cand_lin.reshape(-1)].set(vals.reshape(-1), mode="drop", unique_indices=True)
        cand_docs = jnp.full(Q * cand_pad, d.num_docs, dtype=jnp.int32)
        cand_docs = cand_docs.at[cand_lin.reshape(-1)].set(docs.reshape(-1), mode="drop", unique_indices=True)
        top_scores, top_pos = wide_topk(cand.reshape(Q, cand_pad), kprime)
        top_docs = jnp.take_along_axis(cand_docs.reshape(Q, cand_pad), top_pos, axis=1)
        top_docs = jnp.stack([(top_docs & 0xFF).astype(jnp.uint8),
                              ((top_docs >> 8) & 0xFF).astype(jnp.uint8),
                              ((top_docs >> 16) & 0xFF).astype(jnp.uint8)], axis=-1)
        return top_scores.astype(jnp.bfloat16), top_docs

    for name, with_owner, kprime in (("C: blocked topk + owner", True, K),):
        batches = [build(queries[i:i + Q], with_owner) for i in range(0, NQ, Q)]
        print(f"  cand_pads: {sorted(set(c for _, c in batches))}")

        def run(materialize=True):
            pending = [kernel(cand_pad, kprime, with_owner, p, dev_params) for p, cand_pad in batches]
            if not materialize:
                return [float(s[0, 0]) for s, _ in pending]
            out = []
            for s, o in pending:
                s = np.asarray(s).astype(np.float32)
                o = unpack_doc_ords(np.asarray(o))
                if not with_owner:  # host dedup: keep first occurrence of each doc
                    s2 = np.full((Q, K), -1.0, np.float32)
                    o2 = np.full((Q, K), d.num_docs, np.int32)
                    for qi in range(Q):
                        _, first = np.unique(o[qi], return_index=True)
                        keep = np.zeros(kprime, bool)
                        keep[first] = True
                        sel = np.nonzero(keep)[0][:K]
                        # exact unless the k' window was saturated with real scores
                        # and still yielded < K distinct docs (rare; -> fallback)
                        assert len(sel) == K or s[qi, -1] <= 0.0, "host dedup underflow"
                        s2[qi, :len(sel)], o2[qi, :len(sel)] = s[qi, sel], o[qi, sel]
                    s, o = s2, o2
                out.append((s, o))
            return out

        run()
        t_full = timeit(lambda: run(True))
        t_comp = timeit(lambda: run(False))
        print(f"[{name}] full: {t_full*1000:.0f} ms ({NQ/t_full:.0f} q/s); compute: {t_comp*1000:.0f} ms")
        # exactness vs current engine, batch 0
        ref_s, ref_o = engine.search(queries[:Q], model="bm25",
                                     params={"k1": 0.9, "b": 0.4}, topk=K)
        s, o = run(True)[0]
        print(f"  ord match {(o == ref_o).mean():.4f} score close "
              f"{np.allclose(s, ref_s, rtol=2e-2, atol=1e-2)}")


def main2():
    data = bench.synth_index()
    dindex = DeviceIndex(data)
    engine = ScoringEngine(dindex)
    queries = make_queries(data)
    dev_params = {"k1": jnp.asarray(0.9, jnp.float32), "b": jnp.asarray(0.4, jnp.float32)}
    run_cd_experiments(dindex, engine, queries, dev_params)


def run_stage_breakdown(dindex, engine, queries, dev_params):
    """Cumulative-stage timing of the real kernel on real bench work units."""
    d = dindex
    n_rows = d.num_docs + 1

    def build(batch_q):
        tile_idx, qidx, w1, w2, lo, hi, n = engine._build_work_units(batch_q, "bm25")
        u_pad = _bucket(max(n, 1))
        pad = u_pad - n
        if pad:
            tile_idx = np.concatenate([tile_idx, np.zeros(pad, np.int32)])
            qidx = np.concatenate([qidx, np.zeros(pad, np.int32)])
            w1 = np.concatenate([w1, np.zeros(pad, np.float32)])
            lo = np.concatenate([lo, np.zeros(pad, np.int32)])
            hi = np.concatenate([hi, np.zeros(pad, np.int32)])
        unit_rank = np.arange(n, dtype=np.int64) - np.searchsorted(qidx[:n], qidx[:n])
        cols = int(unit_rank.max() + 1) if n else 1
        cand_pad = _bucket(max(cols * TILE, K), minimum=TILE)
        dest = np.zeros(u_pad, dtype=np.int64)
        dest[:n] = qidx[:n].astype(np.int64) * cand_pad + unit_rank * TILE
        dest[n:] = Q * cand_pad
        packed = np.stack([tile_idx, qidx, w1.view(np.int32), np.zeros(u_pad, np.int32),
                           lo, hi, dest.astype(np.int32)])
        return packed, cand_pad, n

    @functools.partial(jax.jit, static_argnames=("cand_pad", "stage"))
    def kernel(cand_pad, stage, packed, params):
        tile_idx, qidx = packed[0], packed[1]
        w1 = jax.lax.bitcast_convert_type(packed[2], jnp.float32)
        lo, hi, dest = packed[4], packed[5], packed[6]
        docs = jnp.take(d.doc_tiles, tile_idx, axis=0)
        tfs = jnp.take(d.tf_tiles, tile_idx, axis=0)
        dl = jnp.take(d.norm_dl_tiles, tile_idx, axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 1)
        mask = (pos >= lo[:, None]) & (pos < hi[:, None])
        lin = qidx[:, None] * n_rows + docs
        cand_lin = dest[:, None] + pos
        s = _bm25(tfs, dl, w1[:, None], w1[:, None], params, d.stats)
        s = jnp.where(mask, s, 0.0)
        if stage == 0:
            return s.sum()[None]
        acc = jnp.zeros(Q * n_rows, dtype=jnp.float32)
        acc = acc.at[lin.reshape(-1)].add(s.reshape(-1), mode="drop")
        if stage == 1:
            return acc[:1]
        summed = jnp.take(acc, lin.reshape(-1), axis=0).reshape(lin.shape)
        if stage == 2:
            return summed.sum()[None]
        owner = jnp.zeros(Q * n_rows, dtype=jnp.int32)
        owner = owner.at[lin.reshape(-1)].max(
            jnp.where(mask, cand_lin + 1, 0).reshape(-1), mode="drop")
        if stage == 3:
            return owner[:1].astype(jnp.float32)
        keep = mask & (jnp.take(owner, lin.reshape(-1), axis=0).reshape(lin.shape) == cand_lin + 1)
        vals = jnp.where(keep, summed, -1.0)
        if stage == 4:
            return vals.sum()[None]
        cand = jnp.full(Q * cand_pad, -1.0, dtype=jnp.float32)
        cand = cand.at[cand_lin.reshape(-1)].set(vals.reshape(-1), mode="drop", unique_indices=True)
        cand_docs = jnp.full(Q * cand_pad, d.num_docs, dtype=jnp.int32)
        cand_docs = cand_docs.at[cand_lin.reshape(-1)].set(docs.reshape(-1), mode="drop", unique_indices=True)
        if stage == 5:
            return cand[:1] + cand_docs[:1].astype(jnp.float32)
        top_scores, top_pos = jax.lax.top_k(cand.reshape(Q, cand_pad), K)
        top_docs = jnp.take_along_axis(cand_docs.reshape(Q, cand_pad), top_pos, axis=1)
        return (top_scores.sum() + top_docs.sum())[None]

    batches = [build(queries[i:i + Q]) for i in range(0, NQ, Q)]
    units = [n for _, _, n in batches]
    print(f"  units/batch: min {min(units)} max {max(units)}; "
          f"u_pads {sorted(set(_bucket(max(n,1)) for n in units))}; "
          f"cand_pads {sorted(set(c for _, c, _ in batches))}")
    prev = 0.0
    names = ["score", "+scatter_add", "+summed gather", "+owner scatter", "+owner gather",
             "+cand scatters", "+topk"]
    for stage in range(7):
        def run():
            pending = [kernel(cand_pad, stage, p, dev_params) for p, cand_pad, _ in batches]
            return [float(np.asarray(x)[0]) for x in pending]
        run()
        t = timeit(run)
        print(f"  stage {stage} ({names[stage]}): {t*1000:.0f} ms total (+{(t-prev)*1000:.0f})")
        prev = t

def run_variant_e(dindex, engine, queries, dev_params):
    """Variant E: interleaved (score, owner) accumulator -> one pair gather;
    no cand_docs scatter (docs recovered from top-k positions via tile table);
    plus transfer-overlap test via copy_to_host_async."""
    d = dindex
    n_rows = d.num_docs + 1

    def build(batch_q):
        tile_idx, qidx, w1, w2, lo, hi, n = engine._build_work_units(batch_q, "bm25")
        u_pad = _bucket(max(n, 1))
        pad = u_pad - n
        if pad:
            tile_idx = np.concatenate([tile_idx, np.zeros(pad, np.int32)])
            qidx = np.concatenate([qidx, np.zeros(pad, np.int32)])
            w1 = np.concatenate([w1, np.zeros(pad, np.float32)])
            lo = np.concatenate([lo, np.zeros(pad, np.int32)])
            hi = np.concatenate([hi, np.zeros(pad, np.int32)])
        unit_rank = np.arange(n, dtype=np.int64) - np.searchsorted(qidx[:n], qidx[:n])
        cols = int(unit_rank.max() + 1) if n else 1
        cand_pad = _bucket(max(cols * TILE, K), minimum=TILE)
        ncols = cand_pad // TILE
        dest = np.zeros(u_pad, dtype=np.int64)
        dest[:n] = qidx[:n].astype(np.int64) * cand_pad + unit_rank * TILE
        dest[n:] = Q * cand_pad
        # tile table: [Q, ncols] -> tile idx feeding that candidate column
        tile_table = np.zeros((Q, ncols), dtype=np.int32)
        tile_table[qidx[:n], unit_rank] = tile_idx[:n]
        packed = np.stack([tile_idx, qidx, w1.view(np.int32), np.zeros(u_pad, np.int32),
                           lo, hi, dest.astype(np.int32)])
        return packed, tile_table, cand_pad

    @functools.partial(jax.jit, static_argnames=("cand_pad",))
    def kernel(cand_pad, packed, tile_table, params):
        tile_idx, qidx = packed[0], packed[1]
        w1 = jax.lax.bitcast_convert_type(packed[2], jnp.float32)
        lo, hi, dest = packed[4], packed[5], packed[6]
        docs = jnp.take(d.doc_tiles, tile_idx, axis=0)
        tfs = jnp.take(d.tf_tiles, tile_idx, axis=0)
        dl = jnp.take(d.norm_dl_tiles, tile_idx, axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 1)
        mask = (pos >= lo[:, None]) & (pos < hi[:, None])
        lin = qidx[:, None] * n_rows + docs
        cand_lin = dest[:, None] + pos
        s = _bm25(tfs, dl, w1[:, None], w1[:, None], params, d.stats)
        s = jnp.where(mask, s, 0.0)
        acc = jnp.zeros(Q * n_rows, dtype=jnp.float32)
        acc = acc.at[lin.reshape(-1)].add(s.reshape(-1), mode="drop")
        owner = jnp.zeros(Q * n_rows, dtype=jnp.int32)
        owner = owner.at[lin.reshape(-1)].max(
            jnp.where(mask, cand_lin + 1, 0).reshape(-1), mode="drop")
        summed = jnp.take(acc, lin.reshape(-1), axis=0).reshape(lin.shape)
        keep = mask & (jnp.take(owner, lin.reshape(-1), axis=0).reshape(lin.shape) == cand_lin + 1)
        vals = jnp.where(keep, summed, -1.0)
        cand = jnp.full(Q * cand_pad, -1.0, dtype=jnp.float32)
        cand = cand.at[cand_lin.reshape(-1)].set(vals.reshape(-1), mode="drop", unique_indices=True)
        top_scores, top_pos = jax.lax.top_k(cand.reshape(Q, cand_pad), K)
        # recover doc ords from positions: column -> tile via table, lane via pos % TILE
        ttile = jnp.take_along_axis(tile_table, top_pos // TILE, axis=1)  # [Q, K]
        top_docs = d.doc_tiles[ttile, top_pos % TILE]
        top_docs = jnp.where(top_scores > 0, top_docs, d.num_docs)
        top_docs = jnp.stack([(top_docs & 0xFF).astype(jnp.uint8),
                              ((top_docs >> 8) & 0xFF).astype(jnp.uint8),
                              ((top_docs >> 16) & 0xFF).astype(jnp.uint8)], axis=-1)
        return top_scores.astype(jnp.bfloat16), top_docs

    batches = [build(queries[i:i + Q]) for i in range(0, NQ, Q)]

    def run(mode="materialize"):
        pending = [kernel(cand_pad, p, jnp.asarray(tt), dev_params)
                   for p, tt, cand_pad in batches]
        if mode == "compute":
            return [float(s[0, 0]) for s, _ in pending]
        if mode == "async":
            for s, o in pending:
                s.copy_to_host_async()
                o.copy_to_host_async()
        return [(np.asarray(s), unpack_doc_ords(np.asarray(o))) for s, o in pending]

    run()
    t_full = timeit(lambda: run())
    t_comp = timeit(lambda: run("compute"))
    t_async = timeit(lambda: run("async"))
    print(f"[E] full: {t_full*1000:.0f} ms ({NQ/t_full:.0f} q/s); compute: {t_comp*1000:.0f} ms; "
          f"async-fetch: {t_async*1000:.0f} ms ({NQ/t_async:.0f} q/s)")
    ref_s, ref_o = engine.search(queries[:Q], model="bm25", params={"k1": 0.9, "b": 0.4}, topk=K)
    s, o = run()[0]
    print(f"  ord match {(o == ref_o).mean():.4f} score close "
          f"{np.allclose(np.asarray(s, np.float32), ref_s, rtol=2e-2, atol=1e-2)}")

    # current engine with async fetch (overlap test on the unmodified kernel)
    def run_cur_async():
        pending = [engine.search(queries[i:i + Q], model="bm25", params={"k1": 0.9, "b": 0.4},
                                 topk=K, materialize=False, score_dtype="bfloat16", pack_ords=True)
                   for i in range(0, NQ, Q)]
        for s, o in pending:
            s.copy_to_host_async()
            o.copy_to_host_async()
        return [(np.asarray(s), unpack_doc_ords(np.asarray(o))) for s, o in pending]

    run_cur_async()
    print(f"[current+async] {NQ/timeit(run_cur_async):.0f} q/s")

def run_variant_m(dindex, engine, queries, dev_params):
    """Variant M: dense per-(query, term-rank) score scatter (unique indices) +
    rank-reduce + blocked top-k over dense N. No dedup machinery at all."""
    d = dindex
    R = 4
    BLOCK = 32768
    n_pad = ((d.num_docs + BLOCK) // BLOCK) * BLOCK  # strictly > num_docs for sentinel drop
    nb = n_pad // BLOCK

    def build(batch_q):
        tids = np.fromiter((t for terms in batch_q for t, _ in terms), dtype=np.int64)
        qw = np.fromiter((w for terms in batch_q for _, w in terms), dtype=np.float64)
        qix = np.fromiter((q for q, terms in enumerate(batch_q) for _ in terms),
                          dtype=np.int32, count=len(tids))
        rank = np.fromiter((r for terms in batch_q for r, _ in enumerate(terms)),
                           dtype=np.int32, count=len(tids))
        starts = d.term_offsets[tids]
        ends = d.term_offsets[tids + 1]
        keep = ends > starts
        tids, qw, qix, rank, starts, ends = (tids[keep], qw[keep], qix[keep], rank[keep],
                                             starts[keep], ends[keep])
        w1 = (qw * d.idf[tids]).astype(np.float32)
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
        slot = (np.repeat(qix, counts) * R + np.repeat(rank, counts)).astype(np.int32)
        u_pad = _bucket(max(total, 1))
        packed = np.zeros((5, u_pad), dtype=np.int32)
        packed[0, :total] = tile
        packed[1, :total] = slot
        packed[2, :total] = np.repeat(w1, counts).view(np.int32)
        packed[3, :total] = lo
        packed[4, :total] = hi
        return packed

    @jax.jit
    def kernel(packed, params):
        tile_idx, slot = packed[0], packed[1]
        w1 = jax.lax.bitcast_convert_type(packed[2], jnp.float32)
        lo, hi = packed[3], packed[4]
        docs = jnp.take(d.doc_tiles, tile_idx, axis=0)
        tfs = jnp.take(d.tf_tiles, tile_idx, axis=0)
        dl = jnp.take(d.norm_dl_tiles, tile_idx, axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 1)
        mask = (pos >= lo[:, None]) & (pos < hi[:, None])
        s = _bm25(tfs, dl, w1[:, None], w1[:, None], params, d.stats)
        # dense [Q*R, n_pad]; masked lanes -> beyond-range index, dropped
        idx = jnp.where(mask, slot[:, None] * n_pad + docs, Q * R * n_pad)
        dense = jnp.zeros(Q * R * n_pad, dtype=jnp.float32)
        dense = dense.at[idx.reshape(-1)].set(s.reshape(-1), mode="drop", unique_indices=True)
        scores = dense.reshape(Q, R, n_pad).sum(axis=1)  # [Q, n_pad]
        # blocked exact top-k (tie-break: ascending doc ord, same as lax.top_k)
        s1, p1 = jax.lax.top_k(scores.reshape(Q * nb, BLOCK), K)
        off = (jnp.arange(nb, dtype=jnp.int32) * BLOCK).repeat(K)[None, :]
        gpos = p1.reshape(Q, nb * K) + off
        top_scores, p2 = jax.lax.top_k(s1.reshape(Q, nb * K), K)
        top_docs = jnp.take_along_axis(gpos, p2, axis=1)
        top_docs = jnp.where(top_scores > 0, top_docs, d.num_docs)
        top_docs = jnp.stack([(top_docs & 0xFF).astype(jnp.uint8),
                              ((top_docs >> 8) & 0xFF).astype(jnp.uint8),
                              ((top_docs >> 16) & 0xFF).astype(jnp.uint8)], axis=-1)
        return top_scores.astype(jnp.bfloat16), top_docs

    batches = [build(queries[i:i + Q]) for i in range(0, NQ, Q)]
    print(f"  u_pads: {sorted(set(p.shape[1] for p in batches))}")

    def run(mode="async"):
        pending = [kernel(p, dev_params) for p in batches]
        if mode == "compute":
            return [float(s[0, 0]) for s, _ in pending]
        if mode == "async":
            for s, o in pending:
                s.copy_to_host_async()
                o.copy_to_host_async()
        return [(np.asarray(s), unpack_doc_ords(np.asarray(o))) for s, o in pending]

    run()
    t_async = timeit(lambda: run("async"))
    t_comp = timeit(lambda: run("compute"))
    print(f"[M] async: {t_async*1000:.0f} ms ({NQ/t_async:.0f} q/s); compute: {t_comp*1000:.0f} ms")
    ref_s, ref_o = engine.search(queries[:Q], model="bm25", params={"k1": 0.9, "b": 0.4}, topk=K)
    s, o = run()[0]
    real = np.asarray(ref_s) > 0
    print(f"  ord match (real entries): {(o == ref_o)[real].mean():.4f} score close "
          f"{np.allclose(np.asarray(s, np.float32)[real], ref_s[real], rtol=2e-2, atol=1e-2)}")

def run_m_stages(dindex, engine, queries, dev_params):
    """Amortized-RTT stage costs of variant M's kernel (10 dispatches, sync last)."""
    d = dindex
    R = 4
    BLOCK = 32768
    n_pad = ((d.num_docs + BLOCK) // BLOCK) * BLOCK
    nb = n_pad // BLOCK

    import exp_bm25  # self-import for build reuse when run as script
    build = None
    # rebuild the M work units inline (same as run_variant_m.build)
    def build(batch_q):
        tids = np.fromiter((t for terms in batch_q for t, _ in terms), dtype=np.int64)
        qw = np.fromiter((w for terms in batch_q for _, w in terms), dtype=np.float64)
        qix = np.fromiter((q for q, terms in enumerate(batch_q) for _ in terms),
                          dtype=np.int32, count=len(tids))
        rank = np.fromiter((r for terms in batch_q for r, _ in enumerate(terms)),
                           dtype=np.int32, count=len(tids))
        starts = d.term_offsets[tids]
        ends = d.term_offsets[tids + 1]
        keep = ends > starts
        tids, qw, qix, rank, starts, ends = (tids[keep], qw[keep], qix[keep], rank[keep],
                                             starts[keep], ends[keep])
        w1 = (qw * d.idf[tids]).astype(np.float32)
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
        slot = (np.repeat(qix, counts) * R + np.repeat(rank, counts)).astype(np.int32)
        u_pad = 4096
        packed = np.zeros((5, u_pad), dtype=np.int32)
        packed[0, :total] = tile
        packed[1, :total] = slot
        packed[2, :total] = np.repeat(w1, counts).view(np.int32)
        packed[3, :total] = lo
        packed[4, :total] = hi
        return packed

    @functools.partial(jax.jit, static_argnames=("stage",))
    def kernel(stage, packed, params):
        tile_idx, slot = packed[0], packed[1]
        w1 = jax.lax.bitcast_convert_type(packed[2], jnp.float32)
        lo, hi = packed[3], packed[4]
        docs = jnp.take(d.doc_tiles, tile_idx, axis=0)
        tfs = jnp.take(d.tf_tiles, tile_idx, axis=0)
        dl = jnp.take(d.norm_dl_tiles, tile_idx, axis=0)
        pos = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 1)
        mask = (pos >= lo[:, None]) & (pos < hi[:, None])
        s = _bm25(tfs, dl, w1[:, None], w1[:, None], params, d.stats)
        if stage == 0:
            return jnp.where(mask, s, 0.0).sum()
        idx = jnp.where(mask, slot[:, None] * n_pad + docs, Q * R * n_pad)
        dense = jnp.zeros(Q * R * n_pad, dtype=jnp.float32)
        dense = dense.at[idx.reshape(-1)].set(s.reshape(-1), mode="drop", unique_indices=True)
        if stage == 1:
            return dense[0]
        scores = dense.reshape(Q, R, n_pad).sum(axis=1)
        if stage == 2:
            return scores[0, 0]
        s1, p1 = jax.lax.top_k(scores.reshape(Q * nb, BLOCK), K)
        if stage == 3:
            return s1[0, 0]
        off = (jnp.arange(nb, dtype=jnp.int32) * BLOCK).repeat(K)[None, :]
        gpos = p1.reshape(Q, nb * K) + off
        top_scores, p2 = jax.lax.top_k(s1.reshape(Q, nb * K), K)
        top_docs = jnp.take_along_axis(gpos, p2, axis=1)
        return top_scores[0, 0] + top_docs[0, 0].astype(jnp.float32)

    batches = [build(queries[i:i + Q]) for i in range(0, NQ, Q)]
    names = ["score only", "+dense scatter", "+rank reduce", "+block topk", "+merge topk"]
    prev = 0.0
    for stage in range(5):
        def run():
            outs = [kernel(stage, p, dev_params) for p in batches]
            return float(outs[-1])  # in-order execution: syncing last syncs all
        run()
        t = timeit(run)
        print(f"  stage {stage} ({names[stage]}): {t*1000:.0f} ms (+{(t-prev)*1000:.0f}) "
              f"= {(t-prev)*1000/8:.1f} ms/batch marginal")
        prev = t

if __name__ == "__main__":
    if "mstages" in sys.argv:
        data = bench.synth_index()
        dindex = DeviceIndex(data)
        engine = ScoringEngine(dindex)
        run_m_stages(dindex, engine, make_queries(data),
                     {"k1": jnp.asarray(0.9, jnp.float32), "b": jnp.asarray(0.4, jnp.float32)})
    elif "M" in sys.argv:
        data = bench.synth_index()
        dindex = DeviceIndex(data)
        engine = ScoringEngine(dindex)
        run_variant_m(dindex, engine, make_queries(data),
                      {"k1": jnp.asarray(0.9, jnp.float32), "b": jnp.asarray(0.4, jnp.float32)})
    elif "E" in sys.argv:
        data = bench.synth_index()
        dindex = DeviceIndex(data)
        engine = ScoringEngine(dindex)
        run_variant_e(dindex, engine, make_queries(data),
                      {"k1": jnp.asarray(0.9, jnp.float32), "b": jnp.asarray(0.4, jnp.float32)})
    elif "stages" in sys.argv:
        data = bench.synth_index()
        dindex = DeviceIndex(data)
        engine = ScoringEngine(dindex)
        run_stage_breakdown(dindex, engine, make_queries(data),
                            {"k1": jnp.asarray(0.9, jnp.float32), "b": jnp.asarray(0.4, jnp.float32)})
    elif "CD" in sys.argv:
        main2()
    else:
        main()








