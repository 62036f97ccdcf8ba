"""The compact-candidate top-k path must match the exact dense path."""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine
from tests.test_parallel import make_synthetic_index


@pytest.mark.parametrize("model", ["bm25", "qld"])
def test_compact_matches_exact(model):
    data = make_synthetic_index(num_docs=500, num_terms=60, seed=3)
    engine = ScoringEngine(DeviceIndex(data))
    rng = np.random.Generator(np.random.PCG64(0))
    queries = [
        [(int(t), 1.0 + i % 2) for i, t in enumerate(rng.choice(60, size=5, replace=False))]
        for _ in range(7)
    ] + [[]]  # empty query must not break anything
    params = {"k1": 0.9, "b": 0.4} if model == "bm25" else {"mu": 500.0}

    s_exact, d_exact = engine.search(queries, model=model, params=params, topk=50, exact_topk=True)
    s_comp, d_comp = engine.search(queries, model=model, params=params, topk=50, exact_topk=False)

    for q in range(len(queries)):
        exact_valid = s_exact[q] > 0
        comp_valid = s_comp[q] > 0
        assert exact_valid.sum() == comp_valid.sum(), f"query {q}: candidate counts differ"
        np.testing.assert_allclose(s_comp[q][comp_valid], s_exact[q][exact_valid], rtol=1e-5)
        # same docs at each (tie-broken) score level: compare sets per distinct score
        assert set(d_comp[q][comp_valid]) == set(d_exact[q][exact_valid]), f"query {q}"


def test_compact_with_grid():
    data = make_synthetic_index(num_docs=300, num_terms=40, seed=1)
    engine = ScoringEngine(DeviceIndex(data))
    queries = [[(1, 1.0), (2, 1.0)], [(3, 2.0)]]
    grid = {"k1": [0.9, 1.2], "b": [0.4]}
    s_exact, d_exact = engine.search(queries, grid=grid, topk=20, exact_topk=True)
    s_comp, d_comp = engine.search(queries, grid=grid, topk=20, exact_topk=False)
    # axes ordered by sorted param name: b (1), k1 (2), then Q
    assert s_exact.shape == s_comp.shape == (1, 2, 2, 20)
    for idx in np.ndindex(1, 2, 2):
        valid = s_exact[idx] > 0
        np.testing.assert_allclose(s_comp[idx][valid], s_exact[idx][valid], rtol=1e-5)


def test_search_fused_matches_search():
    data = make_synthetic_index(num_docs=400, num_terms=50, seed=7)
    from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine

    engine = ScoringEngine(DeviceIndex(data))
    rng = np.random.Generator(np.random.PCG64(5))
    batches = [
        [[(int(t), 1.0) for t in rng.choice(50, size=4, replace=False)] for _ in range(6)]
        for _ in range(3)
    ]
    fused_scores, fused_ords = engine.search_fused(batches, params={"k1": 0.9, "b": 0.4}, topk=25)
    for si, batch in enumerate(batches):
        s_ref, o_ref = engine.search(batch, params={"k1": 0.9, "b": 0.4}, topk=25, exact_topk=False)
        valid = s_ref > 0
        fs, fo = fused_scores[si], fused_ords[si]
        np.testing.assert_allclose(fs[valid], s_ref[valid], rtol=1e-5)
        assert (fo[valid] == o_ref[valid]).all()


def test_packed_ords_roundtrip():
    from capreolus_tpu.searcher.scoring import (DeviceIndex, ScoringEngine, _ord_pack_geometry,
                                                ord_pack_bits)

    data = make_synthetic_index(num_docs=300, num_terms=40, seed=2)
    engine = ScoringEngine(DeviceIndex(data))
    queries = [[(1, 1.0), (5, 1.0)], [(7, 2.0)]]
    ref_s, ref_o = engine.search(queries, params={"k1": 0.9, "b": 0.4}, topk=20, exact_topk=False)
    s, o = engine.search(queries, params={"k1": 0.9, "b": 0.4}, topk=20, exact_topk=False, pack_ords=True)
    np.testing.assert_allclose(s, ref_s, rtol=1e-6)
    np.testing.assert_array_equal(o, ref_o)

    # materialize=False returns a pending result whose .get() yields the same arrays
    pending = engine.search(queries, params={"k1": 0.9, "b": 0.4}, topk=20, exact_topk=False,
                            pack_ords=True, materialize=False)
    # the raw device buffer is bit-packed ordinal words: ceil(log2) bits per
    # ordinal (9 bits for a 300-doc corpus) in whole uint32 words per group
    bits = ord_pack_bits(300)
    _, wpg = _ord_pack_geometry(bits)
    assert bits == 9
    po = np.asarray(pending.ords)
    assert po.dtype == np.uint32 and po.shape[-1] == wpg
    ps, po = pending.get()
    np.testing.assert_allclose(ps, ref_s, rtol=1e-6)
    np.testing.assert_array_equal(po, ref_o)


def test_ord_bit_packing_all_widths():
    """unpack_doc_ords_bits inverts the device packing convention (one
    continuous little-endian b-bit stream in uint32 words) for every width the
    engine can choose."""
    from capreolus_tpu.searcher.scoring import _ord_pack_geometry, unpack_doc_ords_bits

    rng = np.random.Generator(np.random.PCG64(9))
    for bits in range(1, 25):
        g, wpg = _ord_pack_geometry(bits)
        assert g * bits == 32 * wpg
        k = 37
        kp = ((k + g - 1) // g) * g
        vals = rng.integers(0, 1 << bits, size=(3, kp), dtype=np.uint64)
        words = np.zeros((3, kp * bits // 32), np.uint32)
        for r in range(3):  # reference packer: python big-int bitstream
            stream = 0
            for i, v in enumerate(vals[r].tolist()):
                stream |= int(v) << (bits * i)
            for j in range(words.shape[1]):
                words[r, j] = (stream >> (32 * j)) & 0xFFFFFFFF
        out = unpack_doc_ords_bits(words.reshape(3, kp // g, wpg), k, bits)
        np.testing.assert_array_equal(out, vals[:, :k].astype(np.int32))


def test_tiered_empty_query_batch():
    """An empty batch must return (0, topk)-shaped arrays on the tiered path
    (regression: zero tiers reached jnp.concatenate([]) at trace time after
    the device-side row-compaction rewrite)."""
    data = make_synthetic_index(num_docs=300, num_terms=40, seed=2)
    engine = ScoringEngine(DeviceIndex(data))
    params = {"k1": 0.9, "b": 0.4}

    scores, ords = engine.search([], model="bm25", params=params, topk=20, exact_topk=False)
    assert scores.shape == (0, 20) and ords.shape == (0, 20)

    res = engine.search([], model="bm25", params=params, topk=20,
                        exact_topk=False, materialize=False)
    scores, ords = res.get()
    assert scores.shape == (0, 20) and ords.shape == (0, 20)

    # grid axes keep their leading shape on the empty batch too
    scores, ords = engine.search([], model="bm25", params={"b": 0.4}, topk=20,
                                 exact_topk=False, grid={"k1": [0.8, 0.9, 1.2]})
    assert scores.shape == (3, 0, 20) and ords.shape == (3, 0, 20)
