"""ColBERT late-interaction model + searcher (beyond the reference, which only
consumes a static TCT-ColBERT run: reference searcher/special.py:170-212)."""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.reranker import Reranker


def test_maxsim_matches_numpy_referee():
    import jax.numpy as jnp

    from capreolus_tpu.reranker.colbert import maxsim

    rng = np.random.RandomState(0)
    B, Lq, Ld, dim = 3, 5, 9, 4
    q = rng.randn(B, Lq, dim).astype(np.float32)
    d = rng.randn(B, Ld, dim).astype(np.float32)
    dmask = (rng.rand(B, Ld) > 0.3).astype(np.int32)
    dmask[:, 0] = 1  # at least one valid token
    got = np.asarray(maxsim(jnp.asarray(q), jnp.asarray(d), jnp.asarray(dmask)))
    want = np.zeros(B, np.float32)
    for b in range(B):
        for i in range(Lq):
            sims = [float(q[b, i] @ d[b, j]) for j in range(Ld) if dmask[b, j]]
            want[b] += max(sims)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_marker_insertion_and_query_augmentation():
    import jax.numpy as jnp

    from capreolus_tpu.reranker.colbert import DOC_MARKER, MASK_ID, QUERY_MARKER, insert_marker

    toks = jnp.asarray([[101, 7, 8, 9, 102, 0, 0, 0]], jnp.int32)
    q = np.asarray(insert_marker(toks, QUERY_MARKER))
    # [CLS] [Q] t... with the last position dropped (length preserved)
    np.testing.assert_array_equal(q[0], [101, QUERY_MARKER, 7, 8, 9, 102, 0, 0])
    d = np.asarray(insert_marker(toks, DOC_MARKER))
    assert d[0, 1] == DOC_MARKER
    # augmentation replaces [PAD] with [MASK] (applied inside encode_query)
    aug = np.where(q == 0, MASK_ID, q)
    assert (aug != 0).all() and aug[0, -1] == MASK_ID


def test_colbert_forward_and_ranking_shape(tmpdir_as_cache):
    import jax

    reranker = Reranker.create("colbert", {
        "pretrained": "tiny", "allowrandominit": True, "dim": 8,
        "extractor": {"maxqlen": 4, "maxdoclen": 16, "index": {"collection": {"name": "dummy"}}},
        "trainer": {"niters": 1, "itersize": 4, "batch": 2},
    })
    from capreolus_tpu.benchmark import Benchmark

    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0}, "302": {"D002": 2.0, "D001": 1.0}}
    reranker.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    reranker.build_model()
    batch = reranker.extractor.id2vec("301", "D001", negid="D002")
    batch = {k: np.asarray(v)[None, ...] for k, v in batch.items()}
    params = reranker.init_params(jax.random.PRNGKey(0), batch)
    pos, neg = reranker.score(params, batch)
    assert pos.shape == (1,) and neg.shape == (1,)
    assert np.isfinite(np.asarray(pos)).all() and np.isfinite(np.asarray(neg)).all()
    # per-token projections are L2-normalized, so MaxSim is bounded by maxqlen+1
    lq = batch["query"].shape[-1]
    assert float(np.abs(np.asarray(pos))[0]) <= lq + 1e-4


def test_colbert_train_smoke(tmpdir_as_cache, tmp_path):
    from capreolus_tpu.benchmark import Benchmark
    from capreolus_tpu.sampler import Sampler

    reranker = Reranker.create("colbert", {
        "pretrained": "tiny", "allowrandominit": True, "dim": 8,
        "extractor": {"maxqlen": 4, "maxdoclen": 16, "index": {"collection": {"name": "dummy"}}},
        "trainer": {"niters": 1, "itersize": 4, "batch": 2, "validatefreq": 1},
    })
    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0}, "302": {"D002": 2.0, "D001": 1.0}}
    reranker.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    metrics = reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                                     benchmark.qrels, metric="map")
    assert np.isfinite(metrics["map"])
    assert (tmp_path / "t" / "dev.best.params").exists()


def test_colbert_searcher_end_to_end_and_checkpoint_handoff(tmpdir_as_cache, tmp_path):
    """Train the colbert reranker, export its checkpoint into the late-interaction
    searcher, and search: the searcher must load the TRAINED weights (not the
    random fallback) and produce a full ranking."""
    from capreolus_tpu.benchmark import Benchmark
    from capreolus_tpu.sampler import Sampler
    from capreolus_tpu.searcher import Searcher

    reranker = Reranker.create("colbert", {
        "pretrained": "tiny", "allowrandominit": True, "dim": 8,
        "extractor": {"maxqlen": 4, "maxdoclen": 16, "index": {"collection": {"name": "dummy"}}},
        "trainer": {"niters": 1, "itersize": 4, "batch": 2, "validatefreq": 1},
    })
    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0}, "302": {"D002": 2.0, "D001": 1.0}}
    reranker.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                           benchmark.qrels, metric="map")
    ckpt = tmp_path / "t" / "dev.best.params"
    assert ckpt.exists()

    searcher = Searcher.create("colbert", {
        "checkpointfile": str(ckpt), "dim": 8, "maxdoclen": 32, "maxqlen": 8,
        "batch": 4, "chunk": 2, "index": {"collection": {"name": "dummy"}}})
    searcher.index.create_index()
    _, variables = searcher._encoder()
    trained = np.asarray(reranker.trainer._params["params"]["linear"]["kernel"])
    np.testing.assert_allclose(np.asarray(variables["params"]["linear"]["kernel"]), trained, atol=1e-6)

    results = searcher.query("galaxies collide")
    assert len(results) == 3  # full ranking over the dummy corpus
    assert all(np.isfinite(s) for s in results.values())


def test_colbert_searcher_chunking_invariant(tmpdir_as_cache, tmp_path):
    """MaxSim scores must not depend on the chunk size (pad docs masked out)."""
    from capreolus_tpu.searcher import Searcher

    runs = {}
    for chunk in (1, 2, 3):
        searcher = Searcher.create("colbert", {
            "dim": 8, "maxdoclen": 32, "maxqlen": 8, "batch": 4, "chunk": chunk,
            "allowrandominit": True, "index": {"collection": {"name": "dummy"}}})
        searcher.index.create_index()
        runs[chunk] = searcher.query("telescope galaxies")
    for chunk in (2, 3):
        assert list(runs[chunk]) == list(runs[1])
        for d in runs[1]:
            assert runs[chunk][d] == pytest.approx(runs[1][d], abs=1e-2)  # bf16 chunk sums


def test_colbert_sharded_matches_single(tmpdir_as_cache, tmp_path):
    """Doc-partitioned MaxSim over the 8-device mesh == single-device search
    (same ranking, same scores; shard-pad docs never surface)."""
    from capreolus_tpu.searcher import Searcher

    base = {"dim": 8, "maxdoclen": 32, "maxqlen": 8, "batch": 4, "chunk": 1,
            "allowrandominit": True, "index": {"collection": {"name": "dummy"}}}
    single = Searcher.create("colbert", dict(base))
    single.index.create_index()
    run1 = single.query("telescope galaxies")
    sharded = Searcher.create("colbert", {**base, "shards": 4})
    sharded.index.create_index()
    run4 = sharded.query("telescope galaxies")
    assert list(run4) == list(run1)
    for d in run1:
        assert run4[d] == pytest.approx(run1[d], abs=1e-2)


def test_colbert_training_produces_useful_retriever(tmpdir_as_cache, tmp_path):
    """Retrieval-QUALITY referee for the late-interaction loop (mirrors the
    dense loop's gate, tests/test_dense.py): after training on the dummy
    fixtures, the exported colbert searcher must reach full recall, place
    relevant docs decisively above the random-MRR expectation, and not be worse
    than the untrained random-init encoder. Bad convergence now fails CI."""
    from capreolus_tpu.benchmark import Benchmark
    from capreolus_tpu.evaluation.metrics import eval_run
    from capreolus_tpu.sampler import Sampler
    from capreolus_tpu.searcher import Searcher

    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0},
           "302": {"D002": 2.0, "D001": 1.5, "D003": 1.0}}

    reranker = Reranker.create("colbert", {
        "pretrained": "tiny", "allowrandominit": True, "dim": 8,
        "extractor": {"maxqlen": 8, "maxdoclen": 32,
                      "index": {"collection": {"name": "dummy"}}},
        "trainer": {"niters": 6, "itersize": 16, "batch": 2, "validatefreq": 6},
    })
    reranker.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    out = tmp_path / "t"
    reranker.trainer.train(reranker, sampler, out, dev, out / "d", benchmark.qrels, metric="map")
    ckpt = out / "dev.best.params"
    assert ckpt.exists()

    base = {"dim": 8, "maxdoclen": 32, "maxqlen": 8, "batch": 4,
            "index": {"collection": {"name": "dummy"}}}
    searcher = Searcher.create("colbert", {**base, "checkpointfile": str(ckpt)})
    searcher.index.create_index()
    topics = benchmark.topics[benchmark.query_type]
    trained_run = {qid: searcher.query(topics[qid]) for qid in ("301", "302")}
    wanted = ["recip_rank", "recall_1000"]
    metrics = eval_run(trained_run, benchmark.qrels, wanted,
                       relevance_level=benchmark.relevance_level)
    assert metrics["recall_1000"] == 1.0
    assert metrics["recip_rank"] >= 0.75, metrics
    untrained = Searcher.create("colbert", {**base, "allowrandominit": True})
    untrained.index.create_index()
    untrained_run = {qid: untrained.query(topics[qid]) for qid in ("301", "302")}
    um = eval_run(untrained_run, benchmark.qrels, wanted,
                  relevance_level=benchmark.relevance_level)
    assert metrics["recip_rank"] >= um["recip_rank"] - 1e-9


def test_colbert_trains_with_tensor_parallelism(tmpdir_as_cache, tmp_path):
    """trainer.tp=2 shards colbert's BERT layers over the model axis (the TP
    rules are path-suffix based, so they apply to any model with a 'bert'
    submodule) and the train step runs on the (data, model) mesh."""
    from capreolus_tpu.benchmark import Benchmark
    from capreolus_tpu.sampler import Sampler

    reranker = Reranker.create("colbert", {
        "pretrained": "tiny", "allowrandominit": True, "dim": 8,
        "extractor": {"maxqlen": 4, "maxdoclen": 16, "index": {"collection": {"name": "dummy"}}},
        "trainer": {"niters": 1, "itersize": 4, "batch": 4, "validatefreq": 1, "tp": 2},
    })
    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0}, "302": {"D002": 2.0, "D001": 1.0}}
    reranker.extractor.preprocess(list(run), {d for docs in run.values() for d in docs},
                                  benchmark.topics[benchmark.query_type])
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    metrics = reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                                     benchmark.qrels, metric="map")
    assert np.isfinite(metrics["map"])
    mesh_shape = dict(reranker.trainer._data_mesh.shape)
    assert mesh_shape.get("model") == 2, mesh_shape


def test_colbert_prefilter_two_stage(tmpdir_as_cache, tmp_path):
    """prefilter=N (PLAID-pattern two-stage): with n_cand >= corpus size the
    result must EQUAL exact MaxSim (stage 2 is exact over all candidates); a
    tighter prefilter still returns valid rankings without duplicate docids;
    prefilter + shards is rejected."""
    from capreolus_tpu.core import ConfigError
    from capreolus_tpu.searcher import Searcher

    base = {"dim": 8, "maxdoclen": 32, "maxqlen": 8, "batch": 4, "chunk": 2,
            "allowrandominit": True, "index": {"collection": {"name": "dummy"}}}
    exact = Searcher.create("colbert", dict(base))
    exact.index.create_index()
    run_exact = exact.query("telescope galaxies")

    full = Searcher.create("colbert", {**base, "prefilter": 10})  # >= 3 docs: exact
    full.index.create_index()
    run_full = full.query("telescope galaxies")
    assert list(run_full) == list(run_exact)
    for d in run_exact:
        assert run_full[d] == pytest.approx(run_exact[d], abs=1e-2)

    tight = Searcher.create("colbert", {**base, "prefilter": 2})
    tight.index.create_index()
    run_tight = tight.query("telescope galaxies")
    assert len(run_tight) == 2 and len(set(run_tight)) == 2  # no dup docids
    assert set(run_tight) <= set(run_exact)

    with pytest.raises(ConfigError):
        Searcher.create("colbert", {**base, "prefilter": 2, "shards": 2})


def test_colbert_int8_quantized_search(tmpdir_as_cache, tmp_path):
    """searcher.quantize=int8 MaxSim: per-doc scales factor out of max/sum
    exactly, so rankings track bf16 exact (scores approx); int8 composes with
    shards (equality) and with prefilter (n_cand >= corpus: equals int8 exact)."""
    from capreolus_tpu.searcher import Searcher

    base = {"dim": 8, "maxdoclen": 32, "maxqlen": 8, "batch": 4, "chunk": 2,
            "allowrandominit": True, "index": {"collection": {"name": "dummy"}}}
    exact = Searcher.create("colbert", dict(base))
    exact.index.create_index()
    run_exact = exact.query("telescope galaxies")

    q8 = Searcher.create("colbert", {**base, "quantize": "int8"})
    q8.index.create_index()
    run_q8 = q8.query("telescope galaxies")
    assert set(run_q8) == set(run_exact)
    best_e = max(run_exact.values())
    best_q_doc = max(run_q8.items(), key=lambda kv: kv[1])[0]
    assert run_exact[best_q_doc] >= best_e - 5e-2  # int8 winner near-optimal
    for d in run_exact:
        assert run_q8[d] == pytest.approx(run_exact[d], abs=5e-2)

    sharded = Searcher.create("colbert", {**base, "quantize": "int8", "shards": 2})
    sharded.index.create_index()
    run_sh = sharded.query("telescope galaxies")
    assert list(run_sh) == list(run_q8)
    for d in run_q8:
        assert run_sh[d] == pytest.approx(run_q8[d], abs=1e-4)

    pre = Searcher.create("colbert", {**base, "quantize": "int8", "prefilter": 10})
    pre.index.create_index()
    run_pre = pre.query("telescope galaxies")
    assert list(run_pre) == list(run_q8)
    for d in run_q8:
        # stage-2 keeps int32 sims while the main path uses bf16 sims (the
        # measured-faster layout): scores agree to bf16 rounding, not exactly
        assert run_pre[d] == pytest.approx(run_q8[d], rel=2e-2, abs=1e-2)

    from capreolus_tpu.core import ConfigError
    with pytest.raises(ConfigError):
        Searcher.create("colbert", {**base, "quantize": "fp4"})


def test_colbert_int4_quantized_search(tmpdir_as_cache, tmp_path):
    """searcher.quantize=int4 (capacity tier): packed nibbles unpack to int8
    chunk-wise on device; rankings track bf16 exact within 4-bit rounding, the
    engine rejects the unsupported shards/prefilter/streaming combos, and a
    numpy referee pins the unpack-dequantize math end to end."""
    import numpy as np

    from capreolus_tpu.core import ConfigError
    from capreolus_tpu.searcher import Searcher

    base = {"dim": 8, "maxdoclen": 32, "maxqlen": 8, "batch": 4, "chunk": 2,
            "allowrandominit": True, "index": {"collection": {"name": "dummy"}}}
    exact = Searcher.create("colbert", dict(base))
    exact.index.create_index()
    run_exact = exact.query("telescope galaxies")

    q4 = Searcher.create("colbert", {**base, "quantize": "int4", "rescore": 0})
    q4.index.create_index()
    run_q4 = q4.query("telescope galaxies")
    assert set(run_q4) == set(run_exact)
    best_e = max(run_exact.values())
    best_q_doc = max(run_q4.items(), key=lambda kv: kv[1])[0]
    assert run_exact[best_q_doc] >= best_e - 2e-1  # 4-bit winner near-optimal
    for d in run_exact:
        assert run_q4[d] == pytest.approx(run_exact[d], abs=2e-1)

    # numpy referee over the packed corpus: searcher scores == MaxSim on the
    # dequantized int4 corpus with int8-quantized queries (exact factoring)
    from capreolus_tpu.ops.quantization import quantize_rows_int4, quantize_rows

    emb = np.load(q4._doc_cache_file()).astype(np.float32)
    mask = np.load(q4._mask_file())
    n, ld, dim = emb.shape
    packed, dscale = quantize_rows_int4(emb.reshape(n, ld * dim))
    lo = (packed & 0xF).astype(np.int8)
    hi = (packed >> 4).astype(np.int8)
    lo = np.where(lo > 7, lo - 16, lo)
    hi = np.where(hi > 7, hi - 16, hi)
    deq = np.stack([lo, hi], axis=-1).reshape(n, -1)[:, : ld * dim].reshape(n, ld, dim)

    model, variables = q4._encoder()
    toks = q4._tokenize(["telescope galaxies"], 8)
    toks = np.concatenate([toks, np.zeros((3, 8), np.int32)])
    q_emb = np.asarray(q4._encode_query_jit(variables, toks)[0])[:1].astype(np.float32)
    q_i8 = np.asarray(quantize_rows(q_emb)[0], np.float32)
    qscale = np.abs(q_emb.reshape(q_emb.shape[0], -1)).max(axis=1) / 127.0
    docids = q4.index.data.docid_strings
    for docid, score in run_q4.items():
        o = docids.index(docid)
        sims = np.einsum("le,ke->lk", q_i8[0], deq[o])
        sims = np.where(mask[o][None, :] > 0, sims, -1e9)
        ref = sims.max(axis=1).sum() * qscale[0] * dscale[o]
        assert score == pytest.approx(float(ref), rel=2e-2, abs=2e-2)

    with pytest.raises(ConfigError):
        Searcher.create("colbert", {**base, "quantize": "int4", "shards": 2})
    with pytest.raises(ConfigError):
        Searcher.create("colbert", {**base, "quantize": "int4", "prefilter": 5})
    tiny_budget = Searcher.create("colbert", {**base, "quantize": "int4", "hbmbudget": 0.0001})
    tiny_budget.index.create_index()
    with pytest.raises(ConfigError):
        tiny_budget.query("telescope galaxies")


def test_colbert_int4_two_stage_rescore(tmpdir_as_cache, tmp_path):
    """quantize=int4 with rescore=R (the default mode): the packed engine
    generates candidates and a full-precision host MaxSim from the mmapped
    token-embedding cache restores the exact ranking — with R >= corpus the
    run must match a numpy f32 MaxSim referee over the cache bit-for-bit in
    ordering and to float tolerance in score."""
    import numpy as np

    from capreolus_tpu.searcher import Searcher

    base = {"dim": 8, "maxdoclen": 32, "maxqlen": 8, "batch": 4, "chunk": 2,
            "allowrandominit": True, "index": {"collection": {"name": "dummy"}}}
    rescored = Searcher.create("colbert", {**base, "quantize": "int4", "rescore": 500})
    rescored.index.create_index()
    run = rescored.query("telescope galaxies")

    # numpy full-precision referee straight from the disk cache
    emb = np.load(rescored._doc_cache_file()).astype(np.float32)
    mask = np.load(rescored._mask_file())
    model, variables = rescored._encoder()
    toks = rescored._tokenize(["telescope galaxies"], 8)
    toks = np.concatenate([toks, np.zeros((3, 8), np.int32)])
    q = np.asarray(rescored._encode_query_jit(variables, toks)[0])[0].astype(np.float32)
    sims = np.einsum("le,nke->nlk", q, emb)                     # [N, Lq, Ld]
    sims = np.where(mask[:, None, :] > 0, sims, -1e9)
    ref = sims.max(axis=-1).sum(axis=-1)                        # [N]
    ref = np.where(mask.any(axis=-1), ref, -np.inf)
    docids = rescored.index.data.docid_strings
    order = sorted(range(len(docids)), key=lambda i: (-ref[i], i))
    valid = [i for i in order if np.isfinite(ref[i])]
    assert list(run) == [docids[i] for i in valid[: len(run)]]
    for i in valid[: len(run)]:
        assert run[docids[i]] == pytest.approx(float(ref[i]), rel=1e-4, abs=1e-4)

    # rescore path beats (or ties) the raw 4-bit ranking against the referee:
    # the rescored winner IS the full-precision winner
    assert list(run)[0] == docids[valid[0]]


def test_colbert_streaming_matches_resident(tmpdir_as_cache, tmp_path):
    """Token-embedding corpus over hbmbudget streams host slices through a
    running on-device top-k merge; equality vs the resident engine in bf16 and
    int8 modes; streaming rejects shards/prefilter combos."""
    from capreolus_tpu.core import ConfigError
    from capreolus_tpu.searcher import Searcher

    base = {"dim": 8, "maxdoclen": 32, "maxqlen": 8, "batch": 4, "chunk": 2,
            "allowrandominit": True, "index": {"collection": {"name": "dummy"}}}
    resident = Searcher.create("colbert", dict(base))
    resident.index.create_index()
    run_r = resident.query("telescope galaxies")

    streamed = Searcher.create("colbert", {**base, "hbmbudget": 1e-4})  # ~100 B: 1-slice chunks
    streamed.index.create_index()
    emb, _, _ = streamed._doc_tensors()
    # disk-resident: the f16 cache mmap IS the backing store (bf16 at upload)
    assert isinstance(emb, np.memmap) and emb.dtype == np.float16
    run_s = streamed.query("telescope galaxies")
    assert list(run_s) == list(run_r)
    for d in run_r:
        assert run_s[d] == pytest.approx(run_r[d], abs=1e-4)

    r8 = Searcher.create("colbert", {**base, "quantize": "int8"})
    r8.index.create_index()
    run_r8 = r8.query("telescope galaxies")
    s8 = Searcher.create("colbert", {**base, "quantize": "int8", "hbmbudget": 1e-4})
    s8.index.create_index()
    run_s8 = s8.query("telescope galaxies")
    emb8, _, scale8 = s8._doc_tensors()
    assert isinstance(emb8, np.memmap) and emb8.dtype == np.int8  # disk-built int8 cache
    assert isinstance(scale8, np.memmap)
    assert list(run_s8) == list(run_r8)
    for d in run_r8:
        assert run_s8[d] == pytest.approx(run_r8[d], abs=1e-4)

    bad = Searcher.create("colbert", {**base, "hbmbudget": 1e-4, "prefilter": 2})
    bad.index.create_index()
    with pytest.raises(ConfigError):
        bad.query("telescope galaxies")
