"""Aux subsystem tests: msmarco eval interface, queue, udel expansion, irds gating."""

import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()


def test_msmarco_eval_interface(tmp_path):
    from capreolus_tpu.evaluation.msmarco import compute_metrics_from_files, load_msmarco_run, trec_to_msmarco

    qrels = {"1": {"d1": 1}, "2": {"d9": 1}}
    run = {"1": {"d1": 5.0, "d2": 4.0}, "2": {"d3": 9.0, "d9": 8.0}}
    out = compute_metrics_from_files(trec_qrels=qrels, trec_runs=run)
    assert out["MRR @10"] == pytest.approx((1.0 + 0.5) / 2)
    assert out["QueriesRanked"] == 2

    rows = trec_to_msmarco(run)
    assert ("1", "d1", 1) in rows and ("2", "d3", 1) in rows

    fn = tmp_path / "run.msmarco"
    fn.write_text("".join(f"{q}\t{d}\t{r}\n" for q, d, r in rows))
    loaded = load_msmarco_run(fn)
    assert loaded["1"]["d1"] == 1.0
    out2 = compute_metrics_from_files(trec_qrels=qrels, path_to_candidate=str(fn))
    assert out2["MRR @10"] == pytest.approx(out["MRR @10"])


def test_queue_roundtrip(tmp_path):
    from capreolus_tpu.core.queue import DBManager

    db = DBManager(db_path=tmp_path / "q.sqlite")
    db.queue_run("rank.searcheval", {"benchmark": {"name": "dummy"}}, priority=1)
    db.queue_run("rerank.train", {}, priority=5)

    item = db.claim_next()
    assert item["command"] == "rerank.train"  # higher priority first
    db.mark_done(item["id"])
    item2 = db.claim_next()
    assert item2["command"] == "rank.searcheval"
    db.mark_done(item2["id"], "failed")
    assert db.claim_next() is None
    statuses = {cmd: status for _, cmd, _, status in db.list_runs()}
    assert statuses == {"rerank.train": "done", "rank.searcheval": "failed"}


def test_udel_expansion():
    from capreolus_tpu.utils.udel import udel_expand

    out = udel_expand("coronavirus origin", question="what is the origin of COVID-19?")
    assert "coronavirus" in out and "origin" in out
    assert "covid" in out and "19" in out
    assert "what" not in out and "the" not in out
    # deduplication keeps first occurrence
    assert out.split().count("origin") == 1

    # the published UDel stopword list ships as data and drives the filtering
    # (reference utils/common.py:161-581; e.g. 'according' and 'contrariwise'
    # are udel stopwords but not Lucene stopwords)
    from capreolus_tpu.utils.udel import udel_stopwords

    sw = udel_stopwords()
    assert len(sw) == 419 and "contrariwise" in sw and "according" in sw
    assert "according" not in udel_expand("deaths according to estimates")


def test_irds_bridge_gated():
    from capreolus_tpu.utils.irds import dataset_to_collection, get_irds

    assert dataset_to_collection("msmarco-passage/dev") == "msmarco-passage"
    try:
        import ir_datasets  # noqa: F401

        has_irds = True
    except ImportError:
        has_irds = False
    if not has_irds:
        with pytest.raises(ImportError):
            get_irds("msmarco-passage/dev")


def test_index_to_trec_export(tmpdir_as_cache, tmp_path):
    from capreolus_tpu.index import Index
    from capreolus_tpu.utils.trec import index_to_trec_docs, iterate_trec_docs

    index = Index.create("tpu", {"collection": {"name": "dummy"}})
    index.create_index()
    outdir = index_to_trec_docs(index, tmp_path / "export")
    docs = dict(iterate_trec_docs(next(outdir.iterdir())))
    assert set(docs) == {"D001", "D002", "D003"}
    assert docs["D001"] == index.get_doc("D001")


def test_tensorboard_event_writer(tmp_path):
    """The from-scratch TFRecord/Event writer produces files a standard
    TensorBoard reader can parse (decoded here with an independent reader)."""
    import struct

    import numpy as np

    from capreolus_tpu.utils.tensorboard import EventWriter, masked_crc32c

    w = EventWriter(tmp_path)
    w.add_scalar("training/loss", 0.5, step=3)
    w.add_histogram("layer/kernel", np.linspace(-1, 1, 100), step=3)
    w.close()

    records = []
    with open(w.path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == masked_crc32c(header), "header crc mismatch"
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == masked_crc32c(payload), "payload crc mismatch"
            records.append(payload)

    assert len(records) == 3  # file_version + scalar + histogram

    def read_varint(buf, i):
        shift, val = 0, 0
        while True:
            b = buf[i]
            i += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val, i
            shift += 7

    def parse_fields(buf):
        fields, i = {}, 0
        while i < len(buf):
            key, i = read_varint(buf, i)
            field, wire = key >> 3, key & 7
            if wire == 0:
                val, i = read_varint(buf, i)
            elif wire == 1:
                val = struct.unpack("<d", buf[i:i + 8])[0]
                i += 8
            elif wire == 2:
                n, i = read_varint(buf, i)
                val = buf[i:i + n]
                i += n
            elif wire == 5:
                val = struct.unpack("<f", buf[i:i + 4])[0]
                i += 4
            fields.setdefault(field, []).append(val)
        return fields

    ev0 = parse_fields(records[0])
    assert ev0[3][0] == b"brain.Event:2"

    ev1 = parse_fields(records[1])
    assert ev1[2][0] == 3  # step
    value = parse_fields(parse_fields(ev1[5][0])[1][0])
    assert value[1][0] == b"training/loss"
    assert abs(value[2][0] - 0.5) < 1e-6

    ev2 = parse_fields(records[2])
    value = parse_fields(parse_fields(ev2[5][0])[1][0])
    assert value[1][0] == b"layer/kernel"
    histo = parse_fields(value[5][0])
    assert histo[3][0] == 100.0  # num
    assert abs(histo[1][0] + 1.0) < 1e-9 and abs(histo[2][0] - 1.0) < 1e-9  # min/max


def test_trainer_writes_tensorboard_and_metric_plot(tmp_path, monkeypatch):
    """Training emits TB event files under RESULTS/runs/<boardname> plus
    metrics.png next to loss.png."""
    # crc32c of known vector (rfc 3720: "123456789" -> 0xE3069283)
    from capreolus_tpu.utils.tensorboard import crc32c

    assert crc32c(b"123456789") == 0xE3069283


def test_knrm_combine_weight_figure(tmpdir_as_cache, tmp_path):
    """KNRM.add_summary writes the combine-layer weight figure (parity:
    reference reranker/KNRM.py:71-79 matshow -> TensorBoard figure)."""
    import jax
    import numpy as np

    from capreolus_tpu.reranker import Reranker

    reranker = Reranker.create("KNRM", {"extractor": {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 8,
                                                      "index": {"collection": {"name": "dummy"}}}})
    from capreolus_tpu.benchmark import Benchmark

    benchmark = Benchmark.create("dummy")
    run = {"301": {"D001": 2.0, "D002": 1.5}}
    reranker.extractor.preprocess(list(run), {"D001", "D002"}, benchmark.topics[benchmark.query_type])
    feat = reranker.extractor.id2vec("301", "D001", "D002", label=[1, 0], training=True)
    from capreolus_tpu.trainer.jax_trainer import ARRAY_KEYS, collate

    batch = collate([feat], ARRAY_KEYS)
    params = reranker.init_params(jax.random.PRNGKey(0), batch)
    reranker.add_summary(params, 3, tmp_path / "summ")
    assert (tmp_path / "summ" / "param_stats_3.json").exists()
    assert (tmp_path / "summ" / "combine_weight_3.png").exists()


def test_profiler_trace_artifact(tmpdir_as_cache, tmp_path):
    """trainer.profile=True captures a jax.profiler trace of the first iteration
    (tracing parity beyond the reference's TensorBoard scalars, SURVEY §5)."""
    from capreolus_tpu.sampler import Sampler
    from tests.test_bert_rerankers import make_reranker, prepared

    reranker = make_reranker("BERTMaxP", reranker_overrides={
        "trainer": {"niters": 1, "itersize": 4, "batch": 2, "validatefreq": 1, "profile": True}})
    benchmark, run = prepared(reranker)
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                           benchmark.qrels, metric="map")
    profile_dir = tmp_path / "t" / "info" / "profile"
    assert profile_dir.exists() and any(profile_dir.rglob("*")), "no trace captured"
