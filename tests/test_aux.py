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
