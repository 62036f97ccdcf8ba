"""Registry sweep: every benchmark/collection is creatable with actionable offline errors
(mirrors the reference's registry smoke tests, SURVEY.md §4)."""

import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.benchmark import Benchmark
from capreolus_tpu.collection import Collection
from capreolus_tpu.core import module_registry


@pytest.mark.parametrize("name", module_registry.get_module_names("benchmark"))
def test_benchmark_creatable(tmpdir_as_cache, name):
    benchmark = Benchmark.create(name)
    assert benchmark.module_name == name
    assert benchmark.query_type
    assert hasattr(benchmark, "collection")


@pytest.mark.parametrize("name", module_registry.get_module_names("collection"))
def test_collection_creatable(tmpdir_as_cache, name):
    coll = Collection.create(name)
    assert coll.module_name == name


def test_dummy_benchmark_data(tmpdir_as_cache):
    b = Benchmark.create("dummy")
    assert b.topics["title"]["301"]
    assert b.qrels["301"]["D001"] == 1
    assert b.folds["s1"]["train_qids"] == ["301", "302"]
    assert b.non_nn_dev["s1"] == ["301", "302", "301", "302"]  # dev + train (use_train_as_dev)
    fn = b.get_topics_file()
    lines = open(fn).read().strip().splitlines()
    assert len(lines) == 2 and lines[0].startswith("301\t")
    # cached: second call returns the same file
    assert b.get_topics_file() == fn
    # subset export
    fn_dev = b.get_topics_file(["dev"])
    assert "dev" in fn_dev.name


def test_licensed_collection_errors(tmpdir_as_cache):
    coll = Collection.create("robust04")
    with pytest.raises(IOError, match="licensed"):
        coll.get_path()
    # configured path wins
    coll2 = Collection.create("robust04", {"path": "/tmp"})
    assert str(coll2.get_path()) == "/tmp"


def test_offline_download_benchmark_errors(tmpdir_as_cache):
    from capreolus_tpu.utils.common import OfflineEnvironmentError

    # topics + folds are shipped; qrels still require download/qrelfile
    b = Benchmark.create("robust04.yang19")
    with pytest.raises(OfflineEnvironmentError, match="offline"):
        _ = b.qrels


def test_shipped_robust04_published_data(tmpdir_as_cache):
    """The published Robust04 topics and yang19 folds ship with the package
    (the same data files the reference ships, robust04.py:33-43)."""
    b = Benchmark.create("robust04.yang19")
    topics = b.topics["title"]
    assert len(topics) == 250  # 301-450 + 601-700
    assert topics["301"].lower().startswith("international organized crime")
    folds = b.folds
    assert set(folds) == {"s1", "s2", "s3", "s4", "s5"}
    for fold in folds.values():
        assert len(fold["train_qids"]) == 150
        assert len(fold["predict"]["dev"]) == 50
        assert len(fold["predict"]["test"]) == 50
    # the five test sets partition all 250 topics
    all_test = set()
    for fold in folds.values():
        all_test.update(fold["predict"]["test"])
    assert all_test == set(topics)


def test_shipped_antique_data(tmpdir_as_cache):
    b = Benchmark.create("antique")
    assert len(b.topics[b.query_type]) > 2400
    assert b.relevance_level == 2
    assert b.qrels  # shipped qrels.antique.txt
    assert set(b.folds) >= {"s1"}


def test_generated_folds_require_opt_in(tmpdir_as_cache, monkeypatch):
    from capreolus_tpu.core import ConfigError

    cls = Benchmark.lookup("antique")
    monkeypatch.setattr(cls, "fold_url", None)
    b = Benchmark.create("antique")
    with pytest.raises(ConfigError, match="folds=generated"):
        _ = b.folds
    b2 = Benchmark.create("antique", {"folds": "generated"})
    folds = b2.folds
    assert len(folds) == 5 and all("train_qids" in f for f in folds.values())


def test_static_run_searcher_with_local_file(tmpdir_as_cache, tmp_path):
    from capreolus_tpu.searcher import Searcher
    from capreolus_tpu.utils.trec import write_trec_run

    runfile = tmp_path / "canned.run"
    write_trec_run({"301": {"D001": 2.0}}, runfile)
    s = Searcher.create("bm25staticcds", {"runfile": str(runfile)})
    out = s.query_from_file(tmp_path / "unused.tsv", tmp_path / "out")
    run = Searcher.load_trec_run(out / "static_run")
    assert run["301"]["D001"] == 2.0


def test_covid_xml_topics_and_udel(tmpdir_as_cache, tmp_path):
    """covid parses NIST XML topics and applies udel expansion (reference
    covid.py:154-181); previously the XML would have been fed to the TREC
    parser."""
    xml = """<topics>
<topic number="1"><query>coronavirus origin</query>
<question>what is the origin of COVID-19</question>
<narrative>n</narrative></topic>
<topic number="2"><query>virus spread</query>
<question>how does the coronavirus respond to changes in the weather</question>
<narrative>n</narrative></topic>
</topics>"""
    topicfn = tmp_path / "topics.xml"
    topicfn.write_text(xml)
    qrelfn = tmp_path / "qrels.txt"
    qrelfn.write_text("1 Q0  d1 2\n2 Q0  d2 1\n")
    from capreolus_tpu.benchmark import Benchmark

    plain = Benchmark.create("covid", {"topicfile": str(topicfn), "qrelfile": str(qrelfn)})
    assert plain.topics["title"]["1"] == "coronavirus origin"
    assert plain.topics["desc"]["2"].startswith("how does")
    assert plain.qrels["1"]["d1"] == 2

    expanded = Benchmark.create("covid", {"topicfile": str(topicfn), "qrelfile": str(qrelfn),
                                          "udelqexpand": True})
    t = expanded.topics["title"]["1"]
    assert "coronavirus" in t and t != "coronavirus origin"  # desc folded in
    assert expanded.topics["desc"]["1"] == " "


def test_covidqa_json_topics_and_qrels(tmpdir_as_cache, tmp_path):
    """covidqa parses the kaggle-lit-review JSON into topics (qid 2001+) and
    answer-derived qrels (reference covid.py:211-239)."""
    import json

    data = {"categories": [{"name": "c", "sub_categories": [
        {"kq_name": "incubation period", "nq_name": "how long is incubation",
         "answers": [{"id": "doc1"}, {"id": "doc2"}]},
        {"kq_name": "transmission", "nq_name": "how does it spread",
         "answers": [{"id": "doc3"}]},
    ]}]}
    fn = tmp_path / "covidqa.json"
    fn.write_text(json.dumps(data))
    from capreolus_tpu.benchmark import Benchmark

    b = Benchmark.create("covidqa", {"topicfile": str(fn)})
    assert b.topics["title"]["2001"] == "incubation period"
    assert b.qrels["2001"] == {"doc1": 1, "doc2": 1}
    assert b.qrels["2002"] == {"doc3": 1}


def test_csn_challenge_csv_topics(tmpdir_as_cache, tmp_path):
    fn = tmp_path / "queries.csv"
    fn.write_text("query\nconvert int to string\npriority queue\n")
    from capreolus_tpu.benchmark import Benchmark
    import pytest as _pytest

    b = Benchmark.create("codesearchnet_challenge", {"topicfile": str(fn)})
    assert b.topics["title"] == {"1": "convert int to string", "2": "priority queue"}
    with _pytest.raises(ValueError):
        b.qrels
