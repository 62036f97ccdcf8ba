import pytest

from capreolus_tpu.utils import TargetFileExists, cached_file, done_file
from capreolus_tpu.utils.common import OrderedDefaultDict, hash_file, padlist
from capreolus_tpu.utils.trec import (
    load_qrels,
    load_trec_run,
    load_trec_topics,
    max_pool_trec_passage_run,
    topic_to_trectxt,
    write_trec_run,
)

TOPICS = """<top>

<num> Number: 301
<title> International Organized Crime

<desc> Description:
Identify organizations that participate in international criminal activity.

<narr> Narrative:
A relevant document must as a minimum identify the organization.

</top>
<top>
<num> Number: 302
<title> Poliomyelitis and Post-Polio

<desc> Description:
Is the disease of Poliomyelitis under control?

</top>
"""


def test_load_trec_topics(tmp_path):
    fn = tmp_path / "topics.txt"
    fn.write_text(TOPICS)
    topics = load_trec_topics(fn)
    assert topics["title"]["301"] == "International Organized Crime"
    assert topics["title"]["302"] == "Poliomyelitis and Post-Polio"
    assert topics["desc"]["301"].startswith("Identify organizations")
    assert topics["narr"]["301"].startswith("A relevant document")
    assert "302" not in topics["narr"]


def test_topic_roundtrip(tmp_path):
    fn = tmp_path / "t.txt"
    fn.write_text(topic_to_trectxt("900", "hello world", desc="longer description"))
    topics = load_trec_topics(fn)
    assert topics["title"]["900"] == "hello world"
    assert topics["desc"]["900"] == "longer description"


def test_qrels_and_runs(tmp_path):
    qfn = tmp_path / "qrels.txt"
    qfn.write_text("301 0 d1 2\n301 0 d2 0\n302 0 d3 1\n")
    qrels = load_qrels(qfn)
    assert qrels == {"301": {"d1": 2, "d2": 0}, "302": {"d3": 1}}

    run = {"301": {"d1": 3.5, "d2": 7.25}, "302": {"d3": 1.0}}
    rfn = tmp_path / "run.txt"
    write_trec_run(run, rfn)
    loaded = load_trec_run(rfn)
    assert loaded == run
    # ranks must be ordered by descending score
    lines = rfn.read_text().strip().splitlines()
    assert lines[0].split()[2] == "d2" and lines[0].split()[3] == "1"


def test_max_pool_passage_run():
    run = {"1": {"d1.0": 1.0, "d1.1": 3.0, "d2.0": 2.0}}
    assert max_pool_trec_passage_run(run) == {"1": {"d1": 3.0, "d2": 2.0}}


def test_cached_file(tmp_path):
    target = tmp_path / "f.txt"
    with cached_file(target) as f:
        f.write("hello")
    assert target.read_text() == "hello"
    with pytest.raises(TargetFileExists):
        with cached_file(target) as f:
            f.write("x")
    # failed write leaves nothing behind
    target2 = tmp_path / "g.txt"
    with pytest.raises(RuntimeError):
        with cached_file(target2) as f:
            raise RuntimeError("boom")
    assert not target2.exists()
    assert not list(tmp_path.glob("*.tmp_*"))


def test_done_file(tmp_path):
    d = tmp_path / "work"
    ran = []
    with done_file(d) as already:
        if not already:
            ran.append(1)
    with done_file(d) as already:
        if not already:
            ran.append(2)
    assert ran == [1]
    # failure must not mark done
    d2 = tmp_path / "work2"
    with pytest.raises(ValueError):
        with done_file(d2) as already:
            raise ValueError()
    assert not (d2 / "done").exists()


def test_padlist():
    assert padlist([1, 2, 3], 5) == [1, 2, 3, 0, 0]
    assert padlist([1, 2, 3], 2) == [1, 2]
    assert padlist([], 3, pad_token=-1) == [-1, -1, -1]


def test_ordered_default_dict():
    d = OrderedDefaultDict(list)
    d["b"].append(1)
    d["a"].append(2)
    assert list(d.keys()) == ["b", "a"]


def test_hash_file(tmp_path):
    fn = tmp_path / "x"
    fn.write_bytes(b"abc")
    assert hash_file(fn) == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
