"""Task registry sweep + tutorial/rererank end-to-end on dummy (parity:
/root/reference/capreolus/task/tests/test_task.py:6-12)."""

import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.core import module_registry
from capreolus_tpu.task import Task


@pytest.mark.parametrize("name", module_registry.get_module_names("task"))
def test_task_creatable(tmpdir_as_cache, name):
    config = {}
    if name in ("rerank", "rererank"):
        config = {"reranker" if name == "rerank" else "rerank1": {}}
        config = {}  # defaults are creatable
    task = Task.create(name, config)
    assert task.module_name == name
    assert task.default_command in set(task.commands) | set(task.help_commands)


def test_tutorial_run(tmpdir_as_cache):
    task = Task.create("tutorial", {"searcher2": {"name": "QLDirichlet"}})
    results = task.run()
    assert results["score"]["map"] > 0
    assert results["path"]["s1"] is not None


def test_rererank_traineval(tmpdir_as_cache):
    config = {
        "benchmark": {"name": "dummy"},
        "topn": 3,
        "rerank1": {
            "reranker": {"extractor": {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 16},
                         "trainer": {"niters": 1, "itersize": 8, "batch": 4}},
            "threshold": 10, "testthreshold": 10,
        },
        "rerank2": {
            "reranker": {"name": "DRMM",
                         "extractor": {"embeddings": "random8", "maxqlen": 4, "maxdoclen": 16},
                         "trainer": {"niters": 1, "itersize": 8, "batch": 4}},
            "threshold": 10, "testthreshold": 10,
        },
    }
    task = Task.create("rererank", config)
    preds = task.train()
    assert "test" in preds
    metrics = task.evaluate()
    assert 0.0 <= metrics["map"] <= 1.0


def test_modules_list(capsys):
    task = Task.create("modules")
    task.list_modules()
    out = capsys.readouterr().out
    assert "module type=reranker" in out
    assert "name=KNRM" in out
