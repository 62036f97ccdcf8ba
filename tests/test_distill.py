"""Margin-MSE knowledge distillation (trainer.loss=margin_mse +
sampler.name=distill): the student's pos-neg margin regresses onto a teacher's
margin (Hofstaetter et al. 2020) — the standard cross-encoder -> bi-encoder
recipe. Beyond the reference, which has no distillation machinery."""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.benchmark import Benchmark
from capreolus_tpu.reranker import Reranker
from capreolus_tpu.sampler import Sampler

RUN = {"301": {"D001": 2.0, "D002": 1.5, "D003": 1.0},
       "302": {"D002": 2.0, "D001": 1.5, "D003": 1.0}}
TEACHER = {"301": {"D001": 4.0, "D002": 1.0, "D003": -2.0},
           "302": {"D002": 3.0, "D001": 0.5, "D003": -1.0}}


def _write_teacher_run(tmp_path):
    fn = tmp_path / "teacher.run"
    with open(fn, "wt") as f:
        for qid, docs in TEACHER.items():
            for rank, (docid, score) in enumerate(
                    sorted(docs.items(), key=lambda kv: -kv[1]), start=1):
                f.write(f"{qid} Q0 {docid} {rank} {score} teacher\n")
    return fn


def _make_student(tmp_path, niters=4):
    return Reranker.create("biencoder", {
        "pretrained": "tiny", "allowrandominit": True,
        "extractor": {"maxqlen": 8, "maxdoclen": 32,
                      "index": {"collection": {"name": "dummy"}}},
        "trainer": {"loss": "margin_mse", "niters": niters, "itersize": 16,
                    "batch": 2, "validatefreq": niters},
    })


def test_distill_sampler_margins(tmpdir_as_cache, tmp_path):
    """Samples carry teacher_margin = t(pos) - t(neg) for qrel-consistent
    pos/neg pools; the hash is keyed by the teacher scores."""
    benchmark = Benchmark.create("dummy")
    student = _make_student(tmp_path)
    student.extractor.preprocess(list(RUN), {d for docs in RUN.values() for d in docs},
                                 benchmark.topics[benchmark.query_type])
    sampler = Sampler.create("distill", {"teacherrunfile": str(_write_teacher_run(tmp_path))})
    sampler.prepare(RUN, benchmark.qrels, student.extractor)
    seen = set()
    it = iter(sampler)
    for _ in range(8):
        s = next(it)
        assert "teacher_margin" in s
        seen.add(round(float(s["teacher_margin"]), 3))
    # dummy qrels: 301 -> D001 relevant; 302 -> D002 relevant
    valid = {TEACHER["301"]["D001"] - TEACHER["301"][n] for n in ("D002", "D003")} | \
            {TEACHER["302"]["D002"] - TEACHER["302"][n] for n in ("D001", "D003")}
    assert seen <= {round(v, 3) for v in valid} and seen

    other = Sampler.create("distill", {"teacherrunfile": str(_write_teacher_run(tmp_path))})
    other.prepare(RUN, benchmark.qrels, student.extractor, teacher_scores={"301": {"D001": 1.0, "D002": 0.0}})
    assert other.get_hash() != sampler.get_hash()


def test_margin_mse_training_moves_student_toward_teacher(tmpdir_as_cache, tmp_path):
    """After distillation the student's margins are closer to the teacher's
    than at init (the loss it optimizes, measured out-of-band)."""
    import jax

    from capreolus_tpu.trainer.jax_trainer import ARRAY_KEYS, collate

    benchmark = Benchmark.create("dummy")
    student = _make_student(tmp_path, niters=6)
    student.extractor.preprocess(list(RUN), {d for docs in RUN.values() for d in docs},
                                 benchmark.topics[benchmark.query_type])
    sampler = Sampler.create("distill", {"teacherrunfile": str(_write_teacher_run(tmp_path))})
    sampler.prepare(RUN, benchmark.qrels, student.extractor)
    dev = Sampler.create("pred")
    dev.prepare(RUN, benchmark.qrels, student.extractor)
    out = tmp_path / "t"
    student.trainer.train(student, sampler, out, dev, out / "d", benchmark.qrels, metric="map")

    probe = [("301", "D001", "D003"), ("302", "D002", "D003")]
    samples = [student.extractor.id2vec(q, p, n, label=[1, 0], training=False)
               for q, p, n in probe]
    batch = collate(samples, ARRAY_KEYS)
    teacher_margins = np.array([TEACHER[q][p] - TEACHER[q][n] for q, p, n in probe])

    def margin_mse(params):
        pos, neg = student.score(params, batch)
        margins = np.asarray(pos).reshape(-1) - np.asarray(neg).reshape(-1)
        return float(((margins - teacher_margins) ** 2).mean())

    init_params = student.init_params(jax.random.PRNGKey(0), batch)
    before = margin_mse(init_params)
    trained, _ = student.trainer.load_checkpoint(out / "dev.best", init_params, reranker=student)
    after = margin_mse(trained)
    assert after < before, (before, after)


def test_margin_mse_requires_distill_sampler(tmpdir_as_cache, tmp_path):
    from capreolus_tpu.core import ConfigError

    benchmark = Benchmark.create("dummy")
    student = _make_student(tmp_path)
    student.extractor.preprocess(list(RUN), {d for docs in RUN.values() for d in docs},
                                 benchmark.topics[benchmark.query_type])
    plain = Sampler.create("triplet")
    plain.prepare(RUN, benchmark.qrels, student.extractor)
    dev = Sampler.create("pred")
    dev.prepare(RUN, benchmark.qrels, student.extractor)
    with pytest.raises(ConfigError, match="distill"):
        student.trainer.train(student, plain, tmp_path / "x", dev, tmp_path / "xd",
                              benchmark.qrels, metric="map")

    no_teacher = Sampler.create("distill")
    with pytest.raises(ConfigError, match="teacherrunfile"):
        no_teacher.prepare(RUN, benchmark.qrels, student.extractor)
