"""Mixture-of-experts FFN + expert parallelism (beyond-reference TPU extension).

Referees: deterministic top-1 routing equals the chosen expert's dense FFN;
EP-sharded forward equals single-device; trainer.ep end-to-end on the 8-device
CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.parallel.expert_parallel import expert_param_spec, make_ep_mesh, shard_params_ep
from capreolus_tpu.reranker.bert.encoder import BertConfig, MoeFFN

CFG = BertConfig(vocab_size=128, hidden_size=16, num_layers=2, num_heads=2,
                 intermediate_size=32, max_position=32, dtype="float32",
                 moe_experts=2, moe_topk=1)


def _ffn(x, wi, bi, wo, bo, approximate=True):
    h = jax.nn.gelu(x @ wi + bi, approximate=approximate)
    return h @ wo + bo


def test_top1_routing_equals_chosen_expert():
    """With a gate forced to route every token to one expert, MoeFFN(top-1)
    must equal that expert's plain FFN exactly (gate renormalizes to 1.0)."""
    rng = np.random.Generator(np.random.PCG64(0))
    x = jnp.asarray(rng.standard_normal((2, 5, 16)).astype(np.float32))
    model = MoeFFN(CFG)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    for expert in (0, 1):
        # huge logit margin for the chosen expert
        gate_kernel = np.zeros((16, 2), np.float32)
        gate_bias = np.zeros(2, np.float32)
        gate_bias[expert] = 100.0
        forced = dict(params)
        forced["gate"] = {"kernel": jnp.asarray(gate_kernel), "bias": jnp.asarray(gate_bias)}
        out = model.apply({"params": forced}, x)
        want = _ffn(np.asarray(x),
                    np.asarray(params["experts_wi"][expert]),
                    np.asarray(params["experts_bi"][expert]),
                    np.asarray(params["experts_wo"][expert]),
                    np.asarray(params["experts_bo"][expert]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_top2_gates_are_convex_combination():
    """top-2 over E=2: output is the prob-weighted mix of both experts."""
    import dataclasses
    cfg2 = dataclasses.replace(CFG, moe_topk=2)
    rng = np.random.Generator(np.random.PCG64(1))
    x = jnp.asarray(rng.standard_normal((1, 3, 16)).astype(np.float32))
    model = MoeFFN(cfg2)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    out = np.asarray(model.apply({"params": params}, x))

    logits = np.asarray(x) @ np.asarray(params["gate"]["kernel"]) + np.asarray(params["gate"]["bias"])
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = sum(
        probs[..., e:e + 1] * np.asarray(_ffn(np.asarray(x),
                                              np.asarray(params["experts_wi"][e]),
                                              np.asarray(params["experts_bi"][e]),
                                              np.asarray(params["experts_wo"][e]),
                                              np.asarray(params["experts_bo"][e])))
        for e in range(2)
    )
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_ep_sharded_forward_matches_single_device():
    """Expert-axis sharding is layout only: EP forward == single-device."""
    rng = np.random.Generator(np.random.PCG64(2))
    x = jnp.asarray(rng.standard_normal((4, 6, 16)).astype(np.float32))
    model = MoeFFN(CFG)
    params = model.init(jax.random.PRNGKey(2), x)["params"]
    ref = np.asarray(model.apply({"params": params}, x))

    mesh = make_ep_mesh(ep=2)
    sharded = shard_params_ep({"params": params}, mesh)
    leaf = sharded["params"]["experts_wi"]
    assert leaf.sharding.spec[0] == "expert", leaf.sharding.spec
    got = np.asarray(jax.jit(lambda p, x: model.apply(p, x))(sharded, x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_expert_param_spec_rules():
    P = jax.sharding.PartitionSpec

    class K:
        def __init__(self, key):
            self.key = key

    def path(*parts):
        return tuple(K(p) for p in parts)

    assert expert_param_spec(path("params", "bert", "layer_0", "moe", "experts_wi")) == P("expert", None, None)
    assert expert_param_spec(path("params", "bert", "layer_0", "moe", "experts_bo")) == P("expert", None)
    assert expert_param_spec(path("params", "bert", "layer_0", "moe", "gate", "kernel")) == P()
    assert expert_param_spec(path("params", "bert", "word_embeddings")) == P()


def test_trainer_ep_end_to_end(tmpdir_as_cache, tmp_path):
    """BERTMaxP with moeexperts=2 trained under trainer.ep=2 on the (data=4,
    expert=2) mesh: finite loss/metrics, expert weights sharded."""
    from tests.test_bert_rerankers import make_reranker, prepared
    from capreolus_tpu.sampler import Sampler

    reranker = make_reranker("BERTMaxP", reranker_overrides={
        "moeexperts": 2, "moetopk": 1,
        "trainer": {"niters": 1, "itersize": 4, "batch": 4, "validatefreq": 1, "ep": 2}})
    benchmark, run = prepared(reranker)
    sampler = Sampler.create("triplet")
    sampler.prepare(run, benchmark.qrels, reranker.extractor)
    dev = Sampler.create("pred")
    dev.prepare(run, benchmark.qrels, reranker.extractor)
    metrics = reranker.trainer.train(reranker, sampler, tmp_path / "t", dev, tmp_path / "d",
                                     benchmark.qrels, metric="map")
    mesh = reranker.trainer._data_mesh
    assert mesh is not None and dict(mesh.shape).get("expert") == 2
    assert np.isfinite(metrics["map"])
    assert (tmp_path / "t" / "dev.best.params").exists()


def test_moe_int8_combination_raises(tmpdir_as_cache):
    from tests.test_bert_rerankers import make_reranker
    from capreolus_tpu.core import ConfigError

    reranker = make_reranker("BERTMaxP", reranker_overrides={
        "moeexperts": 2, "quantize": "int8"})
    with pytest.raises(ConfigError):
        reranker.build_model()


def test_moe_gradients_reach_all_experts():
    """With top-1 routing over random inputs, both experts receive tokens and
    both experts' kernels get nonzero gradients (routing is differentiable)."""
    rng = np.random.Generator(np.random.PCG64(5))
    x = jnp.asarray(rng.standard_normal((8, 16, 16)).astype(np.float32))
    model = MoeFFN(CFG)
    params = model.init(jax.random.PRNGKey(5), x)["params"]

    def loss(p):
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    grads = jax.grad(loss)(params)
    for e in range(2):
        g = np.asarray(grads["experts_wi"][e])
        assert np.abs(g).max() > 0, f"expert {e} got zero gradient"
