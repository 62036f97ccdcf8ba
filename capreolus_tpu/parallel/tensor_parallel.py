"""Tensor parallelism for the BERT encoder: Megatron-style column/row sharding
expressed purely as parameter shardings (GSPMD).

The reference has no tensor parallelism (SURVEY §2.3: data parallel only); this
is a TPU-native extension for large cross-encoders (PARADE-large / bert-large,
the BASELINE stretch config). Rather than rewriting the model with explicit
collectives, we exploit XLA's SPMD partitioner: sharding the q/k/v and FFN-up
kernels over a "model" mesh axis (column parallel) and the attention-output and
FFN-down kernels along their input dim (row parallel) is sufficient — XLA
propagates the shardings through the matmuls and inserts the psum after each
row-parallel matmul over ICI, exactly the Megatron-LM communication pattern.

Used by the trainer's ``tp`` config option (trainer/jax_trainer.py) and
validated for numeric equality vs single-device on an 8-device CPU mesh
(tests/test_tensor_parallel.py).
"""

from __future__ import annotations

import jax
import numpy as np

P = jax.sharding.PartitionSpec

# (path-suffix, spec) rules; first match wins. Column-parallel kernels split the
# OUTPUT dim (and their biases), row-parallel kernels split the INPUT dim (their
# biases replicate — they are added after the psum).
_RULES = (
    ("attention/query/kernel", P(None, "model")),
    ("attention/key/kernel", P(None, "model")),
    ("attention/value/kernel", P(None, "model")),
    ("attention/query/bias", P("model")),
    ("attention/key/bias", P("model")),
    ("attention/value/bias", P("model")),
    ("attention/output/kernel", P("model", None)),
    ("intermediate/kernel", P(None, "model")),
    ("intermediate/bias", P("model")),
    ("ffn_output/kernel", P("model", None)),
)


def bert_param_spec(path) -> jax.sharding.PartitionSpec:
    """PartitionSpec for one param path (tree_map_with_path key path)."""
    name = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
    for suffix, spec in _RULES:
        if name.endswith(suffix):
            return spec
    return P()  # embeddings, layernorms, pooler, heads: replicated


def make_tp_mesh(devices=None, tp=2):
    """2D (data, model) mesh over the given devices; data axis gets the rest."""
    devices = list(jax.devices() if devices is None else devices)
    if len(devices) % tp != 0:
        raise ValueError(f"{len(devices)} devices not divisible by tp={tp}")
    arr = np.array(devices).reshape(len(devices) // tp, tp)
    return jax.sharding.Mesh(arr, ("data", "model"))


def shard_params_tp(tree, mesh):
    """Place a param pytree on the mesh with Megatron column/row shardings.

    Validates divisibility: a kernel whose sharded dim does not divide by the
    model-axis size falls back to replication (correct, just not parallel)."""
    tp = mesh.shape["model"]

    def place(path, x):
        spec = bert_param_spec(path)
        for dim, axis in enumerate(spec):
            if axis == "model" and (x.ndim <= dim or x.shape[dim] % tp != 0):
                spec = P()
                break
        return jax.device_put(x, jax.sharding.NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)
