"""Expert parallelism: shard MoE expert weights over an ``expert`` mesh axis.

Companion to the MoeFFN layer (reranker/bert/encoder.py): expert FFN weights
carry a leading [E] axis; placing that axis over an ``expert`` mesh axis makes
XLA's SPMD partitioner compute each expert's einsum on its owner device and
insert one psum for the gated combine — the expert-parallel communication
pattern, obtained purely from parameter shardings (same design as
tensor_parallel.py, which the reference — data-parallel only, SURVEY §2.3 —
has no counterpart for).

Used by the trainer's ``ep`` config option and validated for numeric equality
vs single-device on the 8-device CPU mesh (tests/test_moe.py).
"""

from __future__ import annotations

import jax
import numpy as np

P = jax.sharding.PartitionSpec

# (path-suffix, spec): expert-stacked leaves shard their leading [E] axis
_RULES = (
    ("experts_wi", P("expert", None, None)),
    ("experts_wo", P("expert", None, None)),
    ("experts_bi", P("expert", None)),
    ("experts_bo", P("expert", None)),
)


def expert_param_spec(path) -> jax.sharding.PartitionSpec:
    name = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
    for suffix, spec in _RULES:
        if name.endswith(suffix):
            return spec
    return P()  # gate, attention, embeddings, heads: replicated


def make_ep_mesh(devices=None, ep=2):
    """2D (data, expert) mesh; the data axis gets the remaining devices."""
    devices = list(jax.devices() if devices is None else devices)
    if len(devices) % ep != 0:
        raise ValueError(f"{len(devices)} devices not divisible by ep={ep}")
    arr = np.array(devices).reshape(len(devices) // ep, ep)
    return jax.sharding.Mesh(arr, ("data", "expert"))


def shard_params_ep(tree, mesh):
    """Place a param pytree with expert-axis shardings; a leaf whose expert dim
    does not divide the mesh axis falls back to replication (correct, just not
    parallel)."""
    ep = mesh.shape["expert"]

    def place(path, x):
        spec = expert_param_spec(path)
        for dim, axis in enumerate(spec):
            if axis == "expert" and (x.ndim <= dim or x.shape[dim] % ep != 0):
                spec = P()
                break
        return jax.device_put(x, jax.sharding.NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)
