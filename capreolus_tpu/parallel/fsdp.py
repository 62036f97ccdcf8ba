"""Fully-sharded data parallelism (ZeRO-3 style), expressed purely as
parameter shardings (GSPMD).

The reference scales training only by replicated data parallelism — its TF
trainer's TPUStrategy keeps a full copy of the weights AND the optimizer state
on every core (reference capreolus/trainer/tensorflow.py:60-76 strategy scope;
SURVEY §2.3 lists no sharded-state mode).  That caps the trainable model size
at what one core's HBM holds.  FSDP removes the cap the TPU-native way: every
parameter is sharded over the ``data`` mesh axis along its largest divisible
dimension, so each device permanently stores only ``1/dp`` of the weights,
gradients, and Adam moments.  No model rewrite and no explicit collectives —
XLA's SPMD partitioner sees sharded weights consumed by a batch-sharded
computation and inserts the canonical ZeRO-3 schedule itself: all-gather the
weights just before use in forward/backward, reduce-scatter the gradients, and
keep the optimizer update fully sharded.

Because optax builds its state with ``jnp.zeros_like`` on the (already
sharded) params, the Adam moments inherit the same shardings with no extra
code; ``tests/test_fsdp.py`` pins that, plus numeric equality of the whole
training loop vs replicated DP on an 8-device mesh.

Used by the trainer's ``fsdp`` config option (trainer/jax_trainer.py).
"""

from __future__ import annotations

import jax

P = jax.sharding.PartitionSpec


def fsdp_param_spec(x, dp) -> jax.sharding.PartitionSpec:
    """Shard the largest dimension divisible by ``dp``; replicate if none.

    Preferring the largest extent balances the shards (a [30522, 128] embedding
    whose vocab dim doesn't divide dp=8 still shards its 128-dim axis), and
    leaves scalars / tiny leaves (layernorm scales shorter than dp) replicated
    where sharding would buy nothing.
    """
    ndim = getattr(x, "ndim", 0)
    if ndim == 0:
        return P()
    for d in sorted(range(ndim), key=lambda d: x.shape[d], reverse=True):
        if x.shape[d] >= dp and x.shape[d] % dp == 0:
            return P(*([None] * d + ["data"]))
    return P()


def shard_params_fsdp(tree, mesh):
    """Place every leaf on the mesh with its ZeRO-3 spec over the data axis."""
    dp = mesh.shape["data"]

    def place(x):
        return jax.device_put(x, jax.sharding.NamedSharding(mesh, fsdp_param_spec(x, dp)))

    return jax.tree_util.tree_map(place, tree)
