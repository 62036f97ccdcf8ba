"""Multi-host initialization and mesh construction helpers.

The reference's distributed backend is TensorFlow's TPU runtime (TPUClusterResolver
gRPC discovery + TPUStrategy, /root/reference/capreolus/trainer/tensorflow.py:84-105);
the TPU-native equivalent is jax.distributed + device meshes with named axes
(SURVEY.md §2.3 comm backend row). Collectives ride ICI within a slice and DCN
across slices — XLA chooses based on mesh layout.
"""

from __future__ import annotations

import os

import numpy as np

from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)

_initialized = False


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed for multi-host meshes (idempotent, no-op single-host).

    Environment-driven on TPU pods (JAX discovers the topology); explicit arguments
    for manual clusters.
    """
    global _initialized
    import jax

    if _initialized:
        return
    explicit = coordinator_address is not None
    pod_env = any(k in os.environ for k in ("MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"))
    if explicit or pod_env:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info("jax.distributed initialized: process %d/%d", jax.process_index(), jax.process_count())
    _initialized = True


def make_mesh(axes: dict, devices=None):
    """Build a Mesh from an {axis_name: size} dict; -1 means 'remaining devices'.

    Example: make_mesh({"data": -1}) or make_mesh({"shard": 4, "data": -1}).
    """
    import jax

    devices = list(devices if devices is not None else jax.devices())
    sizes = dict(axes)
    wildcard = [k for k, v in sizes.items() if v == -1]
    fixed = int(np.prod([v for v in sizes.values() if v != -1])) or 1
    if wildcard:
        assert len(wildcard) == 1, "only one axis may be -1"
        sizes[wildcard[0]] = len(devices) // fixed
    total = int(np.prod(list(sizes.values())))
    assert total <= len(devices), f"mesh needs {total} devices, have {len(devices)}"
    shape = tuple(sizes.values())
    return jax.sharding.Mesh(np.array(devices[:total]).reshape(shape), tuple(sizes.keys()))
