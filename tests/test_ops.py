"""Pallas kernels (interpret mode on CPU) must match the XLA reference paths."""

import numpy as np
import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()


def test_knrm_simmat_pool_kernel_matches_xla():
    import jax.numpy as jnp

    from capreolus_tpu.ops.simmat import knrm_simmat_pool
    from capreolus_tpu.reranker.common import KNRM_MUS, KNRM_SIGMAS, knrm_pool, similarity_matrix

    rng = np.random.Generator(np.random.PCG64(0))
    vocab, dim = 50, 16
    embedding = rng.standard_normal((vocab, dim)).astype(np.float32)
    embedding[0] = 0.0
    querytoks = np.array([[1, 2, -1, 0], [3, -2, 0, 0]], dtype=np.int32)
    doctoks = rng.integers(-3, vocab, size=(2, 37)).astype(np.int32)

    ref = knrm_pool(similarity_matrix(jnp.asarray(embedding), querytoks, doctoks), KNRM_MUS, KNRM_SIGMAS)
    out = knrm_simmat_pool(jnp.asarray(embedding), jnp.asarray(querytoks), jnp.asarray(doctoks),
                           KNRM_MUS, KNRM_SIGMAS, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_attention_kernel_interpret():
    import jax.numpy as jnp

    from capreolus_tpu.ops.flash_attention import _flash_attention_tpu, _xla_attention

    rng = np.random.Generator(np.random.PCG64(1))
    q = rng.standard_normal((2, 2, 128, 32)).astype(np.float32)
    k = rng.standard_normal((2, 2, 128, 32)).astype(np.float32)
    v = rng.standard_normal((2, 2, 128, 32)).astype(np.float32)
    mask = np.ones((2, 128), dtype=bool)
    mask[1, 64:] = False

    ref = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask))

    # run the pallas kernel in interpret mode by monkeypatching pallas_call
    import functools
    from unittest import mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig, interpret=True)):
        out = _flash_attention_tpu(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
