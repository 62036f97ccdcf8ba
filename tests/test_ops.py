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


# ------------------------------------------------------------------ int8 embedding quantization
def test_quantize_rows_roundtrip_and_scales():
    from capreolus_tpu.ops.quantization import quantize_rows

    rng = np.random.Generator(np.random.PCG64(3))
    emb = rng.standard_normal((64, 32)).astype(np.float32)
    emb[7] = 0.0  # all-zero row must not divide by zero
    q, scale = quantize_rows(emb)
    assert q.dtype == np.int8 and scale.dtype == np.float32
    assert scale[7] == 1.0 and not q[7].any()
    # reconstruction error bounded by half a quantization step per element
    recon = q.astype(np.float32) * scale[:, None]
    assert np.max(np.abs(recon - emb)) <= 0.5 * scale.max() + 1e-6
    # 3D (ColBERT token tensors): one scale per document
    q3, s3 = quantize_rows(rng.standard_normal((5, 4, 8)))
    assert q3.shape == (5, 4, 8) and s3.shape == (5,)


def test_int8_mips_scores_referee():
    """int8 MIPS == the exactly-factored f32 computation (the rank-1 scale is
    exact, only input rounding differs), and ranking quality survives: top-1
    identical and top-10 overlap >= 8/10 vs full-precision scores."""
    import jax.numpy as jnp

    from capreolus_tpu.ops.quantization import int8_mips_scores, quantize_rows, quantize_rows_jnp

    rng = np.random.Generator(np.random.PCG64(11))
    # clustered corpus (the structure trained embeddings have)
    centers = rng.standard_normal((20, 32))
    docs = (centers[rng.integers(0, 20, 500)] + 0.3 * rng.standard_normal((500, 32))).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    queries = (centers[rng.integers(0, 20, 16)] + 0.3 * rng.standard_normal((16, 32))).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    d_i8, dscale = quantize_rows(docs)
    scores = np.asarray(int8_mips_scores(jnp.asarray(queries), jnp.asarray(d_i8), jnp.asarray(dscale)))

    # exactness of the factoring: same result as dequantize-then-matmul in f64
    q_i8, qscale = (np.asarray(x) for x in quantize_rows_jnp(jnp.asarray(queries)))
    ref_factored = (q_i8.astype(np.float64) * qscale[:, None]) @ (d_i8.astype(np.float64) * dscale[:, None]).T
    np.testing.assert_allclose(scores, ref_factored, rtol=1e-5, atol=1e-5)

    # ranking quality vs full precision: the int8 winner must score within a
    # quantization step of the true winner (clustered corpora contain genuine
    # near-ties, so exact argmax equality is not the right referee), and the
    # top-10 sets must overlap >= 8/10
    exact = queries @ docs.T
    for qi in range(len(queries)):
        assert exact[qi, np.argmax(scores[qi])] >= exact[qi].max() - 1e-2
        top_q = set(np.argsort(scores[qi])[-10:])
        top_e = set(np.argsort(exact[qi])[-10:])
        assert len(top_q & top_e) >= 8, f"query {qi}: overlap {len(top_q & top_e)}"


# ------------------------------------------------------------------ fused MaxSim kernel
def test_maxsim_pallas_matches_xla_reference():
    """The fused Pallas MaxSim (token-major docs, running-max over Ld matmuls,
    in-VMEM Lq reduction) must equal the searcher's XLA chunk math — including
    masked tokens, fully-masked pad docs (-inf), and non-tile-aligned shapes."""
    import jax.numpy as jnp

    from capreolus_tpu.ops.maxsim import maxsim_scores, maxsim_scores_ref

    rng = np.random.Generator(np.random.PCG64(5))
    n_q, lq, ld, c, dim = 3, 5, 7, 11, 24  # deliberately unaligned everywhere
    q = rng.standard_normal((n_q, lq, dim)).astype(np.float32)
    docs = rng.standard_normal((c, ld, dim)).astype(np.float32)
    mask = (rng.random((c, ld)) > 0.3).astype(np.int8)
    mask[4] = 0  # one fully-masked doc -> -inf

    ref = np.asarray(maxsim_scores_ref(jnp.asarray(q), jnp.asarray(docs), jnp.asarray(mask)))

    docs_t = jnp.moveaxis(jnp.asarray(docs, jnp.float32), 0, 1)  # [Ld, C, dim]
    bias_t = jnp.where(jnp.asarray(mask).T > 0, 0.0, -1e9)
    valid = jnp.asarray(mask.any(axis=1))
    out = np.asarray(maxsim_scores(jnp.asarray(q), docs_t, bias_t, valid,
                                   interpret=True, block_docs=8))
    assert out.shape == ref.shape
    assert np.isneginf(out[:, 4]).all() and np.isneginf(ref[:, 4]).all()
    finite = np.isfinite(ref)
    np.testing.assert_allclose(out[finite], ref[finite], rtol=2e-2, atol=2e-2)


# ------------------------------------------------------------------ int4 pack
def test_int4_pack_unpack_roundtrip():
    """Nibble packing is lossless for values in [-7, 7], including odd D
    (zero-padded) and negative values (two's-complement nibbles)."""
    import jax.numpy as jnp

    from capreolus_tpu.ops.quantization import quantize_rows_int4, unpack_int4_jnp

    rng = np.random.Generator(np.random.PCG64(3))
    for d in (8, 7, 64):
        x = rng.standard_normal((50, d)).astype(np.float32)
        packed, scale = quantize_rows_int4(x)
        v = np.asarray(unpack_int4_jnp(jnp.asarray(packed)))
        # referee: re-derive the int grid on the host
        q = np.clip(np.round(x / scale[:, None]), -7, 7).astype(np.int8)
        np.testing.assert_array_equal(v[:, :d], q)
        if d % 2:
            np.testing.assert_array_equal(v[:, d:], 0)
        assert np.abs(x - v[:, :d] * scale[:, None]).max() <= scale.max() / 2 + 1e-6


def test_int4_mips_scores_exact_factoring():
    """int4 scores equal the host integer referee exactly (the rank-1 scale
    factoring is exact; only input rounding approximates), in both the
    single-shot and the chunked (row_chunk < N) paths."""
    import jax.numpy as jnp

    from capreolus_tpu.ops.quantization import (int4_mips_scores, quantize_rows_int4,
                                                quantize_rows_jnp)

    rng = np.random.Generator(np.random.PCG64(4))
    docs = rng.standard_normal((300, 32)).astype(np.float32)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    packed, dscale = quantize_rows_int4(docs)
    qi8, qscale = map(np.asarray, quantize_rows_jnp(jnp.asarray(q)))
    dq = np.clip(np.round(docs / dscale[:, None]), -7, 7)
    ref = (qi8.astype(np.int64) @ dq.T.astype(np.int64)) * qscale[:, None] * dscale[None, :]

    one = np.asarray(int4_mips_scores(jnp.asarray(q), jnp.asarray(packed), jnp.asarray(dscale)))
    np.testing.assert_allclose(one, ref, rtol=1e-6)
    chunked = np.asarray(int4_mips_scores(jnp.asarray(q), jnp.asarray(packed),
                                          jnp.asarray(dscale), row_chunk=128))
    np.testing.assert_allclose(chunked, ref, rtol=1e-6)
