"""Round-5 experiment v2: Pallas int8 matmul vs XLA — DEVICE-side timing.

v1 (exp_pallas_int8.py) dispatched one matmul per call and measured a flat
~1.4 ms across all shapes: the tunnel's dispatch rate, not compute. Here every
timing runs R matmuls inside ONE jit'd lax.fori_loop with a forced data
dependence (the carry perturbs the LHS by one bit), so a single dispatch times
R back-to-back device matmuls.

Run: python scripts/exp_pallas_int8b.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", "jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)

R = 50


def matmul_kernel(a_ref, b_ref, out_ref):
    out_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def pallas_int8_mm(a, b, bm=512, bn=512):
    M, K = a.shape
    _, N = b.shape
    return pl.pallas_call(
        matmul_kernel,
        grid=(M // bm, N // bn),
        in_specs=[pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
                  pl.BlockSpec((K, bn), lambda i, j: (0, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        cost_estimate=pl.CostEstimate(flops=2 * M * N * K,
                                      bytes_accessed=M * K + K * N + M * N * 4,
                                      transcendentals=0),
    )(a, b)


def timed_loop(mm, a, b, out_dtype):
    """One jit'd dispatch running R dependent matmuls; returns s/matmul."""

    @jax.jit
    def many(a, b):
        def body(i, carry):
            # one-element data dependence defeats CSE without touching cost
            a2 = a + carry[:1, :1].astype(a.dtype)
            return mm(a2, b)

        init = jnp.zeros((a.shape[0], b.shape[1]), out_dtype)
        return jax.lax.fori_loop(0, R, body, init)

    np.asarray(jnp.sum(many(a, b)[:8, :8].astype(jnp.float32)))  # compile+warm
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jnp.sum(many(a, b)[:8, :8].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / R)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def xla_mm(a, b):
        out = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=out)

    for (M, K, N) in ((8192, 768, 3072), (8192, 3072, 768), (65536, 768, 768),
                      (65536, 768, 3072)):
        a8 = jnp.asarray(rng.integers(-16, 16, size=(M, K), dtype=np.int8))
        b8 = jnp.asarray(rng.integers(-16, 16, size=(K, N), dtype=np.int8))
        fl = 2 * M * K * N
        ref = np.asarray(xla_mm(a8, b8))
        got = np.asarray(pallas_int8_mm(a8, b8))
        assert (ref == got).all(), "pallas int8 mismatch"
        print(f"[{M}x{K}x{N}]", flush=True)
        rows = [("xla int8", xla_mm, a8, b8, jnp.int32),
                ("xla bf16", xla_mm, a8.astype(jnp.bfloat16), b8.astype(jnp.bfloat16),
                 jnp.float32)]
        for bm, bn in ((512, 512), (1024, 512), (2048, 1024)):
            if M % bm or N % bn:
                continue
            rows.append((f"pallas int8 bm{bm} bn{bn}",
                         functools.partial(pallas_int8_mm, bm=bm, bn=bn), a8, b8,
                         jnp.int32))
        for name, mm, a, b, od in rows:
            t = timed_loop(mm, a, b, od)
            print(f"  {name:26s} {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} T", flush=True)


if __name__ == "__main__":
    main()
