"""Round-5 experiment: Pallas int8 matmul vs XLA's int8 lowering on v5e.

PERF.md r3 recorded XLA's int8 dot reaching only ~55% of the 394 TOPS int8
peak at N=768 (110T split-QKV, 54T single 768x768) and ~150T at the FFN
shapes — the reason monoBERT int8 stalls at ~4.1k docs/s. If a simple tiled
Pallas int8 kernel (int8 LHS/RHS in VMEM, int32 MXU accumulation) beats the
XLA rate at BERT geometries, it becomes the int8 projection/FFN backend.

Run: python scripts/exp_pallas_int8.py
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
from jax.experimental.pallas import tpu as pltpu

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", "jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)

REPS = 20


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(jnp.sum(out[:8, :8].astype(jnp.float32)))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        np.asarray(jnp.sum(out[:8, :8].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def matmul_kernel(a_ref, b_ref, out_ref):
    out_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def pallas_int8_mm(a, b, bm=512, bn=512):
    M, K = a.shape
    K2, N = b.shape
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


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for (M, K, N) in ((8192, 768, 3072), (8192, 3072, 768), (8192, 768, 768),
                      (65536, 768, 768)):
        a8 = jnp.asarray(rng.integers(-127, 127, size=(M, K), dtype=np.int8))
        b8 = jnp.asarray(rng.integers(-127, 127, size=(K, N), dtype=np.int8))
        abf = a8.astype(jnp.bfloat16)
        bbf = b8.astype(jnp.bfloat16)
        fl = 2 * M * K * N

        @jax.jit
        def xla_int8(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)

        @jax.jit
        def xla_bf16(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        rows = [("xla int8", xla_int8, (a8, b8)), ("xla bf16", xla_bf16, (abf, bbf))]
        for bm, bn in ((512, 512), (1024, 512), (256, 1024)):
            if M % bm or N % bn:
                continue
            rows.append((f"pallas int8 bm{bm} bn{bn}",
                         jax.jit(functools.partial(pallas_int8_mm, bm=bm, bn=bn)),
                         (a8, b8)))
        # equality check once per shape
        ref = np.asarray(xla_int8(a8, b8))
        got = np.asarray(pallas_int8_mm(a8, b8))
        assert (ref == got).all(), "pallas int8 mismatch"
        print(f"[{M}x{K}x{N}]", flush=True)
        for name, fn, args in rows:
            t = timeit(fn, *args)
            print(f"  {name:26s} {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} T", flush=True)


if __name__ == "__main__":
    main()
