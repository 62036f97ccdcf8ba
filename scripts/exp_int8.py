"""Experiment: is int8 matmul actually 2x bf16 on v5e at BERT shapes?

v5e MXU: 394 TOPS int8 vs 197 TFLOPS bf16 (peak). This measures whether XLA
lowers jnp/lax dot_general(int8, int8, preferred_element_type=int32) to the
double-rate path at monoBERT shapes, and what dynamic quantization overhead
(abs-max + round + rescale) costs end-to-end.

Run on the real chip: python scripts/exp_int8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache", "jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)

# monoBERT bench geometry: batch 256, seqlen 256 -> 65536 token rows
M = 256 * 256
SHAPES = [(M, 768, 768), (M, 768, 3072), (M, 3072, 768)]
REPS = 30


@jax.jit
def _scalarize(out):
    # cheap device-side reduction whose host fetch is a TRUE sync point
    # (block_until_ready can no-op on the tunneled axon backend)
    return jnp.sum(out[:8, :8].astype(jnp.float32))


def timeit(fn, *args):
    np.asarray(_scalarize(fn(*args)))
    best = np.inf
    for _ in range(3):
        start = time.perf_counter()
        out = None
        for _ in range(REPS):
            out = fn(*args)
        np.asarray(_scalarize(out))  # device executes in order: syncs all reps
        best = min(best, (time.perf_counter() - start) / REPS)
    return best


def bench_shape(m, k, n):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), dtype=jnp.bfloat16)
    w = jax.random.normal(key, (k, n), dtype=jnp.bfloat16)
    xq = jax.random.randint(key, (m, k), -127, 127, dtype=jnp.int8)
    wq = jax.random.randint(key, (k, n), -127, 127, dtype=jnp.int8)

    @jax.jit
    def f_bf16(x, w):
        return x @ w

    @jax.jit
    def f_int8(xq, wq):
        return jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    @jax.jit
    def f_dynq(x, w):
        # full dynamic-quant pipeline: quantize acts per-row + weights per-col,
        # int8 matmul, rescale to f32, cast back to bf16
        xs = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True), 1e-6) / 127.0
        xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
        ws = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True), 1e-6) / 127.0
        wq = jnp.round(w.astype(jnp.float32) / ws).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)

    @jax.jit
    def f_dynq_preqw(x, wq, ws):
        # weights pre-quantized outside the graph (inference path)
        xs = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True), 1e-6) / 127.0
        xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)

    ws = jnp.ones((1, n), dtype=jnp.float32)
    t_bf16 = timeit(f_bf16, x, w)
    t_int8 = timeit(f_int8, xq, wq)
    t_dynq = timeit(f_dynq, x, w)
    t_pq = timeit(f_dynq_preqw, x, wq, ws)
    flops = 2 * m * k * n
    print(f"[{m}x{k}x{n}] bf16 {t_bf16*1e3:7.2f}ms ({flops/t_bf16/1e12:6.1f}T)  "
          f"int8-raw {t_int8*1e3:7.2f}ms ({flops/t_int8/1e12:6.1f}T)  "
          f"dynq {t_dynq*1e3:7.2f}ms  dynq-preqw {t_pq*1e3:7.2f}ms  "
          f"speedup(preqw vs bf16) {t_bf16/t_pq:4.2f}x")


def main():
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    for m, k, n in SHAPES:
        bench_shape(m, k, n)


if __name__ == "__main__":
    main()


def bench_static(m, k, n):
    """Static per-tensor activation scale: quant fuses into the producer epilogue."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), dtype=jnp.bfloat16)
    wq = jax.random.randint(key, (k, n), -127, 127, dtype=jnp.int8)
    ws = jnp.ones((1, n), dtype=jnp.float32)

    @jax.jit
    def f_gelu_bf16(x, w):
        return jax.nn.gelu(x, approximate=True) @ w

    @jax.jit
    def f_gelu_staticq(x, wq, ws):
        g = jax.nn.gelu(x, approximate=True)
        xq = jnp.clip(jnp.round(g.astype(jnp.float32) * (127.0 / 8.0)), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (8.0 / 127.0) * ws).astype(jnp.bfloat16)

    w = jax.random.normal(key, (k, n), dtype=jnp.bfloat16)
    t_b = timeit(f_gelu_bf16, x, w)
    t_s = timeit(f_gelu_staticq, x, wq, ws)
    print(f"[gelu+{m}x{k}x{n}] bf16 {t_b*1e3:7.2f}ms  static-int8 {t_s*1e3:7.2f}ms  speedup {t_b/t_s:4.2f}x")


if __name__ == "__main__" and os.environ.get("EXP_STATIC"):
    bench_static(M, 3072, 768)
    bench_static(M, 768, 3072)
