"""Experiment: can int8 cover the attention matmuls (QKV / attn-out) profitably?

Round-2 measurement (scripts/exp_int8.py) showed a SINGLE 768x768 int8 matmul
is a net loss once dynamic activation quantization is charged (raw 63T vs 57T
bf16 — the small N dimension limits MXU int8 utilization). The remaining lever
(VERDICT round 2 #3): FUSE QKV into one 768x2304 int8 matmul and share ONE
per-token activation quantization across Q, K, V — the act-quant pass is
amortized 3x and the wider N approaches the 768x3072 geometry where int8
measured 1.19x. bf16 QKV fusion alone measured ~8% SLOWER than split on v5e
(the output split forces copies), so the question is whether the int8 rate win
beats the copy cost.

Run on the real chip: python scripts/exp_int8_qkv.py
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

B, L, H = 256, 256, 768  # monoBERT bench geometry: 65536 token rows
M = B * L
REPS = 30


@jax.jit
def _scalarize(*outs):
    return sum(jnp.sum(o[:8, :8].astype(jnp.float32)) for o in outs)


def timeit(fn, *args):
    outs = fn(*args)
    outs = outs if isinstance(outs, tuple) else (outs,)
    np.asarray(_scalarize(*outs))
    best = np.inf
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(REPS):
            outs = fn(*args)
            outs = outs if isinstance(outs, tuple) else (outs,)
        np.asarray(_scalarize(*outs))
        best = min(best, (time.perf_counter() - start) / REPS)
    return best


def quant_rows(x):
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127.0, 127.0).astype(jnp.int8)
    return xq, xs


def int8_mm(xq, xs, wq, ws, bias):
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * ws + bias


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, H), dtype=jnp.bfloat16)
    w3 = [jax.random.normal(jax.random.PRNGKey(i), (H, H), dtype=jnp.bfloat16) for i in range(3)]
    b3 = [jnp.zeros((H,), jnp.bfloat16) for _ in range(3)]
    wf = jnp.concatenate(w3, axis=1)  # [H, 3H]
    bf = jnp.concatenate(b3)
    w3q = [jnp.round(w.astype(jnp.float32) / (jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True) / 127.0)).astype(jnp.int8) for w in w3]
    w3s = [jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True) / 127.0 for w in w3]
    wfq = jnp.concatenate(w3q, axis=1)
    wfs = jnp.concatenate(w3s, axis=1)

    @jax.jit
    def bf16_split(x):
        return tuple((x @ w + b) for w, b in zip(w3, b3))

    @jax.jit
    def bf16_fused(x):
        out = x @ wf + bf
        return out[:, :H], out[:, H:2*H], out[:, 2*H:]

    @jax.jit
    def int8_fused_sharedq(x):
        xq, xs = quant_rows(x)
        out = int8_mm(xq, xs, wfq, wfs, bf.astype(jnp.float32))
        return out[:, :H], out[:, H:2*H], out[:, 2*H:]

    @jax.jit
    def int8_split_sharedq(x):
        xq, xs = quant_rows(x)
        return tuple(int8_mm(xq, xs, wq, ws, jnp.float32(0.0)) for wq, ws in zip(w3q, w3s))

    @jax.jit
    def int8_single(x):  # attn-out geometry: one 768x768 with its own quant
        xq, xs = quant_rows(x)
        return int8_mm(xq, xs, w3q[0], w3s[0], jnp.float32(0.0))

    @jax.jit
    def bf16_single(x):
        return x @ w3[0]

    flops_qkv = 3 * 2 * M * H * H
    for name, fn, fl in [("bf16 split QKV", bf16_split, flops_qkv),
                         ("bf16 fused QKV", bf16_fused, flops_qkv),
                         ("int8 fused QKV (shared act quant)", int8_fused_sharedq, flops_qkv),
                         ("int8 split QKV (shared act quant)", int8_split_sharedq, flops_qkv),
                         ("bf16 single 768x768 (attn-out)", bf16_single, flops_qkv // 3),
                         ("int8 single 768x768 (attn-out)", int8_single, flops_qkv // 3)]:
        t = timeit(fn, x)
        print(f"{name:42s} {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} T")


if __name__ == "__main__":
    main()
