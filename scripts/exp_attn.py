"""Attention path comparison at shipped shapes (VERDICT round 1 weak #3).

XLA batched vs Pallas flash vs Pallas head-batched, BERT-base geometry
(H=12, D=64, bf16), B chosen so B*L is constant (batch of passages).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/capreolus_tpu_jax_cache")

from capreolus_tpu.ops.flash_attention import (
    _flash_attention_tpu,
    _flash_attention_tpu_headbatched,
    _xla_attention,
)

REPS = 8


def timed(fn, inputs, n=3):
    outs = [fn(*x) for x in inputs]
    _ = float(outs[-1][0, 0, 0, 0])
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        outs = [fn(*x) for x in inputs]
        _ = float(outs[-1][0, 0, 0, 0])
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return best / len(inputs)


def main():
    rng = np.random.Generator(np.random.PCG64(0))
    H, D = 12, 64
    xla = jax.jit(_xla_attention)
    for L in (128, 256, 512):
        B = 65536 // L  # constant token volume
        def mk():
            q = jnp.asarray(rng.standard_normal((B, H, L, D)).astype(np.float32), dtype=jnp.bfloat16)
            k = jnp.asarray(rng.standard_normal((B, H, L, D)).astype(np.float32), dtype=jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((B, H, L, D)).astype(np.float32), dtype=jnp.bfloat16)
            m = jnp.asarray(np.ones((B, L), np.int32))
            return q, k, v, m
        inputs = [mk() for _ in range(REPS)]
        t_x = timed(xla, inputs)
        t_f = timed(_flash_attention_tpu, inputs)
        try:
            t_h = timed(_flash_attention_tpu_headbatched, inputs)
        except Exception as e:
            t_h = float("nan")
            print(f"  headbatched failed at L={L}: {type(e).__name__}")
        print(f"L={L} B={B}: xla {t_x*1000:.2f} ms, flash {t_f*1000:.2f} ms, "
              f"headbatched {t_h*1000:.2f} ms per call")
        # numeric agreement
        ox = np.asarray(xla(*inputs[0]), np.float32)
        of = np.asarray(_flash_attention_tpu(*inputs[0]), np.float32)
        print(f"  max |xla - flash| = {np.abs(ox - of).max():.4f}")


if __name__ == "__main__":
    main()
