"""Microbenchmark the scoring engine's constituent ops on the real chip."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/capreolus_tpu_jax_cache")

NROWS = 256 * 200_001  # flat accumulator
U = 2048
TILE = 512
N_UP = U * TILE


def timed(fn, *args, n=5):
    fn(*args)  # compile
    _ = float(fn(*args).ravel()[0])  # warm
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        _ = float(fn(*args).ravel()[0])  # scalar sync: no bulk result transfer
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return best


def main():
    rng = np.random.Generator(np.random.PCG64(0))
    idx = jnp.asarray(rng.integers(0, NROWS, size=N_UP).astype(np.int32))
    vals = jnp.asarray(rng.random(N_UP).astype(np.float32))
    ivals = jnp.asarray(rng.integers(0, 2**30, size=N_UP).astype(np.int32))

    @jax.jit
    def scatter_add(idx, vals):
        acc = jnp.zeros(NROWS, dtype=jnp.float32)
        return acc.at[idx].add(vals, mode="drop")

    @jax.jit
    def scatter_max(idx, ivals):
        acc = jnp.zeros(NROWS, dtype=jnp.int32)
        return acc.at[idx].max(ivals, mode="drop")

    @jax.jit
    def scatter_set_unique(idx, vals):
        acc = jnp.zeros(NROWS, dtype=jnp.float32)
        return acc.at[idx].set(vals, mode="drop", unique_indices=True)

    @jax.jit
    def gather(acc, idx):
        return jnp.take(acc, idx, axis=0).sum()

    acc = jnp.zeros(NROWS, dtype=jnp.float32) + 1.0

    print(f"scatter_add 1M->51M: {timed(scatter_add, idx, vals)*1000:.1f} ms")
    print(f"scatter_max 1M->51M: {timed(scatter_max, idx, ivals)*1000:.1f} ms")
    print(f"scatter_set_unique 1M->51M: {timed(scatter_set_unique, idx, vals)*1000:.1f} ms")
    print(f"gather 1M<-51M: {timed(gather, acc, idx)*1000:.1f} ms")

    for width in (8192, 16384, 32768, 65536, 131072):
        x = jnp.asarray(rng.random((256, width)).astype(np.float32))

        @jax.jit
        def topk(x):
            return jax.lax.top_k(x, 1000)[0]

        print(f"top_k(1000) [256, {width}]: {timed(topk, x)*1000:.1f} ms")

    # tile gathers (the posting fetch)
    tiles = jnp.asarray(rng.random((120_000, TILE)).astype(np.float32))
    tidx = jnp.asarray(rng.integers(0, 120_000, size=U).astype(np.int32))

    @jax.jit
    def tile_gather(tidx):
        return jnp.take(tiles, tidx, axis=0).sum()

    print(f"tile gather [2048 x 512]: {timed(tile_gather, tidx)*1000:.1f} ms")


if __name__ == "__main__":
    main()
