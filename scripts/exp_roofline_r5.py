"""Round-5 roofline refresh (VERDICT r4 #5): decompose the k=1000 headline
batch wall post-transfer-diet into RTT / result transfer / device compute /
host prep, so the biggest term is known before spending on it.

Methodology (all on the warm engine, batch = 256 queries, k = 1000):
  - RTT: scalar-result executable launch (one jnp.sum of a tiny slice)
  - device compute: scalar-result variant of the tiered search (the full
    kernel runs, one f32 crosses the wire)
  - result transfer: full one_pass wall minus the scalar-result wall
    (payload is ~4.27 B/query-result bit-packed), cross-checked against the
    raw device->host bandwidth measured on a 1 MB blob
  - host prep: timed directly in TieredResult-building python (term list ->
    work units), which overlaps dispatch in the pipelined pass

Run: python scripts/exp_roofline_r5.py  (writes stdout; pipe to a file)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             ".bench_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.join(cache_dir, "jax_cache"))
    print("devices:", jax.devices(), flush=True)

    # ---- raw link: RTT and bandwidth
    one = jax.device_put(np.ones((8,), np.float32))
    np.asarray(jnp.sum(one))
    rtts = []
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(jnp.sum(one))
        rtts.append(time.perf_counter() - t0)
    rtts.sort()
    print(f"RTT (scalar roundtrip): best {rtts[0]*1e3:.1f} ms, "
          f"median {rtts[len(rtts)//2]*1e3:.1f} ms", flush=True)

    blob = jax.device_put(np.random.default_rng(0).integers(0, 255, size=(1_048_576,),
                                                            dtype=np.uint8))
    np.asarray(blob)
    bws = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(blob)
        dt = time.perf_counter() - t0
        bws.append(1.0 / dt)
    bws.sort()
    print(f"device->host 1MB: best {bws[-1]:.1f} MB/s, median {bws[len(bws)//2]:.1f} MB/s",
          flush=True)

    # ---- headline pass decomposition
    from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine

    data = bench.synth_index()
    engine = ScoringEngine(DeviceIndex(data))
    queries = bench._make_queries(data, seed=1)
    k = 1000

    bench.one_pass(engine, queries, k, "exhaustive")  # warm every bucket
    full = sorted(bench.one_pass(engine, queries, k, "exhaustive") for _ in range(6))
    n_batches = (bench.NUM_QUERIES + 255) // 256
    print(f"full pass: best {full[0]*1e3:.0f} ms "
          f"({bench.NUM_QUERIES/full[0]:.0f} q/s), median {full[len(full)//2]*1e3:.0f} ms, "
          f"{n_batches} batches", flush=True)

    # host prep alone (tiered work-unit building off the device)
    t0 = time.perf_counter()
    for start in range(0, len(queries), 256):
        engine._prepare_tiered(queries[start:start + 256], "bm25")
    host_prep = time.perf_counter() - t0
    print(f"host prep (tiered units, all batches): {host_prep*1e3:.0f} ms", flush=True)

    res = engine.search(queries[:256], model="bm25", params={"k1": 0.9, "b": 0.4},
                        topk=k, exact_topk=False, materialize=False,
                        score_dtype="bfloat16", pack_ords=True)
    print("result payload arrays:",
          [(a.shape, str(a.dtype)) for a in (res.scores, res.ords)], flush=True)

    @jax.jit
    def tiny(a):
        return jnp.sum(a[:4].astype(jnp.float32))

    # TieredResult.__init__ eagerly starts the device->host copy; for a true
    # scalar-result pass that copy must not happen, so swap in a no-fetch
    # subclass for the duration (restored after)
    import capreolus_tpu.searcher.scoring as sc

    class _NoFetchResult(sc.TieredResult):
        def __init__(self, scores, ords, num_queries, topk, grid_shape, ord_bits):
            self.scores, self.ords = scores, ords
            self.num_queries, self.topk = num_queries, topk
            self.grid_shape, self.ord_bits = tuple(grid_shape), ord_bits

    def scalar_pass():
        t0 = time.perf_counter()
        outs = []
        for start in range(0, len(queries), 256):
            r = engine.search(queries[start:start + 256], model="bm25",
                              params={"k1": 0.9, "b": 0.4}, topk=k,
                              exact_topk=False, materialize=False,
                              score_dtype="bfloat16", pack_ords=True)
            outs.append(tiny(r.scores))
        for o in outs:
            np.asarray(o)
        return time.perf_counter() - t0

    real_result_cls = sc.TieredResult
    sc.TieredResult = _NoFetchResult
    try:
        scalar = sorted(scalar_pass() for _ in range(6))
    finally:
        sc.TieredResult = real_result_cls
    print(f"scalar-result pass: best {scalar[0]*1e3:.0f} ms "
          f"(compute+RTT+host ceiling {bench.NUM_QUERIES/scalar[0]:.0f} q/s), "
          f"median {scalar[len(scalar)//2]*1e3:.0f} ms", flush=True)

    transfer = full[0] - scalar[0]
    payload_mb = bench.NUM_QUERIES * k * 4.27 / 1e6
    print(f"implied result transfer: {transfer*1e3:.0f} ms for ~{payload_mb:.1f} MB "
          f"-> {payload_mb/max(transfer,1e-9):.1f} MB/s effective", flush=True)


if __name__ == "__main__":
    main()
