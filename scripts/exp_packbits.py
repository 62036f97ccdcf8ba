"""A/B the 18-bit ordinal packing against raw int32 ords at the headline shape,
alternating passes so both modes see the same tunnel weather. Also probes
whether k=1000 sits on a per-transfer size cliff by timing k=500/k=750.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             ".bench_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.join(cache_dir, "jax_cache"))
    print("devices:", jax.devices(), flush=True)

    from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine

    data = bench.synth_index()
    engine = ScoringEngine(DeviceIndex(data))
    queries = bench._make_queries(data, seed=1)

    def one_pass(topk, pack):
        batches = [queries[i:i + bench.BATCH] for i in range(0, len(queries), bench.BATCH)]
        start = time.perf_counter()
        pending = engine.search_stream(batches, model="bm25", params=bench.PARAMS,
                                       topk=topk, materialize=False,
                                       score_dtype="bfloat16", pack_ords=pack)
        for p in pending:
            p.get()
        return time.perf_counter() - start

    # compile/warm every mode first (k subset via EXP_KS to bound compiles)
    ks = tuple(int(x) for x in os.environ.get("EXP_KS", "1000").split(","))
    for topk in ks:
        print(f"warm k={topk} bits18 ...", flush=True)
        one_pass(topk, True)
    print("warm k=1000 raw32 ...", flush=True)
    one_pass(1000, False)

    # 18-bit device packing equality at the real corpus scale (bits=18)
    s_p, o_p = engine.search(queries[:64], model="bm25", params=bench.PARAMS,
                             topk=1000, exact_topk=False, pack_ords=True)
    s_r, o_r = engine.search(queries[:64], model="bm25", params=bench.PARAMS,
                             topk=1000, exact_topk=False, pack_ords=False)
    np.testing.assert_array_equal(o_p, o_r)
    np.testing.assert_array_equal(s_p, s_r)
    print("equality at bits=18: OK", flush=True)

    t = {f"k{topk}_bits18": [] for topk in ks}
    t["k1000_raw32"] = []
    for rnd in range(5):
        for topk in ks:
            t[f"k{topk}_bits18"].append(one_pass(topk, True))
        t["k1000_raw32"].append(one_pass(1000, False))
        for k, v in t.items():
            print(f"  round {rnd} {k}: {v[-1]*1e3:.0f} ms", flush=True)
    for k, v in t.items():
        best = min(v)
        print(f"{k}: best {best*1e3:.0f} ms = {bench.NUM_QUERIES/best:.0f} q/s "
              f"(all: {[round(x*1e3) for x in v]})", flush=True)


if __name__ == "__main__":
    main()
