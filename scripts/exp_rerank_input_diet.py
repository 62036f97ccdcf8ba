"""Round-5 experiment: the rerank path's INPUT transfer diet.

PERF.md r3 established the monoBERT bench is transfer/pipeline-bound through
the tunnel at batch 32 (sweeping batch showed small batches win by overlap,
not compute). The int8 ladder stalled at ~4.0k docs/s ~= 97% of the bf16
roofline because the remaining cost is not MXU FLOPs. Inbound bytes per doc
today: ids int32[256] + mask int32[256] + seg int32[256] = 3 KB/doc. But mask
and seg are RECONSTRUCTIBLE from two scalars per doc (true length, first-B
segment boundary), and BERT vocab ids fit int16 (30,522 < 32,767):

    variant A (status quo): int32 ids + int32 mask + int32 seg   = 3072 B/doc
    variant B: int16 ids + int32 len + int32 seg_start (device iota-compare)
                                                            ~=  520 B/doc

Run on the real chip: python scripts/exp_rerank_input_diet.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", "jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)

BATCH, SEQLEN, NUM_DOCS = 32, 256, 2048


def main():
    import dataclasses

    from capreolus_tpu.reranker.bert.encoder import BertConfig
    from capreolus_tpu.reranker.bert_rerankers import _BertScorer

    print("devices:", jax.devices(), flush=True)
    config = BertConfig(dtype="bfloat16", quantize="int8")
    model = _BertScorer(config)

    def make_batch(seed):
        r = np.random.Generator(np.random.PCG64(seed))
        inp = r.integers(1000, config.vocab_size, size=(BATCH, SEQLEN)).astype(np.int32)
        inp[:, 0] = 101
        mask = np.ones((BATCH, SEQLEN), dtype=np.int32)
        seg = np.zeros((BATCH, SEQLEN), dtype=np.int32)
        seg[:, 8:] = 1
        return inp, mask, seg

    inp, mask, seg = make_batch(0)
    fp_model = _BertScorer(dataclasses.replace(config, quantize="none"))
    params = fp_model.init(jax.random.PRNGKey(0), inp[:2], mask[:2], seg[:2])
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), inp[:2], mask[:2], seg[:2]))
    zero = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes["quant_stats"])
    _, updated = model.apply({"params": params["params"], "quant_stats": zero},
                             inp, mask, seg, calibrate=True, mutable=["quant_stats"])
    params = {"params": params["params"], "quant_stats": updated["quant_stats"]}

    @jax.jit
    def score_a(params, inp, mask, seg):
        return model.apply(params, inp, mask, seg)

    @jax.jit
    def score_b(params, ids16, lens, seg_starts):
        ids = ids16.astype(jnp.int32)
        pos = jnp.arange(SEQLEN, dtype=jnp.int32)[None, :]
        mask = (pos < lens[:, None]).astype(jnp.int32)
        seg = (pos >= seg_starts[:, None]).astype(jnp.int32)
        return model.apply(params, ids, mask, seg)

    batches_a = [make_batch(i) for i in range(NUM_DOCS // BATCH)]
    batches_b = [(b[0].astype(np.int16),
                  b[1].sum(axis=1).astype(np.int32),
                  np.full((BATCH,), 8, dtype=np.int32)) for b in batches_a]

    # equality first
    sa = np.asarray(score_a(params, *batches_a[0]))
    sb = np.asarray(score_b(params, *batches_b[0]))
    print("max |A-B|:", float(np.max(np.abs(sa - sb))), flush=True)

    for name, fn, batches in (("A int32 triple", score_a, batches_a),
                              ("B int16+lens  ", score_b, batches_b)):
        np.asarray(fn(params, *batches[0]))
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            pending = [fn(params, *b) for b in batches]
            for p in pending:
                p.copy_to_host_async()
            res = [np.asarray(p) for p in pending]
            times.append(time.perf_counter() - t0)
        times.sort()
        print(f"{name}: best {NUM_DOCS/times[0]:.0f} docs/s, "
              f"median {NUM_DOCS/times[len(times)//2]:.0f} "
              f"(all {[round(NUM_DOCS/t) for t in times]})", flush=True)


if __name__ == "__main__":
    main()
