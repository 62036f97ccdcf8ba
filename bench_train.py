"""Training benchmark: monoBERT pairwise-hinge train-step throughput.

VERDICT r3 #3: the reference is above all a trainer (its TPU path is
/root/reference/capreolus/trainer/tensorflow.py:121-293 — pairwise hinge over
(pos, neg) BERT passes with Adam), so the driver line must carry a train
metric. Configuration matches trainer/jax_trainer.py's monoBERT recipe and
PERF.md's recorded methodology: BERT-base, L=256, batch 16 pairs (32 sequences
forward+backward per step), bf16 activations, f32 Adam, warm compile cache,
np.asarray sync (block_until_ready can no-op on the tunneled axon backend).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BATCH_PAIRS = 16
SEQLEN = 256
STEPS_PER_REP = 20

if os.environ.get("BENCH_SMOKE"):  # CPU end-to-end validation of the bench logic
    BATCH_PAIRS, SEQLEN, STEPS_PER_REP = 2, 64, 2

V5E_BF16_PEAK = 197e12  # TPU v5e bf16 MXU peak, FLOP/s


def bert_matmul_flops_per_seq(config, seqlen, train=False):
    """Matmul FLOPs for one sequence through a BERT encoder (the MFU
    numerator): per layer 4 H^2 projections + 2 H I FFN matmuls + the
    2 L H attention score/context einsums, x2 (MAC=2 FLOPs), x3 for a train
    step (forward + backward ~ 2x forward). Embeddings/LayerNorm/softmax are
    not matmuls and are excluded — standard MFU accounting."""
    H, I, L = config.hidden_size, config.intermediate_size, config.num_layers
    per_token = 2 * (4 * H * H + 2 * H * I + 2 * seqlen * H) * L
    return per_token * seqlen * (3 if train else 1)


def measure(configure_cache=True, budget_s=90.0):
    """Returns the train section dict for the driver line."""
    import jax
    import jax.numpy as jnp
    import optax

    if configure_cache:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", os.path.join(cache_dir, "jax_cache"))

    from capreolus_tpu.reranker.bert.encoder import BertConfig
    from capreolus_tpu.reranker.bert_rerankers import _BertScorer

    config = BertConfig(dtype="bfloat16" if jax.default_backend() == "tpu" else "float32")
    model = _BertScorer(config)

    def make_batch(seed):
        r = np.random.Generator(np.random.PCG64(seed))
        inp = r.integers(1000, config.vocab_size, size=(2 * BATCH_PAIRS, SEQLEN)).astype(np.int32)
        inp[:, 0] = 101
        mask = np.ones_like(inp)
        seg = np.zeros_like(inp)
        seg[:, 8:] = 1
        return inp, mask, seg

    inp, mask, seg = make_batch(0)
    params = model.init(jax.random.PRNGKey(0), inp[:2], mask[:2], seg[:2])
    tx = optax.adam(3e-5)
    opt_state = tx.init(params)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))  # like the production
    def step(params, opt_state, inp, mask, seg):  # trainer (jax_trainer.py:511)
        def loss_fn(p):
            scores = model.apply(p, inp, mask, seg)  # [2B]: pos then neg
            pos, neg = scores[:BATCH_PAIRS], scores[BATCH_PAIRS:]
            return jnp.mean(jax.nn.relu(1.0 - pos + neg))  # the reference's pairwise hinge

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    batch = make_batch(1)
    params, opt_state, loss = step(params, opt_state, *batch)
    np.asarray(loss)  # compile + warm outside the timing

    reps = []
    t_start = time.perf_counter()
    for rep in range(6):
        if reps and time.perf_counter() - t_start > budget_s:
            break
        t0 = time.perf_counter()
        for _ in range(STEPS_PER_REP):
            params, opt_state, loss = step(params, opt_state, *batch)
        np.asarray(loss)  # one sync per rep; steps serialize via the params dependency
        reps.append(time.perf_counter() - t0)
    reps.sort()
    pairs_per_sec = STEPS_PER_REP * BATCH_PAIRS / reps[0]
    seqs_per_sec = 2 * pairs_per_sec
    flops_per_seq = bert_matmul_flops_per_seq(config, SEQLEN, train=True)
    return {
        "metric": "monobert_train_pairs_per_sec_per_chip",
        "pairs_per_sec": round(pairs_per_sec, 1),
        "seqs_per_sec": round(seqs_per_sec, 1),
        "median_pairs_per_sec": round(STEPS_PER_REP * BATCH_PAIRS / reps[len(reps) // 2], 1),
        # model FLOP utilization vs the v5e bf16 MXU peak (matmul FLOPs only)
        "mfu": round(seqs_per_sec * flops_per_seq / V5E_BF16_PEAK, 3),
        "tflops": round(seqs_per_sec * flops_per_seq / 1e12, 1),
        "config": f"bert-base L={SEQLEN} batch={BATCH_PAIRS}pairs bf16 adam hinge",
        "reps": len(reps),
    }


if __name__ == "__main__":
    print(json.dumps(measure()))
