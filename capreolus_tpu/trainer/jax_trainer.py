"""The JAX trainer: one jit/pjit training loop for every reranker.

Replaces both reference trainers (/root/reference/capreolus/trainer/pytorch.py and
tensorflow.py) with a single implementation:

- jitted train step with gradient accumulation via lax.scan over microbatches
- data parallelism over a ``data`` mesh axis: batches are sharded with
  NamedSharding, params replicated; XLA inserts the gradient allreduce over ICI
  (the TPUStrategy equivalent, tensorflow.py:207-211)
- dual learning rates: parameter paths containing "bert"/"electra" use ``bertlr``
  with the warmup+decay schedule, everything else uses ``lr``
  (parity: tensorflow.py:144-197's two Adam optimizers)
- frozen parameters (reranker.trainable == False) get zero updates and are
  excluded from checkpoints (parity: reranker/__init__.py:30-55)
- early stopping on a dev metric every ``validatefreq`` iterations with dev.best
  weights + metrics.json artifacts; loss.txt history; per-iteration weights and
  ``fastforward`` resume (parity: pytorch.py:124-168, 256-300)
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from capreolus_tpu.core import ConfigOption
from capreolus_tpu.evaluation import eval_runs
from capreolus_tpu.reranker.common import LOSS_FUNCTIONS
from capreolus_tpu.trainer import Trainer
from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)

ARRAY_KEYS = (
    "query", "query_idf", "posdoc", "negdoc", "label", "idfs",
    "pos_bert_input", "pos_mask", "pos_seg", "neg_bert_input", "neg_mask", "neg_seg",
    "history", "doctf", "query_char", "doc_char", "teacher_margin",
)

# in-flight dispatch windows (see train()/predict()): how many steps/batches may
# be queued on the device before the host blocks on the oldest result. Small
# enough to bound device memory (each queued step holds one input batch), large
# enough to hide the per-dispatch RTT of a tunneled/remote backend.
TRAIN_PIPELINE_DEPTH = 8
PREDICT_PIPELINE_DEPTH = 8


def select_hard_negatives(preds, depth):
    """{qid: {docid: score}} -> {qid: [depth hardest docids]}, score-descending
    with docid tie-break (deterministic refresh given deterministic scores).
    Pure so the numpy referee in tests/test_hard_negatives.py can pin it."""
    return {qid: [d for d, _ in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:depth]]
            for qid, scores in preds.items()}


def _ext(path, suffix):
    """Append a suffix without clobbering existing dots in the name (dev.best)."""
    path = Path(path)
    return path.parent / (path.name + suffix)


def _plot_loss(losses, path):
    """Loss curve artifact (parity: utils/common.py plot_loss usage in the trainers)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.plot(range(len(losses)), losses)
        ax.set_xlabel("iteration")
        ax.set_ylabel("loss")
        fig.savefig(path, dpi=80)
        plt.close(fig)
    except Exception:
        pass  # plotting is best-effort


def _plot_metrics(history, path):
    """Dev-metric curves (parity: the reference plots metrics alongside loss,
    utils/common.py:114-153)."""
    if not history:
        return
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        iters = [it for it, _ in history]
        for name in sorted(history[0][1]):
            ax.plot(iters, [m[name] for _, m in history], label=name)
        ax.set_xlabel("iteration")
        ax.set_ylabel("metric")
        ax.legend()
        fig.savefig(path, dpi=80)
        plt.close(fig)
    except Exception:
        pass  # plotting is best-effort


def collate(samples, keys=None):
    """Stack a list of extractor sample dicts into batched numpy arrays."""
    out = {}
    for key in samples[0]:
        if keys is not None and key not in keys:
            continue
        values = [s[key] for s in samples]
        if isinstance(values[0], np.ndarray) or np.isscalar(values[0]):
            out[key] = np.stack(values)
        else:
            out[key] = values  # strings (qid/docid) stay as lists
    return out


@Trainer.register
class JaxTrainer(Trainer):
    module_name = "jax"
    config_spec = [
        ConfigOption("batch", 32, "batch size"),
        ConfigOption("niters", 20, "number of iterations to train for"),
        ConfigOption("itersize", 512, "number of training samples per iteration"),
        ConfigOption("gradacc", 1, "number of gradient accumulation steps"),
        ConfigOption("lr", 0.001, "learning rate"),
        ConfigOption("bertlr", 0.00002, "learning rate for bert/electra parameters"),
        ConfigOption("loss", "pairwise_hinge_loss", "pairwise_hinge_loss, pair_softmax_loss, "
                     "crossentropy, lce, margin_mse (teacher-margin distillation; needs "
                     "sampler.name=distill), or infonce (in-batch negatives with cross-device "
                     "negative sharing; needs a reranker exposing encode, e.g. biencoder)"),
        ConfigOption("softmaxloss", False, "use softmax loss instead of hinge"),
        ConfigOption("fastforward", False, "resume from per-iteration checkpoints"),
        ConfigOption("ckpt", "flat", "checkpoint format: flat (single-file flax bytes, gathers "
                     "to one host), sharded (per-shard raw .npy — each process writes only its "
                     "addressable shards, restores across different mesh layouts), or "
                     "sharded_async (sharded + background file writes off the train loop)"),
        ConfigOption("validatefreq", 1, "validate every N iterations"),
        ConfigOption("negrefresh", 0, "ANCE-style hard-negative refresh: every N iterations, "
                     "re-score each training query's ORIGINAL candidate pool with the CURRENT "
                     "model and replace the sampler's negative pools with the top neghard "
                     "hardest (0 disables; needs a sampler whose stream reads live pools — "
                     "triplet/pair/LCE, not distill)"),
        ConfigOption("neghard", 200, "negrefresh pool depth: keep this many hardest "
                     "(highest-scoring non-relevant) candidates per query"),
        ConfigOption("warmupiters", 0, "linear warmup iterations"),
        ConfigOption("decay", 0.0, "decay factor"),
        ConfigOption("decaytype", None, "decay type: exponential, linear, or None"),
        ConfigOption("decayiters", 3, "iterations over which exponential decay spreads"),
        ConfigOption("amp", "none", "bfloat16 mixed precision: none/False, train, pred, both, or True "
                     "(string values match the reference pytorch trainer, pytorch.py:43)", value_type="str"),
        ConfigOption("tp", 1, "tensor-parallel degree: shard BERT matmuls over a 'model' mesh axis "
                     "(Megatron-style column/row split via GSPMD; for bert-large/PARADE-large)"),
        ConfigOption("pp", 1, "pipeline-parallel degree: split the BERT layer stack into stages over "
                     "a 'pipe' mesh axis (GPipe microbatched schedule via shard_map+ppermute; "
                     "each device stores only its stage's layers); composes with tp>1 into a 3D "
                     "(data, pipe, model) mesh where each stage's matmuls are Megatron-sharded"),
        ConfigOption("ep", 1, "expert-parallel degree: shard MoE expert weights (reranker.moeexperts>0) "
                     "over an 'expert' mesh axis; each device computes its experts' einsums and XLA "
                     "inserts the gated-combine psum (parallel/expert_parallel.py)"),
        ConfigOption("sp", False, "sequence parallelism (requires tp>1): shard the token axis of the "
                     "batch over the 'model' mesh axis so token-independent work (embeddings, "
                     "layernorm, FFN rows) runs sequence-sharded; GSPMD inserts the allgathers "
                     "only where attention needs the full sequence (Megatron-SP semantics)"),
        ConfigOption("microbatches", 0, "pipeline microbatches per step (0 = auto: largest divisor "
                     "of the per-data-shard batch <= 2*pp)"),
        ConfigOption("fsdp", False, "fully-sharded data parallelism (ZeRO-3): shard every parameter, "
                     "gradient, and Adam moment over the 'data' mesh axis along its largest divisible "
                     "dim; GSPMD inserts the gather-weights / reduce-scatter-grads schedule "
                     "(parallel/fsdp.py). Each device stores 1/dp of model+optimizer state"),
        ConfigOption("boardname", "default", "experiment label for artifacts"),
        ConfigOption("profile", False, "capture a jax profiler trace of the first iteration"),
        ConfigOption("evalbatch", 0, "prediction batch size (0 = use the training batch size)"),
        ConfigOption("eager", False, "disable jit compilation (op-by-op debugging)"),
        # reference-config compatibility (trainer/tensorflow.py options): accepted,
        # not needed by the JAX runtime — caching is config-path based and TPUs
        # are addressed through jax.devices(), not a TF cluster resolver
        ConfigOption("usecache", False, "accepted for reference-config compatibility"),
        ConfigOption("multithread", False, "accepted for reference-config compatibility (torch DataLoader workers)"),
        ConfigOption("storage", None, "accepted for reference-config compatibility (TF GCS staging)"),
        ConfigOption("tpuname", None, "accepted for reference-config compatibility (TF TPUClusterResolver)"),
        ConfigOption("tpuzone", None, "accepted for reference-config compatibility (TF TPUClusterResolver)"),
    ]
    config_keys_not_in_path = ["fastforward", "boardname", "validatefreq", "profile",
                               "evalbatch", "eager", "usecache", "multithread", "storage", "tpuname", "tpuzone"]

    def build(self):
        self._data_mesh = None
        self._params = None
        self._opt_state = None

    # ------------------------------------------------------------------ setup
    def _amp_mode(self):
        """Normalized amp mode: none, train, pred, or both (validated like the
        reference pytorch trainer, pytorch.py:70-71)."""
        raw = str(self.config["amp"]).lower()
        mode = {"false": "none", "none": "none", "0": "none", "": "none",
                "true": "both", "1": "both"}.get(raw, raw)
        if mode not in ("none", "train", "pred", "both"):
            from capreolus_tpu.core import ConfigError

            raise ConfigError(f"amp must be one of: none, train, pred, both (got {self.config['amp']!r})")
        return mode

    def _jit(self, fn, **kwargs):
        if self.config.get("eager"):
            return fn  # op-by-op execution for debugging
        return jax.jit(fn, **kwargs)

    def _loss_fn(self):
        loss = self.config["loss"]
        if self.config["softmaxloss"]:
            # the reference flag swaps the pairwise HINGE for pair softmax
            # (tensorflow.py loss handling); compute_loss dispatches the
            # structured losses (lce/crossentropy/margin_mse/infonce) on
            # config['loss'], so silently substituting pair_softmax_loss there
            # would feed it mismatched shapes and train on a garbage objective
            if loss not in ("pairwise_hinge_loss", "pair_hinge_loss", "pair_softmax_loss"):
                from capreolus_tpu.core import ConfigError

                raise ConfigError(
                    f"trainer.softmaxloss replaces the pairwise hinge and cannot be combined "
                    f"with trainer.loss={loss}; drop softmaxloss or set loss=pair_softmax_loss")
            return LOSS_FUNCTIONS["pair_softmax_loss"]
        if loss not in LOSS_FUNCTIONS:
            from capreolus_tpu.core import ConfigError

            raise ConfigError(f"unknown loss {loss!r}; valid losses: {sorted(LOSS_FUNCTIONS)}")
        return LOSS_FUNCTIONS[loss]

    def _mesh(self, batch_size):
        """Device mesh: 1D ("data",) for pure DP; 2D ("data", "model") when tp>1;
        2D ("data", "pipe") when pp>1 (the GPipe schedule)."""
        devices = jax.devices()
        n = len(devices)
        tp = int(self.config.get("tp", 1))
        pp = int(self.config.get("pp", 1))
        ep = int(self.config.get("ep", 1))
        if self.config.get("fsdp") and (tp > 1 or pp > 1 or ep > 1):
            from capreolus_tpu.core import ConfigError

            raise ConfigError("trainer.fsdp shards state over the pure-DP 'data' mesh; "
                              "it cannot be combined with tp/pp/ep")
        if ep > 1:
            from capreolus_tpu.core import ConfigError

            if tp > 1 or pp > 1:
                raise ConfigError("trainer.ep cannot be combined with tp/pp yet; pick one")
            if n % ep != 0:
                raise ConfigError(f"trainer.ep={ep} does not divide the {n} available devices")
            dp = n // ep
            while dp > 1 and batch_size % dp != 0:
                dp -= 1
            return jax.sharding.Mesh(np.array(devices[: dp * ep]).reshape(dp, ep), ("data", "expert"))
        if self.config.get("sp") and tp <= 1:
            from capreolus_tpu.core import ConfigError

            raise ConfigError("trainer.sp=True requires trainer.tp>1 (sequence shards ride the "
                              "'model' mesh axis, Megatron-SP style)")
        if pp > 1:
            from capreolus_tpu.core import ConfigError

            if self.config.get("sp"):
                raise ConfigError("trainer.sp cannot be combined with trainer.pp yet")
            if n % (pp * tp) != 0:
                raise ConfigError(f"trainer.pp={pp} x trainer.tp={tp} does not divide the "
                                  f"{n} available devices")
            dp = n // (pp * tp)
            while dp > 1 and batch_size % dp != 0:
                dp -= 1
            if tp > 1:
                # 3D (data, pipe, model): GPipe stages whose layers are
                # additionally Megatron tensor-parallel (partial-manual
                # shard_map; parallel/pipeline_parallel.py)
                return jax.sharding.Mesh(
                    np.array(devices[: dp * pp * tp]).reshape(dp, pp, tp),
                    ("data", "pipe", "model"))
            return jax.sharding.Mesh(np.array(devices[: dp * pp]).reshape(dp, pp), ("data", "pipe"))
        if tp > 1:
            if n % tp != 0:
                from capreolus_tpu.core import ConfigError

                raise ConfigError(f"trainer.tp={tp} does not divide the {n} available devices")
            dp = n // tp
            while dp > 1 and batch_size % dp != 0:
                dp -= 1
            return jax.sharding.Mesh(np.array(devices[: dp * tp]).reshape(dp, tp), ("data", "model"))
        while n > 1 and batch_size % n != 0:
            n -= 1
        if n <= 1:
            return None
        return jax.sharding.Mesh(np.array(devices[:n]), ("data",))

    _SEQ_LAST_AXIS_KEYS = ("pos_bert_input", "pos_mask", "pos_seg",
                           "neg_bert_input", "neg_mask", "neg_seg")

    def _shard_batch(self, batches, leading_dims=2):
        """Place a [gradacc, batch, ...] pytree with the batch axis sharded over
        'data'; with sp=True (and tp>1) the trailing token axis of BERT inputs is
        additionally sharded over 'model' — GSPMD propagates the sequence
        sharding through token-independent ops and gathers only for attention."""
        if self._data_mesh is None:
            return batches
        P = jax.sharding.PartitionSpec
        spec = P(None, "data") if leading_dims == 2 else P("data")
        sharding = jax.sharding.NamedSharding(self._data_mesh, spec)
        sp = bool(self.config.get("sp")) and "model" in self._data_mesh.axis_names
        tp_size = self._data_mesh.shape.get("model", 1)

        def place(key, x):
            if (sp and key in self._SEQ_LAST_AXIS_KEYS and hasattr(x, "ndim")
                    and x.ndim >= leading_dims + 1 and x.shape[-1] % tp_size == 0):
                prefix = [None, "data"] if leading_dims == 2 else ["data"]
                seq_spec = P(*(prefix + [None] * (x.ndim - leading_dims - 1) + ["model"]))
                return jax.device_put(x, jax.sharding.NamedSharding(self._data_mesh, seq_spec))
            return jax.device_put(x, sharding)

        if isinstance(batches, dict):
            return {k: place(k, v) for k, v in batches.items()}
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batches)

    def _replicate(self, tree):
        if self._data_mesh is None:
            return tree
        sharding = jax.sharding.NamedSharding(self._data_mesh, jax.sharding.PartitionSpec())
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)

    # ------------------------------------------------------------------ pipeline parallelism
    def _pp_active(self):
        return int(self.config.get("pp", 1)) > 1 and self._data_mesh is not None \
            and "pipe" in self._data_mesh.axis_names

    def _pp_setup(self, reranker, params):
        """Canonical params -> placed {"rest","stacked"} pipeline view (stacked
        layers sharded over the pipe axis: each device stores only its stage)."""
        from capreolus_tpu.core import ConfigError
        from capreolus_tpu.parallel import pipeline_parallel as ppmod

        if not getattr(reranker, "pp_compatible", False):
            raise ConfigError(
                f"trainer.pp>1 supports plain-BERT cross-encoders (BERTMaxP/TFVanillaBERT); "
                f"{type(reranker).module_name} is not pipeline-compatible")
        if self.config["loss"] == "lce":
            raise ConfigError("trainer.pp>1 does not support loss=lce yet")
        cfg = reranker.build_model().config
        pp = int(self.config["pp"])
        if cfg.num_layers % pp != 0:
            raise ConfigError(f"trainer.pp={pp} does not divide the {cfg.num_layers} encoder layers")
        view = reranker.pp_view(params)
        rest, stacked = ppmod.place_pp_view(view["rest"], view["stacked"], self._data_mesh)
        return {"rest": rest, "stacked": stacked}

    def _pp_canonical(self, reranker, params):
        """Pipeline view -> canonical replicated tree (for predict/checkpoints)."""
        if not (self._pp_active() and isinstance(params, dict) and "stacked" in params):
            return params
        return self._replicate(reranker.pp_canonical(params))

    def _place_params(self, tree):
        """Params onto the mesh: replicated (DP), Megatron column/row-sharded
        over the 'model' axis (tp>1), expert-axis sharded (ep>1), or ZeRO-3
        sharded over 'data' (fsdp) — XLA inserts the TP/EP psums and the FSDP
        gather/reduce-scatter schedule from these shardings alone."""
        if self._data_mesh is not None and "model" in self._data_mesh.axis_names:
            from capreolus_tpu.parallel.tensor_parallel import shard_params_tp

            return shard_params_tp(tree, self._data_mesh)
        if self._data_mesh is not None and "expert" in self._data_mesh.axis_names:
            from capreolus_tpu.parallel.expert_parallel import shard_params_ep

            return shard_params_ep(tree, self._data_mesh)
        if self.config.get("fsdp") and self._data_mesh is not None:
            from capreolus_tpu.parallel.fsdp import shard_params_fsdp

            return shard_params_fsdp(tree, self._data_mesh)
        return self._replicate(tree)

    def _label_params(self, reranker, params):
        """Map each param path to an optimizer group: frozen / bert / other."""

        def label(path, value):
            name = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path).lower()
            if not reranker.trainable(tuple(str(getattr(p, "key", getattr(p, "name", p))) for p in path), value):
                return "frozen"
            if name.startswith("stacked"):
                return "bert"  # pp view: the stacked transformer layers ARE the bert stack
            if "bert" in name or "electra" in name:
                return "bert"
            return "other"

        return jax.tree_util.tree_map_with_path(label, params)

    @property
    def steps_per_iter(self):
        """Optimizer steps per iteration (batches per iter / gradient accumulation)."""
        return max(1, self.n_batch_per_iter // self.config["gradacc"])

    def _make_optimizer(self, reranker, params):
        warmup_steps = self.config["warmupiters"] * self.steps_per_iter
        decaytype = self.config["decaytype"]
        decay = self.config["decay"]
        decay_steps = max(1, self.config["decayiters"] * self.steps_per_iter)
        per_iter = self.steps_per_iter

        def schedule(base_lr):
            def fn(step):
                step = jnp.asarray(step, dtype=jnp.float32)
                mult = jnp.asarray(1.0, dtype=jnp.float32)
                if decaytype == "exponential" and decay:
                    mult = jnp.power(decay, (step - warmup_steps) / decay_steps)
                elif decaytype == "linear" and decay:
                    mult = 1.0 / (1.0 + decay * (step - warmup_steps) / per_iter)
                if warmup_steps:
                    warm = jnp.minimum((step + 1.0) / warmup_steps, 1.0)
                    mult = jnp.where(step <= warmup_steps, warm, mult)
                return base_lr * mult

            return fn

        labels = self._label_params(reranker, params)
        tx = optax.multi_transform(
            {
                "other": optax.adam(schedule(self.config["lr"])),
                "bert": optax.adam(schedule(self.config["bertlr"])),
                "frozen": optax.set_to_zero(),
            },
            labels,
        )
        return tx

    # ------------------------------------------------------------------ train step
    def _build_train_step(self, reranker, tx, loss_fn):
        amp = self._amp_mode() in ("train", "both")
        if self.config["loss"] == "lce" and not hasattr(reranker, "score_lce"):
            from capreolus_tpu.core import ConfigError

            raise ConfigError(
                f"trainer.loss=lce needs a reranker with multi-negative scoring "
                f"(score_lce); {type(reranker).module_name} does not support it")
        if self.config["loss"] == "infonce" and not hasattr(reranker, "encode"):
            from capreolus_tpu.core import ConfigError

            raise ConfigError(
                f"trainer.loss=infonce needs a reranker exposing embeddings (encode); "
                f"{type(reranker).module_name} does not support it (use reranker.name=biencoder)")
        if self.config["loss"] == "infonce" and self._pp_active():
            from capreolus_tpu.core import ConfigError

            raise ConfigError("trainer.loss=infonce is not wired through the GPipe schedule "
                              "(score_pp returns pair scores, not embeddings); use dp/tp/fsdp")
        # rerankers that opt in receive a dropout rng during the training forward
        # (parity: the reference's torch/HF models train with dropout active)
        use_rngs = bool(getattr(reranker, "accepts_rngs", False))

        def compute_loss(params, micro, rng):
            if amp:
                params = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
                )
            rngs = {"dropout": rng} if use_rngs else None
            kwargs = {"rngs": rngs} if use_rngs else {}
            if self._pp_active():
                # params is the {"rest","stacked"} pipeline view; scores flow
                # through the GPipe schedule (parallel/pipeline_parallel.py)
                pos, neg = reranker.score_pp(params, micro, self._data_mesh,
                                             self.config.get("microbatches", 0), rngs=rngs)
                if self.config["loss"] == "crossentropy":
                    loss = loss_fn(jnp.stack([neg, pos], axis=1).astype(jnp.float32), micro["label"])
                else:
                    loss = loss_fn([pos.astype(jnp.float32), neg.astype(jnp.float32)])
                return loss
            if self.config["loss"] == "lce":
                scores = reranker.score_lce(params, micro, **kwargs)
                loss = loss_fn(scores, micro.get("label"))
            elif self.config["loss"] == "crossentropy":
                pos, neg = reranker.score(params, micro, **kwargs)
                loss = loss_fn(jnp.stack([neg, pos], axis=1).astype(jnp.float32), micro["label"])
            elif self.config["loss"] == "margin_mse":
                pos, neg = reranker.score(params, micro, **kwargs)
                loss = loss_fn(pos.astype(jnp.float32).reshape(-1),
                               neg.astype(jnp.float32).reshape(-1),
                               micro["teacher_margin"].astype(jnp.float32).reshape(-1))
            elif self.config["loss"] == "infonce":
                # in-batch negatives: [B, B] similarity matrix with the positive
                # on the diagonal, plus each example's hard negative as B extra
                # columns. The batch axis is sharded over 'data', so this matmul
                # IS the cross-device-negatives recipe — GSPMD all-gathers the
                # document embeddings over ICI and every chip's queries see the
                # GLOBAL batch's documents (DPR/GTR at pod scale)
                q, pos, neg, scale = reranker.encode(params, micro, **kwargs)
                logits = q.astype(jnp.float32) @ pos.astype(jnp.float32).T
                if neg is not None:
                    logits = jnp.concatenate(
                        [logits, q.astype(jnp.float32) @ neg.astype(jnp.float32).T], axis=1)
                loss = loss_fn(scale * logits, jnp.arange(logits.shape[0]))
            else:
                pos, neg = reranker.score(params, micro, **kwargs)
                loss = loss_fn([pos.astype(jnp.float32), neg.astype(jnp.float32)])
            # rerankers may expose a differentiable training regularizer (e.g.
            # SPLADE's FLOPS sparsity penalty, reranker/splade.py); it is part
            # of the TRAINING loss only — inference and dev scoring never see it
            if hasattr(reranker, "regularizer"):
                loss = loss + reranker.regularizer(params, micro, **kwargs)
            return loss

        @functools.partial(self._jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batches, step_rng):
            # batches: pytree with leading [gradacc, batch, ...] axes
            def micro_grads(carry, xs):
                micro, rng = xs
                loss, grads = jax.value_and_grad(compute_loss)(params, micro, rng)
                acc_loss, acc_grads = carry
                return (acc_loss + loss, jax.tree_util.tree_map(jnp.add, acc_grads, grads)), None

            gradacc = self.config["gradacc"]
            micro_rngs = jax.random.split(step_rng, gradacc)
            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
            (loss_sum, grads), _ = jax.lax.scan(micro_grads, (0.0, zero_grads), (batches, micro_rngs))
            grads = jax.tree_util.tree_map(lambda g: (g / gradacc).astype(jnp.float32), grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss_sum / gradacc

        return train_step

    # ------------------------------------------------------------------ public API
    def train(self, reranker, train_dataset, train_output_path, dev_data, dev_output_path,
              qrels, metric="map", relevance_level=1):
        train_output_path = Path(train_output_path)
        dev_output_path = Path(dev_output_path)
        (dev_best_fn, weights_path, info_path, loss_fn_path, metrics_fn) = self.get_paths_for_early_stopping(
            train_output_path, dev_output_path
        )

        model = reranker.build_model()
        loss_fn = self._loss_fn()
        batch_size = self.config["batch"]
        gradacc = self.config["gradacc"]

        negrefresh = int(self.config.get("negrefresh") or 0)
        if negrefresh > 0 and not getattr(train_dataset, "supports_hard_negative_refresh", False):
            from capreolus_tpu.core import ConfigError

            raise ConfigError(
                f"trainer.negrefresh needs a sampler whose stream reads live negative pools "
                f"(triplet/pair/LCE); {type(train_dataset).module_name} does not support it")
        train_iter = iter(train_dataset)
        first_samples = [next(train_iter) for _ in range(batch_size)]
        if self.config["loss"] == "margin_mse" and "teacher_margin" not in first_samples[0]:
            from capreolus_tpu.core import ConfigError

            raise ConfigError("trainer.loss=margin_mse needs per-triple teacher margins "
                              "in the samples; use sampler.name=distill with a teacher "
                              "run file (sampler.teacherrunfile)")
        if self.config["loss"] == "infonce":
            # the infonce branch treats every row's posdoc as a TRUE positive
            # (diagonal labels) and negdoc as ONE hard negative; the pair
            # stream alternates pos/neg docs in the posdoc slot and LCE stacks
            # [nneg, L] negatives — both would train silently on a corrupted
            # objective rather than erroring
            neg0 = first_samples[0].get("negdoc")
            # pair streams emit a zeros negdoc placeholder with negdocid="" —
            # the real discriminator is whether a negative doc was sampled
            if (neg0 is None or np.asarray(neg0).ndim != 1
                    or not first_samples[0].get("negdocid")):
                from capreolus_tpu.core import ConfigError

                raise ConfigError(
                    "trainer.loss=infonce needs a triplet-form stream (one true positive in "
                    "posdoc plus a single hard negative in negdoc per sample); use "
                    f"sampler.name=triplet or distill — sampler.name="
                    f"{type(train_dataset).module_name} is incompatible (pair alternates "
                    "pos/neg in the posdoc slot; LCE stacks nneg negatives per sample)")
        init_batch = collate(first_samples, ARRAY_KEYS)
        params = reranker.init_params(jax.random.PRNGKey(self.config["seed"]), init_batch)
        dropout_rng = jax.random.PRNGKey(self.config["seed"] + 0x5eed)

        # data parallelism: batch axis sharded over the mesh, params replicated;
        # XLA inserts the gradient allreduce (TPUStrategy equivalent)
        self._data_mesh = self._mesh(batch_size)
        if self._data_mesh is not None:
            kind = "data-parallel"
            has_tp = "model" in self._data_mesh.axis_names
            has_pp = "pipe" in self._data_mesh.axis_names
            if has_pp and has_tp:
                kind = "pipeline+tensor+data-parallel"
            elif has_tp:
                kind = "tensor+data-parallel"
            elif has_pp:
                kind = "pipeline+data-parallel"
            elif self.config.get("fsdp"):
                kind = "fully-sharded data-parallel (ZeRO-3)"
            logger.info("%s training over %d devices (mesh %s)",
                        kind, self._data_mesh.devices.size, dict(self._data_mesh.shape))
            if self._pp_active():
                params = self._pp_setup(reranker, params)
            else:
                params = self._place_params(params)

        tx = self._make_optimizer(reranker, params)
        opt_state = tx.init(params)
        train_step = self._build_train_step(reranker, tx, loss_fn)

        # fastforward resume (parity: pytorch.py:124-168)
        initial_iter = 0
        train_loss = []
        if self.config["fastforward"]:
            # checkpoints are always canonical-format: convert the pp view out
            # for template matching and back in after a successful load
            ff_template = self._pp_canonical(reranker, params)
            initial_iter, ff_params, opt_state, train_loss = self._fastforward(
                weights_path, loss_fn_path, ff_template, opt_state, reranker
            )
            if self._pp_active():
                if initial_iter > 0:
                    params = self._pp_setup(reranker, ff_params)
            else:
                params = ff_params
            if initial_iter > 0:
                logger.info("fastforwarding to iteration %d", initial_iter)
                # the stream already yielded batch_size samples for init; skip the rest
                remaining = initial_iter * self.steps_per_iter * gradacc * batch_size - batch_size
                for _ in range(max(0, remaining)):
                    next(train_iter)

        pending = first_samples if initial_iter == 0 else []
        # TensorBoard events (parity: pytorch.py:279-294); from-scratch writer,
        # readable by standard tensorboard
        from capreolus_tpu.core import constants
        from capreolus_tpu.utils.tensorboard import EventWriter

        tb = None
        try:
            tb = EventWriter(constants["RESULTS_BASE_PATH"] / "runs" / self.config["boardname"])
        except Exception as e:
            logger.debug("tensorboard writer unavailable: %s", e)
        metric_history = []
        best_metric = -np.inf
        if metrics_fn.exists():
            best_metric = self.load_best_metric(metrics_fn, metric)
        dev_best_metrics = {}

        import time

        # background prefetch: host sample generation + collation overlaps device
        # steps (the role TFRecord staging plays in the reference, tensorflow.py:326-488)
        import queue as _queue
        import threading

        batch_queue: _queue.Queue = _queue.Queue(maxsize=4)
        total_steps = (self.config["niters"] - initial_iter) * self.steps_per_iter
        stop_flag = []

        def _producer():
            try:
                pending_local = list(pending)
                need = gradacc * batch_size
                for _ in range(total_steps):
                    if stop_flag:
                        return
                    while len(pending_local) < need:
                        pending_local.append(next(train_iter))
                    batch = collate(pending_local[:need], ARRAY_KEYS)
                    del pending_local[:need]
                    batch_queue.put({k: v.reshape((gradacc, batch_size) + v.shape[1:]) for k, v in batch.items()})
            except BaseException as e:  # surface producer failures to the train loop
                batch_queue.put(e)

        producer = threading.Thread(target=_producer, daemon=True)
        producer.start()

        profiling = False
        for niter in range(initial_iter, self.config["niters"]):
            if self.config["profile"] and niter == initial_iter:
                # tracing/profiling parity: the reference's closest facility is
                # TensorBoard scalars; here a real device trace is captured
                jax.profiler.start_trace(str(info_path / "profile"))
                profiling = True
            iter_start = time.time()
            iter_loss = []
            # deferred loss fetch: float(loss) every step would sync the device
            # per step (a full RTT through the tunneled backend); keeping a small
            # window of in-flight loss scalars lets dispatch run ahead so host
            # batch prep and device compute overlap. The window bounds in-flight
            # device memory (each queued step holds its input batch on device).
            pending_loss = []
            for step_i in range(self.steps_per_iter):
                item = batch_queue.get()
                if isinstance(item, BaseException):
                    raise item
                batches = self._shard_batch(item)
                # per-step dropout stream: deterministic in (seed, iter, step) so
                # fastforward resume replays identical regularization noise
                step_rng = jax.random.fold_in(dropout_rng, niter * self.steps_per_iter + step_i)
                params, opt_state, loss = train_step(params, opt_state, batches, step_rng)
                pending_loss.append(loss)
                if len(pending_loss) >= TRAIN_PIPELINE_DEPTH:
                    iter_loss.append(float(pending_loss.pop(0)))
            iter_loss.extend(float(x) for x in pending_loss)
            train_loss.append(float(np.mean(iter_loss)))
            logger.info("iter=%d loss=%.6f (%.1fs)", niter, train_loss[-1], time.time() - iter_start)
            if tb is not None:
                tb.add_scalar("training/loss", train_loss[-1], niter)
            if profiling:
                jax.profiler.stop_trace()
                profiling = False
                logger.info("profiler trace written to %s", info_path / "profile")

            if self.config["fastforward"]:
                self.save_checkpoint(weights_path / f"{niter}", self._pp_canonical(reranker, params),
                                     opt_state, reranker)
            self.write_to_loss_file(loss_fn_path, train_loss)
            _plot_loss(train_loss, info_path / "loss.png")

            if (niter + 1) % self.config["validatefreq"] == 0 and dev_data is not None:
                preds = self.predict(reranker, dev_data, params=self._pp_canonical(reranker, params))
                metrics = self._eval_dev_runs(preds, qrels, self._validation_metrics(metric), relevance_level)
                logger.info("dev metrics: %s", " ".join(f"{k}={v:0.3f}" for k, v in sorted(metrics.items())))
                metric_history.append((niter, dict(metrics)))
                _plot_metrics(metric_history, info_path / "metrics.png")
                if tb is not None:
                    for name, value in metrics.items():
                        tb.add_scalar(f"dev/{name}", value, niter)
                    self._tb_histograms(tb, params, niter)
                if metrics[metric] > best_metric:
                    best_metric = metrics[metric]
                    logger.info("new best dev metric: %s=%0.3f", metric, best_metric)
                    dev_best_metrics = metrics
                    self.write_to_metric_file(metrics_fn, metrics)
                    self.save_checkpoint(dev_best_fn, self._pp_canonical(reranker, params),
                                         opt_state, reranker)
                    try:
                        reranker.add_summary(self._pp_canonical(reranker, params), niter,
                                             info_path / "summaries")
                    except Exception as e:
                        logger.debug("add_summary failed: %s", e)

            # ANCE-style refresh (Xiong et al. 2021): periodically re-score the
            # ORIGINAL candidate pools with the CURRENT model and hand the
            # sampler the hardest negatives — the producer thread picks up the
            # swapped pools on its next drawn triples. Skipped after the final
            # iteration (nothing left to train on the refreshed pools).
            if negrefresh and (niter + 1) % negrefresh == 0 and (niter + 1) < self.config["niters"]:
                hard = self._mine_hard_negatives(reranker, train_dataset,
                                                 self._pp_canonical(reranker, params))
                train_dataset.set_hard_negatives(hard)

        stop_flag.append(True)
        self._wait_for_checkpoints()  # async writes durable before train() returns
        if tb is not None:
            tb.close()
        self._params = self._pp_canonical(reranker, params)
        self._opt_state = opt_state
        return dev_best_metrics

    _TB_HISTOGRAM_PARAM_LIMIT = 1 << 22  # ~4M params

    @classmethod
    def _tb_histograms(cls, tb, params, niter):
        """Per-parameter weight histograms (parity: pytorch.py:289-293). Skipped
        for very large models: pulling every BERT weight to the host each
        validation would dominate training time on a tunneled device."""
        import jax

        leaves = jax.tree_util.tree_leaves_with_path(params)
        total = sum(int(np.prod(leaf.shape)) for _, leaf in leaves)
        if total > cls._TB_HISTOGRAM_PARAM_LIMIT:
            return
        for path, leaf in leaves:
            name = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
            tb.add_histogram(name, np.asarray(leaf), niter)

    @staticmethod
    def _validation_metrics(metric):
        base = ["map", "P_20", "ndcg_cut_20"]
        return base if metric in base else base + [metric]

    @staticmethod
    def _eval_dev_runs(preds, qrels, metrics, relevance_level):
        """Validation metrics on device when supported (north star: eval stays on
        the TPU); host trec_eval-compatible path otherwise. Both are equality-
        tested against each other (tests/test_device_metrics.py)."""
        from capreolus_tpu.evaluation.device_metrics import device_supported, eval_runs_device

        if device_supported(metrics):
            return eval_runs_device(preds, qrels, metrics, relevance_level)
        return eval_runs(preds, qrels, metrics, relevance_level)

    def _mine_hard_negatives(self, reranker, train_dataset, params):
        """Score every (qid, candidate) pair in the train sampler's ORIGINAL
        negative pools with the CURRENT model (the pipelined predict loop) and
        return the top-neghard hardest per query (trainer.negrefresh — the ANCE
        recipe, Xiong et al. 2021, scoped to the first-stage candidate pool the
        rerank task trains from). The mining sampler is cached on the train
        sampler so its materialized features are extracted once per fold, not
        once per refresh."""
        mining = getattr(train_dataset, "_mining_sampler", None)
        if mining is None:
            from capreolus_tpu.sampler import Sampler

            pool = train_dataset.hard_negative_pool()
            mining = Sampler.create("pred", {})
            # empty qrels per qid: everything in the pool is already non-relevant
            # (prepare() split rel/neg against the real qrels)
            mining.prepare(pool, {qid: {} for qid in pool}, train_dataset.extractor)
            train_dataset._mining_sampler = mining
        preds = self.predict(reranker, mining, params=params)
        return select_hard_negatives(preds, int(self.config["neghard"]))

    def predict(self, reranker, pred_data, pred_fn=None, params=None):
        """Score all (qid, docid) pairs in a PredSampler; returns {qid: {docid: score}}
        and writes a TREC run file to pred_fn when given (parity: pytorch.py:310-377)."""
        if params is None:
            params = self._params
        model = reranker.build_model()
        batch_size = int(self.config.get("evalbatch") or 0) or self.config["batch"]

        preds = {}
        # feature extraction for the dev set is expensive (per-passage encoding);
        # cache the materialized samples on the sampler across validation rounds —
        # but only while they fit a RAM budget: a testthreshold=1000 fold over a
        # large benchmark streams instead of materializing (VERDICT r1 weak #10)
        sample_iter = self._predict_samples(pred_data)

        # cache the jitted scorer per reranker: a fresh closure every call would
        # re-trace the model each validation round
        cache = getattr(self, "_test_step_cache", None)
        if cache is None:
            cache = self._test_step_cache = {}
        test_step = cache.get(id(reranker))

        import collections
        import itertools

        # pipelined dispatch: JAX dispatch is async, so keeping a small window of
        # in-flight batches (dispatch + copy_to_host_async, drain lagged) overlaps
        # host batch prep and result transfer with device compute instead of
        # syncing per batch — through the tunneled backend a per-batch sync costs
        # a full RTT (PERF.md round 1); the window bounds in-flight device memory
        pending = collections.deque()

        def _drain_one():
            dev_scores, d_pairs, d_valid = pending.popleft()
            for (qid, docid), score in zip(d_pairs, np.asarray(dev_scores)[:d_valid]):
                preds.setdefault(qid, {})[docid] = float(score)

        prepared = False
        while True:
            chunk = list(itertools.islice(sample_iter, batch_size))
            if not chunk:
                break
            valid = len(chunk)
            pairs = [(s["qid"], s["posdocid"]) for s in chunk]
            while len(chunk) < batch_size:  # pad to avoid recompilation
                chunk.append(chunk[-1])
            batch = collate(chunk, ARRAY_KEYS)
            if not prepared:
                prepared = True
                if hasattr(reranker, "prepare_inference"):
                    # per-predict inference preparation outside the jitted scorer
                    # (int8 scale calibration against the CURRENT params)
                    reranker.prepare_inference(params, batch)
                if hasattr(reranker, "inference_variables"):
                    # calibrated stats enter as jit arguments, not constants
                    params = reranker.inference_variables(params)
                params = self._amp_pred_params(params)  # amp=pred/both: bf16 inference
            if test_step is None:
                test_step = cache[id(reranker)] = self._jit(lambda p, batch: reranker.test(p, batch))
            dev_scores = test_step(params, batch)
            try:
                dev_scores.copy_to_host_async()
            except AttributeError:
                pass  # non-array outputs (e.g. already-host results) just drain
            pending.append((dev_scores, pairs, valid))
            if len(pending) >= PREDICT_PIPELINE_DEPTH:
                _drain_one()
        while pending:
            _drain_one()

        if pred_fn is not None:
            pred_fn = Path(pred_fn)
            pred_fn.parent.mkdir(parents=True, exist_ok=True)
            from capreolus_tpu.utils.trec import write_trec_run

            write_trec_run(preds, pred_fn)
        return preds

    def _amp_pred_params(self, params):
        if self._amp_mode() in ("pred", "both"):
            return jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params)
        return params

    PREDICT_CACHE_BYTES = 2 << 30  # materialize+cache pred features up to 2 GiB

    def _predict_samples(self, pred_data):
        """Returns an iterator over pred samples, materializing and caching them
        on the sampler only when they fit PREDICT_CACHE_BYTES (dev sets during
        validation: cached across rounds; big test folds: streamed once)."""
        import itertools

        cached = getattr(pred_data, "_materialized_samples", None)
        if cached is not None:
            return iter(cached)
        it = iter(pred_data)
        first = next(it, None)
        if first is None:
            return iter(())
        it = itertools.chain([first], it)
        per_sample = sum(np.asarray(first[k]).nbytes for k in ARRAY_KEYS if k in first)
        try:
            total = per_sample * len(pred_data)
        except TypeError:  # no __len__: be safe, stream
            total = None
        if total is not None and total <= self.PREDICT_CACHE_BYTES:
            samples = list(it)
            try:
                pred_data._materialized_samples = samples
            except AttributeError:
                pass
            return iter(samples)
        logger.info("streaming %s prediction samples (%.1f GiB of features exceeds the %d GiB cache budget)",
                    "unknown-count" if total is None else len(pred_data),
                    0.0 if total is None else total / 2**30, self.PREDICT_CACHE_BYTES >> 30)
        return it

    # ------------------------------------------------------------------ checkpoints
    def _ckpt_mode(self):
        mode = str(self.config.get("ckpt", "flat"))
        if mode not in ("flat", "sharded", "sharded_async"):
            from capreolus_tpu.core import ConfigError

            raise ConfigError(f"trainer.ckpt must be flat, sharded, or sharded_async (got {mode!r})")
        return mode

    def save_checkpoint(self, path, params, opt_state, reranker):
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        saveable = self._strip_frozen(reranker, params)
        mode = self._ckpt_mode()
        if mode != "flat":
            from capreolus_tpu.utils.sharded_ckpt import AsyncCheckpointer, save_sharded

            ac = None
            if mode == "sharded_async":
                if getattr(self, "_async_ckpt", None) is None:
                    self._async_ckpt = AsyncCheckpointer()
                ac = self._async_ckpt
            save_sharded(_ext(path, ".params.shards"), saveable, async_checkpointer=ac)
            save_sharded(_ext(path, ".optstate.shards"), opt_state, async_checkpointer=ac)
            done = _ext(path, ".done")
            if ac is not None:  # done must cover BOTH trees: chain it on the writer
                ac.after(lambda: done.write_text("done"))
            else:
                done.write_text("done")
            return
        _ext(path, ".params").write_bytes(serialization.to_bytes(saveable))
        _ext(path, ".optstate").write_bytes(serialization.to_bytes(opt_state))
        _ext(path, ".done").write_text("done")

    def _wait_for_checkpoints(self):
        """Join any in-flight async checkpoint writes (no-op otherwise)."""
        ac = getattr(self, "_async_ckpt", None)
        if ac is not None:
            ac.wait()

    def load_checkpoint(self, path, params, opt_state=None, reranker=None):
        path = Path(path)
        self._wait_for_checkpoints()
        saveable = self._strip_frozen(reranker, params)
        pdir = _ext(path, ".params.shards")
        from capreolus_tpu.utils.sharded_ckpt import is_sharded_checkpoint, load_sharded

        if is_sharded_checkpoint(pdir):
            # restore each leaf onto the template's OWN sharding — a checkpoint
            # saved under a different mesh layout reshards here (assembly is by
            # global index ranges, placement by the target sharding)
            shardings = jax.tree_util.tree_map(lambda x: getattr(x, "sharding", None), saveable)
            loaded = load_sharded(pdir, like=saveable, shardings=shardings)
            params = self._merge_frozen(reranker, params, loaded)
            odir = _ext(path, ".optstate.shards")
            if opt_state is not None and is_sharded_checkpoint(odir):
                osh = jax.tree_util.tree_map(lambda x: getattr(x, "sharding", None), opt_state)
                opt_state = load_sharded(odir, like=opt_state, shardings=osh)
            return params, opt_state
        loaded = serialization.from_bytes(saveable, _ext(path, ".params").read_bytes())
        params = self._merge_frozen(reranker, params, loaded)
        if opt_state is not None and _ext(path, ".optstate").exists():
            opt_state = serialization.from_bytes(opt_state, _ext(path, ".optstate").read_bytes())
        return params, opt_state

    def _strip_frozen(self, reranker, params):
        """Replace frozen leaves with empty arrays so checkpoints skip them
        (parity with the reference excluding embedding.weight)."""
        if reranker is None:
            return params

        def strip(path, value):
            keys = tuple(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
            return value if reranker.trainable(keys, value) else np.zeros(0, dtype=np.float32)

        return jax.tree_util.tree_map_with_path(strip, params)

    def _merge_frozen(self, reranker, params, loaded):
        if reranker is None:
            return loaded

        def merge(path, current, new):
            keys = tuple(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
            return new if reranker.trainable(keys, current) else current

        return jax.tree_util.tree_map_with_path(merge, params, loaded)

    def _fastforward(self, weights_path, loss_fn_path, params, opt_state, reranker):
        if not loss_fn_path.exists():
            return 0, params, opt_state, []
        try:
            losses = self.load_loss_file(loss_fn_path)
        except IOError as e:
            logger.warning("%s", e)
            return 0, params, opt_state, []
        for niter in range(len(losses) - 1, -1, -1):
            ckpt = weights_path / f"{niter}"
            if _ext(ckpt, ".done").exists():
                params, opt_state = self.load_checkpoint(ckpt, params, opt_state, reranker=reranker)
                return niter + 1, params, opt_state, losses[: niter + 1]
        return 0, params, opt_state, []

    def load_best_model(self, reranker, train_output_path, params=None):
        """Load dev.best weights (parity: pytorch.py load_best_model)."""
        train_output_path = Path(train_output_path)
        if params is None:
            params = self._params
        params, _ = self.load_checkpoint(train_output_path / "dev.best", params, reranker=reranker)
        self._params = params
        return params


@Trainer.register
class PytorchTrainerAlias(JaxTrainer):
    """Alias so reference configs using trainer.name=pytorch keep working
    (the single JAX trainer replaces both reference trainers, SURVEY 2.9)."""

    module_name = "pytorch"


@Trainer.register
class TensorflowTrainerAlias(JaxTrainer):
    """Alias so reference configs using trainer.name=tensorflow keep working."""

    module_name = "tensorflow"
