"""BERT cross-encoder rerankers: monoBERT-MaxP, VanillaBERT, PARADE, CEDR-KNRM, Birch.

Single JAX implementations replacing the reference's torch/TF doubles:
  BERTMaxP   <- ptBERTMaxP.py:108 / TFBERTMaxP.py:111 (per-passage monoBERT with
                max/first/sum/avg aggregation)
  VanillaBERT<- TFVanillaBert.py:70 (single-passage relevance head)
  parade     <- parade.py:117 / ptparade.py:91 (Li et al. 2020: passage-CLS
                aggregation via maxp/avg/transformer with learned passage position
                embeddings)
  CEDRKNRM   <- CEDRKNRM.py:184 / TFCEDRKNRM.py:202 (KNRM over per-layer BERT
                simmats + CLS features; passage simmats concatenated along doc axis)
  birch      <- birch.py:132 (per-passage scores, top-k combined linearly)

All share the flash-attention BertEncoder (capreolus_tpu.reranker.bert.encoder);
parameter paths under "bert" get the dual ``bertlr`` learning rate in the trainer.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from capreolus_tpu.core import ConfigOption, Dependency
from capreolus_tpu.reranker import Reranker
from capreolus_tpu.reranker.bert import BertConfig, BertEncoder, get_bert_config, load_pretrained_encoder
from capreolus_tpu.reranker.common import rbf_kernel_bank
from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)

BERT_BATCH_KEYS = ("pos_bert_input", "pos_mask", "pos_seg", "neg_bert_input", "neg_mask", "neg_seg", "label")

_QUANTIZE_OPT = ConfigOption(
    "quantize", "none",
    "inference-time quantization: none or int8 (int8 FFN matmuls on the v5e MXU double-rate path; training stays bf16/f32)")

_DROPOUT_OPT = ConfigOption(
    "hidden_dropout_prob", 0.1,
    "dropout probability of the encoder's hidden layers during training (parity: CEDRKNRM.py:199 / HF BertConfig)")

_LORA_OPT = ConfigOption(
    "lora", 0,
    "LoRA rank: 0 = full fine-tuning; r > 0 adds rank-r adapters to the attention "
    "query/value projections, FREEZES the base encoder (checkpoints and optimizer "
    "state shrink to adapters + head), and starts exactly at the pretrained model "
    "(zero-init up-projection). Composes with tp/pp/fsdp", value_type="int")

_LORA_ALPHA_OPT = ConfigOption("loraalpha", 16.0, "LoRA scaling alpha (delta = alpha/r * BA x)")


def _merge_params(init_tree, pretrained_tree):
    """Overlay pretrained leaves onto an initialized param tree, KEEPING params
    that exist only in the model (LoRA adapters; never dropping them the way a
    wholesale subtree replacement would)."""
    out = dict(init_tree)
    for k, v in pretrained_tree.items():
        if k in out and isinstance(v, dict) and isinstance(out[k], dict):
            out[k] = _merge_params(out[k], v)
        else:
            out[k] = jnp.asarray(v)
    return out


def _fold_rngs(rngs, i):
    """Distinct dropout streams for the pos/neg (or LCE group) forward passes."""
    if rngs is None:
        return None
    return {k: jax.random.fold_in(v, i) for k, v in rngs.items()}


def _flatten_passages(inp, mask, seg):
    """[B, P, L] -> ([B*P, L], B, P); [B, L] passes through with P=1."""
    if inp.ndim == 2:
        return inp, mask, seg, inp.shape[0], 1
    b, p, l = inp.shape
    return inp.reshape(b * p, l), mask.reshape(b * p, l), seg.reshape(b * p, l), b, p


def aggregate_passage_scores(scores, passage_mask, mode):
    """Aggregate [B, P] passage scores (parity: TFBERTMaxP.py:66-87)."""
    if scores.shape[1] == 1:
        return scores[:, 0]
    if mode == "max":
        return jnp.max(jnp.where(passage_mask, scores, -1e30), axis=1)
    if mode == "first":
        return scores[:, 0]
    if mode == "sum":
        return jnp.sum(jnp.where(passage_mask, scores, 0.0), axis=1)
    if mode == "avg":
        denom = jnp.maximum(passage_mask.sum(axis=1), 1)
        return jnp.sum(jnp.where(passage_mask, scores, 0.0), axis=1) / denom
    raise ValueError(f"unknown aggregation {mode!r}")


class _BertScorer(nn.Module):
    """Shared BERT + linear relevance head, scoring each passage."""

    config: BertConfig

    @nn.compact
    def __call__(self, inp, mask, seg, calibrate=False, train=False):
        flat_inp, flat_mask, flat_seg, b, p = _flatten_passages(inp, mask, seg)
        _, pooled, _ = BertEncoder(self.config, name="bert")(flat_inp, flat_mask, flat_seg,
                                                             calibrate=calibrate, train=train)
        scores = nn.Dense(1, name="classifier")(pooled.astype(jnp.float32))[:, 0]
        return scores.reshape(b, p)


class BertRerankerBase(Reranker):
    """Common scoring plumbing for cross-encoders over bertpassage features."""

    dependencies = [
        Dependency(key="extractor", module="extractor", name="bertpassage"),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]

    def encoder_config(self) -> BertConfig:
        import dataclasses as _dc

        name = self.config["pretrained"]
        cfg, self._pretrained_params = load_pretrained_encoder(
            name, allow_random_init=bool(self.config.get("allowrandominit", False)))
        if self.config.get("remat"):
            cfg = _dc.replace(cfg, remat=True)
        gelu = self.config.get("gelu", "tanh")
        if gelu not in ("tanh", "erf"):
            raise ValueError(f"gelu must be 'tanh' or 'erf', got {gelu!r}")
        cfg = _dc.replace(cfg, gelu_approximate=(gelu == "tanh"))
        hdp = self.config.get("hidden_dropout_prob")
        if hdp is not None:
            # one knob controls both dropout sites (the reference exposes only
            # hidden_dropout_prob, CEDRKNRM.py:199)
            cfg = _dc.replace(cfg, hidden_dropout_prob=float(hdp), attention_dropout_prob=float(hdp))
        lora = int(self.config.get("lora", 0) or 0)
        if lora:
            cfg = _dc.replace(cfg, lora_rank=lora,
                              lora_alpha=float(self.config.get("loraalpha", 16.0)))
        moe = int(self.config.get("moeexperts", 0) or 0)
        if moe:
            if self.config.get("quantize", "none") == "int8":
                from capreolus_tpu.core import ConfigError

                raise ConfigError("moeexperts and quantize=int8 cannot be combined")
            if getattr(self, "_pretrained_params", None) is not None:
                from capreolus_tpu.core import ConfigError

                raise ConfigError(
                    "moeexperts>0 replaces the FFN weights and cannot load a dense "
                    "pretrained checkpoint; use pretrained=tiny or allowrandominit")
            cfg = _dc.replace(cfg, moe_experts=moe, moe_topk=int(self.config.get("moetopk", 2)))
        return cfg

    def _passage_mask(self, mask):
        """Valid passages contain doc tokens: any mask=1 position with seg... approximated
        by more tokens than [CLS] q [SEP] [SEP] alone."""
        if mask.ndim == 2:
            return jnp.ones((mask.shape[0], 1), dtype=bool)
        return mask.sum(axis=2) > 0

    def init_params(self, rng, batch):
        model = self.build_model()
        params = model.init(rng, jnp.asarray(batch["pos_bert_input"]), jnp.asarray(batch["pos_mask"]),
                            jnp.asarray(batch["pos_seg"]))
        pretrained = getattr(self, "_pretrained_params", None)
        if pretrained is not None:
            params = jax.tree_util.tree_map(lambda x: x, params)  # copy structure
            flat = params["params"] if "params" in params else params
            if "bert" in flat:
                # MERGE by key rather than replacing the subtree: params that
                # exist only in this model (LoRA adapters) keep their init
                flat["bert"] = jax.device_put(_merge_params(flat["bert"], pretrained))
                logger.info("loaded pretrained weights into bert submodule")
        return params

    accepts_rngs = True  # the trainer passes a dropout rng during training

    def trainable(self, path, value):
        """With LoRA on, only the adapters and everything OUTSIDE the encoder
        (classifier head, simmat layers, ...) train; the base BERT freezes —
        frozen params get zero updates, no optimizer state, and are skipped in
        checkpoints (trainer/jax_trainer.py)."""
        if int(self.config.get("lora", 0) or 0) > 0:
            name = "/".join(map(str, path))
            if "bert" in name and "lora" not in name:
                return False
        return True

    def score(self, params, batch, rngs=None):
        pos = self._score_doc(params, batch["pos_bert_input"], batch["pos_mask"], batch["pos_seg"],
                              rngs=rngs)
        neg = self._score_doc(params, batch["neg_bert_input"], batch["neg_mask"], batch["neg_seg"],
                              rngs=_fold_rngs(rngs, 1))
        return [pos, neg]

    def test(self, params, batch):
        return self._score_doc(params, batch["pos_bert_input"], batch["pos_mask"], batch["pos_seg"],
                               inference=True)

    def score_lce(self, params, batch, rngs=None):
        """[B, 1+nneg] group scores: positive followed by each negative."""
        pos = self._score_doc(params, batch["pos_bert_input"], batch["pos_mask"], batch["pos_seg"],
                              rngs=rngs)
        negs = batch["neg_bert_input"]
        b, nneg = negs.shape[0], negs.shape[1]
        neg_scores = [
            self._score_doc(params, negs[:, i], batch["neg_mask"][:, i], batch["neg_seg"][:, i],
                            rngs=_fold_rngs(rngs, i + 1))
            for i in range(nneg)
        ]
        return jnp.stack([pos] + neg_scores, axis=1)

    # ------------------------------------------------------------------ scoring plumbing
    def _shape_inputs(self, inp, mask, seg):
        """Subclasses whose models expect [B, P, L] override to unsqueeze 2D input."""
        return jnp.asarray(inp), jnp.asarray(mask), jnp.asarray(seg)

    def _head_scores(self, raw_scores, mask):
        """Turn the model's [B, P] output into [B] document scores."""
        return aggregate_passage_scores(raw_scores, self._passage_mask(mask), self.config.get("aggregation", "max"))

    def _score_doc(self, params, inp, mask, seg, inference=False, rngs=None):
        inp, mask, seg = self._shape_inputs(inp, mask, seg)
        raw = self._apply_scorer(params, inp, mask, seg, inference, rngs=rngs)
        return self._head_scores(raw, mask)

    def _apply_scorer(self, params, inp, mask, seg, inference, rngs=None):
        if inference and self.config.get("quantize", "none") == "int8":
            model = self.build_test_model()
            # stats flow in as DATA (via inference_variables) whenever possible so
            # they are jit arguments, not trace-time constants — recalibration
            # after more training does not require retracing the scorer
            stats = params["quant_stats"] if "quant_stats" in params else self._inference_quant_stats(inp, mask, seg)
            return model.apply({"params": params["params"], "quant_stats": stats}, inp, mask, seg)
        if "quant_stats" in params:
            params = {"params": params["params"]}
        if rngs is not None and not inference:
            # training forward: dropout active (parity with the reference's
            # torch/HF dropout regularization)
            return self.build_model().apply(params, inp, mask, seg, train=True, rngs=rngs)
        return self.build_model().apply(params, inp, mask, seg)

    # ------------------------------------------------------------------ pipeline parallelism
    pp_compatible = False  # True on rerankers whose model is the plain _BertScorer

    def pp_view(self, params):
        """Canonical _BertScorer tree -> {"rest", "stacked"} pipeline view
        (layer params stacked along a leading axis for pipe-axis sharding)."""
        from capreolus_tpu.parallel import pipeline_parallel as ppmod

        rest, stacked = ppmod.split_scorer_params(params, self.build_model().config)
        return {"rest": rest, "stacked": stacked}

    def pp_canonical(self, view):
        """Inverse of pp_view: pipeline view -> canonical _BertScorer tree."""
        from capreolus_tpu.parallel import pipeline_parallel as ppmod

        return ppmod.merge_scorer_params(view["rest"], view["stacked"], self.build_model().config)

    def _score_doc_pp(self, view, inp, mask, seg, mesh, microbatches, rng=None):
        from capreolus_tpu.parallel import pipeline_parallel as ppmod

        inp, mask, seg = self._shape_inputs(inp, mask, seg)
        cfg = self.build_model().config
        raw = ppmod.pipelined_scorer_forward(cfg, view["rest"], view["stacked"], inp, mask, seg,
                                             mesh, microbatches, dropout_rng=rng,
                                             train=rng is not None)
        return self._head_scores(raw, mask)

    def score_pp(self, view, batch, mesh, microbatches, rngs=None):
        """Pairwise training scores through the GPipe pipeline (trainer.pp>1)."""
        rng = rngs.get("dropout") if rngs else None
        pos = self._score_doc_pp(view, batch["pos_bert_input"], batch["pos_mask"], batch["pos_seg"],
                                 mesh, microbatches, rng)
        neg = self._score_doc_pp(view, batch["neg_bert_input"], batch["neg_mask"], batch["neg_seg"],
                                 mesh, microbatches,
                                 None if rng is None else jax.random.fold_in(rng, 1))
        return [pos, neg]

    # ------------------------------------------------------------------ int8 inference
    def build_test_model(self):
        """Model used at inference: int8 FFN matmuls (v5e double-rate MXU path)
        when quantize=int8, sharing the training param tree unchanged."""
        if self.config.get("quantize", "none") != "int8":
            return self.build_model()
        if not hasattr(self, "_test_model"):
            import dataclasses as _dc

            train_model = self.build_model()
            cfg = _dc.replace(train_model.config, quantize="int8", remat=False)
            self._test_model = train_model.clone(parent=None, config=cfg)
        return self._test_model

    def prepare_inference(self, params, batch):
        """Calibrate int8 activation scales on a sample batch (no-op unless
        quantize=int8). The trainer calls this at the start of every predict()
        pass, so the scales always reflect the CURRENT params (training moves
        the GELU activation ranges); the calibration forward is jitted once."""
        if self.config.get("quantize", "none") != "int8":
            return
        model = self.build_test_model()
        inp, mask, seg = self._shape_inputs(batch["pos_bert_input"], batch["pos_mask"], batch["pos_seg"])
        calib = getattr(self, "_calibrate_fn", None)
        if calib is None:
            def calib(p, stats, inp, mask, seg):
                _, updated = model.apply({"params": p, "quant_stats": stats}, inp, mask, seg,
                                         calibrate=True, mutable=["quant_stats"])
                return updated["quant_stats"]

            calib = self._calibrate_fn = jax.jit(calib)
        zero = self._zero_quant_stats(model, inp, mask, seg)
        self._quant_stats = calib(params["params"], zero, inp, mask, seg)
        logger.info("calibrated int8 activation scales on a %d-doc sample batch", int(inp.shape[0]))

    def inference_variables(self, params):
        """Variables dict for test(): training params plus the calibrated int8
        scales as data (jit arguments — never trace-time constants)."""
        if self.config.get("quantize", "none") != "int8" or getattr(self, "_quant_stats", None) is None:
            return params
        return {"params": params["params"], "quant_stats": self._quant_stats}

    def _inference_quant_stats(self, inp, mask, seg):
        stats = getattr(self, "_quant_stats", None)
        if stats is None:  # uncalibrated: zeros select the amax=8 fallback in-graph
            stats = self._zero_quant_stats(self.build_test_model(), inp, mask, seg)
        return stats

    @staticmethod
    def _zero_quant_stats(model, inp, mask, seg):
        shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), inp, mask, seg))
        return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes["quant_stats"])


@Reranker.register
class BERTMaxP(BertRerankerBase):
    """monoBERT with passage-score aggregation (BERT-MaxP, Dai & Callan 2019).

    Registered as BERTMaxP; ptBERTMaxP/TFBERTMaxP resolve here too for config
    compatibility with the reference."""

    module_name = "BERTMaxP"
    pp_compatible = True  # plain _BertScorer model: trainer.pp>1 pipelines the encoder
    config_spec = [
        ConfigOption("pretrained", "bert-base-uncased", "pretrained model: bert-base-uncased, "
                     "Capreolus/bert-base-msmarco, electra-base, or tiny (offline)"),
        ConfigOption("gelu", "tanh", "GELU variant: tanh (fast approximation) or erf (exact HF parity)"),
        ConfigOption("allowrandominit", False, "allow training from random weights when the pretrained checkpoint cannot be loaded"),
        ConfigOption("aggregation", "max", "passage aggregation: max, first, sum, or avg"),
        ConfigOption("remat", False, "rematerialize encoder layers in the backward pass"),
        ConfigOption("moeexperts", 0, "mixture-of-experts FFN: number of expert FFNs per layer "
                     "(0 = dense FFN; beyond-reference TPU extension, shardable via trainer.ep)"),
        ConfigOption("moetopk", 2, "experts routed per token (top-k of the softmax gate)"),
        _QUANTIZE_OPT,
        _DROPOUT_OPT,
        _LORA_OPT,
        _LORA_ALPHA_OPT,
    ]

    def build_model(self):
        if not hasattr(self, "model"):
            self.model = _BertScorer(self.encoder_config())
        return self.model


@Reranker.register
class PtBERTMaxPAlias(BERTMaxP):
    module_name = "ptBERTMaxP"


@Reranker.register
class TFBERTMaxPAlias(BERTMaxP):
    module_name = "TFBERTMaxP"


@Reranker.register
class VanillaBERT(BERTMaxP):
    """Single-passage BERT relevance classifier (parity: TFVanillaBert.py:70)."""

    module_name = "TFVanillaBERT"
    config_spec = [
        ConfigOption("pretrained", "bert-base-uncased", "pretrained model"),
        ConfigOption("gelu", "tanh", "GELU variant: tanh (fast approximation) or erf (exact HF parity)"),
        ConfigOption("allowrandominit", False, "allow training from random weights when the pretrained checkpoint cannot be loaded"),
        ConfigOption("aggregation", "first", "single passage: always the first"),
        _QUANTIZE_OPT,
        _DROPOUT_OPT,
    ]


class ParadeModel(nn.Module):
    config: BertConfig
    aggregation: str = "transformer"
    num_passages: int = 16

    @nn.compact
    def __call__(self, inp, mask, seg, calibrate=False, train=False):
        flat_inp, flat_mask, flat_seg, b, p = _flatten_passages(inp, mask, seg)
        _, pooled, _ = BertEncoder(self.config, name="bert")(flat_inp, flat_mask, flat_seg,
                                                             calibrate=calibrate, train=train)
        cls_vecs = pooled.reshape(b, p, -1).astype(jnp.float32)  # [B, P, H]

        if self.aggregation == "maxp":
            doc_vec = jnp.max(cls_vecs, axis=1)
        elif self.aggregation == "avg":
            doc_vec = jnp.mean(cls_vecs, axis=1)
        elif self.aggregation == "transformer":
            h = self.config.hidden_size
            pos_emb = self.param("passage_position_embeddings",
                                 nn.initializers.normal(0.02), (self.num_passages + 1, h), jnp.float32)
            agg_cls = self.param("agg_cls", nn.initializers.normal(0.02), (h,), jnp.float32)
            x = jnp.concatenate([jnp.broadcast_to(agg_cls, (b, 1, h)), cls_vecs], axis=1)
            x = x + pos_emb[None, : p + 1]
            from capreolus_tpu.reranker.bert.encoder import BertLayer

            full_mask = jnp.ones((b, p + 1), dtype=jnp.int32)
            for i in range(2):
                x = BertLayer(self.config, name=f"agg_layer_{i}")(x.astype(jnp.dtype(self.config.dtype)),
                                                                  full_mask, calibrate, train)
            doc_vec = x[:, 0].astype(jnp.float32)
        else:
            raise ValueError(f"unknown PARADE aggregation {self.aggregation!r}")
        score = nn.Dense(1, name="classifier")(doc_vec)[:, 0]
        return score[:, None]  # [B, 1]: aggregation already pooled over passages


@Reranker.register
class Parade(BertRerankerBase):
    """PARADE: Passage Representation Aggregation for Document Reranking
    (Li et al. 2020; parity: parade.py:117)."""

    module_name = "parade"
    dependencies = [
        Dependency(key="extractor", module="extractor", name="pooledbertpassage"),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]
    config_spec = [
        ConfigOption("pretrained", "bert-base-uncased", "pretrained model"),
        ConfigOption("gelu", "tanh", "GELU variant: tanh (fast approximation) or erf (exact HF parity)"),
        ConfigOption("allowrandominit", False, "allow training from random weights when the pretrained checkpoint cannot be loaded"),
        ConfigOption("aggregation", "transformer", "passage aggregation: transformer, maxp, or avg"),
        _QUANTIZE_OPT,
        _DROPOUT_OPT,
    ]

    def build_model(self):
        if not hasattr(self, "model"):
            self.model = ParadeModel(
                self.encoder_config(),
                aggregation=self.config["aggregation"],
                num_passages=self.extractor.config["numpassages"],
            )
        return self.model

    def _shape_inputs(self, inp, mask, seg):
        inp, mask, seg = jnp.asarray(inp), jnp.asarray(mask), jnp.asarray(seg)
        if inp.ndim == 2:  # single passage at train time is still a "document"
            inp, mask, seg = inp[:, None], mask[:, None], seg[:, None]
        return inp, mask, seg

    def _head_scores(self, raw_scores, mask):
        return raw_scores[:, 0]  # model output is already aggregated over passages


@Reranker.register
class PtParadeAlias(Parade):
    module_name = "ptparade"


class CedrKnrmModel(nn.Module):
    config: BertConfig
    simmat_layers: tuple = (0, 6, 12)
    cls_mode: str = "avg"  # avg, max, or none
    maxqlen: int = 20
    # kernel bank config (parity: CEDRKNRM.py:42-43 — an exact-match kernel
    # mu=1.0/sigma=0.01 is appended to the configured mus)
    mus: tuple = (-0.9, -0.7, -0.5, -0.3, -0.1, 0.1, 0.3, 0.5, 0.7, 0.9)
    sigma: float = 0.1
    gradkernels: bool = True
    combine_hidden: int = 1024

    @nn.compact
    def __call__(self, inp, mask, seg, calibrate=False, train=False):
        flat_inp, flat_mask, flat_seg, b, p = _flatten_passages(inp, mask, seg)
        hidden, pooled, all_hidden = BertEncoder(self.config, name="bert")(
            flat_inp, flat_mask, flat_seg, output_hidden_states=True, calibrate=calibrate, train=train
        )
        l = flat_inp.shape[1]

        # query tokens: segment 0, not CLS (pos 0), valid; doc tokens: segment 1, valid
        pos_ids = jnp.arange(l)[None, :]
        is_valid = flat_mask > 0
        q_mask = (flat_seg == 0) & is_valid & (pos_ids > 0)  # [B*P, L] (includes first SEP; masked next)
        q_mask = q_mask & (pos_ids <= self.maxqlen)
        d_mask = (flat_seg == 1) & is_valid

        base_mus = np.asarray(list(self.mus) + [1.0], dtype=np.float32)
        base_sigmas = np.asarray([self.sigma] * len(self.mus) + [0.01], dtype=np.float32)
        if self.gradkernels:
            mus = self.param("mus", lambda rng: jnp.asarray(base_mus))
            sigmas = self.param("sigmas", lambda rng: jnp.asarray(base_sigmas))
        else:
            mus, sigmas = jnp.asarray(base_mus), jnp.asarray(base_sigmas)

        features = []
        for layer in self.simmat_layers:
            emb = all_hidden[min(layer, len(all_hidden) - 1)].astype(jnp.float32)  # [B*P, L, H]
            norm = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-9)
            sim = jnp.einsum("bqe,bde->bqd", norm, norm, preferred_element_type=jnp.float32)
            sim = jnp.where(q_mask[:, :, None] & d_mask[:, None, :], sim, 0.0)
            # concat passage simmats along doc axis (parity: CEDRKNRM.py:109-133)
            sim = sim.reshape(b, p, l, l).transpose(0, 2, 1, 3).reshape(b, l, p * l)
            kernels = rbf_kernel_bank(sim, mus, sigmas)  # [B, K, L, P*L]
            k_sum = kernels.sum(axis=3)  # [B, K, L]
            row_valid = (jnp.abs(sim).sum(axis=2) != 0.0)[:, None, :]
            # log(clamp(., 1e-10)) * 0.01 matches the reference's feature scaling
            # (CEDRKNRM.py:128-131) so combine-layer weights transfer
            pooled_k = jnp.where(row_valid, jnp.log(jnp.maximum(k_sum, 1e-10)) * 0.01, 0.0).sum(axis=2)  # [B, K]
            features.append(pooled_k)

        if self.cls_mode != "none":
            cls = pooled.reshape(b, p, -1).astype(jnp.float32)
            cls_feat = jnp.mean(cls, axis=1) if self.cls_mode == "avg" else jnp.max(cls, axis=1)
            features.append(cls_feat)

        combined = jnp.concatenate(features, axis=1)
        if self.combine_hidden > 0:
            # two stacked linears, no activation between (parity: CEDRKNRM.py:61-70)
            combined = nn.Dense(self.combine_hidden, name="combine_hidden")(combined)
        score = nn.Dense(1, name="combine")(combined)[:, 0]
        return score[:, None]


@Reranker.register
class CEDRKNRM(BertRerankerBase):
    """CEDR-KNRM: KNRM over contextualized embedding simmats + CLS features
    (MacAvaney et al. 2019; parity: CEDRKNRM.py:184)."""

    module_name = "CEDRKNRM"
    dependencies = [
        Dependency(key="extractor", module="extractor", name="pooledbertpassage"),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]
    config_spec = [
        ConfigOption("pretrained", "electra-base", "pretrained model (reference default, CEDRKNRM.py:193)"),
        ConfigOption("gelu", "tanh", "GELU variant: tanh (fast approximation) or erf (exact HF parity)"),
        ConfigOption("allowrandominit", False, "allow training from random weights when the pretrained checkpoint cannot be loaded"),
        ConfigOption("simmat_layers", "0..12,1", "encoder layers to build simmats from "
                     "(range syntax a..b,step or a comma list)", value_type="intlist"),
        ConfigOption("cls", "avg", "CLS feature pooling: avg, max, or none"),
        ConfigOption("mus", [-0.9, -0.7, -0.5, -0.3, -0.1, 0.1, 0.3, 0.5, 0.7, 0.9],
                     "RBF kernel centers (an exact-match kernel is appended)", value_type="floatlist"),
        ConfigOption("sigma", 0.1, "RBF kernel width"),
        ConfigOption("gradkernels", True, "tune mus and sigmas during training"),
        ConfigOption("combine_hidden", 1024, "hidden size of the combination FC layer (0 to disable)"),
        ConfigOption("hidden_dropout_prob", 0.1, "dropout probability of the encoder's hidden layers"),
        _QUANTIZE_OPT,
    ]

    def build_model(self):
        if not hasattr(self, "model"):
            self.model = CedrKnrmModel(
                self.encoder_config(),
                simmat_layers=tuple(self.config["simmat_layers"]),
                cls_mode=self.config["cls"] or "none",
                maxqlen=self.extractor.config["maxqlen"],
                mus=tuple(self.config["mus"]),
                sigma=float(self.config["sigma"]),
                gradkernels=bool(self.config["gradkernels"]),
                combine_hidden=int(self.config["combine_hidden"]),
            )
        return self.model

    _shape_inputs = Parade._shape_inputs
    _head_scores = Parade._head_scores


@Reranker.register
class TFCEDRKNRMAlias(CEDRKNRM):
    module_name = "TFCEDRKNRM"


class BirchModel(nn.Module):
    config: BertConfig
    topk: int = 3
    hidden: int = 0  # 0: weighted sum of topk scores; >0: MLP combiner (parity: birch.py:41-47)

    @nn.compact
    def __call__(self, inp, mask, seg, calibrate=False, train=False):
        flat_inp, flat_mask, flat_seg, b, p = _flatten_passages(inp, mask, seg)
        _, pooled, _ = BertEncoder(self.config, name="bert")(flat_inp, flat_mask, flat_seg,
                                                             calibrate=calibrate, train=train)
        psg_scores = nn.Dense(1, name="relevance")(pooled.astype(jnp.float32))[:, 0].reshape(b, p)
        k = min(self.topk, p)
        top_scores, _ = jax.lax.top_k(psg_scores, k)
        if self.hidden > 0:
            h = nn.relu(nn.Dense(self.hidden, name="combine_hidden")(top_scores))
            score = nn.Dense(1, name="combine_out")(h)[:, 0]
        else:
            # initialized to 1/topk like the reference's combine layer (birch.py:44)
            weights = self.param("topk_weights", lambda rng: jnp.full((k,), 1.0 / k, jnp.float32))
            score = (top_scores * weights).sum(axis=1)
        return score[:, None]


@Reranker.register
class Birch(BertRerankerBase):
    """Birch: document ranking from sentence-level evidence (Yilmaz et al. 2019;
    parity: birch.py:132 — per-passage scores, top-k combined linearly)."""

    module_name = "birch"
    dependencies = [
        Dependency(key="extractor", module="extractor", name="birchbertpassage"),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]
    config_spec = [
        ConfigOption("pretrained", "msmarco_mb", "pretrained Birch model: mb, msmarco_mb, or car_mb "
                     "(reference default, birch.py:138), or any BERT checkpoint name"),
        ConfigOption("gelu", "tanh", "GELU variant: tanh (fast approximation) or erf (exact HF parity)"),
        ConfigOption("allowrandominit", False, "allow training from random weights when the pretrained checkpoint cannot be loaded"),
        ConfigOption("topk", 3, "number of top passages to combine"),
        ConfigOption("hidden", 0, "combiner hidden size, or 0 for a weighted sum of the topk "
                     "(parity: birch.py:136)"),
        ConfigOption("finetune", False, "fine-tune the BERT model (frozen otherwise, parity: birch.py:66,137)"),
        _QUANTIZE_OPT,
        _DROPOUT_OPT,
    ]

    def build_model(self):
        if not hasattr(self, "model"):
            self.model = BirchModel(self.encoder_config(), topk=self.config["topk"],
                                    hidden=int(self.config["hidden"]))
        return self.model

    def init_params(self, rng, batch):
        params = super().init_params(rng, batch)
        if getattr(self, "_pretrained_params", None) is not None:
            # the reference scores passages with the checkpoint's fine-tuned NSP
            # head (birch.py:72-83); load it into the relevance Dense so frozen-
            # BERT training starts from the pretrained passage-relevance signal
            from capreolus_tpu.reranker.bert.encoder import load_pretrained_nsp_head

            head = load_pretrained_nsp_head(self.config["pretrained"])
            if head is not None:
                params["params"]["relevance"] = jax.tree_util.tree_map(jnp.asarray, head)
                self._nsp_head_loaded = True
                logger.info("loaded pretrained NSP head into the relevance layer")
            else:
                logger.warning("could not load the %s NSP head; the relevance layer starts "
                               "from random init over %s BERT features",
                               self.config["pretrained"],
                               "frozen" if not self.config["finetune"] else "trainable")
        return params

    def trainable(self, path, value):
        name = "/".join(map(str, path))
        if not self.config["finetune"]:
            if "bert" in name:
                return False
            # reference freezes the whole NSP model incl. its head (birch.py:66);
            # a randomly-initialized head (offline/tiny) must stay trainable
            if "relevance" in name and getattr(self, "_nsp_head_loaded", False):
                return False
        return True

    _shape_inputs = Parade._shape_inputs
    _head_scores = Parade._head_scores
