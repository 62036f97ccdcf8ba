"""Trainable dense bi-encoder (DPR/TCT-ColBERT-style), beyond the reference.

The reference can only CONSUME dense runs (static_tct_colbert downloads one,
/root/reference/capreolus/searcher/special.py:170-212). This module closes the
loop in-framework: a shared BERT encoder embeds query and document separately
(mean or CLS pooling, L2-normalized), scored by scaled cosine similarity, and
trains with the standard trainer + samplers (triplet hinge or pairwise
softmax/crossentropy; LCE needs a multi-negative extractor and is not wired
for the bi-encoder yet). The trained checkpoint
plugs straight into the dense searcher (`searcher.name=dense
searcher.checkpointfile=.../dev.best.params`) for exact MIPS retrieval.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from capreolus_tpu.core import ConfigOption, Dependency
from capreolus_tpu.reranker import Reranker
from capreolus_tpu.reranker.bert import BertConfig, BertEncoder, load_pretrained_encoder
from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)


class BiEncoderModel(nn.Module):
    """Shared-encoder bi-encoder: score = scale * cos(embed(q), embed(d))."""

    config: BertConfig
    pooling: str = "mean"
    scale: float = 20.0  # cosine in [-1,1] is too flat for softmax/hinge losses

    def setup(self):
        self.bert = BertEncoder(self.config)  # attribute name keeps the "bert" param path

    def embed(self, toks, train=False):
        """L2-normalized pooled embedding of one token batch ([B, L] -> [B, H]).
        Exposed as a method so the InfoNCE training path (trainer.loss=infonce)
        can embed queries/docs once each and build the in-batch logit matrix."""
        # BERT's learned positions cap the sequence; longer extractor outputs
        # (berttext's reference-parity default maxdoclen=800) truncate like
        # HF's truncation=True instead of crashing on the position-add
        toks = jnp.asarray(toks, dtype=jnp.int32)[:, : self.config.max_position]
        mask = (toks != 0).astype(jnp.int32)  # WordPiece [PAD] = 0
        hidden, _, _ = self.bert(toks, mask, train=train)
        if self.pooling == "cls":
            vec = hidden[:, 0]
        else:
            m = mask[..., None].astype(hidden.dtype)
            vec = (hidden * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        vec = vec.astype(jnp.float32)
        return vec / (jnp.linalg.norm(vec, axis=-1, keepdims=True) + 1e-9)

    def __call__(self, querytoks, doctoks, query_idf=None, train=False):
        q = self.embed(querytoks, train=train)
        d = self.embed(doctoks, train=train)
        return self.scale * (q * d).sum(axis=-1)


@Reranker.register
class BiEncoder(Reranker):
    """Dense retriever trained in-framework; export to the dense searcher."""

    module_name = "biencoder"
    dependencies = [
        # specialtokens: train on the same [CLS] ... [SEP] layout the dense
        # searcher serves at inference (no train/serve input skew)
        Dependency(key="extractor", module="extractor", name="berttext",
                   default_config_overrides={"specialtokens": True}),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]
    config_spec = [
        ConfigOption("pretrained", "bert-base-uncased", "encoder checkpoint (or 'tiny' offline)"),
        ConfigOption("pooling", "mean", "embedding pooling: mean or cls"),
        ConfigOption("scale", 20.0, "cosine similarity scale (logit temperature)"),
        ConfigOption("gelu", "tanh", "GELU variant: tanh or erf"),
        ConfigOption("allowrandominit", False, "allow random init when the checkpoint cannot be loaded"),
        ConfigOption("hidden_dropout_prob", 0.1, "encoder dropout during training"),
    ]

    accepts_rngs = True  # encoder dropout during training

    def build(self):
        from capreolus_tpu.core import ConfigError

        if self.config["pooling"] not in ("mean", "cls"):
            raise ConfigError(f"biencoder pooling must be 'mean' or 'cls', got {self.config['pooling']!r}")
        if self.config["gelu"] not in ("tanh", "erf"):
            raise ConfigError(f"biencoder gelu must be 'tanh' or 'erf', got {self.config['gelu']!r}")

    def build_model(self):
        if not hasattr(self, "model"):
            import dataclasses as _dc

            name = self.config["pretrained"]
            cfg, self._pretrained_params = load_pretrained_encoder(
                name, allow_random_init=bool(self.config["allowrandominit"]))
            cfg = _dc.replace(cfg, gelu_approximate=(self.config["gelu"] == "tanh"),
                              hidden_dropout_prob=float(self.config["hidden_dropout_prob"]),
                              attention_dropout_prob=float(self.config["hidden_dropout_prob"]))
            self.model = BiEncoderModel(cfg, pooling=self.config["pooling"],
                                        scale=float(self.config["scale"]))
        return self.model

    def init_params(self, rng, batch):
        model = self.build_model()
        params = model.init(rng, jnp.asarray(batch["query"]), jnp.asarray(batch["posdoc"]))
        pretrained = getattr(self, "_pretrained_params", None)
        if pretrained is not None:
            params["params"]["bert"] = jax.device_put(jax.tree_util.tree_map(jnp.asarray, pretrained))
            logger.info("loaded pretrained weights into the bi-encoder")
        return params

    score = Reranker.score_default
    test = Reranker.test_default

    def encode(self, params, batch, rngs=None):
        """(q, posdoc, negdoc-or-None) unit embeddings + the logit scale, for
        the trainer's in-batch-negative InfoNCE loss (trainer.loss=infonce).
        Each text is encoded ONCE; the trainer builds the [B, B(+B)] similarity
        matrix, which under GSPMD data sharding spans the GLOBAL batch — every
        chip's queries train against every chip's documents with XLA inserting
        the all-gather over ICI (the DPR/GTR cross-device-negatives recipe)."""
        model = self.build_model()

        def emb(toks, i):
            r = self.fold_rngs(rngs, i)
            kwargs = {"rngs": r} if r is not None else {}
            return model.apply(params, toks, train=r is not None,
                               method=BiEncoderModel.embed, **kwargs)

        q = emb(batch["query"], 0)
        pos = emb(batch["posdoc"], 1)
        neg = emb(batch["negdoc"], 2) if "negdoc" in batch else None
        return q, pos, neg, float(self.config["scale"])
