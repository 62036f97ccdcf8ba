"""Trainable learned-sparse term-weighting encoder (uniCOIL-style), beyond the
reference.

The reference's sparse retrieval is purely statistical (BM25 et al. through
Anserini, /root/reference/capreolus/searcher/anserini.py); modern sparse stacks
learn per-term IMPACTS with a BERT encoder (uniCOIL, Lin & Ma 2021; DeepImpact)
and serve them from an ordinary inverted index. This module closes that loop
in-framework: a shared encoder produces a non-negative weight for every token
(ReLU of a linear head over the contextual embedding), and the relevance score
is the exact-match dot product

    score(q, d) = sum over query positions i of  qw_i * max_{j : d_j == q_i} dw_j

i.e. document term impact = max over occurrences, query term weight = sum over
occurrences — EXACTLY the quantity an impact-ordered inverted index computes,
so a trained checkpoint plugs straight into ``searcher.name=impact``
(searcher/impact.py) with zero train/serve skew: the searcher's per-term
aggregation (doc max, query sum) reproduces this model's score up to impact
quantization.

TPU notes: the [B, Lq, Ld] exact-match mask is a cheap integer compare fused
into the weighted max; all FLOPs are in the BERT encoder (MXU). Trains with the
standard trainer/samplers (pairwise hinge/softmax).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from capreolus_tpu.core import ConfigOption, Dependency
from capreolus_tpu.reranker import Reranker
from capreolus_tpu.reranker.bert import BertConfig, BertEncoder, load_pretrained_encoder
from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)


class UniCoilModel(nn.Module):
    """Shared-encoder token weighting + exact-match interaction."""

    config: BertConfig
    cls_id: int = 101
    sep_id: int = 102

    @nn.compact
    def __call__(self, querytoks, doctoks, query_idf=None, train=False):
        encoder = BertEncoder(self.config, name="bert")
        tokweight = nn.Dense(1, name="tokweight")

        def weights(toks):
            # truncate to BERT's learned positions (HF truncation=True
            # semantics) instead of crashing on berttext's 800-token default
            toks = jnp.asarray(toks, dtype=jnp.int32)[:, : self.config.max_position]
            mask = (toks != 0).astype(jnp.int32)  # WordPiece [PAD] = 0
            hidden, _, _ = encoder(toks, mask, train=train)
            w = nn.relu(tokweight(hidden.astype(jnp.float32))[..., 0])
            return toks, w * mask

        q, qw = weights(querytoks)  # [B, Lq]
        d, dw = weights(doctoks)    # [B, Ld]
        # special tokens carry encoder context but never score: [CLS]/[SEP]
        # appear in BOTH sequences and would add a constant match term
        valid_q = (q != 0) & (q != self.cls_id) & (q != self.sep_id)
        valid_d = (d != 0) & (d != self.cls_id) & (d != self.sep_id)
        match = (q[:, :, None] == d[:, None, :]) & valid_q[:, :, None] & valid_d[:, None, :]
        # document term impact = max over matching occurrences (0 if none)
        dmax = jnp.max(jnp.where(match, dw[:, None, :], 0.0), axis=-1)  # [B, Lq]
        return (qw * dmax * valid_q.astype(jnp.float32)).sum(axis=-1)


@Reranker.register
class UniCoil(Reranker):
    """Learned-sparse retriever trained in-framework; export via searcher.name=impact."""

    module_name = "unicoil"
    dependencies = [
        # specialtokens: the searcher encodes docs/queries as [CLS] ... [SEP]
        # too, so the contextual weights match between training and serving
        Dependency(key="extractor", module="extractor", name="berttext",
                   default_config_overrides={"specialtokens": True}),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]
    config_spec = [
        ConfigOption("pretrained", "bert-base-uncased", "encoder checkpoint (or 'tiny' offline)"),
        ConfigOption("gelu", "tanh", "GELU variant: tanh or erf"),
        ConfigOption("allowrandominit", False, "allow random init when the checkpoint cannot be loaded"),
        ConfigOption("hidden_dropout_prob", 0.1, "encoder dropout during training"),
    ]

    accepts_rngs = True  # encoder dropout during training

    def build(self):
        from capreolus_tpu.core import ConfigError

        if self.config["gelu"] not in ("tanh", "erf"):
            raise ConfigError(f"unicoil gelu must be 'tanh' or 'erf', got {self.config['gelu']!r}")

    def build_model(self):
        if not hasattr(self, "model"):
            import dataclasses as _dc

            name = self.config["pretrained"]
            cfg, self._pretrained_params = load_pretrained_encoder(
                name, allow_random_init=bool(self.config["allowrandominit"]))
            cfg = _dc.replace(cfg, gelu_approximate=(self.config["gelu"] == "tanh"),
                              hidden_dropout_prob=float(self.config["hidden_dropout_prob"]),
                              attention_dropout_prob=float(self.config["hidden_dropout_prob"]))
            tok = self.extractor.tokenizer
            self.model = UniCoilModel(cfg, cls_id=int(tok.cls_id), sep_id=int(tok.sep_id))
        return self.model

    def init_params(self, rng, batch):
        model = self.build_model()
        params = model.init(rng, jnp.asarray(batch["query"]), jnp.asarray(batch["posdoc"]))
        pretrained = getattr(self, "_pretrained_params", None)
        if pretrained is not None:
            params["params"]["bert"] = jax.device_put(jax.tree_util.tree_map(jnp.asarray, pretrained))
            logger.info("loaded pretrained weights into the uniCOIL encoder")
        return params

    score = Reranker.score_default
    test = Reranker.test_default
