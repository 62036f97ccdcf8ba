"""SPLADE-style learned sparse EXPANSION model, beyond the reference.

Where uniCOIL (reranker/unicoil.py) weights only the terms that literally occur
in a text, SPLADE (Formal et al., SIGIR'21 — SPLADE-max variant) projects every
token's contextual embedding onto the whole vocabulary and max-pools, so a text
is represented as a sparse NON-NEGATIVE vocab vector that can up-weight terms
it never contains (semantic expansion):

    rep(x)_v = max over valid positions i of  log(1 + relu(logit_iv))
    score(q, d) = rep(q) . rep(d)

Sparsity is learned, not assumed: the FLOPS regularizer (sum over the vocab of
the squared batch-mean activation) pushes rep mass onto few terms, which is
what makes the inverted-index serving path (searcher.name=impact with
searcher.encoder=splade) efficient. The regularizer enters the TRAINING loss
via the trainer's reranker.regularizer hook; inference never sees it.

TPU notes: the [B, L, V] logit tensor is one MXU matmul ([B*L, H] x [H, V]) —
exactly the shape the hardware wants; relu/log1p/max fuse into its epilogue.
The head is the faithful BERT MLM prediction head (transform Dense + LayerNorm
+ vocab decoder); when HF weights are reachable, the pretrained MLM head loads
with the decoder tied to the word embeddings (encoder.py
load_pretrained_mlm_head) — exactly what the published SPLADE fine-tunes from.
Offline it trains from init.
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


class MlmHead(nn.Module):
    """BERT's masked-LM prediction head: transform Dense + GELU + LayerNorm,
    then the vocab decoder (HF cls.predictions; decoder weight tied to the
    word embeddings at pretrained-load time, free to drift in fine-tuning)."""

    hidden_size: int
    vocab_size: int
    gelu_approximate: bool = True
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, name="transform")(x)
        x = nn.gelu(x, approximate=self.gelu_approximate)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="transform_ln")(x)
        return nn.Dense(self.vocab_size, name="decoder")(x)


class SpladeModel(nn.Module):
    """Shared-encoder vocab-expansion representations + dot-product scoring."""

    config: BertConfig
    vocab_size: int
    cls_id: int = 101
    sep_id: int = 102

    @nn.compact
    def _rep(self, toks, train=False):
        # truncate to BERT's learned positions (HF truncation=True semantics)
        # instead of crashing on berttext's 800-token default
        toks = jnp.asarray(toks, dtype=jnp.int32)[:, : self.config.max_position]
        mask = (toks != 0).astype(jnp.int32)  # WordPiece [PAD] = 0
        encoder = BertEncoder(self.config, name="bert")
        hidden, _, _ = encoder(toks, mask, train=train)
        head = MlmHead(self.config.hidden_size, self.vocab_size,
                       gelu_approximate=self.config.gelu_approximate,
                       layer_norm_eps=self.config.layer_norm_eps, name="mlm")
        logits = head(hidden.astype(jnp.float32))
        w = jnp.log1p(nn.relu(logits))  # [B, L, V] >= 0
        valid = (toks != 0) & (toks != self.cls_id) & (toks != self.sep_id)
        return jnp.max(jnp.where(valid[..., None], w, 0.0), axis=1)  # [B, V]

    def __call__(self, querytoks, doctoks, query_idf=None, train=False):
        q = self._rep(querytoks, train=train)
        d = self._rep(doctoks, train=train)
        return (q * d).sum(axis=-1)

    def rep(self, toks, train=False):
        """Public sparse-representation entry point (searcher + regularizer)."""
        return self._rep(toks, train=train)

    def flops(self, querytoks, doctoks, train=False):
        """FLOPS regularizer (Paria et al. 2020, as used by SPLADE): for each
        side, sum_v (mean over the batch of rep_v)^2 — a differentiable proxy
        for the expected posting intersections per query."""
        def f(toks):
            r = self._rep(toks, train=train)
            return (r.mean(axis=0) ** 2).sum()

        return f(querytoks) + f(doctoks)


@Reranker.register
class Splade(Reranker):
    """Learned sparse expansion retriever; export via searcher.name=impact
    searcher.encoder=splade."""

    module_name = "splade"
    dependencies = [
        Dependency(key="extractor", module="extractor", name="berttext",
                   default_config_overrides={"specialtokens": True}),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]
    config_spec = [
        ConfigOption("pretrained", "bert-base-uncased", "encoder checkpoint (or 'tiny' offline)"),
        ConfigOption("gelu", "tanh", "GELU variant: tanh or erf"),
        ConfigOption("allowrandominit", False, "allow random init when the checkpoint cannot be loaded"),
        ConfigOption("hidden_dropout_prob", 0.1, "encoder dropout during training"),
        ConfigOption("regweight", 1e-3, "FLOPS sparsity regularizer weight (0 disables; "
                     "applied to both query and doc representations during training)"),
    ]

    accepts_rngs = True  # encoder dropout during training

    def build(self):
        from capreolus_tpu.core import ConfigError

        if self.config["gelu"] not in ("tanh", "erf"):
            raise ConfigError(f"splade gelu must be 'tanh' or 'erf', got {self.config['gelu']!r}")

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
            self.model = SpladeModel(cfg, vocab_size=int(tok.vocab_size),
                                     cls_id=int(tok.cls_id), sep_id=int(tok.sep_id))
        return self.model

    def init_params(self, rng, batch):
        from capreolus_tpu.reranker.bert.encoder import load_pretrained_mlm_head

        model = self.build_model()
        params = model.init(rng, jnp.asarray(batch["query"]), jnp.asarray(batch["posdoc"]))
        pretrained = getattr(self, "_pretrained_params", None)
        if pretrained is not None:
            params["params"]["bert"] = jax.device_put(jax.tree_util.tree_map(jnp.asarray, pretrained))
            logger.info("loaded pretrained weights into the SPLADE encoder")
            mlm = load_pretrained_mlm_head(self.config["pretrained"], model.config)
            if mlm is not None and mlm["decoder"]["kernel"].shape[1] == int(model.vocab_size):
                params["params"]["mlm"] = jax.device_put(
                    jax.tree_util.tree_map(jnp.asarray, mlm))
                logger.info("loaded the pretrained MLM head (decoder tied to embeddings)")
        return params

    def regularizer(self, params, batch, rngs=None):
        """Trainer hook: FLOPS penalty over the query + positive-doc reps
        (the negative doc shares the doc distribution; one side suffices and
        halves the extra forward cost)."""
        lam = float(self.config["regweight"])
        if lam <= 0.0:
            return jnp.float32(0.0)
        kwargs = {"rngs": rngs, "train": True} if rngs is not None else {}
        return lam * self.model.apply(params, batch["query"], batch["posdoc"],
                                      method=SpladeModel.flops, **kwargs)

    score = Reranker.score_default
    test = Reranker.test_default
