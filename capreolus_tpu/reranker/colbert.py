"""ColBERT-style late-interaction model (Khattab & Zaharia, SIGIR'20) — beyond
the reference's zoo.

The reference can only consume a STATIC TCT-ColBERT run file
(/root/reference/capreolus/searcher/special.py:170-212); there is no trainable
multi-vector model anywhere in its tree. This module adds one, TPU-first: every
query/document token is projected to a compact per-token embedding, and the
relevance score is MaxSim — sum over query tokens of the max dot product against
the document's tokens. On TPU the whole interaction is one batched [Lq, dim] x
[dim, Ld] matmul per pair (MXU) followed by a masked max/sum (VPU); no gather,
no host loop.

Faithful ColBERT details implemented: [Q]/[D] marker tokens inserted after
[CLS] (BERT's [unused0]/[unused1] ids), query augmentation (query [PAD]s become
[MASK] and the query encoder attends over ALL positions so MASK slots carry
expansion signal), L2-normalized per-token projections without bias.
Punctuation-token filtering on the doc side (a tokenizer-level detail of the
original) is not applied; [PAD] doc tokens are masked out of the max.

Trains with the standard trainer/samplers (pairwise hinge or softmax); the
checkpoint plugs into `searcher.name=colbert` (searcher/late_interaction.py)
for end-to-end late-interaction retrieval.
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

# bert-base-uncased WordPiece ids (shared by the shipped dryrun vocab layout):
# [unused0]=1 marks queries, [unused1]=2 marks documents, [MASK]=103 augments
QUERY_MARKER = 1
DOC_MARKER = 2
MASK_ID = 103


def insert_marker(toks, marker_id):
    """[CLS] t1 t2 ... -> [CLS] [marker] t1 t2 ... (length preserved: the last
    token drops, mirroring ColBERT's tokenizer-side marker insertion)."""
    toks = jnp.asarray(toks, dtype=jnp.int32)
    marker = jnp.full_like(toks[:, :1], marker_id)
    return jnp.concatenate([toks[:, :1], marker, toks[:, 1:-1]], axis=1)


class ColBERTModel(nn.Module):
    """score(q, d) = sum_i max_j  E_q(q)_i . E_d(d)_j   (both L2-normalized).

    setup()-style so encode_query/encode_doc are callable standalone via
    model.apply(params, toks, method=...) — the late-interaction searcher
    embeds the corpus once with encode_doc and queries with encode_query."""

    config: BertConfig
    dim: int = 128
    query_augment: bool = True

    def setup(self):
        self.bert = BertEncoder(self.config, name="bert")
        self.linear = nn.Dense(self.dim, use_bias=False, name="linear")

    def encode_query(self, toks, train=False):
        toks = insert_marker(toks, QUERY_MARKER)
        if self.query_augment:
            toks = jnp.where(toks == 0, MASK_ID, toks)
        # augmentation: attend over every position (MASK slots included)
        mask = jnp.ones_like(toks)
        return self._project(toks, mask, train), None

    def encode_doc(self, toks, train=False):
        toks = insert_marker(toks, DOC_MARKER)
        mask = (toks != 0).astype(jnp.int32)
        return self._project(toks, mask, train), mask

    def _project(self, toks, mask, train):
        hidden, _, _ = self.bert(toks, mask, train=train)
        emb = self.linear(hidden).astype(jnp.float32)
        return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-9)

    def __call__(self, querytoks, doctoks, query_idf=None, train=False):
        q, _ = self.encode_query(querytoks, train=train)      # [B, Lq, dim]
        d, dmask = self.encode_doc(doctoks, train=train)      # [B, Ld, dim]
        return maxsim(q, d, dmask)


def maxsim(q, d, dmask):
    """[B, Lq, dim] x [B, Ld, dim] -> [B] MaxSim scores (one MXU matmul per
    pair + masked max/sum). dmask [B, Ld] zeroes padded doc tokens."""
    sim = jnp.einsum("bqe,bke->bqk", q, d)                    # [B, Lq, Ld]
    sim = jnp.where(dmask[:, None, :] > 0, sim, -1e9)
    return jnp.max(sim, axis=-1).sum(axis=-1)


@Reranker.register
class ColBERT(Reranker):
    """Trainable late-interaction reranker; export to searcher.name=colbert."""

    module_name = "colbert"
    dependencies = [
        # same [CLS] ... [SEP] layout the late-interaction searcher serves
        Dependency(key="extractor", module="extractor", name="berttext",
                   default_config_overrides={"specialtokens": True}),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]
    config_spec = [
        ConfigOption("pretrained", "bert-base-uncased", "encoder checkpoint (or 'tiny' offline)"),
        ConfigOption("dim", 128, "per-token embedding dimension"),
        ConfigOption("queryaugment", True, "expand query [PAD]s to [MASK] (ColBERT query augmentation)"),
        ConfigOption("gelu", "tanh", "GELU variant: tanh or erf"),
        ConfigOption("allowrandominit", False, "allow random init when the checkpoint cannot be loaded"),
        ConfigOption("hidden_dropout_prob", 0.1, "encoder dropout during training"),
    ]

    accepts_rngs = True  # encoder dropout during training

    def build(self):
        from capreolus_tpu.core import ConfigError

        if self.config["gelu"] not in ("tanh", "erf"):
            raise ConfigError(f"colbert gelu must be 'tanh' or 'erf', got {self.config['gelu']!r}")
        if int(self.config["dim"]) <= 0:
            raise ConfigError("colbert dim must be positive")

    def build_model(self):
        if not hasattr(self, "model"):
            import dataclasses as _dc

            name = self.config["pretrained"]
            cfg, self._pretrained_params = load_pretrained_encoder(
                name, allow_random_init=bool(self.config["allowrandominit"]))
            cfg = _dc.replace(cfg, gelu_approximate=(self.config["gelu"] == "tanh"),
                              hidden_dropout_prob=float(self.config["hidden_dropout_prob"]),
                              attention_dropout_prob=float(self.config["hidden_dropout_prob"]))
            self.model = ColBERTModel(cfg, dim=int(self.config["dim"]),
                                      query_augment=bool(self.config["queryaugment"]))
        return self.model

    def init_params(self, rng, batch):
        model = self.build_model()
        params = model.init(rng, jnp.asarray(batch["query"]), jnp.asarray(batch["posdoc"]))
        pretrained = getattr(self, "_pretrained_params", None)
        if pretrained is not None:
            params["params"]["bert"] = jax.device_put(jax.tree_util.tree_map(jnp.asarray, pretrained))
            logger.info("loaded pretrained weights into the ColBERT encoder")
        return params

    score = Reranker.score_default
    test = Reranker.test_default
