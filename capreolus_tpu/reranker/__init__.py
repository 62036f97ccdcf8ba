"""Reranker modules: neural second-stage models.

Capability parity with /root/reference/capreolus/reranker/__init__.py:7-55 (default
extractor/trainer dependencies, build_model/score/test contract, weight save/load
that skips frozen embeddings), with the torch/TF double implementations replaced by
a single JAX/Flax model zoo. Parameters are explicit JAX pytrees owned by the
trainer; rerankers define the model, its per-batch scoring, and which parameter
paths are trainable.
"""

from __future__ import annotations

from capreolus_tpu.core import Dependency, ModuleBase, import_all_modules, register_module_type
from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)


@register_module_type
class Reranker(ModuleBase):
    module_type = "reranker"
    dependencies = [
        Dependency(key="extractor", module="extractor", name="embedtext"),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]

    def build_model(self):
        """Create and return the flax model (cached on self.model)."""
        raise NotImplementedError

    def score(self, params, batch):
        """Return [pos_scores, neg_scores] for a training batch (parity: score())."""
        raise NotImplementedError

    def test(self, params, batch):
        """Return scores for the batch's posdoc (parity: test())."""
        raise NotImplementedError

    def trainable(self, path: tuple, value) -> bool:
        """Whether the parameter at ``path`` (tuple of name strings) is trainable.

        Frozen paths are excluded from optimization and from checkpoints — the
        JAX equivalent of the reference skipping ``embedding.weight`` and
        ``_nosave_`` params when pickling (reranker/__init__.py:30-55).
        """
        return True

    def init_params(self, rng, batch):
        """Initialize model parameters from an example batch."""
        import jax.numpy as jnp

        model = self.build_model()
        return model.init(rng, jnp.asarray(batch["query"]), jnp.asarray(batch["posdoc"]),
                          jnp.asarray(batch["query_idf"]))

    # default score/test implementations for models with
    # __call__(querytoks, doctoks, query_idf) -> [B] signature
    def _apply(self, params, query, doc, query_idf):
        return self.model.apply(params, query, doc, query_idf)

    def score_default(self, params, batch):
        pos = self._apply(params, batch["query"], batch["posdoc"], batch["query_idf"])
        neg = self._apply(params, batch["query"], batch["negdoc"], batch["query_idf"])
        return [pos.reshape(-1), neg.reshape(-1)]

    def test_default(self, params, batch):
        return self._apply(params, batch["query"], batch["posdoc"], batch["query_idf"]).reshape(-1)


import_all_modules(__file__, __package__)
