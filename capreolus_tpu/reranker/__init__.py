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

    def add_summary(self, params, niter, output_path):
        """Write per-parameter statistics for iteration ``niter`` (the JSON analog of
        the reference's TensorBoard weight histograms, reranker/__init__.py:22-28)."""
        import json

        import jax
        import numpy as np

        stats = {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            name = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
            arr = np.asarray(leaf)
            if arr.size == 0:
                continue
            stats[name] = {
                "shape": list(arr.shape),
                "mean": float(arr.mean()),
                "std": float(arr.std()),
                "min": float(arr.min()),
                "max": float(arr.max()),
            }
        from pathlib import Path

        output_path = Path(output_path)
        output_path.mkdir(parents=True, exist_ok=True)
        with open(output_path / f"param_stats_{niter}.json", "wt") as f:
            json.dump(stats, f, indent=1)

    # default score/test implementations for models with
    # __call__(querytoks, doctoks, query_idf) -> [B] signature
    # rerankers whose models apply dropout set this True; the trainer then passes
    # a "dropout" rng during training forwards (inference stays deterministic)
    accepts_rngs = False

    def _apply(self, params, query, doc, query_idf, rngs=None):
        if rngs is not None and self.accepts_rngs:
            return self.model.apply(params, query, doc, query_idf, train=True, rngs=rngs)
        return self.model.apply(params, query, doc, query_idf)

    @staticmethod
    def fold_rngs(rngs, i):
        """Distinct dropout streams for the pos vs neg forward passes."""
        if rngs is None:
            return None
        import jax

        return {k: jax.random.fold_in(v, i) for k, v in rngs.items()}

    def score_default(self, params, batch, rngs=None):
        pos = self._apply(params, batch["query"], batch["posdoc"], batch["query_idf"], rngs=rngs)
        neg = self._apply(params, batch["query"], batch["negdoc"], batch["query_idf"],
                          rngs=self.fold_rngs(rngs, 1))
        return [pos.reshape(-1), neg.reshape(-1)]

    def test_default(self, params, batch):
        return self._apply(params, batch["query"], batch["posdoc"], batch["query_idf"]).reshape(-1)


import_all_modules(__file__, __package__)
