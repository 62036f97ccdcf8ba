"""KNRM: kernel-pooled neural ranking.

Capability parity with /root/reference/capreolus/reranker/KNRM.py (Xiong et al.,
End-to-End Neural Ad-hoc Ranking with Kernel Pooling, SIGIR'17): RBF kernel bank
over the query x doc similarity matrix, log-sum pooling, linear combination, with
the gradkernels / singlefc / scoretanh / finetune options.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from capreolus_tpu.core import ConfigOption
from capreolus_tpu.reranker import Reranker
from capreolus_tpu.reranker.common import KNRM_MUS, KNRM_SIGMAS, knrm_pool, similarity_matrix


class KNRMModel(nn.Module):
    embedding_init: np.ndarray
    gradkernels: bool = True
    singlefc: bool = True
    scoretanh: bool = False
    finetune: bool = False

    @nn.compact
    def __call__(self, querytoks, doctoks, query_idf=None):
        import jax

        embedding = self.param("embedding", lambda rng: jnp.asarray(self.embedding_init))
        mus = self.param("mus", lambda rng: jnp.asarray(KNRM_MUS, dtype=jnp.float32))
        sigmas = self.param("sigmas", lambda rng: jnp.asarray(KNRM_SIGMAS, dtype=jnp.float32))

        if jax.default_backend() == "tpu" and not self.gradkernels and not self.finetune:
            # fused Pallas simmat + kernel pooling (no [B, K, Q, D] in HBM). The
            # kernel has no VJP; with kernels and embeddings frozen no gradient
            # flows through it, so inputs are stop_gradient-wrapped explicitly.
            from capreolus_tpu.ops.simmat import knrm_simmat_pool

            sg = jax.lax.stop_gradient
            pooled = knrm_simmat_pool(sg(embedding), querytoks, doctoks, sg(mus), sg(sigmas))
        else:
            simmat = similarity_matrix(embedding, querytoks, doctoks)  # [B, Q, D]
            pooled = knrm_pool(simmat, mus, sigmas)  # [B, K]

        if self.singlefc:
            scores = nn.Dense(1, name="combine")(pooled)
        else:
            hidden = jnp.tanh(nn.Dense(30, name="combine1")(pooled))
            scores = nn.Dense(1, name="combine2")(hidden)
        if self.scoretanh:
            scores = jnp.tanh(scores)
        return scores[:, 0]


@Reranker.register
class KNRM(Reranker):
    """Chenyan Xiong, Zhuyun Dai, Jamie Callan, Zhiyuan Liu, and Russell Power. 2017.
    End-to-End Neural Ad-hoc Ranking with Kernel Pooling. SIGIR'17."""

    module_name = "KNRM"
    config_spec = [
        ConfigOption("gradkernels", True, "backprop through mus and sigmas"),
        ConfigOption("scoretanh", False, "use a tanh on the prediction (as in paper)"),
        ConfigOption("singlefc", True, "single fully connected layer (as in paper)"),
        ConfigOption("finetune", False, "fine-tune the embedding layer"),
    ]

    def build_model(self):
        if not hasattr(self, "model"):
            self.model = KNRMModel(
                embedding_init=self.extractor.embeddings,
                gradkernels=self.config["gradkernels"],
                singlefc=self.config["singlefc"],
                scoretanh=self.config["scoretanh"],
                finetune=self.config["finetune"],
            )
        return self.model

    def trainable(self, path, value):
        name = "/".join(str(p) for p in path)
        if "embedding" in name and not self.config["finetune"]:
            return False
        if ("mus" in name or "sigmas" in name) and not self.config["gradkernels"]:
            return False
        return True

    score = Reranker.score_default
    test = Reranker.test_default

    def add_summary(self, params, niter, output_path):
        """Also plot the combine-layer weights as a figure (parity: the
        reference's KNRM.add_summary matshow, reranker/KNRM.py:71-79)."""
        super().add_summary(params, niter, output_path)
        if not self.config["singlefc"]:
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            import numpy as np
            from pathlib import Path

            kernel = np.asarray(params["params"]["combine"]["kernel"])
            fig = plt.figure()
            ax = fig.add_subplot(1, 1, 1)
            ax.matshow(kernel.T)
            output_path = Path(output_path)
            output_path.mkdir(parents=True, exist_ok=True)
            fig.savefig(output_path / f"combine_weight_{niter}.png", bbox_inches="tight")
            plt.close(fig)
        except Exception as e:  # plotting must never break training
            from capreolus_tpu.utils.loginit import get_logger

            get_logger(__name__).debug("combine-weight figure failed: %s", e)
