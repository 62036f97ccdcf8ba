"""Interaction-based neural rankers: DRMM, DRMMTKS, ConvKNRM, PACRR, DSSM, CDSSM.

Single JAX implementations of the reference's PyTorch models:
  DRMM     <- DRMM.py:126 (Guo et al. CIKM'16): matching histograms (CH/NH/LCH)
              + term gate (TV/IDF)
  DRMMTKS  <- DRMMTKS.py:74: top-k similarity selection variant
  ConvKNRM <- ConvKNRM.py:84 (Dai et al. WSDM'18): n-gram cross-matched kernels
  PACRR    <- PACRR.py:89 (Hui et al. EMNLP'17): n-gram convs + k-max pooling
  DSSM     <- DSSM.py:50 (Huang et al. CIKM'13): siamese MLP over bag-of-words
  CDSSM    <- CDSSM.py:79 (Shen et al. CIKM'14): convolutional DSSM
  TFKNRM   <- TFKNRM.py:75: same computation as KNRM (single JAX implementation)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from capreolus_tpu.core import ConfigOption, Dependency
from capreolus_tpu.reranker import Reranker
from capreolus_tpu.reranker.common import KNRM_MUS, KNRM_SIGMAS, knrm_pool, similarity_matrix
from capreolus_tpu.reranker.knrm import KNRM


@Reranker.register
class TFKNRMAlias(KNRM):
    """The reference's TF variant of KNRM resolves to the same JAX model."""

    module_name = "TFKNRM"
    dependencies = [
        Dependency(key="extractor", module="extractor", name="slowembedtext"),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]


# ------------------------------------------------------------------------- DRMM
def matching_histogram(simmat, d_mask, nbins, hist_type):
    """DRMM matching histograms (parity: DRMM.py:41-81).

    Bins 0..nbins-1 cover [-1, 1); the extra final bin counts exact matches
    (0.999 < sim < 1.001). Counts are laplace-smoothed (+1) then CH/NH/LCH scaled.
    """
    sim = simmat + (1.0 - d_mask[:, None, :]) * 1e7  # push PAD out of all bins
    edges = jnp.linspace(-1.0, 1.0, nbins + 1)[1:]  # upper bounds
    below = (sim[..., None] < edges).astype(jnp.float32).sum(axis=2)  # [B, Q, nbins]
    hist = jnp.concatenate([below[..., :1], jnp.diff(below, axis=-1)], axis=-1)
    exact = ((sim > 0.999) & (sim < 1.001)).astype(jnp.float32).sum(axis=2, keepdims=True)
    hist = jnp.concatenate([hist, exact], axis=-1) + 1.0  # [B, Q, nbins+1]

    if hist_type == "NH":
        hist = hist / hist.sum(axis=-1, keepdims=True)
    elif hist_type == "LCH":
        hist = jnp.log(hist)
    elif hist_type != "CH":
        raise ValueError("histType should be CH, NH, or LCH")
    return jax.lax.stop_gradient(hist)


class DRMMModel(nn.Module):
    embedding_init: np.ndarray
    nbins: int = 29
    nodes: int = 5
    hist_type: str = "LCH"
    gate_type: str = "IDF"

    @nn.compact
    def __call__(self, querytoks, doctoks, query_idf):
        embedding = self.param("embedding", lambda rng: jnp.asarray(self.embedding_init))
        simmat = similarity_matrix(embedding, querytoks, doctoks)
        q_mask = (querytoks != 0).astype(jnp.float32)
        d_mask = (doctoks != 0).astype(jnp.float32)

        hist = matching_histogram(simmat, d_mask, self.nbins, self.hist_type)
        h = jnp.tanh(nn.Dense(self.nodes, name="ffw1")(hist))
        ffw_vec = jnp.tanh(nn.Dense(1, name="ffw2")(h))[..., 0]  # [B, Q]

        atten_mask = (1.0 - q_mask) * -1e7
        if self.gate_type == "IDF":
            gate = nn.Dense(1, use_bias=False, name="gate")(query_idf[..., None])[..., 0] + atten_mask
        else:  # TV
            q_emb = jnp.take(embedding, jnp.maximum(querytoks, 0), axis=0)
            gate = nn.Dense(1, use_bias=False, name="gate")(q_emb)[..., 0] + atten_mask
        w = jax.nn.softmax(gate, axis=1)

        x = (w * ffw_vec).sum(axis=-1, keepdims=True)
        return nn.Dense(1, name="output")(x)[:, 0]


@Reranker.register
class DRMM(Reranker):
    """Jiafeng Guo, Yixing Fan, Qingyao Ai, and W. Bruce Croft. 2016. A Deep Relevance
    Matching Model for Ad-hoc Retrieval. CIKM'16 (parity: DRMM.py:126)."""

    module_name = "DRMM"
    config_spec = [
        ConfigOption("nbins", 29, "number of bins in the matching histogram"),
        ConfigOption("nodes", 5, "hidden layer size"),
        ConfigOption("histType", "LCH", "histogram type: CH, NH, or LCH"),
        ConfigOption("gateType", "IDF", "term gate type: TV or IDF"),
    ]

    def build_model(self):
        if not hasattr(self, "model"):
            self.model = DRMMModel(
                embedding_init=self.extractor.embeddings,
                nbins=self.config["nbins"],
                nodes=self.config["nodes"],
                hist_type=self.config["histType"],
                gate_type=self.config["gateType"],
            )
        return self.model

    def trainable(self, path, value):
        return "embedding" not in "/".join(map(str, path))

    score = Reranker.score_default
    test = Reranker.test_default


# ------------------------------------------------------------------------- DRMMTKS
class DRMMTKSModel(nn.Module):
    embedding_init: np.ndarray
    topk: int = 10
    gate_type: str = "IDF"

    @nn.compact
    def __call__(self, querytoks, doctoks, query_idf):
        embedding = self.param("embedding", lambda rng: jnp.asarray(self.embedding_init))
        simmat = similarity_matrix(embedding, querytoks, doctoks)  # [B, Q, D]
        k = min(self.topk, simmat.shape[-1])
        top_sims, _ = jax.lax.top_k(simmat, k)  # [B, Q, k]
        h = jnp.tanh(nn.Dense(1, name="mlp")(top_sims))[..., 0]  # [B, Q]

        q_mask = (querytoks != 0).astype(jnp.float32)
        atten_mask = (1.0 - q_mask) * -1e7
        if self.gate_type == "IDF":
            gate = nn.Dense(1, use_bias=False, name="gate")(query_idf[..., None])[..., 0] + atten_mask
        else:
            q_emb = jnp.take(embedding, jnp.maximum(querytoks, 0), axis=0)
            gate = nn.Dense(1, use_bias=False, name="gate")(q_emb)[..., 0] + atten_mask
        w = jax.nn.softmax(gate, axis=1)
        x = (w * h).sum(axis=-1, keepdims=True)
        return nn.Dense(1, name="output")(x)[:, 0]


@Reranker.register
class DRMMTKS(Reranker):
    """DRMM with top-k similarity selection (parity: DRMMTKS.py:74)."""

    module_name = "DRMMTKS"
    config_spec = [
        ConfigOption("topk", 10, "number of top similarities kept per query term"),
        ConfigOption("gateType", "IDF", "term gate type: TV or IDF"),
        ConfigOption("freezeemb", True, "freeze the embedding layer"),
    ]

    def build_model(self):
        if not hasattr(self, "model"):
            self.model = DRMMTKSModel(
                embedding_init=self.extractor.embeddings,
                topk=self.config["topk"],
                gate_type=self.config["gateType"],
            )
        return self.model

    def trainable(self, path, value):
        if self.config["freezeemb"] and "embedding" in "/".join(map(str, path)):
            return False
        return True

    score = Reranker.score_default
    test = Reranker.test_default


# ------------------------------------------------------------------------- ConvKNRM
class ConvKNRMModel(nn.Module):
    embedding_init: np.ndarray
    maxngram: int = 3
    filters: int = 128
    crossmatch: bool = True
    singlefc: bool = True
    scoretanh: bool = False

    @nn.compact
    def __call__(self, querytoks, doctoks, query_idf=None):
        embedding = self.param("embedding", lambda rng: jnp.asarray(self.embedding_init))
        mus = self.param("mus", lambda rng: jnp.asarray(KNRM_MUS, dtype=jnp.float32))
        sigmas = self.param("sigmas", lambda rng: jnp.asarray(KNRM_SIGMAS, dtype=jnp.float32))

        q_emb = jnp.take(embedding, jnp.maximum(querytoks, 0), axis=0)  # [B, Q, E]
        d_emb = jnp.take(embedding, jnp.maximum(doctoks, 0), axis=0)

        q_ngrams, d_ngrams = [], []
        for h in range(1, self.maxngram + 1):
            conv = nn.Conv(self.filters, kernel_size=(h,), padding="SAME", name=f"conv_{h}")
            q_ngrams.append(jnp.tanh(conv(q_emb)))
            d_ngrams.append(jnp.tanh(conv(d_emb)))

        q_mask = (querytoks != 0)
        d_mask = (doctoks != 0)
        pooled = []
        for qi, q_ng in enumerate(q_ngrams):
            for di, d_ng in enumerate(d_ngrams):
                if not self.crossmatch and qi != di:
                    continue
                qn = q_ng / (jnp.linalg.norm(q_ng, axis=-1, keepdims=True) + 1e-9)
                dn = d_ng / (jnp.linalg.norm(d_ng, axis=-1, keepdims=True) + 1e-9)
                sim = jnp.einsum("bqe,bde->bqd", qn, dn, preferred_element_type=jnp.float32)
                sim = jnp.where(q_mask[:, :, None] & d_mask[:, None, :], sim, 0.0)
                pooled.append(knrm_pool(sim, mus, sigmas))
        features = jnp.concatenate(pooled, axis=1)

        if self.singlefc:
            scores = nn.Dense(1, name="combine")(features)
        else:
            scores = nn.Dense(1, name="combine2")(jnp.tanh(nn.Dense(30, name="combine1")(features)))
        if self.scoretanh:
            scores = jnp.tanh(scores)
        return scores[:, 0]


@Reranker.register
class ConvKNRM(Reranker):
    """Zhuyun Dai, Chenyan Xiong, Jamie Callan, Zhiyuan Liu. 2018. Convolutional Neural
    Networks for Soft-Matching N-Grams in Ad-hoc Search. WSDM'18 (parity: ConvKNRM.py:84)."""

    module_name = "ConvKNRM"
    dependencies = [
        Dependency(key="extractor", module="extractor", name="slowembedtext"),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]
    config_spec = [
        ConfigOption("gradkernels", True, "backprop through mus and sigmas"),
        ConfigOption("maxngram", 3, "maximum ngram length"),
        ConfigOption("crossmatch", True, "match ngrams of different lengths"),
        ConfigOption("filters", 128, "convolution filters"),
        ConfigOption("scoretanh", False, "tanh on the final score"),
        ConfigOption("singlefc", True, "single fully connected combination layer"),
    ]

    def build_model(self):
        if not hasattr(self, "model"):
            self.model = ConvKNRMModel(
                embedding_init=self.extractor.embeddings,
                maxngram=self.config["maxngram"],
                filters=self.config["filters"],
                crossmatch=self.config["crossmatch"],
                singlefc=self.config["singlefc"],
                scoretanh=self.config["scoretanh"],
            )
        return self.model

    def trainable(self, path, value):
        name = "/".join(map(str, path))
        if "embedding" in name:
            return False
        if ("mus" in name or "sigmas" in name) and not self.config["gradkernels"]:
            return False
        return True

    score = Reranker.score_default
    test = Reranker.test_default


# ------------------------------------------------------------------------- PACRR
class PACRRModel(nn.Module):
    embedding_init: np.ndarray
    mingram: int = 1
    maxgram: int = 3
    nfilters: int = 32
    kmax: int = 2
    combine: int = 32
    nonlinearity: str = "relu"
    use_idf: bool = True

    @nn.compact
    def __call__(self, querytoks, doctoks, query_idf):
        embedding = self.param("embedding", lambda rng: jnp.asarray(self.embedding_init))
        simmat = similarity_matrix(embedding, querytoks, doctoks)  # [B, Q, D]

        signals = []
        x = simmat[..., None]  # [B, Q, D, 1]
        for n in range(self.mingram, self.maxgram + 1):
            if n == 1:
                conv_out = simmat
            else:
                conv = nn.Conv(self.nfilters, kernel_size=(n, n), padding="SAME", name=f"conv_{n}")
                conv_out = jnp.max(nn.relu(conv(x)), axis=-1)  # max over filters -> [B, Q, D]
            k = min(self.kmax, conv_out.shape[-1])
            top, _ = jax.lax.top_k(conv_out, k)  # [B, Q, k]
            signals.append(top)

        feats = jnp.concatenate(signals, axis=-1)  # [B, Q, ngrams*kmax]
        if self.use_idf:
            idf_softmax = jax.nn.softmax(jnp.where(querytoks != 0, query_idf, -1e7), axis=1)
            feats = jnp.concatenate([feats, idf_softmax[..., None]], axis=-1)

        flat = feats.reshape(feats.shape[0], -1)
        nonlin = {"relu": nn.relu, "tanh": jnp.tanh, "none": lambda v: v}[self.nonlinearity]
        h = nonlin(nn.Dense(self.combine, name="combine1")(flat))
        h = nonlin(nn.Dense(self.combine, name="combine2")(h))
        return nn.Dense(1, name="output")(h)[:, 0]


@Reranker.register
class PACRR(Reranker):
    """Kai Hui, Andrew Yates, Klaus Berberich, Gerard de Melo. 2017. PACRR: A Position-Aware
    Neural IR Model for Relevance Matching. EMNLP'17 (parity: PACRR.py:89)."""

    module_name = "PACRR"
    config_spec = [
        ConfigOption("mingram", 1, "minimum ngram length"),
        ConfigOption("maxgram", 3, "maximum ngram length"),
        ConfigOption("nfilters", 32, "convolution filters"),
        ConfigOption("idf", True, "concatenate idf softmax signal"),
        ConfigOption("kmax", 2, "k-max pooling depth"),
        ConfigOption("combine", 32, "combination layer size"),
        ConfigOption("nonlinearity", "relu", "combination nonlinearity: none, relu, or tanh"),
    ]

    def build_model(self):
        if not hasattr(self, "model"):
            self.model = PACRRModel(
                embedding_init=self.extractor.embeddings,
                mingram=self.config["mingram"],
                maxgram=self.config["maxgram"],
                nfilters=self.config["nfilters"],
                kmax=self.config["kmax"],
                combine=self.config["combine"],
                nonlinearity=self.config["nonlinearity"],
                use_idf=self.config["idf"],
            )
        return self.model

    def trainable(self, path, value):
        return "embedding" not in "/".join(map(str, path))

    score = Reranker.score_default
    test = Reranker.test_default


# ------------------------------------------------------------------------- DSSM
class DSSMModel(nn.Module):
    nhiddens: tuple = (56,)

    @nn.compact
    def __call__(self, query_vec, doc_vec, train=False):
        # siamese towers: the same layer instances score query and doc (shared weights)
        layers = [nn.Dense(n, name=f"ffw_{i}") for i, n in enumerate(self.nhiddens)]
        # the reference hardcodes Dropout(0.5) between FC layers (DSSM.py:21)
        drop = nn.Dropout(rate=0.5, deterministic=not train)

        def tower(x):
            for layer in layers:
                x = drop(jnp.tanh(layer(x)))
            return x

        q = tower(query_vec)
        d = tower(doc_vec)
        sim = (q * d).sum(axis=-1) / (
            (jnp.linalg.norm(q, axis=-1) + 1e-9) * (jnp.linalg.norm(d, axis=-1) + 1e-9)
        )
        return sim


@Reranker.register
class DSSM(Reranker):
    """Po-Sen Huang et al. 2013. Learning Deep Structured Semantic Models for Web Search
    using Clickthrough Data. CIKM'13 (parity: DSSM.py:50)."""

    module_name = "DSSM"
    dependencies = [
        Dependency(key="extractor", module="extractor", name="bagofwords"),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]
    config_spec = [
        ConfigOption("nhiddens", "56", "space-separated hidden layer sizes"),
    ]

    def build_model(self):
        if not hasattr(self, "model"):
            sizes = tuple(int(s) for s in str(self.config["nhiddens"]).split())
            self.model = DSSMModel(nhiddens=sizes)
        return self.model

    def init_params(self, rng, batch):
        model = self.build_model()
        return model.init(rng, jnp.asarray(batch["query"]), jnp.asarray(batch["posdoc"]))

    accepts_rngs = True  # DSSM trains with FC dropout

    def score(self, params, batch, rngs=None):
        pos_kw = {"train": True, "rngs": rngs} if rngs is not None else {}
        neg_kw = {"train": True, "rngs": self.fold_rngs(rngs, 1)} if rngs is not None else {}
        pos = self.model.apply(params, batch["query"], batch["posdoc"], **pos_kw)
        neg = self.model.apply(params, batch["query"], batch["negdoc"], **neg_kw)
        return [pos.reshape(-1), neg.reshape(-1)]

    def test(self, params, batch):
        return self.model.apply(params, batch["query"], batch["posdoc"]).reshape(-1)


# ------------------------------------------------------------------------- CDSSM
class CDSSMModel(nn.Module):
    embedding_init: np.ndarray
    nfilter: int = 1
    nkernel: int = 3
    nhiddens: int = 30
    windowsize: int = 3
    dropoutrate: float = 0.0  # conv dropout during training (parity: CDSSM.py:16)

    @nn.compact
    def __call__(self, querytoks, doctoks, query_idf=None, train=False):
        embedding = self.param("embedding", lambda rng: jnp.asarray(self.embedding_init))
        conv = nn.Conv(self.nfilter, kernel_size=(self.windowsize,), padding="SAME", name="conv")
        sem = nn.Dense(self.nhiddens, name="sem")
        drop = nn.Dropout(rate=self.dropoutrate, deterministic=not train)

        def tower(toks):
            emb = jnp.take(embedding, jnp.maximum(toks, 0), axis=0)  # [B, L, E]
            h = drop(jnp.tanh(conv(emb)))  # [B, L, F]
            mask = (toks != 0)[..., None]
            h = jnp.where(mask, h, -1e7)
            pooled = jnp.max(h, axis=1)  # [B, F]
            return jnp.tanh(sem(pooled))

        q = tower(querytoks)
        d = tower(doctoks)
        sim = (q * d).sum(axis=-1) / (
            (jnp.linalg.norm(q, axis=-1) + 1e-9) * (jnp.linalg.norm(d, axis=-1) + 1e-9)
        )
        return sim


@Reranker.register
class CDSSM(Reranker):
    """Yelong Shen et al. 2014. A Latent Semantic Model with Convolutional-Pooling Structure
    for Information Retrieval. CIKM'14 (parity: CDSSM.py:79)."""

    module_name = "CDSSM"
    dependencies = [
        Dependency(key="extractor", module="extractor", name="slowembedtext"),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]
    config_spec = [
        ConfigOption("nkernel", 3, "conv kernel dimension"),
        ConfigOption("nfilter", 1, "number of conv filters"),
        ConfigOption("nhiddens", 30, "hidden layer size"),
        ConfigOption("windowsize", 3, "words per conv window"),
        ConfigOption("dropoutrate", 0.0, "dropout rate"),
    ]

    accepts_rngs = True  # CDSSM trains with conv dropout

    def build_model(self):
        if not hasattr(self, "model"):
            self.model = CDSSMModel(
                embedding_init=self.extractor.embeddings,
                nfilter=self.config["nfilter"],
                nkernel=self.config["nkernel"],
                nhiddens=self.config["nhiddens"],
                windowsize=self.config["windowsize"],
                dropoutrate=self.config["dropoutrate"],
            )
        return self.model

    def trainable(self, path, value):
        return "embedding" not in "/".join(map(str, path))

    score = Reranker.score_default
    test = Reranker.test_default
