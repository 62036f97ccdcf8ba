"""Sequence/context interaction rankers: DUET, POSITDRMM, HINT, TK, DeepTileBar.

Single JAX implementations of the remaining reference models:
  DUET        <- DUET.py:136 (Mitra et al. 2017): local exact-match network +
                 distributed semantic network, scores summed
  POSITDRMM   <- POSITDRMM.py:130 (McDonald et al. EMNLP'18): contextualized
                 (BiGRU) term matching with top-k pooling + exact-match statistics
  HINT        <- HINT.py:328 (Fan et al. 2018): hierarchical neural matching with
                 spatial-GRU-style local matching and k-max signal accumulation
  TK          <- TK.py:150 (Hofstaetter et al. 2020): shallow transformer
                 contextualization mixed with static embeddings + kernel pooling
  DeepTileBar <- DeepTileBar.py:176 (Tang & Yang AAAI'19): CNN+LSTM over
                 TextTiling-style tile matrices (deeptiles extractor)

RNN components use flax.linen recurrent cells under lax.scan (compiler-friendly
fixed-length loops); attention uses the shared flash-attention path.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from capreolus_tpu.core import ConfigOption, Dependency
from capreolus_tpu.reranker import Reranker
from capreolus_tpu.reranker.common import KNRM_MUS, KNRM_SIGMAS, exact_match_matrix, knrm_pool, similarity_matrix


def _bigru(features: int, name: str):
    return nn.RNN(nn.GRUCell(features), name=name)


class _BiGRU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.GRUCell(self.features), name="fwd")(x)
        # keep_order=True realigns the reversed scan's outputs to input positions
        # (without it flax returns them in reversed order, so fwd/bwd concat at
        # position t would pair states of different tokens)
        bwd = nn.RNN(nn.GRUCell(self.features), name="bwd", reverse=True, keep_order=True)(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


# ------------------------------------------------------------------------- DUET
class DUETModel(nn.Module):
    embedding_init: np.ndarray
    nfilters: int = 10
    lmhidden: int = 30
    nhidden: int = 699
    idfweight: bool = True
    activation: str = "relu"
    dropoutrate: float = 0.5  # applied in training only (parity: DUET.py:28,73,83)

    @nn.compact
    def __call__(self, querytoks, doctoks, query_idf, train=False):
        act = nn.relu if self.activation == "relu" else jnp.tanh
        drop = nn.Dropout(rate=self.dropoutrate, deterministic=not train)
        embedding = self.param("embedding", lambda rng: jnp.asarray(self.embedding_init))

        # local model: binary exact-match matrix, optionally idf-weighted rows
        exact = exact_match_matrix(querytoks, doctoks)  # [B, Q, D]
        if self.idfweight:
            exact = exact * query_idf[:, :, None]
        h = act(nn.Conv(self.nfilters, kernel_size=(1,), name="local_conv")(exact))  # conv over doc axis
        h = h.reshape(h.shape[0], -1)
        local = drop(act(nn.Dense(self.lmhidden, name="local_ffw1")(h)))
        local_score = nn.Dense(1, name="local_out")(local)[:, 0]

        # distributed model: convolved semantic representations, elementwise interaction
        q_emb = jnp.take(embedding, jnp.maximum(querytoks, 0), axis=0)
        d_emb = jnp.take(embedding, jnp.maximum(doctoks, 0), axis=0)
        conv_q = act(nn.Conv(self.nfilters, kernel_size=(3,), name="dist_conv_q")(q_emb))
        conv_d = act(nn.Conv(self.nfilters, kernel_size=(3,), name="dist_conv_d")(d_emb))
        q_vec = jnp.max(jnp.where((querytoks != 0)[..., None], conv_q, -1e7), axis=1)
        d_vec = jnp.max(jnp.where((doctoks != 0)[..., None], conv_d, -1e7), axis=1)
        inter = jnp.concatenate([q_vec * d_vec, q_vec, d_vec], axis=-1)
        dist = drop(act(nn.Dense(self.nhidden, name="dist_ffw1")(inter)))
        dist_score = nn.Dense(1, name="dist_out")(dist)[:, 0]

        return local_score + dist_score


@Reranker.register
class DUET(Reranker):
    """Bhaskar Mitra, Fernando Diaz, Nick Craswell. 2017. Learning to Match using Local
    and Distributed Representations of Text for Web Search (parity: DUET.py:136)."""

    module_name = "DUET"
    dependencies = [
        Dependency(key="extractor", module="extractor", name="slowembedtext"),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]
    config_spec = [
        ConfigOption("nfilters", 10, "filters for local and distributed models"),
        ConfigOption("lmhidden", 30, "local model hidden size"),
        ConfigOption("nhidden", 699, "distributed model hidden size"),
        ConfigOption("idfweight", True, "weight local matches by query idf"),
        ConfigOption("dropoutrate", 0.5, "dropout probability"),
        ConfigOption("activation", "relu", "tanh or relu"),
    ]

    accepts_rngs = True  # DUET trains with dropout

    def build_model(self):
        if not hasattr(self, "model"):
            self.model = DUETModel(
                embedding_init=self.extractor.embeddings,
                nfilters=self.config["nfilters"],
                lmhidden=self.config["lmhidden"],
                nhidden=self.config["nhidden"],
                idfweight=self.config["idfweight"],
                activation=self.config["activation"],
                dropoutrate=self.config["dropoutrate"],
            )
        return self.model

    def trainable(self, path, value):
        return "embedding" not in "/".join(map(str, path))

    score = Reranker.score_default
    test = Reranker.test_default


# ------------------------------------------------------------------------- POSITDRMM
class POSITDRMMModel(nn.Module):
    embedding_init: np.ndarray
    hidden: int = 32
    topk: int = 5

    @nn.compact
    def __call__(self, querytoks, doctoks, query_idf, train=False):
        embedding = self.param("embedding", lambda rng: jnp.asarray(self.embedding_init))
        # dropout on the encoder inputs during training (parity: POSITDRMM.py:35,66,71)
        drop = nn.Dropout(rate=0.2, deterministic=not train)
        q_emb = drop(jnp.take(embedding, jnp.maximum(querytoks, 0), axis=0))
        d_emb = drop(jnp.take(embedding, jnp.maximum(doctoks, 0), axis=0))

        # contextualization with a shared BiGRU + residual (as in the paper)
        encoder = _BiGRU(self.hidden, name="context_gru")
        proj = nn.Dense(q_emb.shape[-1], name="context_proj")
        q_ctx = q_emb + proj(encoder(q_emb))
        d_ctx = d_emb + proj(encoder(d_emb))

        def norm(x):
            return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-9)

        sim = jnp.einsum("bqe,bde->bqd", norm(q_ctx), norm(d_ctx), preferred_element_type=jnp.float32)
        q_mask = querytoks != 0
        d_mask = doctoks != 0
        sim = jnp.where(q_mask[:, :, None] & d_mask[:, None, :], sim, -1e7)

        k = min(self.topk, sim.shape[-1])
        topk_vals, _ = jax.lax.top_k(sim, k)  # [B, Q, k]
        exact = exact_match_matrix(querytoks, doctoks)
        exact_stats = exact.sum(axis=2, keepdims=True) / jnp.maximum(d_mask.sum(axis=1), 1)[:, None, None]
        feats = jnp.concatenate([topk_vals, exact_stats], axis=-1)  # [B, Q, k+1]

        term_scores = jnp.tanh(nn.Dense(1, name="term_mlp")(feats))[..., 0]  # [B, Q]
        gate = nn.Dense(1, use_bias=False, name="gate")(query_idf[..., None])[..., 0]
        gate = jax.nn.softmax(jnp.where(q_mask, gate, -1e7), axis=1)
        return (gate * term_scores).sum(axis=1)


@Reranker.register
class POSITDRMM(Reranker):
    """Ryan McDonald, George Brokos, Ion Androutsopoulos. 2018. Deep Relevance Ranking
    using Enhanced Document-Query Interactions (parity: POSITDRMM.py:130)."""

    module_name = "POSITDRMM"
    dependencies = [
        Dependency(key="extractor", module="extractor", name="slowembedtext"),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]
    config_spec = [ConfigOption("hidden", 32, "BiGRU hidden size"), ConfigOption("topk", 5, "top-k matches per term")]

    accepts_rngs = True  # trains with input dropout

    def build_model(self):
        if not hasattr(self, "model"):
            self.model = POSITDRMMModel(embedding_init=self.extractor.embeddings,
                                        hidden=self.config["hidden"], topk=self.config["topk"])
        return self.model

    def trainable(self, path, value):
        return "embedding" not in "/".join(map(str, path))

    score = Reranker.score_default
    test = Reranker.test_default


# ------------------------------------------------------------------------- HINT
class SpatialGRU2D(nn.Module):
    """Faithful 2D spatial GRU (reference HINT.py:15-81 GRUCell2d/GRUModel2d):
    each grid cell's hidden state depends on its left, top, and diagonal
    neighbors through 3 sigmoid reset gates and 4 softmax-normalized update
    gates. TPU-idiomatic formulation: a lax.scan over the Q+D-1 anti-diagonals,
    with every cell on a diagonal computed in parallel (the wavefront carries
    the previous two diagonals; a 2D RNN has no intra-diagonal dependencies).
    Returns the bottom-right cell's hidden state, like the reference."""

    hidden: int

    @nn.compact
    def __call__(self, s):  # s: [N, Q, D, C]
        n, qlen, dlen, cdim = s.shape
        h = self.hidden
        std = 1.0 / np.sqrt(h)

        def init(key, shape):
            return jax.random.uniform(key, shape, minval=-std, maxval=std)

        wrz_k = self.param("Wrz_kernel", init, (3 * h + cdim, 7 * h))
        wrz_b = self.param("Wrz_bias", init, (7 * h,))
        w_k = self.param("W_kernel", init, (cdim, h))
        w_b = self.param("W_bias", init, (h,))
        u_k = self.param("U_kernel", init, (3 * h, h))
        u_b = self.param("U_bias", init, (h,))

        def cell(x, hdiag, htop, hleft):
            # reference input order: [h_top, h_left, h_diag, x] (HINT.py:44)
            q = jnp.concatenate([htop, hleft, hdiag, x], axis=-1)
            rz = q @ wrz_k + wrz_b
            rl, rt, rd, zi, zl, zt, zd = jnp.split(rz, 7, axis=-1)
            rl, rt, rd = nn.sigmoid(rl), nn.sigmoid(rt), nn.sigmoid(rd)
            z = jax.nn.softmax(jnp.stack([zi, zl, zt, zd]), axis=0)
            zi, zl, zt, zd = z[0], z[1], z[2], z[3]
            # reference quirk mirrored exactly: gate order [rl, rt, rd]
            # multiplies neighbor order [h_top, h_left, h_diag] (HINT.py:51-54)
            t11 = jnp.concatenate([htop, hleft, hdiag], axis=-1)
            r = jnp.concatenate([rl, rt, rd], axis=-1)
            h1 = jnp.tanh(x @ w_k + w_b + (r * t11) @ u_k + u_b)
            return zl * hleft + zt * htop + zd * hdiag + zi * h1

        iq = jnp.arange(qlen)

        def step(carry, d):
            hm1, hm2 = carry  # hidden on diagonals d-1 and d-2: [N, Q, h]
            j = d - iq  # the doc position of row i's cell on diagonal d
            jc = jnp.clip(j, 0, dlen - 1)
            x = jnp.take_along_axis(s, jc[None, :, None, None], axis=2)[:, :, 0, :]

            def up(a):  # neighbor at row i-1 (zero border at i=0)
                return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)

            hnew = cell(x, up(hm2), up(hm1), hm1)
            valid = ((j >= 0) & (j < dlen))[None, :, None]
            return (jnp.where(valid, hnew, 0.0), hm1), None

        h0 = jnp.zeros((n, qlen, h), jnp.float32)
        (hlast, _), _ = jax.lax.scan(step, (h0, h0), jnp.arange(qlen + dlen - 1))
        return hlast[:, qlen - 1]  # h(Q-1, D-1): the bottom-right corner


class HINTSpatialModel(nn.Module):
    """Faithful HiNT (reference HINT.py:84-214): per-100-token passage windows,
    3-channel spatial tensors (query projection, doc projection, similarity),
    XOR + cosine matrices each run through a forward and a flipped 2D spatial
    GRU, passage evidence accumulated by a BiLSTM, k-max pooled, scored."""

    embedding_init: np.ndarray
    hidden: int = 2  # config spatialGRU = the 2D GRU hidden size (HINT.py:97)
    lstm_dim: int = 6
    kmax: int = 10
    window: int = 100  # fixed by the reference (HINT.py:88 "100: windows size")

    @nn.compact
    def __call__(self, querytoks, doctoks, query_idf):
        embedding = self.param("embedding", lambda rng: jnp.asarray(self.embedding_init))
        b, qlen = querytoks.shape
        dlen = doctoks.shape[1]

        m_cos = similarity_matrix(embedding, querytoks, doctoks)  # [B, Q, D] cosine
        m_xor = exact_match_matrix(querytoks, doctoks)
        # reference masks positions where BOTH query and doc are padding
        # (HINT.py:252-253: product of the two pad masks)
        pad_mask = ((querytoks == 0)[:, :, None] & (doctoks == 0)[:, None, :]).astype(jnp.float32)

        qvec = jnp.take(embedding, jnp.clip(querytoks, 0), axis=0)
        dvec = jnp.take(embedding, jnp.clip(doctoks, 0), axis=0)
        ws = nn.Dense(1, name="Ws")
        x_i = ws(qvec)[:, :, 0]  # [B, Q]
        y_j = ws(dvec)[:, :, 0]  # [B, D]

        # split the document into P fixed windows (clamped for docs shorter
        # than the reference's 100-token window)
        w = min(self.window, dlen)
        p = max(1, dlen // w)
        trunc = p * w

        def windows(m):  # [B, Q, D] -> [B, P, Q, W]
            return m[:, :, :trunc].reshape(b, qlen, p, w).transpose(0, 2, 1, 3)

        def stack_channels(m):  # -> [B, P, Q, W, 3]
            xi = jnp.broadcast_to(x_i[:, None, :, None], (b, p, qlen, w))
            yj = jnp.broadcast_to(y_j[:, :trunc].reshape(b, p, 1, w), (b, p, qlen, w))
            s = jnp.stack([xi, yj, windows(m)], axis=-1)
            return s * (1.0 - windows(pad_mask))[..., None]

        s_cos = stack_channels(m_cos).reshape(b * p, qlen, w, 3)
        s_xor = stack_channels(m_xor).reshape(b * p, qlen, w, 3)
        both = jnp.concatenate([s_xor, s_cos], axis=0)  # [2*B*P, Q, W, 3]
        h_fwd = SpatialGRU2D(self.hidden, name="GRU2d1")(both)  # [2BP, h]
        h_inv = SpatialGRU2D(self.hidden, name="GRU2d3")(jnp.flip(both, axis=(1, 2)))
        e = jnp.concatenate(
            [h_fwd[: b * p], h_fwd[b * p:], h_inv[: b * p], h_inv[b * p:]], axis=-1
        ).reshape(b, p, 4 * self.hidden)  # [B, P, 8]: xor+cos, fwd+inv

        fwd = nn.RNN(nn.OptimizedLSTMCell(self.lstm_dim), name="lstm_fwd")(e)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.lstm_dim), name="lstm_bwd", reverse=True,
                     keep_order=True)(e)  # keep_order: realign outputs to input positions
        lstm_out = fwd + bwd  # reference sums the directions (HINT.py:201)
        vt = jnp.tanh(nn.Dense(self.lstm_dim, name="Wv")(e))
        evidence = jnp.concatenate([vt, lstm_out], axis=1)  # [B, 2P, lstm_dim]
        k = min(self.kmax, evidence.shape[1])
        top, _ = jax.lax.top_k(evidence.transpose(0, 2, 1), k)  # [B, lstm_dim, kmax]
        if k < self.kmax:  # pad so the fc layer has the reference's 6*kmax width
            top = jnp.concatenate(
                [top, jnp.zeros((b, self.lstm_dim, self.kmax - k))], axis=-1)
        return nn.Dense(1, name="fc")(top.reshape(b, -1))[:, 0]


class HINTModel(nn.Module):
    embedding_init: np.ndarray
    lstm_dim: int = 6
    kmax: int = 10
    window: int = 20
    depth: int = 2  # stacked accumulation GRUs (the reference's spatialGRU depth)

    @nn.compact
    def __call__(self, querytoks, doctoks, query_idf):
        embedding = self.param("embedding", lambda rng: jnp.asarray(self.embedding_init))
        sim = similarity_matrix(embedding, querytoks, doctoks)  # [B, Q, D]
        b, q, d = sim.shape

        # local matching over fixed windows of the document (HINT's passage level)
        n_win = max(1, d // self.window)
        windows = sim[:, :, : n_win * self.window].reshape(b, q, n_win, self.window)
        # per-window signal: strongest query-term match patterns
        win_feat = jnp.concatenate(
            [windows.max(axis=3), windows.mean(axis=3)], axis=1
        ).transpose(0, 2, 1)  # [B, n_win, 2Q]

        # GRU stack accumulates evidence across windows (spatial GRU stand-in;
        # a true 2D spatial GRU recurs over Q+D anti-diagonal steps — sequential
        # control flow that maps poorly to the TPU; the windowed formulation
        # keeps the hierarchical local->global evidence structure)
        seq = win_feat
        for i in range(max(1, self.depth)):
            seq = _BiGRU(self.lstm_dim, name=f"accumulate_{i}")(seq)  # [B, n_win, 2*dim]
        k = min(self.kmax, seq.shape[1])
        top_states, _ = jax.lax.top_k(seq.transpose(0, 2, 1), k)  # [B, 2*dim, k]
        feats = top_states.reshape(b, -1)
        h = jnp.tanh(nn.Dense(self.lstm_dim * 4, name="combine")(feats))
        return nn.Dense(1, name="output")(h)[:, 0]


@Reranker.register
class HINT(Reranker):
    """Yixing Fan et al. 2018. Modeling Diverse Relevance Patterns in Ad-hoc Retrieval
    (parity: HINT.py:328). Default mode=spatial runs the faithful 2D spatial GRU
    (anti-diagonal wavefront scan, referee-tested against a numpy recurrence in
    tests/test_sequence_models.py); mode=windowed is the fast BiGRU stand-in."""

    module_name = "HINT"
    dependencies = [
        Dependency(key="extractor", module="extractor", name="slowembedtext"),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]
    config_spec = [
        ConfigOption("spatialGRU", 2, "2D spatial GRU hidden size (reference HINT.py:97); "
                     "in mode=windowed, the BiGRU stack depth"),
        ConfigOption("LSTMdim", 6, "recurrent hidden size"),
        ConfigOption("kmax", 10, "k-max signals kept"),
        ConfigOption("mode", "spatial", "spatial (faithful anti-diagonal 2D GRU) or "
                     "windowed (fast BiGRU accumulation stand-in)"),
    ]

    def build(self):
        from capreolus_tpu.core import ConfigError

        if self.config["mode"] not in ("spatial", "windowed"):
            raise ConfigError(f"HINT.mode must be 'spatial' or 'windowed', got {self.config['mode']!r}")

    def build_model(self):
        if not hasattr(self, "model"):
            if self.config["mode"] == "spatial":
                self.model = HINTSpatialModel(embedding_init=self.extractor.embeddings,
                                              hidden=int(self.config["spatialGRU"]),
                                              lstm_dim=self.config["LSTMdim"],
                                              kmax=self.config["kmax"])
            else:
                self.model = HINTModel(embedding_init=self.extractor.embeddings,
                                       lstm_dim=self.config["LSTMdim"], kmax=self.config["kmax"],
                                       depth=int(self.config["spatialGRU"]))
        return self.model

    def trainable(self, path, value):
        return "embedding" not in "/".join(map(str, path))

    score = Reranker.score_default
    test = Reranker.test_default


# ------------------------------------------------------------------------- TK
class TKModel(nn.Module):
    embedding_init: np.ndarray
    projdim: int = 32
    ffdim: int = 100
    numlayers: int = 2
    numattheads: int = 10
    alpha: float = 0.5
    singlefc: bool = True
    scoretanh: bool = False

    @nn.compact
    def __call__(self, querytoks, doctoks, query_idf=None, train=False):
        embedding = self.param("embedding", lambda rng: jnp.asarray(self.embedding_init))
        mus = self.param("mus", lambda rng: jnp.asarray(KNRM_MUS, dtype=jnp.float32))
        sigmas = self.param("sigmas", lambda rng: jnp.asarray(KNRM_SIGMAS, dtype=jnp.float32))

        emb_dim = self.embedding_init.shape[-1]
        heads = self.numattheads
        att_dim = max(heads, (emb_dim // heads) * heads)
        pe_drop = nn.Dropout(rate=0.1, deterministic=not train)  # parity: TK.py:16-18

        def positional_encoding(length):
            # sinusoidal PE (parity: TK.py:20-25)
            position = np.arange(length, dtype=np.float32)[:, None]
            div_term = np.exp(np.arange(0, emb_dim, 2, dtype=np.float32) * (-np.log(10000.0) / emb_dim))
            pe = np.zeros((length, emb_dim), dtype=np.float32)
            pe[:, 0::2] = np.sin(position * div_term)
            pe[:, 1::2] = np.cos(position * div_term[: pe[:, 1::2].shape[1]])
            return jnp.asarray(pe)

        layers = [
            (nn.MultiHeadDotProductAttention(num_heads=heads, qkv_features=att_dim, name=f"att_{i}"),
             nn.Dense(self.ffdim, name=f"ff1_{i}"), nn.Dense(emb_dim, name=f"ff2_{i}"),
             nn.LayerNorm(name=f"ln1_{i}"), nn.LayerNorm(name=f"ln2_{i}"))
            for i in range(self.numlayers)
        ]

        def contextualize(x, mask):
            attn_mask = mask[:, None, None, :]
            for att, ff1, ff2, ln1, ln2 in layers:
                y = att(x, x, mask=jnp.broadcast_to(attn_mask, (x.shape[0], 1, x.shape[1], x.shape[1])))
                x = ln1(x + y)
                x = ln2(x + ff2(nn.relu(ff1(x))))
            return x

        q_mask = querytoks != 0
        d_mask = doctoks != 0
        q_emb = jnp.take(embedding, jnp.maximum(querytoks, 0), axis=0)
        d_emb = jnp.take(embedding, jnp.maximum(doctoks, 0), axis=0)
        # positional encoding feeds only the contextualization branch (TK.py:115)
        q_pos = pe_drop(q_emb + positional_encoding(q_emb.shape[1])[None])
        d_pos = pe_drop(d_emb + positional_encoding(d_emb.shape[1])[None])
        q_mix = self.alpha * q_emb + (1 - self.alpha) * contextualize(q_pos, q_mask)
        d_mix = self.alpha * d_emb + (1 - self.alpha) * contextualize(d_pos, d_mask)

        def norm(x):
            return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-9)

        sim = jnp.einsum("bqe,bde->bqd", norm(q_mix), norm(d_mix), preferred_element_type=jnp.float32)
        sim = jnp.where(q_mask[:, :, None] & d_mask[:, None, :], sim, 0.0)
        pooled = knrm_pool(sim, mus, sigmas)  # [B, K]

        if self.singlefc:
            scores = nn.Dense(1, name="combine")(pooled)
        else:
            scores = nn.Dense(1, name="combine2")(jnp.tanh(nn.Dense(30, name="combine1")(pooled)))
        if self.scoretanh:
            scores = jnp.tanh(scores)
        return scores[:, 0]


@Reranker.register
class TK(Reranker):
    """Sebastian Hofstaetter et al. 2020. Interpretable & Time-Budget-Constrained
    Contextualization for Re-Ranking (parity: TK.py:150)."""

    module_name = "TK"
    dependencies = [
        Dependency(key="extractor", module="extractor", name="slowembedtext"),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]
    config_spec = [
        ConfigOption("gradkernels", True, "backprop through mus and sigmas"),
        ConfigOption("scoretanh", False, "tanh on the final score"),
        ConfigOption("singlefc", True, "single combination layer"),
        ConfigOption("projdim", 32, "projection size"),
        ConfigOption("ffdim", 100, "transformer feedforward size"),
        ConfigOption("numlayers", 2, "transformer layers"),
        ConfigOption("numattheads", 10, "attention heads"),
        ConfigOption("alpha", 0.5, "static/contextual mixing weight"),
        ConfigOption("usemask", False, "use masking"),
        ConfigOption("usemixer", False, "use mixer"),
        ConfigOption("finetune", False, "fine-tune embeddings"),
    ]

    accepts_rngs = True  # positional-encoding dropout during training

    def build_model(self):
        if not hasattr(self, "model"):
            self.model = TKModel(
                embedding_init=self.extractor.embeddings,
                projdim=self.config["projdim"],
                ffdim=self.config["ffdim"],
                numlayers=self.config["numlayers"],
                numattheads=self.config["numattheads"],
                alpha=self.config["alpha"],
                singlefc=self.config["singlefc"],
                scoretanh=self.config["scoretanh"],
            )
        return self.model

    def trainable(self, path, value):
        name = "/".join(map(str, path))
        if "embedding" in name and not self.config["finetune"]:
            return False
        if ("mus" in name or "sigmas" in name) and not self.config["gradkernels"]:
            return False
        return True

    score = Reranker.score_default
    test = Reranker.test_default


# ------------------------------------------------------------------------- DeepTileBar
class DeepTileBarModel(nn.Module):
    numberfilter: int = 3
    lstmhiddendim: int = 3
    hidden1: int = 32
    hidden2: int = 16

    @nn.compact
    def __call__(self, tile_matrix):
        """tile_matrix: [B, channels, Q, ntiles] (deeptiles extractor output)."""
        x = tile_matrix.transpose(0, 2, 3, 1)  # [B, Q, T, C]
        conv = nn.Conv(self.numberfilter, kernel_size=(1, 3), name="conv")
        h = nn.relu(conv(x))  # [B, Q, T, F]
        b, q, t, f = h.shape
        rows = h.reshape(b * q, t, f)
        encoded = _BiGRU(self.lstmhiddendim, name="row_lstm")(rows)[:, -1, :]  # [B*Q, 2*dim]
        feats = encoded.reshape(b, -1)
        h = nn.relu(nn.Dense(self.hidden1, name="ffw1")(feats))
        h = nn.relu(nn.Dense(self.hidden2, name="ffw2")(h))
        return nn.Dense(1, name="output")(h)[:, 0]


@Reranker.register
class DeepTileBar(Reranker):
    """Zhiwen Tang, Grace Hui Yang. 2019. DeepTileBars: Visualizing Term Distribution
    for Neural Information Retrieval (parity: DeepTileBar.py:176)."""

    module_name = "DeepTileBar"
    dependencies = [
        Dependency(key="extractor", module="extractor", name="deeptiles"),
        Dependency(key="trainer", module="trainer", name="jax"),
    ]
    config_spec = [
        ConfigOption("passagelen", 30, "tile length"),
        ConfigOption("numberfilter", 3, "conv filters"),
        ConfigOption("lstmhiddendim", 3, "lstm hidden size"),
        ConfigOption("linearhiddendim1", 32, "first hidden layer"),
        ConfigOption("linearhiddendim2", 16, "second hidden layer"),
    ]

    def build_model(self):
        if not hasattr(self, "model"):
            self.model = DeepTileBarModel(
                numberfilter=self.config["numberfilter"],
                lstmhiddendim=self.config["lstmhiddendim"],
                hidden1=self.config["linearhiddendim1"],
                hidden2=self.config["linearhiddendim2"],
            )
        return self.model

    def init_params(self, rng, batch):
        import jax.numpy as jnp

        model = self.build_model()
        return model.init(rng, jnp.asarray(batch["posdoc"]))

    def score(self, params, batch):
        pos = self.model.apply(params, batch["posdoc"])
        neg = self.model.apply(params, batch["negdoc"])
        return [pos.reshape(-1), neg.reshape(-1)]

    def test(self, params, batch):
        return self.model.apply(params, batch["posdoc"]).reshape(-1)
