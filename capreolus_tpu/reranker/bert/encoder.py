"""Flax BERT/ELECTRA encoder for cross-encoder rerankers.

From-scratch transformer encoder (not a port of HF's modeling code): embeddings +
post-LN transformer blocks + pooler, with attention routed through the Pallas flash
attention kernel on TPU (capreolus_tpu.ops.flash_attention). Supports loading
HuggingFace BERT/ELECTRA checkpoints via convert_hf_weights (torch state_dict ->
param pytree), which is how the reference's pretrained models
(bert-base-uncased, Capreolus/bert-base-msmarco, ELECTRA variants —
/root/reference/capreolus/reranker/TFBERTMaxP.py:111) are reproduced.

bfloat16 activations by default on TPU (parity with the reference's mixed_bfloat16
policy, trainer/tensorflow.py:107-109) with float32 layernorm statistics.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from capreolus_tpu.ops.flash_attention import multihead_attention


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: str = "float32"
    remat: bool = False  # rematerialize each layer's activations in the backward pass
    gelu_approximate: bool = True  # tanh GELU (fast on VPU); False for erf parity
    quantize: str = "none"  # "int8": int8 FFN matmuls at inference (v5e 2x int8 MACs)
    # mixture-of-experts FFN (beyond-reference TPU extension): 0 = dense FFN;
    # >0 replaces each layer's FFN with moe_experts expert FFNs and top-k routing.
    # Expert weights carry a leading [E] axis shardable over an 'expert' mesh
    # axis (trainer.ep, parallel/expert_parallel.py)
    moe_experts: int = 0
    moe_topk: int = 2
    # training-time regularization (parity: HF BertConfig / reference CEDRKNRM.py:199);
    # active only when the model is applied with train=True and a "dropout" rng
    hidden_dropout_prob: float = 0.1
    attention_dropout_prob: float = 0.1
    # LoRA (beyond-reference): rank-r adapters on the attention query/value
    # projections (Hu et al. 2021's standard targets). The BASE weights freeze
    # (reranker.trainable) so checkpoints shrink to adapters + head, and the
    # optimizer state is ~1% of full fine-tuning — the production recipe for
    # fitting large-model fine-tuning in HBM alongside tp/pp/fsdp
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads


# named configs the reference uses (electra discriminators share BERT's encoder shape)
KNOWN_CONFIGS = {
    "tiny": BertConfig(vocab_size=1024, hidden_size=64, num_layers=2, num_heads=2,
                       intermediate_size=128, max_position=512),
    "bert-base-uncased": BertConfig(),
    "Capreolus/bert-base-msmarco": BertConfig(),
    "bert-large-uncased": BertConfig(hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096),
    "google/electra-base-discriminator": BertConfig(),
    "Capreolus/electra-base-msmarco": BertConfig(),
    "Capreolus/birch-bert-large-mb": BertConfig(hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096),
    "Capreolus/birch-bert-large-msmarco_mb": BertConfig(hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096),
    "Capreolus/birch-bert-large-car_mb": BertConfig(hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096),
}

# the reference accepts short model names and maps them to hub checkpoints
# (TFBERTMaxP.py:29-40); same aliases here so its configs transfer verbatim
PRETRAINED_ALIASES = {
    "electra-base": "google/electra-base-discriminator",
    "electra-base-msmarco": "Capreolus/electra-base-msmarco",
    "bert-base-msmarco": "Capreolus/bert-base-msmarco",
    # birch checkpoints (bert-large shape; birch.py:64)
    "mb": "Capreolus/birch-bert-large-mb",
    "msmarco_mb": "Capreolus/birch-bert-large-msmarco_mb",
    "car_mb": "Capreolus/birch-bert-large-car_mb",
}


def get_bert_config(name: str) -> BertConfig:
    name = PRETRAINED_ALIASES.get(name, name)
    if name in KNOWN_CONFIGS:
        return KNOWN_CONFIGS[name]
    return BertConfig()


class Int8Dense(nn.Module):
    """Dense layer computed as an int8 MXU matmul, with the SAME param tree as
    nn.Dense (kernel/bias, identical init) so checkpoints and HF-converted
    weights load unchanged.

    Weights are quantized per-output-channel in-graph (one cheap elementwise
    pass over the kernel per call); activations per-token (dynamic abs-max)
    unless a pre-quantized tensor is supplied. Accumulation is int32 via
    preferred_element_type — the v5e MXU runs int8 x int8 at 2x the bf16 MAC
    rate (394 vs 197 TOPS peak; measured 1.4x on the FFN chain, PERF.md)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_pre=None, fold_scales=None, x_scales=None):
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        kf = kernel
        if fold_scales is not None:
            # fold the (per-channel) activation scales of a pre-quantized input
            # into the kernel before quantizing it: exact per-channel activation
            # quantization at zero runtime cost
            kf = kf * fold_scales[:, None]
        ws = jnp.maximum(jnp.max(jnp.abs(kf), axis=0, keepdims=True), 1e-8) / 127.0
        wq = jnp.round(kf / ws).astype(jnp.int8)
        if x_pre is not None:
            # pre-quantized input: per-input-channel scales arrive folded into
            # the kernel (fold_scales), per-TOKEN scales arrive as x_scales —
            # q/k/v share ONE quantization of the same hidden states instead
            # of paying the abs/max/round/clip chain three times
            xq = x_pre
            xs = jnp.float32(1.0) if x_scales is None else x_scales
        else:
            xq, xs = _quantize_per_token(x)
        acc = jax.lax.dot_general(xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * xs * ws + bias
        return out.astype(self.dtype)


def _quantize_per_token(x):
    """Dynamic per-token int8 quantization: returns (int8 values, f32 scales)."""
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127.0, 127.0).astype(jnp.int8)
    return xq, xs


class MoeFFN(nn.Module):
    """Mixture-of-experts FFN with top-k softmax routing (dense dispatch).

    TPU-idiomatic formulation: expert weights are STACKED with a leading [E]
    axis, compute is two batched einsums over E, and the top-k gate zeroes the
    non-routed experts' contributions. Dense dispatch (every expert sees every
    token) keeps shapes static and MXU-friendly; with the expert axis sharded
    over an 'expert' mesh axis, XLA computes each expert on its owner device
    and inserts one psum for the gated combine — real expert-parallel compute
    without capacity/overflow heuristics. Cost is E/topk times the routed
    FLOPs, the honest tradeoff at small-to-moderate E.

    Beyond-reference extension (the reference has no MoE); routing follows the
    standard top-k-of-softmax with renormalized gates (Shazeer et al. 2017)."""

    config: BertConfig

    @nn.compact
    def __call__(self, x):
        c = self.config
        dtype = jnp.dtype(c.dtype)
        E, H, I = c.moe_experts, c.hidden_size, c.intermediate_size
        k = min(c.moe_topk, E)
        # routing in f32 for stable softmax
        logits = nn.Dense(E, name="gate", dtype=jnp.float32)(x.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)  # [B, L, E]
        _, topi = jax.lax.top_k(probs, k)
        mask = jnp.sum(jax.nn.one_hot(topi, E, dtype=probs.dtype), axis=-2)  # [B, L, E]
        gates = probs * mask
        gates = gates / jnp.maximum(gates.sum(axis=-1, keepdims=True), 1e-9)

        # batch_axis=0: fan computed per expert, not across the stacked E axis
        init = nn.initializers.lecun_normal(in_axis=-2, out_axis=-1, batch_axis=(0,))
        wi = self.param("experts_wi", init, (E, H, I), jnp.float32)
        bi = self.param("experts_bi", nn.initializers.zeros_init(), (E, I), jnp.float32)
        wo = self.param("experts_wo", init, (E, I, H), jnp.float32)
        bo = self.param("experts_bo", nn.initializers.zeros_init(), (E, H), jnp.float32)

        h = jnp.einsum("blh,ehi->blei", x.astype(dtype), wi.astype(dtype)) + bi.astype(dtype)
        h = nn.gelu(h, approximate=c.gelu_approximate)
        out = jnp.einsum("blei,eio->bleo", h, wo.astype(dtype)) + bo.astype(dtype)
        return jnp.einsum("ble,bleo->blo", gates.astype(dtype), out)


class LoRAAdapter(nn.Module):
    """Rank-r low-rank delta: x -> (alpha/r) * (x @ A) @ B, A ~ N(0, 0.02),
    B = 0 (Hu et al. 2021). Added to a frozen base projection's output."""

    features: int
    rank: int
    alpha: float
    dtype: "jnp.dtype" = None

    @nn.compact
    def __call__(self, x):
        down = nn.Dense(self.rank, use_bias=False, name="down", dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.02))(x)
        up = nn.Dense(self.features, use_bias=False, name="up", dtype=self.dtype,
                      kernel_init=nn.initializers.zeros)(down)
        return up * (self.alpha / self.rank)


class BertSelfAttention(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden, mask, train=False):
        c = self.config
        dtype = jnp.dtype(c.dtype)
        b, l, _ = hidden.shape

        # separate q/k/v projections measured faster than a fused [H, 3H] matmul on
        # v5e (the split output forces an extra copy that outweighs the MXU win).
        # With quantize=int8 every projection (q/k/v/out) runs as an int8 MXU
        # matmul with dynamic per-token activation scales — the attention
        # projections are a third of BERT's matmul FLOPs and were the last
        # bf16 island in the int8 inference path. Scores/softmax/context stay
        # bf16 (quantizing post-softmax probabilities measurably hurts ranking
        # fidelity for no bandwidth win at these shapes).
        if c.quantize == "int8":
            # one shared per-token quantization of the hidden states feeds all
            # three projections (the abs-max chain over [B, L, H] costs as much
            # as the int8 MXU saving if paid per projection)
            hq, hs = _quantize_per_token(hidden)

            def qkv(name):
                return Int8Dense(c.hidden_size, name=name, dtype=dtype)(hidden, x_pre=hq, x_scales=hs)

            def proj(name):
                return Int8Dense(c.hidden_size, name=name, dtype=dtype)
        else:
            def qkv(name):
                return nn.Dense(c.hidden_size, name=name, dtype=dtype)(hidden)

            def proj(name):
                return nn.Dense(c.hidden_size, name=name, dtype=dtype)

        q = qkv("query")
        k = qkv("key")
        v = qkv("value")
        if c.lora_rank > 0:
            # standard LoRA placement (q and v); up-projection starts at zero,
            # so step 0 is exactly the pretrained model
            q = q + LoRAAdapter(c.hidden_size, c.lora_rank, c.lora_alpha,
                                name="query_lora", dtype=dtype)(hidden)
            v = v + LoRAAdapter(c.hidden_size, c.lora_rank, c.lora_alpha,
                                name="value_lora", dtype=dtype)(hidden)

        def split(x):
            return x.reshape(b, l, c.num_heads, c.head_dim).transpose(0, 2, 1, 3)

        drop_rng = self.make_rng("dropout") if (train and c.attention_dropout_prob > 0.0) else None
        out = multihead_attention(split(q), split(k), split(v), mask=mask,
                                  dropout_rate=c.attention_dropout_prob if train else 0.0,
                                  dropout_rng=drop_rng)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, c.hidden_size)
        return proj("output")(out)


class BertLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden, mask, calibrate=False, train=False):
        c = self.config
        dtype = jnp.dtype(c.dtype)
        dropout = nn.Dropout(rate=c.hidden_dropout_prob, deterministic=not train)
        attn = BertSelfAttention(c, name="attention")(hidden, mask, train)
        attn = dropout(attn)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attention_ln", dtype=jnp.float32)(
            (hidden + attn).astype(jnp.float32)
        ).astype(dtype)
        if c.quantize == "int8":
            ff = self._int8_ffn(hidden, calibrate, dtype)
        elif c.moe_experts:
            ff = MoeFFN(c, name="moe")(hidden)
        else:
            ff = nn.Dense(c.intermediate_size, name="intermediate", dtype=dtype)(hidden)
            # tanh-approximate GELU by default: erf is a slow transcendental chain on
            # the VPU (measured +20% monoBERT throughput) and differs by ~1e-3
            ff = nn.gelu(ff, approximate=c.gelu_approximate)
            ff = nn.Dense(c.hidden_size, name="ffn_output", dtype=dtype)(ff)
        ff = dropout(ff)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_ln", dtype=jnp.float32)(
            (hidden + ff).astype(jnp.float32)
        ).astype(dtype)
        return hidden

    def _int8_ffn(self, hidden, calibrate, dtype):
        """Inference-only int8 FFN chain: int8 up-matmul -> GELU -> per-channel
        requantize -> int8 down-matmul. Measured 1.42x over the bf16 FFN on v5e
        (PERF.md): the MXU runs int8 at double rate AND the materialized GELU
        intermediate halves its HBM traffic. GELU-output scales are per-channel
        amax values from the "quant_stats" collection (calibrated on a sample
        batch; uncalibrated channels fall back to amax=8)."""
        c = self.config
        ff = Int8Dense(c.intermediate_size, name="intermediate", dtype=jnp.float32)(hidden)
        g = nn.gelu(ff, approximate=c.gelu_approximate)
        amax = self.variable("quant_stats", "gelu_amax",
                             lambda: jnp.zeros((c.intermediate_size,), jnp.float32))
        if calibrate:
            observed = jnp.max(jnp.abs(g.reshape(-1, c.intermediate_size)), axis=0)
            amax.value = jnp.maximum(amax.value, observed)
        s = jnp.where(amax.value > 0, amax.value, 8.0) / 127.0
        gq = jnp.clip(jnp.round(g / s), -127.0, 127.0).astype(jnp.int8)
        return Int8Dense(c.hidden_size, name="ffn_output", dtype=dtype)(g, x_pre=gq, fold_scales=s)


class BertEncoder(nn.Module):
    """Returns (sequence_output, pooled_output, all_hidden_states)."""

    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None, output_hidden_states=False,
                 calibrate=False, train=False):
        c = self.config
        dtype = jnp.dtype(c.dtype)
        b, l = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        word_emb = self.param("word_embeddings",
                              nn.initializers.normal(0.02), (c.vocab_size, c.hidden_size), jnp.float32)
        pos_emb = self.param("position_embeddings",
                             nn.initializers.normal(0.02), (c.max_position, c.hidden_size), jnp.float32)
        type_emb = self.param("token_type_embeddings",
                              nn.initializers.normal(0.02), (c.type_vocab_size, c.hidden_size), jnp.float32)

        # ids are taken mod vocab: identity for real checkpoints, keeps the offline
        # hash-vocab fallback tokenizer in range for small test configs
        hidden = (
            jnp.take(word_emb, input_ids % c.vocab_size, axis=0)
            + pos_emb[None, :l]
            + jnp.take(type_emb, token_type_ids % c.type_vocab_size, axis=0)
        )
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_ln", dtype=jnp.float32)(hidden)
        hidden = nn.Dropout(rate=c.hidden_dropout_prob, deterministic=not train)(hidden)
        hidden = hidden.astype(dtype)

        mask = attention_mask.astype(jnp.bool_)
        all_hidden = [hidden]
        layer_cls = BertLayer
        if c.remat:
            # trade FLOPs for HBM: recompute each layer's activations in the
            # backward pass (jax.checkpoint), enabling larger train batches.
            # calibrate/train are static python flags (argnums count self as 0)
            layer_cls = nn.remat(BertLayer, static_argnums=(3, 4))
        for i in range(c.num_layers):
            hidden = layer_cls(c, name=f"layer_{i}")(hidden, mask, calibrate, train)
            if output_hidden_states:
                all_hidden.append(hidden)

        pooled = jnp.tanh(nn.Dense(c.hidden_size, name="pooler", dtype=dtype)(hidden[:, 0]))
        return hidden, pooled, (all_hidden if output_hidden_states else None)


# ------------------------------------------------------------------ HF weight loading
def convert_hf_weights(state_dict, config: BertConfig):
    """Convert a HuggingFace BERT/ELECTRA torch state_dict into a BertEncoder param tree.

    Accepts both ``bert.`` and ``electra.`` prefixes.
    """

    def get(*names):
        for name in names:
            if name in state_dict:
                return np.asarray(state_dict[name])
        raise KeyError(f"none of {names} in checkpoint (keys like {list(state_dict)[:5]})")

    def prefixed(suffix):
        return (f"bert.{suffix}", f"electra.{suffix}", suffix)

    params = {
        "word_embeddings": get(*prefixed("embeddings.word_embeddings.weight")),
        "position_embeddings": get(*prefixed("embeddings.position_embeddings.weight")),
        "token_type_embeddings": get(*prefixed("embeddings.token_type_embeddings.weight")),
        "embeddings_ln": {
            "scale": get(*prefixed("embeddings.LayerNorm.weight")),
            "bias": get(*prefixed("embeddings.LayerNorm.bias")),
        },
    }
    for i in range(config.num_layers):
        pre = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "attention": {
                "query": _dense(get(*prefixed(pre + "attention.self.query.weight")),
                                get(*prefixed(pre + "attention.self.query.bias"))),
                "key": _dense(get(*prefixed(pre + "attention.self.key.weight")),
                              get(*prefixed(pre + "attention.self.key.bias"))),
                "value": _dense(get(*prefixed(pre + "attention.self.value.weight")),
                                get(*prefixed(pre + "attention.self.value.bias"))),
                "output": _dense(get(*prefixed(pre + "attention.output.dense.weight")),
                                 get(*prefixed(pre + "attention.output.dense.bias"))),
            },
            "attention_ln": {
                "scale": get(*prefixed(pre + "attention.output.LayerNorm.weight")),
                "bias": get(*prefixed(pre + "attention.output.LayerNorm.bias")),
            },
            "intermediate": _dense(get(*prefixed(pre + "intermediate.dense.weight")),
                                   get(*prefixed(pre + "intermediate.dense.bias"))),
            "ffn_output": _dense(get(*prefixed(pre + "output.dense.weight")),
                                 get(*prefixed(pre + "output.dense.bias"))),
            "output_ln": {
                "scale": get(*prefixed(pre + "output.LayerNorm.weight")),
                "bias": get(*prefixed(pre + "output.LayerNorm.bias")),
            },
        }
    # electra has no pooler; initialize one if missing
    try:
        params["pooler"] = _dense(get(*prefixed("pooler.dense.weight")),
                                  get(*prefixed("pooler.dense.bias")))
    except KeyError:
        hs = config.hidden_size
        params["pooler"] = {"kernel": np.eye(hs, dtype=np.float32), "bias": np.zeros(hs, dtype=np.float32)}
    return params


def _dense(weight, bias):
    # torch Linear stores [out, in]; flax Dense expects [in, out]
    return {"kernel": np.asarray(weight).T, "bias": np.asarray(bias)}


def load_pretrained_encoder(name: str, allow_random_init: bool = False):
    """Returns (BertConfig, params or None). Downloads via HF transformers when
    online; 'tiny' is the deliberate random-init config for offline tests.

    A failure to load (typo'd name, offline without a cached checkpoint) raises
    unless ``allow_random_init=True`` — silently training from random weights
    while claiming a pretrained name destroys effectiveness parity
    (reference consumes real checkpoints, TFBERTMaxP.py:20-35)."""
    name = PRETRAINED_ALIASES.get(name, name)
    config = get_bert_config(name)
    if name == "tiny":
        return config, None
    try:
        import torch  # noqa: F401
        from transformers import AutoModel

        model = AutoModel.from_pretrained(name)
        hf_cfg = model.config
        config = BertConfig(
            vocab_size=hf_cfg.vocab_size,
            hidden_size=hf_cfg.hidden_size,
            num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            intermediate_size=hf_cfg.intermediate_size,
            max_position=hf_cfg.max_position_embeddings,
            type_vocab_size=hf_cfg.type_vocab_size,
            dtype=config.dtype,
        )
        params = convert_hf_weights(model.state_dict(), config)
        return config, params
    except Exception as e:  # offline or unknown model
        from capreolus_tpu.utils.loginit import get_logger

        if not allow_random_init:
            raise RuntimeError(
                f"could not load pretrained weights for {name!r} ({e}); refusing to "
                f"continue with random initialization. Fix the model name / provide a "
                f"cached checkpoint, use pretrained=tiny for offline smoke tests, or "
                f"opt in explicitly with reranker.allowrandominit=True"
            ) from e
        get_logger(__name__).warning(
            "could not load pretrained %s (%s); using random initialization "
            "(allowrandominit=True)", name, e
        )
        return config, None


def load_pretrained_mlm_head(name: str, config: BertConfig):
    """Load BERT's masked-LM prediction head (the head SPLADE projects through):
    transform Dense + LayerNorm, and the decoder whose weight HF TIES to the
    word-embedding table (cls.predictions.decoder.weight IS
    embeddings.word_embeddings.weight) plus the per-vocab bias. Returned as a
    param tree for reranker/splade.py's MlmHead (decoder stored untied — the
    tie is reproduced at load, drift during fine-tuning is permitted, a common
    untied variant). None offline."""
    name = PRETRAINED_ALIASES.get(name, name)
    try:
        import numpy as _np
        from transformers import BertForMaskedLM

        model = BertForMaskedLM.from_pretrained(name)
    except Exception:
        return None  # offline / no transformers: expected, train from init
    try:
        sd = model.state_dict()
        emb = _np.asarray(sd["bert.embeddings.word_embeddings.weight"])  # [V, H]
        return {
            "transform": {
                "kernel": _np.asarray(sd["cls.predictions.transform.dense.weight"]).T.astype(_np.float32),
                "bias": _np.asarray(sd["cls.predictions.transform.dense.bias"]).astype(_np.float32),
            },
            "transform_ln": {
                "scale": _np.asarray(sd["cls.predictions.transform.LayerNorm.weight"]).astype(_np.float32),
                "bias": _np.asarray(sd["cls.predictions.transform.LayerNorm.bias"]).astype(_np.float32),
            },
            "decoder": {
                "kernel": emb.T.astype(_np.float32),  # tied: [H, V]
                "bias": _np.asarray(sd["cls.predictions.bias"]).astype(_np.float32),
            },
        }
    except Exception as e:
        # the model LOADED but the state-dict mapping failed (e.g. a renamed
        # key in a newer transformers): this must be loud — silently training
        # from a random head while claiming the pretrained start is worse than
        # failing
        from capreolus_tpu.utils.loginit import get_logger

        get_logger(__name__).warning(
            "pretrained MLM head of %s loaded but could not be mapped (%s); "
            "the SPLADE head will train from random init", name, e)
        return None


def load_pretrained_nsp_head(name: str):
    """Load the next-sentence-prediction head of a Birch checkpoint as a 1-output
    relevance head. The reference ranks passages by RAW NSP logit index 1
    (birch.py:79 ``scores[:, :, 1]  # take second output`` — no softmax), and
    that logit is itself linear in the pooled vector, so the faithful 1-output
    head is exactly row 1 of the NSP weight: score == reference score verbatim.
    Returns {"kernel": [H, 1], "bias": [1]} or None offline."""
    name = PRETRAINED_ALIASES.get(name, name)
    try:
        import numpy as _np
        from transformers import BertForNextSentencePrediction

        model = BertForNextSentencePrediction.from_pretrained(name)
        sd = model.state_dict()
        w = _np.asarray(sd["cls.seq_relationship.weight"])  # [2, H]
        b = _np.asarray(sd["cls.seq_relationship.bias"])  # [2]
        return nsp_logits_to_relevance_head(w, b)
    except Exception:
        return None


def nsp_logits_to_relevance_head(w, b):
    """Collapse a 2-logit NSP head [2, H] / [2] into the 1-output relevance head:
    score = raw logit[1], exactly the value birch.py:79 ranks by (it applies no
    softmax, and a single logit is linear in the pooled vector). Split out for
    direction-parity testing (ADVICE round 2, high: the previous logit[0]-logit[1]
    head scored in the inverted direction)."""
    import numpy as _np

    w = _np.asarray(w)
    b = _np.asarray(b)
    return {"kernel": w[1][:, None].astype(_np.float32),
            "bias": _np.asarray([b[1]], dtype=_np.float32)}
