"""Pipeline parallelism for the BERT encoder: GPipe-style microbatched stages
over a ``pipe`` mesh axis, expressed with shard_map + lax.ppermute.

The reference has no pipeline parallelism (SURVEY §2.3: data parallel only);
this is a TPU-native extension for encoders too deep/wide for one chip's HBM.
Unlike the tensor-parallel path (tensor_parallel.py), which relies on GSPMD
sharding propagation, a pipeline is an explicit schedule, so it is written the
TPU-idiomatic way for explicit schedules:

- the transformer stack's per-layer parameter trees are STACKED along a leading
  layer axis and sharded over ``pipe`` — each device physically holds only its
  stage's layers (true memory scaling, not replicated storage);
- inside ``shard_map``, every device runs the same program: a ``lax.scan`` over
  ``microbatches + stages - 1`` ticks. At each tick a stage applies its layers
  (an inner ``lax.scan`` over the stacked stage params) and hands its
  activations to the next stage with ``lax.ppermute`` over the ICI ring;
- stage 0 injects a fresh microbatch each tick (masked ``jnp.where`` on the
  axis index — all devices trace the identical program, SPMD-style), the last
  stage collects finished microbatches into the output buffer;
- the whole schedule is differentiable: ppermute/scan/where all have transpose
  rules, so ``jax.grad`` through the pipeline yields the reverse (backward)
  pipeline automatically — GPipe's fill-drain schedule with a bubble fraction
  of (S-1)/(M+S-1).

Embeddings and pooler/head params are small and stay replicated (they ride the
``data`` axis only); the bubble is amortized by choosing microbatches >= 2*S.

Validated for numeric equality vs the plain single-device ``BertEncoder`` on an
8-device CPU mesh (tests/test_pipeline_parallel.py), and exercised as a dryrun
leg (__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

P = jax.sharding.PartitionSpec


# ------------------------------------------------------------------ param views
def stack_layer_params(bert_params, num_layers):
    """[layer_0 .. layer_{L-1}] subtrees -> one tree with a leading [L] axis."""
    layers = [bert_params[f"layer_{i}"] for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked, num_layers):
    """Inverse of stack_layer_params: leading [L] axis -> layer_i subtrees."""
    return {
        f"layer_{i}": jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
        for i in range(num_layers)
    }


def split_bert_params(bert_params, num_layers):
    """(non-layer params, stacked layer params)."""
    rest = {k: v for k, v in bert_params.items() if not k.startswith("layer_")}
    return rest, stack_layer_params(bert_params, num_layers)


def merge_bert_params(rest, stacked, num_layers):
    out = dict(rest)
    out.update(unstack_layer_params(stacked, num_layers))
    return out


def make_pp_mesh(devices=None, pp=2, tp=1):
    """(data, pipe) mesh, or 3D (data, pipe, model) when tp>1 (pipeline stages
    whose per-stage layers are additionally Megatron tensor-parallel); the data
    axis gets the remaining devices."""
    devices = list(jax.devices() if devices is None else devices)
    if len(devices) % (pp * tp) != 0:
        raise ValueError(f"{len(devices)} devices not divisible by pp={pp}*tp={tp}")
    if tp > 1:
        arr = np.array(devices).reshape(len(devices) // (pp * tp), pp, tp)
        return jax.sharding.Mesh(arr, ("data", "pipe", "model"))
    arr = np.array(devices).reshape(len(devices) // pp, pp)
    return jax.sharding.Mesh(arr, ("data", "pipe"))


def place_pp_view(rest, stacked, mesh):
    """Place the split param view on the mesh: stacked layers sharded over
    ``pipe`` along the layer axis (each device holds only its stage's layers),
    everything else replicated. On a 3D (data, pipe, model) mesh each stacked
    leaf ADDITIONALLY carries the Megatron column/row sharding on its matmul
    dims (tensor_parallel.bert_param_spec shifted past the leading layer axis)
    — pp x tp composition from parameter shardings alone."""
    rep = jax.sharding.NamedSharding(mesh, P())
    if "model" in mesh.axis_names:
        from capreolus_tpu.parallel.tensor_parallel import bert_param_spec

        tp_size = mesh.shape["model"]

        def place_layer(path, x):
            spec = bert_param_spec(path)
            # shift past the stacked [L] axis; replicate over 'model' when the
            # sharded dim does not divide (correct, just not tensor-parallel)
            for dim, axis in enumerate(spec):
                if axis == "model" and (x.ndim <= dim + 1 or x.shape[dim + 1] % tp_size != 0):
                    spec = P()
                    break
            sh = jax.sharding.NamedSharding(mesh, P("pipe", *spec))
            return jax.device_put(x, sh)

        stacked = jax.tree_util.tree_map_with_path(place_layer, stacked)
    else:
        layer_sh = jax.sharding.NamedSharding(mesh, P("pipe"))
        stacked = jax.tree_util.tree_map(lambda x: jax.device_put(x, layer_sh), stacked)
    rest = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), rest)
    return rest, stacked


# ------------------------------------------------------------------ embeddings / head
# Plain-function re-statements of BertEncoder's embedding and pooler math
# (reranker/bert/encoder.py:209-241); pinned bit-for-bit against
# BertEncoder.apply by tests/test_pipeline_parallel.py.
def _layernorm(x, scale, bias, eps):
    x = x.astype(jnp.float32)
    # flax LayerNorm's fast-variance formulation (E[x^2] - E[x]^2) so the
    # pipelined embeddings match BertEncoder's to the last bit
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean, 0.0)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def embed(config, bert_params, input_ids, token_type_ids=None):
    c = config
    l = input_ids.shape[1]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    hidden = (
        jnp.take(bert_params["word_embeddings"], input_ids % c.vocab_size, axis=0)
        + bert_params["position_embeddings"][None, :l]
        + jnp.take(bert_params["token_type_embeddings"], token_type_ids % c.type_vocab_size, axis=0)
    )
    ln = bert_params["embeddings_ln"]
    hidden = _layernorm(hidden, ln["scale"], ln["bias"], c.layer_norm_eps)
    return hidden.astype(jnp.dtype(c.dtype))


def pool(config, bert_params, hidden):
    pl = bert_params["pooler"]
    cls = hidden[:, 0].astype(jnp.dtype(config.dtype))
    return jnp.tanh(cls @ pl["kernel"].astype(cls.dtype) + pl["bias"].astype(cls.dtype))


# ------------------------------------------------------------------ the pipeline
def _stage_apply(config, stage_layers, hidden, mask, layer_offset, dropout_rng, train):
    """Apply this stage's stacked layers with an inner scan."""
    from capreolus_tpu.reranker.bert.encoder import BertLayer

    layer = BertLayer(config)
    n_local = jax.tree_util.tree_leaves(stage_layers)[0].shape[0]

    def body(h, xs):
        lp, i = xs
        if train and dropout_rng is not None:
            key = jax.random.fold_in(dropout_rng, layer_offset + i)
            h = layer.apply({"params": lp}, h, mask, False, True, rngs={"dropout": key})
        else:
            h = layer.apply({"params": lp}, h, mask, False, False)
        return h, None

    hidden, _ = jax.lax.scan(body, hidden, (stage_layers, jnp.arange(n_local)))
    return hidden


def pipelined_layers(config, stacked_layers, hidden, mask, mesh, microbatches,
                     dropout_rng=None, train=False):
    """Run the transformer stack as a fill-drain pipeline over the ``pipe`` axis.

    hidden: [B, T, H] (B sharded over ``data``); stacked_layers: [L, ...] pytree
    sharded over ``pipe``. Returns [B, T, H] with the same sharding as hidden.
    """
    c = config
    stages = int(mesh.shape["pipe"])
    if c.num_layers % stages != 0:
        raise ValueError(f"num_layers={c.num_layers} not divisible by pipe={stages}")
    per_stage = c.num_layers // stages
    if not microbatches:
        # auto: largest divisor of the per-data-shard batch <= 2*stages — enough
        # microbatches to amortize the (S-1)/(M+S-1) bubble without shrinking
        # each microbatch below MXU-friendly sizes
        b_local = hidden.shape[0] // int(mesh.shape["data"])
        microbatches = max(m for m in range(1, max(b_local, 1) + 1)
                           if b_local % m == 0 and m <= 2 * stages)
    M = int(microbatches)

    def pipe_body(h_local, mask_local, layers_local):
        b_local, t, hdim = h_local.shape
        if b_local % M != 0:
            raise ValueError(f"local batch {b_local} not divisible by microbatches={M}")
        mb = b_local // M
        stage = jax.lax.axis_index("pipe")
        xs = h_local.reshape(M, mb, t, hdim)
        masks = mask_local.reshape(M, mb, t)

        # carries become device-varying after the first tick (axis_index masks,
        # ppermute); mark the zero-init carries varying so scan types agree
        state = jax.lax.pcast(jnp.zeros((mb, t, hdim), h_local.dtype),
                              ("data", "pipe"), to="varying")
        outputs = jax.lax.pcast(jnp.zeros((M, mb, t, hdim), h_local.dtype),
                                ("data", "pipe"), to="varying")
        # per-(data-shard, microbatch) dropout streams; folded again per layer
        rng = dropout_rng
        if rng is not None and train:
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def tick(carry, t_idx):
            state, outputs = carry
            # stage s processes microbatch (t_idx - s) this tick
            mbi = jnp.clip(t_idx - stage, 0, M - 1)
            inject = jax.lax.dynamic_index_in_dim(xs, mbi, 0, keepdims=False)
            h_in = jnp.where(stage == 0, inject, state)
            m = jax.lax.dynamic_index_in_dim(masks, mbi, 0, keepdims=False)
            tick_rng = None
            if rng is not None and train:
                tick_rng = jax.random.fold_in(rng, mbi)
            h_out = _stage_apply(c, layers_local, h_in, m, stage * per_stage, tick_rng, train)
            # last stage commits microbatch (t_idx - (S-1)) when it is in range
            widx = jnp.clip(t_idx - (stages - 1), 0, M - 1)
            commit = (stage == stages - 1) & (t_idx >= stages - 1)
            prev = jax.lax.dynamic_index_in_dim(outputs, widx, 0, keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(commit, h_out, prev), widx, 0)
            # hand activations to the next stage over the ICI ring
            state = jax.lax.ppermute(h_out, "pipe", [(i, (i + 1) % stages) for i in range(stages)])
            return (state, outputs), None

        (state, outputs), _ = jax.lax.scan(tick, (state, outputs), jnp.arange(M + stages - 1))
        # replicate the last stage's outputs across the pipe axis so the pooler/
        # head (replicated) see the full result on every device
        outputs = jax.lax.psum(jnp.where(stage == stages - 1, outputs, jnp.zeros_like(outputs)), "pipe")
        return outputs.reshape(b_local, t, hdim)

    # manual over (data, pipe) only: on a 3D mesh the 'model' axis stays AUTO,
    # so GSPMD tensor-parallelizes each stage's matmuls from the param
    # shardings (place_pp_view) and inserts the Megatron psums inside the
    # pipeline schedule — pp x tp composition without rewriting either
    mapped = jax.shard_map(
        pipe_body,
        mesh=mesh,
        in_specs=(P("data", None, None), P("data", None), P("pipe")),
        out_specs=P("data", None, None),
        axis_names={"data", "pipe"},
    )
    return mapped(hidden, mask, stacked_layers)


def pipelined_encoder(config, bert_params_rest, stacked_layers, input_ids,
                      attention_mask, token_type_ids, mesh, microbatches,
                      dropout_rng=None, train=False):
    """Full BertEncoder forward (embeddings -> pipelined stack -> pooler).

    Returns (sequence_output, pooled_output), matching BertEncoder.apply's first
    two outputs (encoder.py:241) bit-for-bit when train=False.
    """
    hidden = embed(config, bert_params_rest, input_ids, token_type_ids)
    if dropout_rng is not None and train and config.hidden_dropout_prob > 0:
        keep = 1.0 - config.hidden_dropout_prob
        mask_ = jax.random.bernoulli(jax.random.fold_in(dropout_rng, 0x0e0b), keep, hidden.shape)
        hidden = jnp.where(mask_, hidden / keep, 0).astype(hidden.dtype)
    mask = attention_mask.astype(jnp.bool_)
    hidden = pipelined_layers(config, stacked_layers, hidden, mask, mesh, microbatches,
                              dropout_rng=dropout_rng, train=train)
    pooled = pool(config, bert_params_rest, hidden)
    return hidden, pooled


# ------------------------------------------------------------------ scorer-level API
def split_scorer_params(scorer_params, config):
    """_BertScorer param tree -> (pp view) = (rest tree, stacked layers).

    The rest tree keeps the exact _BertScorer layout minus the per-layer
    subtrees, so optimizer path labels ("bert" -> bertlr) still apply."""
    tree = scorer_params["params"] if "params" in scorer_params else scorer_params
    bert = tree["bert"]
    rest_bert, stacked = split_bert_params(bert, config.num_layers)
    rest = {k: v for k, v in tree.items() if k != "bert"}
    rest["bert"] = rest_bert
    return {"params": rest}, stacked


def merge_scorer_params(rest_tree, stacked, config):
    """Inverse of split_scorer_params: pp view -> canonical _BertScorer tree."""
    tree = rest_tree["params"] if "params" in rest_tree else rest_tree
    bert = merge_bert_params(tree["bert"], stacked, config.num_layers)
    out = {k: v for k, v in tree.items() if k != "bert"}
    out["bert"] = bert
    return {"params": out}


def pipelined_scorer_forward(config, rest_tree, stacked, inp, mask, seg, mesh,
                             microbatches, dropout_rng=None, train=False):
    """_BertScorer forward through the pipeline: [B, P, L] or [B, L] token ids
    -> [B, P] passage scores (bert_rerankers.py _BertScorer.__call__ parity)."""
    tree = rest_tree["params"] if "params" in rest_tree else rest_tree
    if inp.ndim == 3:
        b, p, l = inp.shape
        flat_inp = inp.reshape(b * p, l)
        flat_mask = mask.reshape(b * p, l)
        flat_seg = seg.reshape(b * p, l)
    else:
        b, p = inp.shape[0], 1
        flat_inp, flat_mask, flat_seg = inp, mask, seg
    _, pooled = pipelined_encoder(config, tree["bert"], stacked, flat_inp, flat_mask,
                                  flat_seg, mesh, microbatches,
                                  dropout_rng=dropout_rng, train=train)
    head = tree["classifier"]
    scores = (pooled.astype(jnp.float32) @ head["kernel"] + head["bias"])[:, 0]
    return scores.reshape(b, p)
