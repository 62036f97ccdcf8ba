"""End-to-end late-interaction (ColBERT) retrieval on TPU.

The reference can only consume a pre-computed TCT-ColBERT run file
(/root/reference/capreolus/searcher/special.py:170-212). This searcher BUILDS
late-interaction runs natively: every document's tokens are embedded once with
a ColBERT encoder into an HBM-resident ``[N, Ld, dim]`` bf16 tensor, and search
scores MaxSim exactly — for each query token, the max dot product over the
doc's tokens, summed over query tokens. On TPU the interaction is a flat
``[Q*Lq, dim] x [dim, C*Ld]`` MXU matmul per doc chunk followed by a masked
max/sum on the VPU; ``lax.map`` over chunks bounds the similarity tensor to one
chunk so corpus size only occupies HBM through the (compact, dim<<768) token
embeddings. No approximate-NN/IVF structures: exact over the whole corpus, like
the dense searcher (searcher/dense.py), with the same shards/topkmode options.

Pairs with the trainable `reranker.name=colbert` (reranker/colbert.py): train
in-framework, pass the checkpoint via ``searcher.checkpointfile``.
"""

from __future__ import annotations

from collections import OrderedDict
from pathlib import Path

import numpy as np

from capreolus_tpu.core import ConfigOption, Dependency
from capreolus_tpu.searcher import Searcher, _hbm_budget_mb
from capreolus_tpu.utils.caching import done_file
from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)


@Searcher.register
class LateInteractionSearcher(Searcher):
    """Exact ColBERT MaxSim retrieval over per-token embeddings."""

    module_name = "colbert"
    dependencies = [
        Dependency(key="index", module="index", name="tpu"),
        Dependency(key="tokenizer", module="tokenizer", name="berttokenizer"),
    ]
    config_spec = [
        ConfigOption("pretrained", "tiny", "encoder checkpoint (bert/electra names; 'tiny' for offline smoke)"),
        ConfigOption("checkpointfile", None, "trained colbert reranker checkpoint "
                     "(dev.best.params with 'bert' + 'linear' submodules)"),
        ConfigOption("dim", 128, "per-token embedding dimension (must match the checkpoint)"),
        ConfigOption("maxdoclen", 180, "document tokens fed to the encoder"),
        ConfigOption("maxqlen", 32, "query tokens (ColBERT pads to this with [MASK])"),
        ConfigOption("batch", 64, "embedding / query batch size"),
        ConfigOption("hits", 1000, "number of results"),
        ConfigOption("chunk", 256, "docs scored per MaxSim chunk (bounds the similarity "
                     "tensor to batch*chunk*maxqlen*maxdoclen bf16)"),
        ConfigOption("allowrandominit", False, "allow a randomly-initialized encoder when the "
                     "checkpoint cannot be loaded (smoke tests only)"),
        ConfigOption("shards", 1, "devices to shard the token-embedding tensor across "
                     "(doc-partitioned; per-shard top-k merged over ICI, like searcher.shards "
                     "on BM25 and dense)"),
        ConfigOption("prefilter", 0, "two-stage mode (PLAID-style candidate generation, "
                     "Santhanam et al. 2022): 0 = exact MaxSim over the whole corpus; N > 0 = "
                     "a cheap pooled-embedding first pass selects N candidates per query "
                     "([Q, dim] x [dim, N] matmul), exact MaxSim reranks only those. "
                     "Approximate: measured top-10 overlap vs exact in tests/test_colbert.py"),
        ConfigOption("quantize", "none", "token-embedding quantization: none (bf16), int8 "
                     "(per-doc symmetric scales, int8 MXU MaxSim at double rate, half the HBM "
                     "per corpus; the per-doc scale factors out of MaxSim's max/sum exactly — "
                     "ops/quantization.py, overlap referee'd in tests/test_colbert.py), or int4 "
                     "(packed nibble pairs: 4x the docs per HBM byte vs bf16 — the capacity "
                     "tier; chunks unpack to int8 on device and ride the same int8 MXU path; "
                     "resident exact engine only — exclusive with shards/prefilter/streaming)"),
        ConfigOption("rescore", 200, "quantize=int4 two-stage depth: the packed engine "
                     "retrieves this many candidates and a full-precision MaxSim rescore "
                     "from the memory-mapped token-embedding disk cache restores the exact "
                     "ranking (0 disables: rank by the 4-bit scores directly)"),
        ConfigOption("hbmbudget", 12000.0, "HBM budget (MB) for the resident token-embedding "
                     "tensor; corpora above it stream host-resident chunks through the device "
                     "with a running on-device top-k merge (the late-interaction analogue of the "
                     "sparse engine's host-streaming postings; composes with quantize=int8)"),
    ]
    config_keys_not_in_path = ["batch", "chunk", "shards", "hbmbudget"]  # none change results
    # (hbmbudget: streamed-vs-resident equality pinned in tests/test_colbert.py)

    def build(self):
        from capreolus_tpu.core import ConfigError

        if int(self.config["dim"]) <= 0 or int(self.config["chunk"]) <= 0:
            raise ConfigError("colbert searcher dim and chunk must be positive")
        if int(self.config["prefilter"]) > 0 and int(self.config["shards"]) > 1:
            raise ConfigError("colbert searcher prefilter is single-device; use shards=1 "
                              "(the exact sharded path) or prefilter=0")
        if self.config["quantize"] not in (None, "none", "int8", "int4"):  # "none" casts to None
            raise ConfigError(f"colbert quantize must be 'none', 'int8', or 'int4', "
                              f"got {self.config['quantize']!r}")
        if self.config["quantize"] == "int4" and (int(self.config["shards"]) > 1
                                                  or int(self.config["prefilter"]) > 0):
            raise ConfigError("colbert quantize=int4 runs the resident exact engine only: "
                              "set shards=1 and prefilter=0 (use int8 for those combos)")

    # ------------------------------------------------------------------ encoder
    def _encoder(self):
        if getattr(self, "_enc", None) is None:
            import dataclasses as _dc

            import jax

            from capreolus_tpu.reranker.bert.encoder import load_pretrained_encoder
            from capreolus_tpu.reranker.colbert import ColBERTModel

            name = self.config["pretrained"]
            cfg, bert_params = load_pretrained_encoder(
                name, allow_random_init=bool(self.config["allowrandominit"]) or name == "tiny")
            cfg = _dc.replace(cfg, hidden_dropout_prob=0.0, attention_dropout_prob=0.0)
            model = ColBERTModel(cfg, dim=int(self.config["dim"]))
            self._random_init = bert_params is None

            rng = jax.random.PRNGKey(0)
            dummy = np.zeros((1, 8), dtype=np.int32)
            variables = model.init(rng, dummy, dummy)
            if bert_params is not None:
                variables = {"params": {**variables["params"],
                                        "bert": jax.tree_util.tree_map(np.asarray, bert_params)}}
            ckpt = self.config.get("checkpointfile")
            if ckpt:
                from capreolus_tpu.utils.sharded_ckpt import restore_params

                # flat flax msgpack file OR a trainer.ckpt=sharded directory
                restored = restore_params(ckpt)
                tree = restored.get("params", restored)
                for sub in ("bert", "linear"):
                    if sub not in tree:
                        raise ValueError(f"checkpoint {ckpt} has no '{sub}' submodule "
                                         f"(top-level keys: {sorted(tree)[:8]}) — expected a "
                                         f"trained colbert reranker checkpoint")
                variables = {"params": jax.tree_util.tree_map(np.asarray, tree)}
                self._random_init = False
                logger.info("colbert searcher weights restored from %s", ckpt)
            self._enc = (model, variables)

            # jit once; params/tokens are ARGUMENTS (remote-compile payload limit)
            self._encode_doc_jit = jax.jit(
                lambda v, toks: model.apply(v, toks, method=ColBERTModel.encode_doc))
            self._encode_query_jit = jax.jit(
                lambda v, toks: model.apply(v, toks, method=ColBERTModel.encode_query))
        return self._enc

    def _tokenize(self, texts, maxlen):
        tok = self.tokenizer
        inp = np.zeros((len(texts), maxlen), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [tok.cls_id] + tok.convert_tokens_to_ids(tok.tokenize(text)[: maxlen - 2]) + [tok.sep_id]
            inp[i, : len(ids)] = ids
        return inp

    # ------------------------------------------------------------------ doc embeddings
    def _doc_cache_file(self):
        """Keyed like dense.py's (ADVICE round 2): encoder identity + checkpoint
        content + tokenizer fingerprint + random-init marker + dim/maxdoclen."""
        import hashlib
        import os as _os

        self._encoder()
        parts = [self.config["pretrained"], str(self.config["dim"]), str(self.config["maxdoclen"]),
                 self.tokenizer.fingerprint,
                 "randominit" if getattr(self, "_random_init", False) else "pretrained"]
        ckpt = self.config.get("checkpointfile")
        if ckpt:
            st = _os.stat(ckpt)
            parts += [ckpt, str(st.st_size), str(st.st_mtime_ns)]
        key = hashlib.md5("|".join(parts).encode()).hexdigest()[:16]
        # raw .npy (not npz) so the arrays memory-map at load — disk-resident
        # like the sparse tile cache; the mask lives beside it (_mask_file)
        return self.index.get_cache_path() / "colbert" / f"doc_token_embeddings_{key}.emb.npy"

    @staticmethod
    def _mask_for(emb_fn):
        return Path(str(emb_fn)[: -len(".emb.npy")] + ".mask.npy")

    def _mask_file(self):
        return self._mask_for(self._doc_cache_file())

    def _current_doc_cache_file(self):
        """The generation-tagged token cache the loaded corpus came from (set
        by _doc_tensors). Derived readers (int4 rescore, streaming) must use
        THIS name, never the gen-0 base (see searcher/embedding_cache.py)."""
        fn = getattr(self, "_active_cache_fn", None)
        return fn if fn is not None else self._doc_cache_file()

    def _encode_doc_batches(self, docids, maxlen):
        """Encode the given docids' tokens in fixed-shape batches. Returns
        ([n, Ld, dim] f16 embeddings, [n, Ld] int8 masks)."""
        model, variables = self._encoder()
        batch = int(self.config["batch"])
        embs, masks = [], []
        for start in range(0, len(docids), batch):
            texts = [self.index.get_doc(d) for d in docids[start : start + batch]]
            toks = self._tokenize(texts, maxlen)
            if len(toks) < batch:  # fixed batch shape: one compiled executable
                toks = np.concatenate([toks, np.zeros((batch - len(toks), maxlen), np.int32)])
            e, m = self._encode_doc_jit(variables, toks)
            embs.append(np.asarray(e, np.float16)[: len(texts)])
            masks.append(np.asarray(m, np.int8)[: len(texts)])
        emb = np.concatenate(embs) if embs else np.zeros((0, maxlen, int(self.config["dim"])), np.float16)
        mask = np.concatenate(masks) if masks else np.zeros((0, maxlen), np.int8)
        return emb, mask

    def _doc_tensors(self):
        """([N, Ld, dim] embeddings, [N, Ld] int8 masks, per-doc scales), disk-
        cached. With quantize=none the embeddings are bf16 and scales is None;
        with quantize=int8 they are int8 with f32 [N] per-doc scales derived at
        load (the disk cache stays full-precision, shared across both modes)."""
        import jax.numpy as jnp

        self.index.create_index()
        docid_strings = self.index.data.docid_strings  # merges pending ops first
        gen = getattr(self.index, "_loaded_generation", 0)
        if getattr(self, "_docs_emb", None) is not None and getattr(self, "_docs_emb_gen", 0) == gen:
            return self._docs_emb
        self._docs_emb = None
        self._docs_emb_gen = gen
        from capreolus_tpu.searcher import embedding_cache as ec

        base_fn = self._doc_cache_file()
        cache_fn = ec.generation_path(base_fn, gen)
        mask_fn = self._mask_for(cache_fn)
        self._active_cache_fn = cache_fn
        if cache_fn.exists() and mask_fn.exists():
            # memory-mapped: streaming touches only the pages in flight, the
            # resident paths read once while uploading to HBM
            emb = np.load(cache_fn, mmap_mode="r")
            mask = np.load(mask_fn, mmap_mode="r")
        else:
            maxlen = int(self.config["maxdoclen"])

            def encode(docids):
                logger.info("embedding %d documents' tokens with the %s colbert encoder",
                            len(docids), self.config["pretrained"])
                return self._encode_doc_batches(docids, maxlen)

            prev, prev_gen = ec.find_previous(base_fn, gen)
            emb = None
            if prev is not None:
                old_e = np.load(prev, mmap_mode="r")
                old_m = np.load(self._mask_for(prev), mmap_mode="r")
                src = ec.row_sources(ec.read_docids(prev), docid_strings)
                if ec.identity_remap(src, old_e.shape[0]):
                    ec.link_identical(self._mask_for(prev), mask_fn)
                    ec.link_identical(prev, cache_fn)
                    emb = np.load(cache_fn, mmap_mode="r")
                    mask = np.load(mask_fn, mmap_mode="r")
                else:
                    emb = np.empty((len(docid_strings),) + old_e.shape[1:], dtype=old_e.dtype)
                    mask = np.empty((len(docid_strings),) + old_m.shape[1:], dtype=old_m.dtype)
                    reused = ec.fill_kept_rows([emb, mask], [old_e, old_m], src)
                    new_idx = np.flatnonzero(src < 0)
                    if len(new_idx):
                        ne, nm = encode([docid_strings[i] for i in new_idx])
                        emb[new_idx], mask[new_idx] = ne, nm
                    logger.info("colbert cache gen %d built from gen %d: reused %d rows, "
                                "encoded %d new documents", gen, prev_gen, reused, len(new_idx))
            if emb is None:
                emb, mask = encode(docid_strings)
            if not (cache_fn.exists() and mask_fn.exists()):
                from capreolus_tpu.utils.caching import TargetFileExists, cached_file

                # mask first, emb last: the existence check requires BOTH, and
                # cached_file writes are atomic, so a crash between the two never
                # leaves a loadable half-pair. Each write gets its OWN race guard:
                # a crash-orphaned mask must not stop the emb from being written
                # on the retry (the pair would otherwise never self-heal and every
                # run would re-encode the corpus)
                for fn, arr in ((mask_fn, mask), (cache_fn, emb)):
                    try:
                        with cached_file(fn, "wb") as f:
                            np.save(f, arr)
                    except TargetFileExists:
                        pass
        ec.write_docids(cache_fn, docid_strings)
        ec.prune_old_generations(base_fn, gen)
        qmode = self.config.get("quantize", "none") or "none"
        quantized = qmode == "int8"
        n_docs, ld, dim = emb.shape
        per_doc = {"int8": ld * dim, "int4": (ld * dim + (ld * dim) % 2) // 2}.get(qmode, 2 * ld * dim)
        dev_bytes = n_docs * per_doc + mask.size + (4 * n_docs if qmode in ("int8", "int4") else 0)
        budget_bytes = float(_hbm_budget_mb(self.config)) * 1e6
        host_mode = dev_bytes > budget_bytes
        if host_mode and qmode == "int4":
            from capreolus_tpu.core import ConfigError

            raise ConfigError("colbert quantize=int4 is resident-only; the packed corpus "
                              f"({dev_bytes / 1e6:.0f} MB) exceeds hbmbudget — raise the "
                              "budget or use quantize=int8 (which composes with streaming)")
        if host_mode:
            logger.info("colbert corpus (%d docs, %.0f MB device bytes) exceeds hbmbudget=%.0f MB: "
                        "host-streaming mode (chunked uploads + running top-k merge)",
                        n_docs, dev_bytes / 1e6, budget_bytes / 1e6)
        if qmode == "int4":
            # packed nibbles over flattened per-doc token rows; per-doc scale
            # (same reduction scope as the int8 per-doc quantize_rows)
            from capreolus_tpu.ops.quantization import quantize_rows_int4

            q4, scale = quantize_rows_int4(emb.reshape(n_docs, ld * dim))
            self._docs_emb = (jnp.asarray(q4), jnp.asarray(mask, dtype=jnp.int8),
                              jnp.asarray(scale))
        elif quantized:
            if host_mode:
                # disk-resident int8 corpus: built slab-wise next to the f16
                # cache and memory-mapped (rows flattened [N, Ld*dim]; the
                # streamer reshapes per upload slice) — host RAM holds no
                # O(corpus) copy in any streaming mode
                from capreolus_tpu.searcher.dense import _quantized_disk_cache

                q2d, scale = _quantized_disk_cache(cache_fn, emb.reshape(n_docs, ld * dim), "int8")
                self._docs_emb = (q2d, mask, scale)
            else:
                from capreolus_tpu.ops.quantization import quantize_rows

                q, scale = quantize_rows(np.asarray(emb))
                self._docs_emb = (jnp.asarray(q), jnp.asarray(mask, dtype=jnp.int8), jnp.asarray(scale))
        elif host_mode:
            # the f16 mmap stays the backing store; upload slices convert to
            # bf16 in make_chunk (same values the resident path uploads)
            self._docs_emb = (emb, mask, None)
        else:
            self._docs_emb = (jnp.asarray(emb, dtype=jnp.bfloat16), jnp.asarray(mask, dtype=jnp.int8), None)
        return self._docs_emb

    # ------------------------------------------------------------------ search
    def query_from_file(self, topicsfn, output_path):
        from pathlib import Path

        output_path = Path(output_path)
        with done_file(output_path) as already:
            if not already:
                self._search_all(Path(topicsfn), output_path)
        return output_path

    def build_topk(self, hits):
        """Dispatch to one of the four MaxSim engines and return
        ``(topk(q_emb, *corpus) -> (scores, ordinals), corpus, n_corpus)``.

        Shared by the batch pipeline (_search_all) and the serving layer
        (serving.ColbertRetrievalService); the corpus tensors are ARGUMENTS
        (not closure captures — remote-compile payload limit), except in
        host-streaming mode where the host arrays live outside the jit."""
        import jax
        import jax.numpy as jnp

        docs, dmask, dscale = self._doc_tensors()
        n = docs.shape[0]
        hits = min(int(hits), n)
        chunk = min(int(self.config["chunk"]), max(n, 1))
        quantized = dscale is not None

        # int4 is a CANDIDATE-GENERATION tier (like dense.py): 4-bit rounding
        # blurs fine MaxSim order but keeps the true top-k inside a modest
        # candidate pool, so the packed engine retrieves `rescore` candidates
        # and a full-precision host rescore from the mmapped token-embedding
        # cache restores the exact ranking (referee'd in tests/test_colbert.py)
        qmode = self.config.get("quantize", "none") or "none"
        rescore = int(self.config.get("rescore", 200) or 0) if qmode == "int4" else 0
        engine_hits = min(max(rescore, hits), n) if rescore else hits

        shards = int(self.config.get("shards", 1))
        host_mode = isinstance(docs, np.ndarray)  # corpus > hbmbudget: host-resident
        if host_mode:
            corpus = ()  # streamed topk closes over the host arrays
        else:
            pad = (-n) % (chunk * shards)
            if pad:  # fully-masked pad docs can never win (masked max -> -inf)
                docs = jnp.concatenate([docs, jnp.zeros((pad, *docs.shape[1:]), docs.dtype)])
                dmask = jnp.concatenate([dmask, jnp.zeros((pad, dmask.shape[1]), dmask.dtype)])
                if quantized:
                    dscale = jnp.concatenate([dscale, jnp.ones((pad,), dscale.dtype)])
            corpus = (docs, dmask, dscale) if quantized else (docs, dmask)

        def chunked_scores(q_emb, docs_l, dmask_l, dscale_l=None):
            # q_emb [Q, Lq, dim]; per chunk: one [Q*Lq, dim] x [dim, C*Ld] MXU
            # matmul -> [Q, Lq, C, Ld] sims -> masked max over doc tokens,
            # sum over query tokens. lax.map keeps peak memory at one chunk.
            # int8 mode: both operands int8 (double-rate MXU), int32 sims; the
            # per-query and per-doc scales are constant within a row so they
            # factor out of the max AND the sum exactly (ops/quantization.py).
            nchunks = docs_l.shape[0] // chunk
            dr = docs_l.reshape(nchunks, chunk, *docs_l.shape[1:])
            mr = dmask_l.reshape(nchunks, chunk, dmask_l.shape[1])
            if dscale_l is not None:
                from capreolus_tpu.ops.quantization import quantize_rows_jnp

                q_i8, qscale = quantize_rows_jnp(q_emb)
                nq, lq = q_emb.shape[0], q_emb.shape[1]
                q2d = q_i8.reshape(nq * lq, q_emb.shape[2])
                scr = dscale_l.reshape(nchunks, chunk)

                packed = docs_l.dtype == jnp.uint8  # int4 nibble-packed corpus
                qdim = q_emb.shape[2]

                def chunk_scores_q(args):
                    # measured (PERF.md): the 4D int8 einsum misses the MXU int8
                    # path (1.7x slower than bf16); a flat 2D dot_general with
                    # bf16 sims (exact int32 MXU accumulate, converted in the
                    # epilogue so the [Q*Lq, C*Ld] intermediate is half-width)
                    # restores parity. bf16 sim rounding (~0.4%) is on par with
                    # the int8 input rounding itself.
                    d, m, sc = args  # [C, Ld, dim] int8 / [C, P] packed uint8, [C, Ld], [C]
                    if packed:
                        # int4: unpack THIS chunk to int8 (the transient int8
                        # corpus never materializes wholesale), then the same
                        # int8 MXU path
                        from capreolus_tpu.ops.quantization import unpack_int4_jnp

                        ldm = m.shape[1]
                        d = unpack_int4_jnp(d)[:, : ldm * qdim].reshape(chunk, ldm, qdim)
                    ld = d.shape[1]
                    sim = jax.lax.dot_general(
                        q2d, d.reshape(chunk * ld, d.shape[2]),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.bfloat16)             # [Q*Lq, C*Ld]
                    sim = sim.reshape(nq, lq, chunk, ld)
                    sim = jnp.where(m[None, None, :, :] > 0, sim, jnp.bfloat16(-1e9))
                    per_q_token = sim.max(axis=-1).astype(jnp.float32)   # [Q, Lq, C]
                    scores = per_q_token.sum(axis=1) * qscale[:, None] * sc[None, :]
                    valid = m.any(axis=-1)[None, :]                      # [Q, C]
                    return jnp.where(valid, scores, -jnp.inf)

                scores = jax.lax.map(chunk_scores_q, (dr, mr, scr))      # [nchunks, Q, C]
                return jnp.moveaxis(scores, 0, 1).reshape(q_emb.shape[0], -1)

            def chunk_scores(args):
                d, m = args  # [C, Ld, dim], [C, Ld]
                sim = jnp.einsum("qle,cke->qclk", q_emb.astype(jnp.bfloat16), d,
                                 preferred_element_type=jnp.float32)  # [Q, C, Lq, Ld]
                sim = jnp.where(m[None, :, None, :] > 0, sim, -1e9)
                per_q_token = sim.max(axis=-1)                       # [Q, C, Lq]
                valid = m.any(axis=-1)[None, :]                      # [Q, C]
                return jnp.where(valid, per_q_token.sum(axis=-1), -jnp.inf)

            scores = jax.lax.map(chunk_scores, (dr, mr))             # [nchunks, Q, C]
            return jnp.moveaxis(scores, 0, 1).reshape(q_emb.shape[0], -1)

        prefilter = int(self.config.get("prefilter", 0))
        if host_mode:
            from capreolus_tpu.core import ConfigError

            if shards > 1 or prefilter > 0:
                raise ConfigError("colbert streaming (corpus > hbmbudget) runs the exact "
                                  "single-chip path: set shards=1 and prefilter=0, or raise "
                                  "hbmbudget (shards already partition the corpus across chips)")
            topk = self._streamed_topk(docs, dmask, dscale, n, hits, chunk, chunked_scores)
        elif shards > 1:
            topk, corpus = self._sharded_topk(corpus, n, hits, shards, chunked_scores)
        elif prefilter > 0:
            topk = self._prefilter_topk(corpus, n, hits, min(prefilter, n), chunk)
        else:
            @jax.jit
            def topk(q_emb, *corpus):
                return jax.lax.top_k(chunked_scores(q_emb, *corpus), engine_hits)

        if rescore:
            topk = self._rescore_wrap(topk, n, hits)
        return topk, corpus, n

    def _rescore_wrap(self, base_topk, n, hits):
        """Two-stage int4 MaxSim: the packed engine generates ``rescore``
        candidates; this wrapper re-scores them at full precision from the
        memory-mapped token-embedding disk cache (per query: one
        [Lq, dim] x [dim, r*Ld] host BLAS matmul + masked max/sum) and returns
        the exact ranking whenever the true top-k is inside the candidate pool
        (recall referee'd in tests/test_colbert.py). The dense analogue is
        dense.py _rescore_wrap."""
        emb_mm = np.load(self._current_doc_cache_file(), mmap_mode="r")
        mask_mm = np.load(self._mask_for(self._current_doc_cache_file()), mmap_mode="r")

        def topk(q_emb, *corpus):
            s, o = base_topk(q_emb, *corpus)
            s, o = np.asarray(s), np.asarray(o)
            qf = np.asarray(q_emb, np.float32)              # [Q, Lq, dim]
            valid = np.isfinite(s) & (o < n)
            safe = np.where(valid, o, 0)
            exact = np.full(s.shape, -np.inf, np.float32)
            # per-query loop bounds the gathered full-precision candidate
            # tensor to [r, Ld, dim] (the mmap pages in only touched rows)
            for qi in range(o.shape[0]):
                cand = np.asarray(emb_mm[safe[qi]], np.float32)   # [r, Ld, dim]
                cmask = np.asarray(mask_mm[safe[qi]]) > 0         # [r, Ld]
                r, ld, dim = cand.shape
                sim = qf[qi] @ cand.reshape(r * ld, dim).T        # [Lq, r*Ld]
                sim = np.where(cmask[None].reshape(1, r * ld), sim, -1e9)
                per_tok = sim.reshape(-1, r, ld).max(axis=-1)     # [Lq, r]
                exact[qi] = np.where(valid[qi], per_tok.sum(axis=0), -np.inf)
            k = min(hits, exact.shape[1])
            idx = np.argsort(-exact, kind="stable", axis=1)[:, :k]
            return np.take_along_axis(exact, idx, 1), np.take_along_axis(o, idx, 1)

        return topk

    def _search_all(self, topicsfn, output_path):
        from capreolus_tpu.searcher.tpu import _load_topics_tsv

        topics = _load_topics_tsv(topicsfn)
        topk, corpus, n = self.build_topk(int(self.config["hits"]))
        docid_strings = self.index.data.docid_strings

        model, variables = self._encoder()
        run = OrderedDict()
        batch = int(self.config["batch"])
        maxqlen = int(self.config["maxqlen"])
        for start in range(0, len(topics), batch):
            chunk_topics = topics[start : start + batch]
            toks = self._tokenize([t for _, t in chunk_topics], maxqlen)
            if len(toks) < batch:
                toks = np.concatenate([toks, np.zeros((batch - len(toks), maxqlen), np.int32)])
            q_emb, _ = self._encode_query_jit(variables, toks)
            scores, ords = topk(q_emb, *corpus)
            scores, ords = np.asarray(scores), np.asarray(ords)
            for qi, (qid, _) in enumerate(chunk_topics):
                run[qid] = {docid_strings[int(o)]: float(s)
                            for s, o in zip(scores[qi], ords[qi])
                            if int(o) < n and np.isfinite(s)}

        outfn = output_path / f"searcher_colbert_dim-{self.config['dim']}"
        self._write_run(run, outfn)

    def _prefilter_topk(self, corpus, n, hits, n_cand, chunk):
        """Two-stage MaxSim (PLAID-pattern candidate generation): stage 1 scores
        every doc with ONE [Q, dim] x [dim, N] matmul — sum_i q_i . dbar, where
        dbar is the doc's mean valid-token embedding (sum over query tokens
        commutes into a single pooled query vector) — and keeps the top n_cand;
        stage 2 gathers only those docs' token embeddings and scores exact
        MaxSim. Approximate overall (stage 1 is a heuristic, not a bound);
        overlap vs exact is pinned in tests. With quantize=int8 stage 1
        dequantizes inside the pooling reduction (fused by XLA, no bf16 corpus
        materializes) and stage 2 runs the gathered candidates on the int8 MXU."""
        import jax
        import jax.numpy as jnp

        hits = min(hits, n_cand)
        cch = min(chunk, n_cand)
        pad_c = (-n_cand) % cch
        n_cand_pad = n_cand + pad_c
        nchunks = n_cand_pad // cch
        quantized = len(corpus) == 3

        @jax.jit
        def topk(q_emb, docs, dmask, dscale=None):
            # pooled per-doc mean embedding computed in-jit from the jit ARGUMENT
            # tensors (a closure-captured [N, dim] constant would go into the
            # remote-compile payload — CLAUDE.md convention); one cheap reduction
            m = (dmask > 0).astype(jnp.bfloat16)[..., None]
            d_f = docs if not quantized else \
                docs.astype(jnp.bfloat16) * dscale.astype(jnp.bfloat16)[:, None, None]
            pooled = (d_f * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)  # [Npad, dim]
            qsum = q_emb.astype(jnp.bfloat16).sum(axis=1)                 # [Q, dim]
            s1 = jnp.einsum("qe,ne->qn", qsum, pooled,
                            preferred_element_type=jnp.float32)
            s1 = jnp.where(jnp.arange(docs.shape[0])[None, :] < n, s1, -jnp.inf)
            _, cand = jax.lax.top_k(s1, n_cand)                           # [Q, n_cand]
            if pad_c:  # pad with repeats of the last candidate (dedup'd by rank)
                cand = jnp.concatenate(
                    [cand, jnp.broadcast_to(cand[:, -1:], (cand.shape[0], pad_c))], axis=1)
            cand_r = jnp.moveaxis(cand.reshape(-1, nchunks, cch), 1, 0)   # [nchunks, Q, cch]

            if quantized:
                from capreolus_tpu.ops.quantization import quantize_rows_jnp

                q_i8, qscale = quantize_rows_jnp(q_emb)

            def chunk_scores(c_slice):                                    # [Q, cch]
                d = docs[c_slice]                                         # [Q, cch, Ld, dim]
                mm = dmask[c_slice]                                       # [Q, cch, Ld]
                if quantized:
                    sim = jnp.einsum("qle,qcke->qclk", q_i8, d,
                                     preferred_element_type=jnp.int32)
                    sim = jnp.where(mm[:, :, None, :] > 0, sim, jnp.int32(-(2 ** 30)))
                    per_q = sim.max(axis=-1).astype(jnp.float32).sum(axis=-1) \
                        * qscale[:, None] * dscale[c_slice]               # [Q, cch]
                else:
                    sim = jnp.einsum("qle,qcke->qclk", q_emb.astype(jnp.bfloat16), d,
                                     preferred_element_type=jnp.float32)
                    sim = jnp.where(mm[:, :, None, :] > 0, sim, -1e9)
                    per_q = sim.max(axis=-1).sum(axis=-1)                 # [Q, cch]
                return jnp.where(mm.any(axis=-1), per_q, -jnp.inf)

            s2 = jax.lax.map(chunk_scores, cand_r)                        # [nchunks, Q, cch]
            s2 = jnp.moveaxis(s2, 0, 1).reshape(q_emb.shape[0], -1)       # [Q, n_cand_pad]
            # repeats from pad_c must not yield duplicate docids in the result:
            # keep only the FIRST occurrence per candidate
            order = jnp.argsort(cand, axis=1, stable=True)
            sorted_cand = jnp.take_along_axis(cand, order, axis=1)
            is_first = jnp.concatenate(
                [jnp.ones_like(sorted_cand[:, :1], dtype=bool),
                 sorted_cand[:, 1:] != sorted_cand[:, :-1]], axis=1)
            first = jnp.zeros_like(is_first).at[
                jnp.arange(cand.shape[0])[:, None], order].set(is_first)
            s2 = jnp.where(first, s2, -jnp.inf)
            ms, idx = jax.lax.top_k(s2, hits)
            return ms, jnp.take_along_axis(cand, idx, axis=1)

        return topk

    def _streamed_topk(self, emb, mask, scale, n, hits, chunk, chunked_scores):
        """Host-streaming exact MaxSim for corpora larger than hbmbudget: the
        token-embedding tensor stays in host RAM; per query batch, fixed-shape
        upload slices (a multiple of the scoring chunk) are folded into a
        running on-device top-k. Async dispatch pipelines upload i+1 under the
        scoring of slice i. Equality vs the resident engine is pinned in
        tests/test_colbert.py; the sparse analogue is scoring.py
        _stream_working_set, the dense analogue dense.py _streamed_topk."""
        import jax
        import jax.numpy as jnp
        import ml_dtypes

        from capreolus_tpu.searcher.streamed import pad_rows, streamed_topk

        ld = mask.shape[1]
        dim = int(self.config["dim"])
        # int8 disk caches arrive row-flattened [N, Ld*dim]; bf16-mode arrives
        # as the f16 mmap (converted to bf16 per upload slice — same values the
        # resident path uploads, half the stream bytes of f32)
        flat = emb.ndim == 2 and scale is not None
        to_bf16 = scale is None and emb.dtype == np.float16
        budget_bytes = float(_hbm_budget_mb(self.config)) * 1e6
        row_bytes = ld * dim * (2 if to_bf16 else emb.dtype.itemsize) + mask.shape[1] \
            + (4 if scale is not None else 0)
        per_upload = int(max(1, budget_bytes // 2 // row_bytes))  # double buffering
        upload = max(chunk, per_upload - per_upload % chunk)  # multiple of the scoring chunk

        def make_chunk(start):
            rows = pad_rows(np.asarray(emb[start : start + upload]), upload)
            if flat:
                rows = rows.reshape(upload, ld, dim)
            if to_bf16:
                rows = rows.astype(ml_dtypes.bfloat16)
            parts = [jnp.asarray(rows),
                     jnp.asarray(pad_rows(np.asarray(mask[start : start + upload]), upload))]
            if scale is not None:
                parts.append(jnp.asarray(pad_rows(np.asarray(scale[start : start + upload]),
                                                  upload, fill=1)))
            return tuple(parts)

        logger.info("streaming colbert search: %d-doc upload slices (%.0f MB each), %d/query-batch",
                    upload, upload * row_bytes / 1e6, -(-n // upload))
        return streamed_topk(make_chunk, lambda q_emb, c: chunked_scores(q_emb, *c),
                             n, upload, hits)

    def _sharded_topk(self, corpus, n, hits, shards, chunked_scores):
        """Doc-partitioned MaxSim over a 'shard' mesh: each chip scores its slice
        of the token-embedding tensor chunk-by-chunk and takes a local top-k;
        candidates merge with an allgather over ICI (the same pattern as the
        sparse engine's index sharding and dense.py's _sharded_topk). With
        quantize=int8 each shard holds its slice of the int8 tensor + per-doc
        scales (half the HBM per shard => twice the corpus per pod)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devices = jax.devices()
        if len(devices) < shards:
            raise ValueError(f"searcher.shards={shards} but only {len(devices)} devices are available")
        mesh = Mesh(np.array(devices[:shards]), ("shard",))
        corpus_specs = (P("shard", None, None), P("shard", None)) + \
            ((P("shard"),) if len(corpus) == 3 else ())
        corpus_sharded = tuple(jax.device_put(x, NamedSharding(mesh, spec))
                               for x, spec in zip(corpus, corpus_specs))
        per_shard = corpus[0].shape[0] // shards
        local_k = min(hits, per_shard)

        def shard_fn(q_emb, *corpus_local):
            scores = chunked_scores(q_emb, *corpus_local)  # [Q, per_shard]
            s, o = jax.lax.top_k(scores, local_k)
            shard_id = jax.lax.axis_index("shard")
            o = o + shard_id * per_shard  # local ordinal -> global
            s = jnp.where(o < n, s, -jnp.inf)  # shard-pad docs must never win
            s_all = jax.lax.all_gather(s, "shard", axis=1, tiled=True)
            o_all = jax.lax.all_gather(o, "shard", axis=1, tiled=True)
            ms, idx = jax.lax.top_k(s_all, hits)
            return ms, jnp.take_along_axis(o_all, idx, axis=1)

        # outputs ARE replicated (every shard merges the same allgathered
        # candidates); the static checker cannot infer it: check_vma=False
        mapped = jax.shard_map(shard_fn, mesh=mesh,
                               in_specs=(P(),) + corpus_specs,
                               out_specs=(P(), P()), check_vma=False)

        @jax.jit
        def topk(q_emb, *corpus_sharded):
            return mapped(q_emb, *corpus_sharded)

        return topk, corpus_sharded

    def _write_run(self, run, outfn):
        with open(outfn, "wt", encoding="utf-8") as f:
            for qid, docs_ in run.items():
                for rank, (docid, score) in enumerate(docs_.items(), start=1):
                    f.write(f"{qid} Q0 {docid} {rank} {score:.6f} capreolus_tpu\n")
        logger.info("wrote colbert run file %s (%d queries)", outfn, len(run))
