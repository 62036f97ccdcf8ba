"""Learned-sparse impact retrieval (uniCOIL/DeepImpact family): a trained
term-weighting encoder's document impacts are quantized into an inverted index
and served by the SAME tiled postings engine as BM25.

Beyond the reference (whose sparse retrieval is purely statistical through
Anserini, /root/reference/capreolus/searcher/anserini.py:26-83) but built on
its architecture: Anserini serves learned-sparse models from quantized-impact
Lucene indexes the same way, so this is the natural TPU-native counterpart —
impacts become the ``tf`` payload of the existing CSR tiles and scoring is the
``impact`` model (score = sum_t qweight(t) * impact(t, d), searcher/scoring.py
_impact), i.e. one elementwise multiply instead of the BM25 formula, on an
engine that already does exact tiered top-k, maxpostings early termination,
and host-streaming.

Pipeline:

    rerank.train with reranker.name=unicoil ...      # train the encoder
    rank.searcheval with searcher.name=impact \
        searcher.checkpointfile=.../dev.best.params  # index + retrieve

Zero train/serve skew: the reranker scores exact-match qw_i * max dw_j per
query position (reranker/unicoil.py), and this searcher aggregates document
impacts with MAX over token occurrences and query weights with SUM — the same
number, up to the b-bit impact quantization (Anserini quantizes to 8 bits the
same way).
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

from capreolus_tpu.core import ConfigOption, Dependency
from capreolus_tpu.searcher import Searcher
from capreolus_tpu.utils.caching import done_file
from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)


@Searcher.register
class ImpactSearcher(Searcher):
    """End-to-end learned-sparse retrieval over a quantized impact index."""

    module_name = "impact"
    dependencies = [
        Dependency(key="index", module="index", name="tpu"),
        Dependency(key="tokenizer", module="tokenizer", name="berttokenizer"),
    ]
    config_spec = [
        ConfigOption("pretrained", "tiny", "encoder checkpoint (bert names; 'tiny' for offline smoke)"),
        ConfigOption("encoder", "unicoil", "weighting family: 'unicoil' (exact-match token "
                     "weights, reranker/unicoil.py) or 'splade' (vocab-expansion "
                     "representations, reranker/splade.py — docs may be indexed under "
                     "terms they never contain)"),
        ConfigOption("topterms", 256, "splade only: per-document expansion terms kept "
                     "(highest-weight vocab entries); queries keep at most the same count",
                     value_type="int"),
        ConfigOption("checkpointfile", None, "trained unicoil/splade checkpoint (dev.best.params) "
                     "providing the 'bert' encoder and the weighting head "
                     "('tokweight' for unicoil, 'mlm' for splade)"),
        ConfigOption("maxdoclen", 256, "document tokens fed to the encoder"),
        ConfigOption("maxqlen", 32, "query tokens fed to the encoder"),
        ConfigOption("batch", 128, "encoding batch size"),
        ConfigOption("hits", 1000, "number of results"),
        ConfigOption("quantbits", 8, "impact quantization bits (Anserini-style linear "
                     "quantization to 2^b - 1 levels over the corpus max impact)", value_type="int"),
        ConfigOption("maxpostings", 0, "impact-ordered early termination: score only each "
                     "term's N highest-impact postings (0 = exact)", value_type="int"),
        ConfigOption("hbmbudget", 12000.0, "HBM budget (MB) for the resident impact tiles; "
                     "corpora above it host-stream per-batch working sets, same engine "
                     "machinery as BM25 (searcher/scoring.py streaming mode)"),
        ConfigOption("allowrandominit", False, "allow a randomly-initialized encoder when the "
                     "checkpoint cannot be loaded (smoke tests only)"),
        ConfigOption("gelu", "tanh", "GELU variant — must match the checkpoint's training "
                     "config (reranker.gelu) or serving weights diverge from the trained model"),
    ]
    config_keys_not_in_path = ["batch", "hbmbudget"]  # results-invariant (streaming equality pinned)

    def build(self):
        from capreolus_tpu.core import ConfigError

        if not 1 <= int(self.config["quantbits"]) <= 16:
            raise ConfigError(f"impact quantbits must be in [1, 16], got {self.config['quantbits']}")
        if self.config["encoder"] not in ("unicoil", "splade"):
            raise ConfigError(f"impact encoder must be 'unicoil' or 'splade', "
                              f"got {self.config['encoder']!r}")
        if self.config["gelu"] not in ("tanh", "erf"):
            raise ConfigError(f"impact gelu must be 'tanh' or 'erf', got {self.config['gelu']!r}")

    # ------------------------------------------------------------------ encoder
    def _encoder(self):
        """(variables, weight_fn). unicoil: weight_fn(vs, inp, mask) -> [B, L]
        per-position token weights (0 on pads). splade: -> [B, V] per-vocab
        expansion representations (log1p(relu(mlm logits)) max-pooled)."""
        if getattr(self, "_enc", None) is None:
            import flax.linen as nn
            import jax
            import jax.numpy as jnp

            from capreolus_tpu.reranker.bert.encoder import BertEncoder, load_pretrained_encoder

            name = self.config["pretrained"]
            splade = self.config["encoder"] == "splade"
            cfg, params = load_pretrained_encoder(
                name, allow_random_init=bool(self.config["allowrandominit"]) or name == "tiny")
            # honor the checkpoint's GELU variant (reranker.gelu at training
            # time) — a mismatched activation silently breaks score parity
            import dataclasses as _dc

            cfg = _dc.replace(cfg, gelu_approximate=(self.config["gelu"] == "tanh"))
            model = BertEncoder(cfg)
            self._random_init = params is None
            rng = jax.random.PRNGKey(0)
            dummy = np.zeros((1, 8), dtype=np.int32)
            if params is None:
                params = model.init(rng, dummy, np.ones_like(dummy))["params"]
                if name != "tiny":
                    logger.warning("impact encoder %s running from RANDOM init", name)
            # the weighting head: restored from the checkpoint, else PRNGKey(0)
            head_key = "mlm" if splade else "tokweight"
            if splade:
                from capreolus_tpu.reranker.splade import MlmHead

                head = MlmHead(cfg.hidden_size, int(self.tokenizer.vocab_size),
                               gelu_approximate=cfg.gelu_approximate,
                               layer_norm_eps=cfg.layer_norm_eps)
            else:
                head = nn.Dense(1)
            head_params = head.init(rng, np.zeros((1, cfg.hidden_size), np.float32))["params"]

            ckpt = self.config.get("checkpointfile")
            if ckpt:
                from capreolus_tpu.utils.sharded_ckpt import restore_params

                # flat flax msgpack file OR a trainer.ckpt=sharded directory
                restored = restore_params(ckpt)
                tree = restored.get("params", restored)
                missing = [k for k in ("bert", head_key) if k not in tree]
                if missing:
                    raise ValueError(f"checkpoint {ckpt} lacks {missing} (top-level keys: "
                                     f"{sorted(tree)[:8]}); expected a trained "
                                     f"{self.config['encoder']} checkpoint")
                params = jax.tree_util.tree_map(np.asarray, tree["bert"])
                restored_head = jax.tree_util.tree_map(np.asarray, tree[head_key])
                # fail actionably on a structurally-different head (e.g. a
                # splade checkpoint from before the MLM-head architecture) —
                # otherwise the mismatch surfaces as an opaque flax scope
                # error inside jit on the first query
                if isinstance(restored_head, dict) and set(restored_head) != set(head_params):
                    raise ValueError(
                        f"checkpoint {ckpt}'s '{head_key}' head has submodules "
                        f"{sorted(restored_head)} but this version expects "
                        f"{sorted(head_params)}; the checkpoint predates the current "
                        f"head architecture — retrain or use the matching version")
                head_params = restored_head
                self._random_init = False
                logger.info("impact encoder + %s head restored from %s", head_key, ckpt)

            variables = {"encoder": {"params": params}, "head": {"params": head_params}}
            cls_id, sep_id = int(self.tokenizer.cls_id), int(self.tokenizer.sep_id)

            if splade:
                def weight_fn(vs, inp, mask):
                    hidden, _, _ = model.apply(vs["encoder"], inp, mask)
                    logits = head.apply(vs["head"], hidden.astype(jnp.float32))
                    w = jnp.log1p(nn.relu(logits))  # [B, L, V]
                    valid = (mask != 0) & (inp != cls_id) & (inp != sep_id)
                    return jnp.max(jnp.where(valid[..., None], w, 0.0), axis=1)
            else:
                def weight_fn(vs, inp, mask):
                    hidden, _, _ = model.apply(vs["encoder"], inp, mask)
                    w = nn.relu(head.apply(vs["head"], hidden.astype(jnp.float32))[..., 0])
                    return w * mask.astype(jnp.float32)

            self._weight_jit = jax.jit(weight_fn)
            self._enc = variables
        return self._enc, self._weight_jit

    def _encode_batches(self, texts, maxlen):
        """Tokenize + run the weighting head; yields (inp, out) per batch —
        out is [B, L] token weights (unicoil) or [B, V] reps (splade)."""
        variables, weight_fn = self._encoder()
        tok = self.tokenizer
        batch = int(self.config["batch"])
        for start in range(0, len(texts), batch):
            chunk = texts[start : start + batch]
            inp = np.zeros((batch, maxlen), dtype=np.int32)
            mask = np.zeros((batch, maxlen), dtype=np.int32)
            for i, text in enumerate(chunk):
                ids = [tok.cls_id] + tok.convert_tokens_to_ids(tok.tokenize(text or "")[: maxlen - 2]) + [tok.sep_id]
                inp[i, : len(ids)] = ids
                mask[i, : len(ids)] = 1
            yield len(chunk), inp, np.asarray(weight_fn(variables, inp, mask))

    def _token_weights(self, texts, maxlen):
        """unicoil: list of (ids [L] int32, weights [L] f32) per text with
        [CLS]/[SEP]/[PAD] positions zeroed (they never score — unicoil.py)."""
        tok = self.tokenizer
        out = []
        for n, inp, w in self._encode_batches(texts, maxlen):
            special = (inp == tok.cls_id) | (inp == tok.sep_id) | (inp == tok.pad_id)
            w = np.where(special, 0.0, w)
            out.extend((inp[i], w[i]) for i in range(n))
        return out

    def _sparse_reps(self, texts, maxlen):
        """splade: list of (term_ids, weights) per text — the top ``topterms``
        nonzero vocab entries of the expansion representation (the learned
        sparsity bound; Anserini caps SPLADE postings the same way)."""
        cap = max(1, int(self.config["topterms"]))
        out = []
        for n, _, reps in self._encode_batches(texts, maxlen):
            for i in range(n):
                row = reps[i]
                nz = np.nonzero(row > 0)[0]
                if len(nz) > cap:
                    nz = nz[np.argpartition(-row[nz], cap - 1)[:cap]]
                order = np.argsort(nz)
                out.append((nz[order].astype(np.int64), row[nz[order]].astype(np.float32)))
        return out

    def _doc_term_weights(self, texts):
        """Per-document (term_ids, impacts): unicoil aggregates MAX over token
        occurrences; splade representations are already per-term maxes."""
        maxdoclen = int(self.config["maxdoclen"])
        if self.config["encoder"] == "splade":
            return self._sparse_reps(texts, maxdoclen)
        out = []
        for ids, w in self._token_weights(texts, maxdoclen):
            keep = w > 0
            ids, w = ids[keep], w[keep]
            if len(ids):
                order = np.argsort(ids, kind="stable")
                ids, w = ids[order], w[order]
                uniq, start = np.unique(ids, return_index=True)
                impacts = np.maximum.reduceat(w, start).astype(np.float32)
            else:
                uniq = np.zeros(0, np.int64)
                impacts = np.zeros(0, np.float32)
            out.append((uniq.astype(np.int64), impacts))
        return out

    # ------------------------------------------------------------------ impact index
    def _cache_file(self):
        """Keyed by everything that affects the impacts: encoder identity
        (incl. checkpoint content), tokenizer, maxdoclen, quantbits, and a
        random-init marker (same disjointness rule as the dense embedding
        cache, searcher/dense.py)."""
        import hashlib
        import os as _os

        self._encoder()
        # "rawdocmajor" marks the round-4 cache format: RAW float impacts in
        # doc-major order (quantization happens at load), so incremental merges
        # can re-quantize over the new corpus max without re-encoding anything
        parts = [self.config["pretrained"], self.config["encoder"], self.config["gelu"],
                 str(self.config["topterms"]), str(self.config["maxdoclen"]),
                 "rawdocmajor", self.tokenizer.fingerprint,
                 "randominit" if getattr(self, "_random_init", False) else "pretrained"]
        ckpt = self.config.get("checkpointfile")
        if ckpt:
            st = _os.stat(ckpt)
            parts += [str(ckpt), str(st.st_size), str(st.st_mtime_ns)]
        key = hashlib.md5("|".join(parts).encode()).hexdigest()[:16]
        return self.index.get_cache_path() / "impact" / f"impact_raw_{key}.npz"

    def _encode_doc_major(self, docids):
        """Encode documents into doc-major raw-impact arrays:
        (doc_offsets [n+1], term_ids [P], raw_impacts f32 [P])."""
        texts = [self.index.get_doc(d) for d in docids]
        logger.info("encoding %d documents for the impact index (%s, %s)",
                    len(texts), self.config["encoder"], self.config["pretrained"])
        per_doc = self._doc_term_weights(texts)
        offs = np.zeros(len(texts) + 1, dtype=np.int64)
        terms, raws = [], []
        for i, (uniq, impacts) in enumerate(per_doc):
            offs[i + 1] = offs[i] + len(uniq)
            terms.append(np.asarray(uniq, np.int64))
            raws.append(np.asarray(impacts, np.float32))
        return (offs,
                np.concatenate(terms) if terms else np.zeros(0, np.int64),
                np.concatenate(raws) if raws else np.zeros(0, np.float32))

    def _raw_doc_major(self, docid_strings, gen):
        """Load or build the generation's raw doc-major cache, reusing the
        previous generation's rows for surviving documents (only added docs are
        encoded — embedding_cache.py semantics for a variable-length layout)."""
        from capreolus_tpu.searcher import embedding_cache as ec

        base_fn = self._cache_file()
        cache_fn = ec.generation_path(base_fn, gen)
        if cache_fn.exists():
            # repair a crash-orphaned sidecar so the NEXT generation can still
            # remap from this cache instead of re-encoding the whole corpus
            ec.write_docids(cache_fn, docid_strings)
            z = np.load(cache_fn)
            return z["doc_offsets"], z["term_ids"], z["raw_impacts"]
        prev, prev_gen = ec.find_previous(base_fn, gen)
        if prev is not None:
            src_probe = ec.row_sources(ec.read_docids(prev), docid_strings)
            with np.load(prev) as zp:
                prev_rows = len(zp["doc_offsets"]) - 1
            if ec.identity_remap(src_probe, prev_rows):
                ec.link_identical(prev, cache_fn)
                ec.write_docids(cache_fn, docid_strings)
                ec.prune_old_generations(base_fn, gen)
                z = np.load(cache_fn)
                return z["doc_offsets"], z["term_ids"], z["raw_impacts"]
        if prev is None:
            offs, terms, raw = self._encode_doc_major(docid_strings)
        else:
            z = np.load(prev)
            old_offs, old_terms, old_raw = z["doc_offsets"], z["term_ids"], z["raw_impacts"]
            src = ec.row_sources(ec.read_docids(prev), docid_strings)
            keep = src >= 0
            new_idx = np.flatnonzero(~keep)
            if len(new_idx):
                e_offs, e_terms, e_raw = self._encode_doc_major(
                    [docid_strings[i] for i in new_idx])
            else:
                e_offs = np.zeros(1, np.int64)
                e_terms, e_raw = np.zeros(0, np.int64), np.zeros(0, np.float32)
            # one vectorized gather from [old ++ encoded]: per-doc source starts
            # + within-doc offsets (the same repeat trick the tier builder uses)
            n = len(docid_strings)
            lengths = np.zeros(n, dtype=np.int64)
            lengths[keep] = (old_offs[1:] - old_offs[:-1])[src[keep]]
            lengths[new_idx] = e_offs[1:] - e_offs[:-1]
            starts = np.zeros(n, dtype=np.int64)
            starts[keep] = old_offs[:-1][src[keep]]
            starts[new_idx] = len(old_terms) + e_offs[:-1]
            offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lengths, out=offs[1:])
            total = int(offs[-1])
            within = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], lengths)
            gather = np.repeat(starts, lengths) + within
            terms = np.concatenate([old_terms, e_terms])[gather]
            raw = np.concatenate([old_raw, e_raw])[gather]
            logger.info("impact cache gen %d built from gen %d: reused %d docs, "
                        "encoded %d new", gen, prev_gen, int(keep.sum()), len(new_idx))
        from capreolus_tpu.utils.caching import TargetFileExists, cached_file

        try:
            with cached_file(cache_fn, "wb") as f:
                np.savez(f, doc_offsets=offs, term_ids=terms, raw_impacts=raw)
        except TargetFileExists:
            pass
        ec.write_docids(cache_fn, docid_strings)
        ec.prune_old_generations(base_fn, gen)
        return offs, terms, raw

    def _impact_index(self):
        """Build (or load) the quantized impact CSR and wrap it in the shared
        scoring engine. Returns (engine, docid_strings, scale). Generation-
        aware: incremental index merges invalidate the engine and re-derive the
        CSR from the (incrementally maintained) raw doc-major cache."""
        self.index.create_index()
        docid_strings = list(self.index.data.docid_strings)  # merges pending ops
        gen = getattr(self.index, "_loaded_generation", 0)
        cached = getattr(self, "_engine", None)
        if cached is not None and getattr(self, "_engine_gen", 0) == gen:
            return cached
        offs, term_ids_raw, raw = self._raw_doc_major(docid_strings, gen)
        term_offsets, doc_ids, q_impacts, doclens, scale = self._csr_from_doc_major(
            offs, term_ids_raw, raw, len(docid_strings))

        from capreolus_tpu.index.smallfloat import quantize_lengths
        from capreolus_tpu.index.tpu import IndexData
        from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine

        data = IndexData(
            term_offsets=term_offsets,
            doc_ids=doc_ids,
            tfs=q_impacts,
            doclens=doclens,
            norm_doclens=quantize_lengths(np.maximum(doclens, 1)),
            docid_strings=docid_strings,
            vocab=dict(getattr(self.tokenizer, "vocab", {}) or {}),
        )
        budget = float(self.config["hbmbudget"])
        engine = ScoringEngine(DeviceIndex(
            data, hbm_budget=budget * 1e6 if budget > 0 else None))
        result = (engine, docid_strings, scale)
        self._engine_gen = gen
        # Single assignment last: a concurrent reader sees either the old
        # complete tuple or the new one, never None/half-built state.
        self._engine = result
        return result

    def _csr_from_doc_major(self, doc_offsets, term_ids, raw_impacts, num_docs):
        """Quantize raw impacts and build the (term-major, impact-desc) CSR.

        Document term impact = MAX weight over token occurrences; quantization
        is Anserini-style linear over the corpus max: q = round(w * scale),
        scale = (2^b - 1) / max_w; zero-quantized postings are dropped. Runs at
        every load from the raw doc-major cache (cheap numpy over O(postings)),
        so an incremental merge that raises the corpus max re-quantizes the
        whole corpus exactly like a fresh build would."""
        vocab_size = int(term_ids.max()) + 1 if len(term_ids) else 0
        max_w = float(raw_impacts.max()) if len(raw_impacts) else 0.0
        levels = (1 << int(self.config["quantbits"])) - 1
        scale = levels / max_w if max_w > 0 else 1.0
        quants = np.rint(raw_impacts * scale).astype(np.int32)
        lengths = doc_offsets[1:] - doc_offsets[:-1]
        docs = np.repeat(np.arange(num_docs, dtype=np.int32), lengths)
        keep = quants > 0
        terms, docs, quants = term_ids[keep], docs[keep], quants[keep]
        # term-major, impact descending within term (maxpostings-compatible),
        # doc ascending among impact ties (deterministic)
        order = np.lexsort((docs, -quants, terms))
        terms, docs, quants = terms[order], docs[order], quants[order]
        term_offsets = np.zeros(vocab_size + 1, dtype=np.int64)
        np.add.at(term_offsets, terms + 1, 1)
        term_offsets = np.cumsum(term_offsets)
        doclens = np.zeros(num_docs, dtype=np.int32)
        ordc, counts = np.unique(docs, return_counts=True)
        doclens[ordc] = counts
        logger.info("impact index: %d postings over %d terms (scale %.3f, %d-bit)",
                    len(docs), vocab_size, scale, int(self.config["quantbits"]))
        return term_offsets, docs.astype(np.int32), quants, doclens, scale

    # ------------------------------------------------------------------ search
    def query_weights_batch(self, query_texts):
        """Per query, [(term_id, weight)] — ONE encoder forward for the whole
        batch (per-query calls would each pay a full batch-row BERT forward of
        padding). unicoil: SUM of token weights per unique term (matches the
        reranker's per-position sum, unicoil.py); splade: the query's expansion
        representation (per-term max, splade.py)."""
        maxqlen = int(self.config["maxqlen"])
        if self.config["encoder"] == "splade":
            return [list(zip(ids.tolist(), w.tolist()))
                    for ids, w in self._sparse_reps(query_texts, maxqlen)]
        results = []
        for ids, w in self._token_weights(query_texts, maxqlen):
            keep = w > 0
            ids, w = ids[keep], w[keep]
            out = {}
            for t, x in zip(ids.tolist(), w.tolist()):
                out[t] = out.get(t, 0.0) + x
            results.append(sorted(out.items()))
        return results

    def query_weights(self, query_text):
        """Single-query convenience wrapper over query_weights_batch."""
        return self.query_weights_batch([query_text])[0]

    def query_from_file(self, topicsfn, output_path):
        from pathlib import Path

        output_path = Path(output_path)
        with done_file(output_path) as already:
            if not already:
                self._search_all(Path(topicsfn), output_path)
        return output_path

    def _search_all(self, topicsfn, output_path):
        from capreolus_tpu.searcher.tpu import _load_topics_tsv

        topics = _load_topics_tsv(topicsfn)
        engine, docid_strings, scale = self._impact_index()
        hits = int(self.config["hits"])
        n_docs = len(docid_strings)
        run = OrderedDict()
        batch = max(1, int(self.config["batch"]))
        for start in range(0, len(topics), batch):
            chunk = topics[start : start + batch]
            # fold the dequantization into the query weights so returned
            # scores are the true (quantized-impact) dot products; drop query
            # terms outside the indexed vocabulary (df = 0 or id beyond the
            # corpus max — they cannot contribute)
            nt = engine.dindex.num_terms
            offs = engine.dindex.term_offsets
            term_lists = [[(t, w / scale) for t, w in qw
                           if t < nt and offs[t + 1] > offs[t]]
                          for qw in self.query_weights_batch([text for _, text in chunk])]
            scores, ords = engine.search(
                term_lists, model="impact", params={}, topk=hits,
                max_postings_per_term=int(self.config["maxpostings"]))
            for qi, (qid, _) in enumerate(chunk):
                run[qid] = {docid_strings[int(o)]: float(s)
                            for s, o in zip(scores[qi], ords[qi])
                            if int(o) < n_docs and s > 0.0}
        outfn = output_path / "searcher_impact"
        with open(outfn, "wt", encoding="utf-8") as f:
            for qid, docs_ in run.items():
                for rank, (docid, score) in enumerate(docs_.items(), start=1):
                    f.write(f"{qid} Q0 {docid} {rank} {score:.6f} capreolus_tpu\n")
        logger.info("wrote impact run file %s (%d queries)", outfn, len(run))
