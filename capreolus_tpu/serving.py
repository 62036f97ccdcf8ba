"""Serving API: low-latency batched retrieve(-then-rerank) over a built index.

The reference stops at experiment pipelines; this framework is also intended for
production serving, so the engine is exposed as a service object that keeps the
index in HBM, the analyzer/native tokenizer warm, and (optionally) a trained
reranker's parameters resident:

    from capreolus_tpu.serving import RetrievalService
    svc = RetrievalService.from_config(collection="nf")
    hits = svc.search(["dietary supplements cancer prevention"], k=10)

Batches are formed transparently; results are (docid, score) lists per query.
"""

from __future__ import annotations

from collections import Counter
from typing import List, Optional, Sequence, Tuple

from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)


class RetrievalService:
    def __init__(self, index, model: str = "bm25", params: Optional[dict] = None, batch_size: int = 64,
                 hbm_budget_mb: float = 12000.0, pruning: bool = True, shards: int = 0):
        from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine

        index.create_index()
        self.index = index
        self.model = model
        self.params = dict(params or {"k1": 0.9, "b": 0.4})
        self.batch_size = batch_size
        # serving is the synchronous low-latency regime where exact block-max
        # pruning pays (measured 1.58x per batch at 2M docs, PERF.md round 3);
        # the engine's A/B probe still auto-disables it when it does not
        self.pruning = bool(pruning)
        self._generation = getattr(index, "generation", 0)
        self._hbm_budget_mb = hbm_budget_mb
        # multi-chip serving: shards>1 doc-partitions the postings over a
        # 'shard' mesh axis; each chip scores its partition and the per-shard
        # top-k merge rides an ICI allgather (parallel/sharded_search.py).
        # Block-max pruning is a single-device span structure and doesn't
        # compose with the sharded path — the partitioning itself is the win.
        self.shards = int(shards)
        if self.shards > 1:
            self.engine = None
            self._build_sharded(index.data)
        else:
            self._sindex = None
            self.engine = ScoringEngine(DeviceIndex(
                index.data, hbm_budget=hbm_budget_mb * 1e6 if hbm_budget_mb > 0 else None))

    def _build_sharded(self, data):
        import jax
        import numpy as np
        from jax.sharding import Mesh

        from capreolus_tpu.parallel.sharded_search import ShardedDeviceIndex

        devices = jax.devices()
        if len(devices) < self.shards:
            raise ValueError(f"shards={self.shards} but only {len(devices)} devices present")
        mesh = Mesh(np.array(devices[: self.shards]), ("shard",))
        self._sindex = ShardedDeviceIndex(data, mesh)
        self._shard_host = data

    @property
    def _docids(self):
        if self._sindex is not None:
            return self._shard_host.docid_strings
        return self.engine.dindex.host.docid_strings

    def refresh(self) -> bool:
        """NRT reopen (Lucene's SearcherManager.maybeRefresh): merge any
        pending incremental index ops (TpuIndex.add/delete_documents) and swap
        in a fresh engine over the new generation. Returns True when the
        served index changed. In-flight searches keep the old engine — the
        swap is one reference assignment."""
        from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine

        if hasattr(self.index, "refresh"):
            self.index.refresh()
        gen = getattr(self.index, "generation", 0)
        if gen == self._generation:
            return False
        data = self.index.data
        if self._sindex is not None:
            self._build_sharded(data)
        else:
            self.engine = ScoringEngine(DeviceIndex(
                data, hbm_budget=self._hbm_budget_mb * 1e6 if self._hbm_budget_mb > 0 else None))
        self._generation = gen
        return True

    @classmethod
    def from_config(cls, collection: str = "dummy", collection_path: Optional[str] = None,
                    model: str = "bm25", params: Optional[dict] = None, shards: int = 0,
                    **index_config):
        import capreolus_tpu

        capreolus_tpu.load_all_modules()
        from capreolus_tpu.index import Index

        coll_cfg = {"name": collection}
        if collection_path:
            coll_cfg["path"] = collection_path
        index = Index.create("tpu", {**index_config, "collection": coll_cfg})
        return cls(index, model=model, params=params, shards=shards)

    def _analyze(self, query: str, vocab=None):
        if vocab is None:
            vocab = self.index.data.vocab
        counts = Counter(self.index.analyze(query))
        return [(vocab[t], float(c)) for t, c in counts.items() if t in vocab]

    def search_async(self, queries: Sequence[str], k: int = 10):
        """Dispatch-now / collect-later variant of ``search`` (identical
        results): the device work and the async result fetch are already in
        flight when this returns, and the returned zero-arg callable
        materializes the hit lists. A pipelining caller (MicroBatcher) can
        dispatch the NEXT batch while this one's results cross the wire, so
        at saturation the per-call device round-trip overlaps compute
        instead of serializing with it (PERF.md round-4 serving economics)."""
        if self._sindex is not None:
            return self._search_async_sharded(queries, k)
        # point-in-time view: vocab/docids come from the ENGINE's own host
        # data so a concurrent refresh() can never mix generations
        engine = self.engine
        host = engine.dindex.host
        docids = host.docid_strings
        pending = []
        for start in range(0, len(queries), self.batch_size):
            batch = queries[start : start + self.batch_size]
            term_lists = [self._analyze(q, host.vocab) for q in batch]
            if self.pruning and engine.supports_pruning(self.model):
                res = engine.search_pruned(term_lists, model=self.model,
                                           params=self.params, topk=k,
                                           materialize=False)
            else:
                res = engine.search(term_lists, model=self.model,
                                    params=self.params, topk=k,
                                    materialize=False)
            if isinstance(res, tuple):  # exact-topk path: raw device arrays
                for arr in res:
                    if hasattr(arr, "copy_to_host_async"):
                        arr.copy_to_host_async()
            pending.append((len(batch), res))

        def collect() -> List[List[Tuple[str, float]]]:
            import numpy as np

            results: List[List[Tuple[str, float]]] = []
            for n, res in pending:
                # tiered path: a pending TieredResult; exact-topk path: the
                # raw device arrays whose fetch started at dispatch
                scores, ords = res.get() if hasattr(res, "get") else map(np.asarray, res)
                for qi in range(n):
                    hits = []
                    for s, o in zip(scores[qi], ords[qi]):
                        if s <= 0.0:
                            break
                        hits.append((docids[int(o)], float(s)))
                    results.append(hits)
            return results

        return collect

    def _search_async_sharded(self, queries: Sequence[str], k: int):
        """Multi-chip dispatch: doc-partitioned scoring over the 'shard' mesh,
        per-shard top-k, ICI allgather merge (parallel/sharded_search.py).
        Same collect-later contract as the single-device path."""
        from capreolus_tpu.parallel.sharded_search import sharded_search

        sindex, host = self._sindex, self._shard_host
        docids = host.docid_strings
        pending = []
        for start in range(0, len(queries), self.batch_size):
            batch = queries[start : start + self.batch_size]
            term_lists = [self._analyze(q, host.vocab) for q in batch]
            units = sindex.build_work_units(term_lists, model=self.model)
            scores, ords = sharded_search(sindex, units, num_queries=len(batch),
                                          topk=k, model=self.model, params=self.params,
                                          materialize=False)
            for arr in (scores, ords):
                if hasattr(arr, "copy_to_host_async"):
                    arr.copy_to_host_async()
            pending.append((len(batch), scores, ords))

        def collect() -> List[List[Tuple[str, float]]]:
            import numpy as np

            results: List[List[Tuple[str, float]]] = []
            for n, scores, ords in pending:
                scores, ords = np.asarray(scores), np.asarray(ords)
                for qi in range(n):
                    hits = []
                    for s, o in zip(scores[qi], ords[qi]):
                        if s <= 0.0:
                            break
                        hits.append((docids[int(o)], float(s)))
                    results.append(hits)
            return results

        return collect

    def search(self, queries: Sequence[str], k: int = 10) -> List[List[Tuple[str, float]]]:
        """Returns, per query, the top-k (docid, score) pairs."""
        return self.search_async(queries, k)()

    def get_document(self, docid: str) -> Optional[str]:
        return self.index.get_doc(docid)

    def snippets(self, query: str, hits) -> List[str]:
        """Query-biased snippets for a hit list (analysis/highlight.py — the
        Lucene-highlighter role; stemming-aware matching via this index's
        analyzer, idf-weighted window choice)."""
        from capreolus_tpu.analysis.highlight import snippets_for_hits

        return snippets_for_hits(self.index, query, hits)


class _EmbeddingRetrievalService:
    """Shared serving core for the embedding searchers (dense bi-encoder MIPS
    and ColBERT late-interaction MaxSim).

    Wraps the searcher's ``build_topk`` engine dispatch (resident brute force,
    IVF cells, two-stage prefilter, doc-sharded, or host-streamed — whichever
    the searcher config selects) and keeps everything warm across calls:
    corpus embeddings stay in HBM (or pinned host RAM in streaming mode), the
    query encoder stays jitted, and the top-k executable is compiled once at a
    fixed query-batch shape so serving traffic never retraces. Queries are
    padded to that shape per call. Subclasses provide the searcher module name
    and the query-embedding hook; result filtering (the -inf/pad-sentinel
    invariant) lives HERE, once.
    """

    _searcher_name: str = ""  # registry name ("dense" / "colbert")

    def __init__(self, searcher, max_k: int = 100):
        import numpy as np

        self.searcher = searcher
        self._np = np
        self._requested_k = int(max_k)  # refresh() re-clamps against the NEW corpus
        topk, corpus, n = searcher.build_topk(max_k)
        self._topk = topk
        # normalize to an argument tuple: dense passes one corpus pytree,
        # colbert a (docs, mask[, scale]) tuple, streaming an empty tuple
        self._corpus = corpus if isinstance(corpus, tuple) else (corpus,)
        self._n = n
        self.max_k = min(self._requested_k, n)
        self._docids = searcher.index.data.docid_strings
        # key on the generation the engine's artifacts were actually LOADED
        # from (stashed by TpuIndex._load) — a fresh CURRENT read could name a
        # generation another process committed after our load (the stale-cache
        # race fixed in TpuSearcherMixin.get_engine)
        self._generation = getattr(searcher.index, "_loaded_generation",
                                   getattr(searcher.index, "generation", 0))
        self.batch_size = int(searcher.config["batch"])
        self._prepare()

    def refresh(self) -> bool:
        """NRT reopen for the embedding engines (mirrors RetrievalService
        .refresh): merge pending incremental index ops; on a new generation the
        searcher re-derives its embedding cache INCREMENTALLY (surviving docs'
        rows are remapped, only added docs are encoded — embedding_cache.py)
        and this service swaps in a rebuilt top-k engine. In-flight searches
        keep the old engine; the swap is one reference assignment."""
        index = self.searcher.index
        if hasattr(index, "refresh"):
            index.refresh()
        gen = getattr(index, "_loaded_generation", getattr(index, "generation", 0))
        if gen == self._generation:
            return False
        # rebuild at the ORIGINALLY requested k: a service constructed over a
        # small corpus must serve the full request once the corpus grows
        topk, corpus, n = self.searcher.build_topk(self._requested_k)
        self._topk = topk
        self._corpus = corpus if isinstance(corpus, tuple) else (corpus,)
        self._n = n
        self.max_k = min(self._requested_k, n)
        self._docids = self.searcher.index.data.docid_strings
        self._generation = getattr(index, "_loaded_generation", gen)
        return True

    def _prepare(self):
        """Subclass hook: warm the query encoder."""

    def _embed_batch(self, chunk: List[str]):
        """Subclass hook: encode <= batch_size queries, padded to batch_size
        rows (keeps the compiled top-k executable at one shape)."""
        raise NotImplementedError

    @classmethod
    def from_config(cls, collection: str = "dummy", collection_path: Optional[str] = None,
                    max_k: int = 100, **searcher_config):
        import capreolus_tpu

        capreolus_tpu.load_all_modules()
        from capreolus_tpu.searcher import Searcher

        coll_cfg = {"name": collection}
        if collection_path:
            coll_cfg["path"] = collection_path
        index_cfg = searcher_config.pop("index", {})
        searcher = Searcher.create(cls._searcher_name,
                                   {**searcher_config,
                                    "index": {**index_cfg, "collection": coll_cfg}})
        return cls(searcher, max_k=max_k)

    def search_async(self, queries: Sequence[str], k: int = 10):
        """Dispatch-now / collect-later variant of ``search`` (identical
        results; see RetrievalService.search_async): the top-k executables and
        async result fetches are in flight when this returns. Engine state
        (corpus, docids, n) is snapshotted at dispatch so a concurrent
        refresh() can never mix generations inside one call."""
        np = self._np
        k = min(int(k), self.max_k)
        topk, corpus, n, docids = self._topk, self._corpus, self._n, self._docids
        pending = []
        for start in range(0, len(queries), self.batch_size):
            chunk = list(queries[start : start + self.batch_size])
            q_emb = self._embed_batch(chunk)
            scores, ords = topk(q_emb, *corpus)
            for arr in (scores, ords):
                if hasattr(arr, "copy_to_host_async"):
                    arr.copy_to_host_async()
            pending.append((len(chunk), scores, ords))

        def collect() -> List[List[Tuple[str, float]]]:
            results: List[List[Tuple[str, float]]] = []
            for cn, dscores, dords in pending:
                scores, ords = np.asarray(dscores), np.asarray(dords)
                for qi in range(cn):
                    hits = []
                    for s, o in zip(scores[qi][:k], ords[qi][:k]):
                        # -inf slots (fewer finite candidates than k) carry
                        # sentinel/padded ordinals — never surface them
                        if int(o) >= n or not np.isfinite(s):
                            continue
                        hits.append((docids[int(o)], float(s)))
                    results.append(hits)
            return results

        return collect

    def search(self, queries: Sequence[str], k: int = 10) -> List[List[Tuple[str, float]]]:
        """Returns, per query, the top-k (docid, score) pairs."""
        return self.search_async(queries, k)()

    def get_document(self, docid: str) -> Optional[str]:
        return self.searcher.index.get_doc(docid)

    def snippets(self, query: str, hits) -> List[str]:
        from capreolus_tpu.analysis.highlight import snippets_for_hits

        return snippets_for_hits(self.searcher.index, query, hits)


class DenseRetrievalService(_EmbeddingRetrievalService):
    """Low-latency dense (bi-encoder MIPS) serving over an embedded corpus.

        svc = DenseRetrievalService.from_config(collection="nf", pretrained="tiny")
        hits = svc.search(["dietary supplements cancer prevention"], k=10)
    """

    _searcher_name = "dense"

    def _prepare(self):
        self.searcher._embed_maxlen = int(self.searcher.config["maxqlen"])

    def _embed_batch(self, chunk):
        import jax.numpy as jnp

        padded = chunk + [""] * (self.batch_size - len(chunk))
        return jnp.asarray(self.searcher._embed_texts(padded))


class ColbertRetrievalService(_EmbeddingRetrievalService):
    """Low-latency late-interaction (ColBERT MaxSim) serving — same contract
    as DenseRetrievalService over searcher/late_interaction.py's engines."""

    _searcher_name = "colbert"

    def _prepare(self):
        self.maxqlen = int(self.searcher.config["maxqlen"])
        _, self._variables = self.searcher._encoder()

    def _embed_batch(self, chunk):
        np = self._np
        toks = self.searcher._tokenize(chunk, self.maxqlen)
        if len(toks) < self.batch_size:
            toks = np.concatenate(
                [toks, np.zeros((self.batch_size - len(toks), self.maxqlen), np.int32)])
        q_emb, _ = self.searcher._encode_query_jit(self._variables, toks)
        return q_emb


class ImpactRetrievalService:
    """Low-latency learned-sparse (uniCOIL/SPLADE impact) serving.

    Keeps the quantized impact index resident in HBM and the query-weighting
    encoder jitted across calls; same ``search(queries, k) -> [[(docid,
    score)]]`` contract as the other services, so it composes with
    MicroBatcher/HTTP and HybridRetrievalService. Scores are true
    quantized-impact dot products (dequantization folded into the query
    weights, searcher/impact.py _search_all).

        svc = ImpactRetrievalService.from_config(
            collection="nf", checkpointfile=".../dev.best.params")
        hits = svc.search(["dietary supplements cancer prevention"], k=10)
    """

    def __init__(self, searcher):
        self.searcher = searcher
        self.batch_size = max(1, int(searcher.config["batch"]))
        # Snapshot the (engine, docids, scale) tuple ONCE: the hot path never
        # re-derives it (searcher._impact_index() copies every docid string
        # and merges pending incremental ops — O(corpus) host work that does
        # not belong on the latency path), and refresh() swaps the snapshot in
        # one assignment so concurrent dispatches keep the tuple they read.
        self._snapshot = searcher._impact_index()
        self._served_gen = getattr(searcher, "_engine_gen", 0)

    @property
    def index(self):
        return self.searcher.index

    @property
    def _docids(self):  # /health corpus_size
        return self._snapshot[1]

    def refresh(self) -> bool:
        """NRT reopen (mirrors RetrievalService.refresh): merge pending
        incremental index ops; on a new generation _impact_index() re-derives
        the quantized CSR from the incrementally-maintained raw doc-major
        cache (survivors remapped, only added docs encoded) and re-quantizes
        over the new corpus max exactly like a fresh build. In-flight searches
        keep the old engine — search() snapshots the engine tuple once."""
        index = self.searcher.index
        if hasattr(index, "refresh"):
            index.refresh()
        # _impact_index() re-reads index.data (merging any remaining pending
        # ops) and rebuilds the engine when the loaded generation moved; the
        # snapshot swap below is one assignment, so in-flight dispatches keep
        # the tuple they already read.
        self._snapshot = self.searcher._impact_index()
        new_gen = getattr(self.searcher, "_engine_gen", 0)
        changed = new_gen != self._served_gen
        self._served_gen = new_gen
        return changed

    @classmethod
    def from_config(cls, collection: str = "dummy", collection_path: Optional[str] = None,
                    **searcher_config):
        import capreolus_tpu

        capreolus_tpu.load_all_modules()
        from capreolus_tpu.searcher import Searcher

        coll_cfg = {"name": collection}
        if collection_path:
            coll_cfg["path"] = collection_path
        index_cfg = searcher_config.pop("index", {})
        searcher = Searcher.create("impact",
                                   {**searcher_config,
                                    "index": {**index_cfg, "collection": coll_cfg}})
        return cls(searcher)

    def search_async(self, queries: Sequence[str], k: int = 10):
        """Dispatch-now / collect-later variant of ``search`` (identical
        results; see RetrievalService.search_async). The engine tuple is the
        service's snapshot — a concurrent refresh() swaps the snapshot in one
        assignment and this call keeps the tuple it read here."""
        import numpy as np

        engine, docids, scale = self._snapshot
        nt = engine.dindex.num_terms
        offs = engine.dindex.term_offsets
        maxpost = int(self.searcher.config["maxpostings"])
        pending = []
        for start in range(0, len(queries), self.batch_size):
            batch = list(queries[start : start + self.batch_size])
            term_lists = [[(t, w / scale) for t, w in qw
                           if t < nt and offs[t + 1] > offs[t]]
                          for qw in self.searcher.query_weights_batch(batch)]
            res = engine.search(term_lists, model="impact", params={}, topk=k,
                                max_postings_per_term=maxpost, materialize=False)
            if isinstance(res, tuple):  # exact-topk path: raw device arrays
                for arr in res:
                    if hasattr(arr, "copy_to_host_async"):
                        arr.copy_to_host_async()
            pending.append((len(batch), res))

        def collect() -> List[List[Tuple[str, float]]]:
            results: List[List[Tuple[str, float]]] = []
            for n, res in pending:
                scores, ords = res.get() if hasattr(res, "get") else map(np.asarray, res)
                for qi in range(n):
                    hits = []
                    for s, o in zip(scores[qi], ords[qi]):
                        if s <= 0.0:
                            break  # scores descend; zero/sentinel tail follows
                        if int(o) >= len(docids):
                            continue
                        hits.append((docids[int(o)], float(s)))
                    results.append(hits)
            return results

        return collect

    def search(self, queries: Sequence[str], k: int = 10) -> List[List[Tuple[str, float]]]:
        """Returns, per query, the top-k (docid, score) pairs."""
        return self.search_async(queries, k)()

    def get_document(self, docid: str) -> Optional[str]:
        return self.searcher.index.get_doc(docid)

    def snippets(self, query: str, hits) -> List[str]:
        from capreolus_tpu.analysis.highlight import snippets_for_hits

        return snippets_for_hits(self.searcher.index, query, hits)


class HybridRetrievalService:
    """Serving-level hybrid retrieval: fuse two warm services' rankings per
    query (reciprocal rank fusion by default — searcher/fusion.py math over
    live hit lists instead of run files). The canonical pairing is a sparse
    RetrievalService + a DenseRetrievalService; any two services with the
    ``search(queries, k) -> [[(docid, score)]]`` contract compose."""

    def __init__(self, service1, service2, method: str = "rrf", k_rrf: int = 60,
                 alpha: float = 0.5, depth: int = 100):
        from capreolus_tpu.core import ConfigError

        if method not in ("rrf", "interp"):
            raise ConfigError(f"hybrid method must be 'rrf' or 'interp', got {method!r}")
        self.services = (service1, service2)
        self.method = method
        self.k_rrf = int(k_rrf)
        self.alpha = float(alpha)
        # per-service candidate depth before fusion; embedding services are
        # compiled at a fixed max_k and silently clamp k internally, which
        # would give the two legs ASYMMETRIC depths — clamp both legs to the
        # tightest limit so fusion sees equal-depth runs
        self._depth_limit = min((int(svc.max_k) for svc in self.services
                                 if hasattr(svc, "max_k")), default=None)
        self.depth = int(depth)
        if self._depth_limit is not None and self.depth > self._depth_limit:
            logger.warning(
                "hybrid depth %d exceeds an embedding service's compiled max_k=%d; "
                "clamping BOTH legs to %d (build the service with max_k>=%d for "
                "deeper fusion)", self.depth, self._depth_limit, self._depth_limit,
                self.depth)
            self.depth = self._depth_limit
        self.batch_size = min(getattr(service1, "batch_size", 64),
                              getattr(service2, "batch_size", 64))
        self._docids = getattr(service1, "_docids", [])  # /health corpus_size

    def search_async(self, queries: Sequence[str], k: int = 10):
        """Dispatch-now / collect-later variant of ``search`` (identical
        results): BOTH legs are dispatched before either is collected, so
        their device work overlaps even in a single synchronous call."""
        depth = max(self.depth, k)
        if self._depth_limit is not None:
            depth = min(depth, self._depth_limit)
        collectors = []
        for svc in self.services:
            dispatch = getattr(svc, "search_async", None)
            if callable(dispatch):
                collectors.append(dispatch(queries, k=depth))
            else:
                hits = svc.search(queries, k=depth)
                collectors.append(lambda h=hits: h)

        def collect() -> List[List[Tuple[str, float]]]:
            from capreolus_tpu.searcher.fusion import interp_fuse, rrf_fuse

            runs = [{str(i): dict(h) for i, h in enumerate(c())} for c in collectors]
            if self.method == "rrf":
                fused = rrf_fuse(runs, k=self.k_rrf, hits=k)
            else:
                fused = interp_fuse(runs[0], runs[1], alpha=self.alpha, hits=k)
            return [sorted(fused.get(str(i), {}).items(), key=lambda kv: (-kv[1], kv[0]))
                    for i in range(len(queries))]

        return collect

    def search(self, queries: Sequence[str], k: int = 10) -> List[List[Tuple[str, float]]]:
        return self.search_async(queries, k)()

    def get_document(self, docid: str) -> Optional[str]:
        return self.services[0].get_document(docid)

    def snippets(self, query: str, hits) -> List[str]:
        return self.services[0].snippets(query, hits)


class RerankingService(RetrievalService):
    """Retrieve-then-rerank serving: first-stage engine + a trained reranker."""

    def __init__(self, index, reranker, checkpoint_path, topn: int = 100,
                 extractor_state_path: Optional[str] = None, **kwargs):
        super().__init__(index, **kwargs)
        import jax

        from capreolus_tpu.trainer.jax_trainer import ARRAY_KEYS, collate

        self.reranker = reranker
        self.topn = topn
        self._collate = collate
        self._keys = ARRAY_KEYS
        if extractor_state_path:
            # restore the TRAINING-TIME extractor state (vocab/idf/doc tokens,
            # written by extractor.save_state after training) so checkpoints
            # with vocabulary-sized parameters deserialize against identical
            # table shapes
            reranker.extractor.load_state(extractor_state_path)
        elif not getattr(reranker.extractor, "_preprocessed", False):
            # a fresh serving process has never run a training pipeline: build
            # the extractor state (vocab/embeddings, doc token cache) over the
            # corpus BEFORE the model (embedding-based models size their tables
            # from it). Live-query terms absent from the corpus vocabulary map
            # to the OOV id. NOTE: models trained with finetune'd embedding
            # tables need extractor_state_path (corpus-wide vocab differs from
            # the training vocab, so those checkpoints cannot deserialize).
            reranker.extractor.preprocess([], list(index.data.docid_strings), {})
        reranker.build_model()
        # template params + restore trained weights
        self._params = None
        self._checkpoint_path = checkpoint_path

    def _ensure_params(self, example_batch):
        if self._params is None:
            import jax

            template = self.reranker.init_params(jax.random.PRNGKey(0), example_batch)
            try:
                params, _ = self.reranker.trainer.load_checkpoint(
                    self._checkpoint_path, template, reranker=self.reranker)
            except Exception as e:
                raise RuntimeError(self._restore_help()) from e
            # flax only surfaces a shape mismatch lazily at apply time; check
            # eagerly so the failure is actionable (vocab-sized tables differ
            # when the serving vocab != the training vocab)
            flat_t = jax.tree_util.tree_leaves_with_path(template)
            flat_p = dict(jax.tree_util.tree_leaves_with_path(params))
            mismatched = [
                jax.tree_util.keystr(path)
                for path, leaf in flat_t
                if getattr(flat_p.get(path), "shape", None) != getattr(leaf, "shape", None)
            ]
            if mismatched:
                raise RuntimeError(
                    f"restored checkpoint shapes do not match the serving model "
                    f"({mismatched[:3]}...); " + self._restore_help())
            # one-time inference prep (int8 scale calibration) against the
            # restored weights, then bake the calibrated stats in as variables
            if hasattr(self.reranker, "prepare_inference"):
                self.reranker.prepare_inference(params, example_batch)
            if hasattr(self.reranker, "inference_variables"):
                params = self.reranker.inference_variables(params)
            self._params = params
        return self._params

    @staticmethod
    def _restore_help():
        return ("failed to restore the reranker checkpoint; if the model has "
                "vocabulary-sized trained parameters (e.g. finetune=True embedding "
                "tables), the serving process must restore the training-time "
                "extractor state — pass extractor_state_path= pointing at a file "
                "written by extractor.save_state() after training")

    def search_async(self, queries: Sequence[str], k: int = 10):
        """Two-stage dispatch/collect split: DISPATCH sends the first-stage
        retrieval (device work + async fetch in flight at return); COLLECT
        runs extraction + the reranker. Under the pipelined MicroBatcher,
        batch N's rerank (the heavy stage) overlaps batch N+1's first-stage
        round-trip. All extractor-state mutation happens inside collect(),
        which the batcher serializes on its single worker thread."""
        first_collect = RetrievalService.search_async(self, queries, k=max(self.topn, k))
        return lambda: self._rerank_stage(queries, first_collect(), k)

    def search(self, queries: Sequence[str], k: int = 10):
        return self.search_async(queries, k)()

    def _rerank_stage(self, queries: Sequence[str], first_stage, k: int):
        extractor = self.reranker.extractor

        results = []
        for qi, (query, hits) in enumerate(zip(queries, first_stage)):
            if not hits:
                results.append([])
                continue
            qid = f"live{qi}"
            q_toks = extractor.tokenizer.tokenize(query)
            extractor.qid2toks[qid] = q_toks
            # training-time preprocess computes idf only for its qids' terms;
            # live queries were never seen, so fetch their idf from the warm
            # index now (otherwise idf-gated models — DRMM/POSITDRMM/TK — see
            # a silently-zeroed query_idf feature)
            if hasattr(extractor, "idf") and extractor.config.get("calcidf", True):
                for tok in q_toks:
                    if tok not in extractor.idf:
                        extractor.idf[tok] = self.index.get_idf(tok)
            samples = [extractor.id2vec(qid, docid, label=[1, 0], training=False) for docid, _ in hits]
            batch = self._collate(samples, self._keys)
            params = self._ensure_params(batch)
            scores = self.reranker.test(params, batch)
            reranked = sorted(zip((d for d, _ in hits), map(float, scores)), key=lambda kv: -kv[1])
            results.append(reranked[:k])
        return results
