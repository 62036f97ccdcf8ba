"""TPU first-stage searchers.

Capability parity with the Anserini searcher zoo
(/root/reference/capreolus/searcher/anserini.py:151-549): BM25 (with k1/b list-valued
grid search), BM25Grid, BM25RM3, QL-Dirichlet, QLJM, INL2, SPL, F2Exp, F2Log — all
re-expressed as elementwise scoring models over the shared TPU engine. Grid searches
run as a vmap over the parameter axes with shared posting gathers, instead of one
Java subprocess per parameter combination.
"""

from __future__ import annotations

import itertools
from collections import Counter

import numpy as np

from capreolus_tpu.core import ConfigOption, Dependency
from capreolus_tpu.searcher import Searcher
from capreolus_tpu.searcher.scoring import DeviceIndex, ScoringEngine
from capreolus_tpu.utils.caching import done_file
from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)

QUERY_BATCH = 64
# in-flight device batches during pipelined search dispatch: enough depth that
# result transfers overlap the next batches' compute, small enough that result
# buffers / streaming working sets can't accumulate without bound in HBM
DISPATCH_WINDOW = 4


def _windowed(result_iter, window=DISPATCH_WINDOW):
    """Drain ``result_iter`` (whose construction IS the device dispatch) at
    most ``window`` items ahead of the consumer."""
    from collections import deque

    buf = deque()
    for r in result_iter:
        buf.append(r)
        if len(buf) > window:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def _load_topics_tsv(topicsfn):
    topics = []
    with open(topicsfn, encoding="utf-8") as f:
        for line in f:
            if line.strip():
                qid, text = line.rstrip("\n").split("\t", 1)
                topics.append((qid, text))
    return topics


class TpuSearcherMixin:
    """Shared search loop: analyze queries, batch, run the engine, write run files.

    Analog of AnseriniSearcherMixIn (/root/reference/capreolus/searcher/anserini.py:21-83),
    including the done-file skip protocol.
    """

    model = "bm25"  # scoring model key in SCORING_MODELS

    def get_engine(self) -> ScoringEngine:
        self.index.create_index()
        data = self.index.data  # merges any pending incremental ops first
        # key the cache on the generation the loaded artifacts actually came
        # from (stashed by _load), NOT a fresh CURRENT read — another process
        # committing a merge between the two reads would otherwise cache the
        # stale data under the new generation and never invalidate it
        gen = getattr(self.index, "_loaded_generation", None)
        if gen is None:
            gen = getattr(self.index, "generation", 0)
        if getattr(self, "_engine", None) is None or getattr(self, "_engine_gen", None) != gen:
            budget_mb = float(self.config.get("hbmbudget", 12000))
            self._engine = ScoringEngine(DeviceIndex(
                data,
                hbm_budget=budget_mb * 1e6 if budget_mb > 0 else None))
            self._engine_gen = gen
        return self._engine

    def grid_params(self):
        """Returns (fixed_params, grid) where grid maps param -> list of values."""
        raise NotImplementedError

    def query_weights(self, text, engine):
        """Analyze a query string into [(term_id, weight)] with qtf weights."""
        vocab = self.index.data.vocab
        counts = Counter(self.index.analyze(text))
        return [(vocab[t], float(c)) for t, c in counts.items() if t in vocab]

    def _query_from_file(self, topicsfn, output_path):
        output_path.mkdir(parents=True, exist_ok=True)
        with done_file(output_path) as already_done:
            if not already_done:
                self._search_all(topicsfn, output_path)
        return output_path

    def query_from_file(self, topicsfn, output_path):
        from pathlib import Path

        return self._query_from_file(Path(topicsfn), Path(output_path))

    def _search_all(self, topicsfn, output_path):
        engine = self.get_engine()
        topics = _load_topics_tsv(topicsfn)
        hits = min(int(self.config.get("hits", 1000)), engine.dindex.num_docs)
        fixed, grid = self.grid_params()
        param_axes = tuple(sorted(grid))
        combos = list(itertools.product(*[grid[k] for k in param_axes])) or [()]
        docids = engine.dindex.host.docid_strings

        runs = {self._param_tag(fixed, dict(zip(param_axes, combo))): {} for combo in combos}
        tags = list(runs)

        # exact block-max dynamic pruning (default-on): bit-identical results,
        # provably-safe doc-range skipping (scoring.py block-max section).
        # Engages for single-parameter-point BM25 with no approximate cap.
        max_postings = int(self.config.get("maxpostings", 0))
        use_prune = (len(combos) == 1 and max_postings == 0
                     and bool(self.config.get("pruning", True))
                     and engine.supports_pruning(self.model))
        prune_params = {**fixed, **dict(zip(param_axes, combos[0]))} if use_prune else None

        batches = [topics[s : s + QUERY_BATCH] for s in range(0, len(topics), QUERY_BATCH)]
        batch_terms = [[self.query_weights(text, engine) for _, text in b] for b in batches]
        # pipelined dispatch with a bounded in-flight window: lazy materialization
        # lets host work (pruning bound spans on a worker thread, run-dict
        # building below) overlap device compute and result transfers, while the
        # window caps device residency — a grid sweep's per-batch results are
        # [combos, Q, hits] and hbmbudget streaming uploads per-batch working
        # sets, so dispatching every batch up front would hold them ALL in HBM
        if use_prune:
            pending = engine.search_pruned_stream(batch_terms, model=self.model,
                                                  params=prune_params, topk=hits,
                                                  materialize=False,
                                                  window=DISPATCH_WINDOW)
        else:
            pending = _windowed(
                (engine.search(tl, model=self.model, params=fixed, grid=grid,
                               topk=hits, max_postings_per_term=max_postings,
                               materialize=False)
                 for tl in batch_terms),
                DISPATCH_WINDOW)

        for batch, term_lists, res in zip(batches, batch_terms, pending):
            if hasattr(res, "get"):
                scores, doc_ords = res.get()
            else:  # exact-topk path returns device arrays directly
                scores, doc_ords = (np.asarray(res[0]), np.asarray(res[1]))
            # axes: [len(p1), ..., len(pk), Q, hits] ordered by sorted param name
            flat_scores = scores.reshape(len(combos), len(batch), -1)
            flat_ords = doc_ords.reshape(len(combos), len(batch), -1)
            for ci in range(len(combos)):
                run = runs[tags[ci]]
                for qi, (qid, _) in enumerate(batch):
                    if not term_lists[qi]:
                        continue
                    ranked = {}
                    for s, o in zip(flat_scores[ci, qi], flat_ords[ci, qi]):
                        if s <= 0.0:
                            break  # no more matching docs (scores are non-negative)
                        ranked[docids[o]] = float(s)
                    run[qid] = ranked

        for tag, run in runs.items():
            outfn = output_path / tag
            self._write_run(run, outfn)
            logger.info("wrote run file %s (%d queries)", outfn, len(run))

    def _write_run(self, run, outfn):
        with open(outfn, "wt", encoding="utf-8") as f:
            for qid, docs in run.items():
                for rank, (docid, score) in enumerate(docs.items(), start=1):
                    f.write(f"{qid} Q0 {docid} {rank} {score:.6f} capreolus_tpu\n")

    def _param_tag(self, fixed, combo_params):
        parts = [f"searcher_{self.module_name}"]
        for k in sorted({**fixed, **combo_params}):
            v = {**fixed, **combo_params}[k]
            parts.append(f"{k}-{v:g}" if isinstance(v, float) else f"{k}-{v}")
        return "_".join(parts)


class TpuSearcherBase(TpuSearcherMixin, Searcher):
    dependencies = [Dependency(key="index", module="index", name="tpu")]


@Searcher.register
class BM25(TpuSearcherBase):
    """BM25 with k1/b grid search (parity: searcher/anserini.py:151-176).

    ``shards`` > 1 partitions the postings by document range across that many
    devices and merges per-shard top-k over ICI (the new first-class index-sharding
    component, SURVEY.md §2.3)."""

    module_name = "BM25"
    model = "bm25"
    config_spec = [
        ConfigOption("k1", [0.9], "controls term saturation", value_type="floatlist"),
        ConfigOption("b", [0.4], "controls document length normalization", value_type="floatlist"),
        ConfigOption("hits", 1000, "number of results to return"),
        ConfigOption("fields", "title", "accepted for reference-config compatibility; "
                     "the TPU index searches merged document contents"),
        ConfigOption("shards", 1, "devices to shard the postings across (1 = single chip)"),
        ConfigOption("maxpostings", 0, "impact-ordered early termination: score only each term's "
                     "top-N highest-impact postings (0 = exact; approximate when set)"),
        ConfigOption("pruning", True, "exact block-max dynamic pruning (WAND/MaxScore semantics): "
                     "skips doc ranges provably below the top-k threshold; results are "
                     "bit-identical to exhaustive scoring"),
        ConfigOption("hbmbudget", 12000.0, "HBM budget (MB) for resident postings tiles; corpora "
                     "whose tiles exceed it run in host-streaming mode (per-batch working-set "
                     "uploads, like Lucene's disk-resident postings). 0 = always resident"),
    ]
    config_keys_not_in_path = ["shards", "pruning", "hbmbudget"]  # none changes results

    def grid_params(self):
        return {}, {"k1": list(self.config["k1"]), "b": list(self.config["b"])}

    def _search_all(self, topicsfn, output_path):
        if self.config["shards"] <= 1:
            return super()._search_all(topicsfn, output_path)
        if int(self.config.get("maxpostings", 0)) > 0:
            from capreolus_tpu.core import ConfigError

            raise ConfigError("searcher.maxpostings (early termination) is not yet supported with "
                              "searcher.shards > 1; drop one of the two options")
        self._search_all_sharded(topicsfn, output_path)

    def _search_all_sharded(self, topicsfn, output_path):
        import itertools

        import jax
        from jax.sharding import Mesh

        import numpy as np

        from capreolus_tpu.parallel import ShardedDeviceIndex, sharded_search

        shards = self.config["shards"]
        devices = jax.devices()
        if len(devices) < shards:
            raise ValueError(f"searcher.shards={shards} but only {len(devices)} devices are available")
        self.index.create_index()
        data = self.index.data
        mesh = Mesh(np.array(devices[:shards]), ("shard",))
        sindex = ShardedDeviceIndex(data, mesh)

        topics = _load_topics_tsv(topicsfn)
        hits = min(int(self.config["hits"]), data.num_docs)
        vocab = data.vocab
        from collections import Counter

        combos = list(itertools.product(self.config["k1"], self.config["b"]))
        for k1, b in combos:
            run = {}
            for start in range(0, len(topics), QUERY_BATCH):
                batch = topics[start : start + QUERY_BATCH]
                term_lists = [
                    [(vocab[t], float(c)) for t, c in Counter(self.index.analyze(text)).items() if t in vocab]
                    for _, text in batch
                ]
                units = sindex.build_work_units(term_lists, model="bm25")
                scores, ords = sharded_search(sindex, units, num_queries=len(batch), topk=hits,
                                              model="bm25", params={"k1": k1, "b": b})
                for qi, (qid, _) in enumerate(batch):
                    if not term_lists[qi]:
                        continue
                    ranked = {}
                    for s, o in zip(scores[qi], ords[qi]):
                        if s <= 0.0:
                            break
                        ranked[data.docid_strings[int(o)]] = float(s)
                    run[qid] = ranked
            tag = self._param_tag({}, {"k1": k1, "b": b})
            self._write_run(run, output_path / tag)
            logger.info("wrote sharded (%d-way) run file %s", shards, output_path / tag)


@Searcher.register
class BM25Grid(TpuSearcherBase):
    """BM25 over a full k1 x b grid defined by ranges (parity: searcher/anserini.py:180-200)."""

    module_name = "BM25Grid"
    model = "bm25"
    config_spec = [
        ConfigOption("k1max", 1.0, "maximum k1"),
        ConfigOption("bmax", 1.0, "maximum b"),
        ConfigOption("k1min", 0.1, "minimum k1"),
        ConfigOption("bmin", 0.1, "minimum b"),
        ConfigOption("step", 0.1, "grid step"),
        ConfigOption("hits", 1000, "number of results"),
        ConfigOption("fields", "title", "query fields"),
    ]

    def grid_params(self):
        c = self.config
        k1s = list(np.round(np.arange(c["k1min"], c["k1max"] + 1e-9, c["step"]), 4))
        bs = list(np.round(np.arange(c["bmin"], c["bmax"] + 1e-9, c["step"]), 4))
        return {}, {"k1": k1s, "b": bs}


@Searcher.register
class QLDirichlet(TpuSearcherBase):
    """Query likelihood with Dirichlet smoothing (parity: searcher/anserini.py:407-431)."""

    module_name = "QLDirichlet"
    model = "qld"
    config_spec = [
        ConfigOption("mu", [1000.0], "smoothing parameter", value_type="floatlist"),
        ConfigOption("hits", 1000, "number of results"),
        ConfigOption("fields", "title", "query fields"),
    ]

    def grid_params(self):
        return {}, {"mu": list(self.config["mu"])}


@Searcher.register
class QLJM(TpuSearcherBase):
    """Query likelihood with Jelinek-Mercer smoothing (parity: searcher/anserini.py:435-446)."""

    module_name = "QLJM"
    model = "qljm"
    config_spec = [
        ConfigOption("lam", [0.1], "smoothing lambda", value_type="floatlist"),
        ConfigOption("hits", 1000, "number of results"),
        ConfigOption("fields", "title", "query fields"),
    ]

    def grid_params(self):
        return {}, {"lam": list(self.config["lam"])}


@Searcher.register
class INL2(TpuSearcherBase):
    """DFR I(n)L2 (parity: searcher/anserini.py:450-462)."""

    module_name = "INL2"
    model = "inl2"
    config_spec = [
        ConfigOption("c", [0.1], "hyperparameter", value_type="floatlist"),
        ConfigOption("hits", 1000, "number of results"),
        ConfigOption("fields", "title", "query fields"),
    ]

    def grid_params(self):
        return {}, {"c": list(self.config["c"])}


@Searcher.register
class SPL(TpuSearcherBase):
    """DFR SPL (parity: searcher/anserini.py:466-482)."""

    module_name = "SPL"
    model = "spl"
    config_spec = [
        ConfigOption("c", [0.1], "hyperparameter", value_type="floatlist"),
        ConfigOption("hits", 1000, "number of results"),
        ConfigOption("fields", "title", "query fields"),
    ]

    def grid_params(self):
        return {}, {"c": list(self.config["c"])}


@Searcher.register
class F2Exp(TpuSearcherBase):
    """Axiomatic F2EXP (parity: searcher/anserini.py:486-502)."""

    module_name = "F2Exp"
    model = "f2exp"
    config_spec = [
        ConfigOption("s", [0.5], "hyperparameter", value_type="floatlist"),
        ConfigOption("hits", 1000, "number of results"),
        ConfigOption("fields", "title", "query fields"),
    ]

    def grid_params(self):
        return {}, {"s": list(self.config["s"])}


@Searcher.register
class F2Log(TpuSearcherBase):
    """Axiomatic F2LOG (parity: searcher/anserini.py:506-522)."""

    module_name = "F2Log"
    model = "f2log"
    config_spec = [
        ConfigOption("s", [0.5], "hyperparameter", value_type="floatlist"),
        ConfigOption("hits", 1000, "number of results"),
        ConfigOption("fields", "title", "query fields"),
    ]

    def grid_params(self):
        return {}, {"s": list(self.config["s"])}


@Searcher.register
class BM25RM3(TpuSearcherBase):
    """BM25 with RM3 pseudo-relevance feedback (parity: searcher/anserini.py:204-229).

    Stage 1 BM25 retrieves feedback docs; the relevance model is estimated from the
    forward index (term vectors scaled by doc score, L1-normalized, top fbTerms kept),
    interpolated with the original query, and rescored with per-term weights.
    """

    module_name = "BM25RM3"
    model = "bm25"
    config_spec = [
        ConfigOption("k1", [0.9], "term saturation", value_type="floatlist"),
        ConfigOption("b", [0.4], "length normalization", value_type="floatlist"),
        ConfigOption("fbTerms", [5, 25], "expansion terms", value_type="intlist"),
        ConfigOption("fbDocs", [5, 10], "feedback depth", value_type="intlist"),
        ConfigOption("originalQueryWeight", [0.5], "original query interpolation", value_type="floatlist"),
        ConfigOption("hits", 1000, "number of results"),
        ConfigOption("fields", "title", "query fields"),
    ]

    def _search_all(self, topicsfn, output_path):
        engine = self.get_engine()
        data = engine.dindex.host
        topics = _load_topics_tsv(topicsfn)
        hits = min(int(self.config["hits"]), engine.dindex.num_docs)
        c = self.config

        combos = list(
            itertools.product(c["k1"], c["b"], c["fbTerms"], c["fbDocs"], c["originalQueryWeight"])
        )
        for k1, b, fb_terms, fb_docs, oqw in combos:
            run = {}
            for start in range(0, len(topics), QUERY_BATCH):
                batch = topics[start : start + QUERY_BATCH]
                term_lists = [self.query_weights(text, engine) for _, text in batch]
                # stage 1: initial BM25 for feedback docs
                s1_scores, s1_ords = engine.search(term_lists, model="bm25", params={"k1": k1, "b": b}, topk=fb_docs)
                # relevance model estimation + interpolation (host, tiny)
                expanded = [
                    self._rm3_expand(term_lists[qi], s1_scores[qi], s1_ords[qi], data, fb_terms, oqw)
                    for qi in range(len(batch))
                ]
                scores, doc_ords = engine.search(expanded, model="bm25", params={"k1": k1, "b": b}, topk=hits)
                for qi, (qid, _) in enumerate(batch):
                    if not term_lists[qi]:
                        continue
                    ranked = {}
                    for s, o in zip(scores[qi], doc_ords[qi]):
                        if s <= 0.0:
                            break
                        ranked[data.docid_strings[o]] = float(s)
                    run[qid] = ranked
            tag = self._param_tag(
                {}, {"k1": k1, "b": b, "fbTerms": fb_terms, "fbDocs": fb_docs, "originalQueryWeight": oqw}
            )
            self._write_run(run, output_path / tag)
            logger.info("wrote RM3 run file %s", output_path / tag)

    @staticmethod
    def _rm3_expand(terms, fb_scores, fb_ords, data, fb_terms, oqw):
        if not terms:
            return terms
        weights = {}
        valid = fb_scores > 0
        total_score = float(fb_scores[valid].sum()) or 1.0
        for score, ord_ in zip(fb_scores[valid], fb_ords[valid]):
            s, e = data.fwd_offsets[ord_], data.fwd_offsets[ord_ + 1]
            tids = data.fwd_term_ids[s:e]
            tfs = data.fwd_tfs[s:e].astype(np.float64)
            dl = max(1.0, float(tfs.sum()))
            contrib = (tfs / dl) * (float(score) / total_score)
            for tid, w in zip(tids, contrib):
                weights[int(tid)] = weights.get(int(tid), 0.0) + float(w)
        top = sorted(weights.items(), key=lambda kv: -kv[1])[: int(fb_terms)]
        norm = sum(w for _, w in top) or 1.0
        fb_part = {tid: w / norm for tid, w in top}

        q_norm = sum(w for _, w in terms) or 1.0
        combined = {tid: oqw * w / q_norm for tid, w in terms}
        for tid, w in fb_part.items():
            combined[tid] = combined.get(tid, 0.0) + (1.0 - oqw) * w
        return sorted(combined.items())
