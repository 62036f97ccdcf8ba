"""Searcher modules: first-stage ranking.

Capability parity with /root/reference/capreolus/searcher/__init__.py:17-91
(run-file IO, ``query_from_file``, interactive ``query``), with Anserini's Java
SearchCollection replaced by the TPU scoring engine (capreolus_tpu.searcher.scoring).
"""

from __future__ import annotations

import os

from capreolus_tpu.core import ModuleBase, import_all_modules, register_module_type
from capreolus_tpu.utils.loginit import get_logger
from capreolus_tpu.utils.trec import load_trec_run, write_trec_run

logger = get_logger(__name__)


def _hbm_budget_mb(config):
    """hbmbudget in MB; only a MISSING/None key falls back to the default —
    an explicit 0 is honored (it forces host-streaming mode), which a falsy
    `or`-guard would silently turn back into the default (round-3 review)."""
    v = config.get("hbmbudget", 12000.0)
    return 12000.0 if v is None else float(v)


@register_module_type
class Searcher(ModuleBase):
    """Base class for Searcher modules."""

    module_type = "searcher"

    @staticmethod
    def load_trec_run(fn):
        return load_trec_run(fn)

    @staticmethod
    def write_trec_run(preds, outfn, mode="wt"):
        return write_trec_run(preds, outfn, mode=mode)

    def query_from_file(self, topicsfn, output_path):
        """Run all topics in the qid\\tquery TSV ``topicsfn``; returns output_path
        containing one TREC run file per searcher parameter combination."""
        raise NotImplementedError

    def query(self, query_string):
        """Search for a single query string; returns {docid: score} per param config.

        Parity: /root/reference/capreolus/searcher/__init__.py:66-91.
        """
        import tempfile
        from pathlib import Path

        index = getattr(self, "index", None)
        if index is not None:  # composite searchers (fusion) own no index
            index.create_index()
        with tempfile.TemporaryDirectory() as tmpdir:
            topicsfn = Path(tmpdir) / "topic.tsv"
            topicsfn.write_text(f"q1\t{query_string}\n")
            results_dir = Path(tmpdir) / "results"
            self.query_from_file(topicsfn, results_dir)

            runs = {}
            for fn in sorted(os.listdir(results_dir)):
                # skip the done marker and any sub-searcher output directories
                # (composite searchers like fusion nest their children's runs)
                if fn == "done" or not (results_dir / fn).is_file():
                    continue
                run = load_trec_run(results_dir / fn)
                runs[fn] = run.get("q1", {})
        if len(runs) == 1:
            return next(iter(runs.values()))
        return runs


import_all_modules(__file__, __package__)
