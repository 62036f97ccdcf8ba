"""Helpers for benchmarks whose topics/qrels/folds come from public downloads.

The reference ships many static fold/topic/qrel files in capreolus/data and
downloads the rest at runtime. Here every artifact is either (1) downloaded once
into the benchmark's cache (gated in offline environments with actionable errors),
(2) supplied by the user via the ``topicfile``/``qrelfile``/``foldfile`` config
options, or (3) for folds only: generated as a deterministic seeded k-fold split
over the topic qids (clearly logged — NOT the published split; supply ``foldfile``
to reproduce paper numbers exactly).
"""

from __future__ import annotations

import hashlib
import json

from capreolus_tpu.benchmark import Benchmark
from capreolus_tpu.core import ConfigOption
from capreolus_tpu.utils.common import download_file
from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)

FILE_CONFIG_OPTIONS = [
    ConfigOption("topicfile", None, "path to a local topics file (overrides download)"),
    ConfigOption("qrelfile", None, "path to a local qrels file (overrides download)"),
    ConfigOption("foldfile", None, "path to a local folds json (overrides the generated split)"),
]


class DownloadableBenchmark(Benchmark):
    """Benchmark whose files are downloaded or user-supplied."""

    topic_url = None
    qrel_url = None
    fold_url = None
    num_folds = 5

    config_spec = FILE_CONFIG_OPTIONS

    def _data_dir(self):
        path = self.get_cache_path() / "data"
        path.mkdir(parents=True, exist_ok=True)
        return path

    def _file(self, kind, url, config_key):
        configured = self.config.get(config_key)
        if configured:
            return configured
        if url is None:
            return None
        dest = self._data_dir() / f"{kind}.{url.split('/')[-1]}"
        return download_file(url, dest)

    @property
    def topic_file(self):
        return self._file("topics", self.topic_url, "topicfile")

    @property
    def qrel_file(self):
        return self._file("qrels", self.qrel_url, "qrelfile")

    @property
    def fold_file(self):
        configured = self.config.get("foldfile")
        if configured:
            return configured
        if self.fold_url is not None:
            return self._file("folds", self.fold_url, "foldfile")
        return self._generated_fold_file()

    def _generated_fold_file(self):
        """Deterministic seeded k-fold split over topic qids (md5-ordered)."""
        dest = self._data_dir() / f"generated_{self.num_folds}folds.json"
        if dest.exists():
            return dest
        qids = sorted(self.topics[self.query_type])
        ordered = sorted(qids, key=lambda q: hashlib.md5(f"fold{q}".encode()).hexdigest())
        k = self.num_folds
        folds = {}
        for i in range(k):
            test = ordered[i::k]
            dev = ordered[(i + 1) % k :: k]
            train = [q for q in ordered if q not in set(test) | set(dev)]
            folds[f"s{i + 1}"] = {"train_qids": train, "predict": {"dev": dev, "test": test}}
        logger.warning(
            "benchmark %s: using a generated %d-fold split (NOT the published split); "
            "set benchmark.foldfile to reproduce paper numbers exactly", self.module_name, k
        )
        dest.write_text(json.dumps(folds))
        return dest
