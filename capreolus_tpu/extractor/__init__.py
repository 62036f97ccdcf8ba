"""Extractor modules: turn (qid, docid) pairs into model-ready feature arrays.

Capability parity with /root/reference/capreolus/extractor/__init__.py:9-79:
``preprocess(qids, docids, topics)`` builds vocabulary/embedding state (cached,
keyed by an md5 over the sorted qids+docids), then ``id2vec(qid, posid, negid,
label, training)`` returns a dict of numpy arrays for one training/eval sample.

TPU-first design note: the reference's per-sample id2vec path (JNI doc fetch +
tokenize inside the DataLoader loop) was its main host bottleneck (SURVEY.md §3.3);
here preprocess pre-tokenizes every candidate document once into padded id arrays
held in memory, so id2vec is a cheap dictionary lookup + slice.
"""

from __future__ import annotations

import hashlib
import pickle

from capreolus_tpu.core import ModuleBase, import_all_modules, register_module_type
from capreolus_tpu.utils.exceptions import MissingDocError
from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)


@register_module_type
class Extractor(ModuleBase):
    """Base class for Extractor modules."""

    module_type = "extractor"
    pad = 0
    pad_tok = "<pad>"

    def get_state_cache_file_path(self, qids, docids):
        """Cache file path keyed by an md5 over the sorted qids and docids
        (parity: extractor/__init__.py:48-63)."""
        digest = hashlib.md5(str(sorted(qids) + sorted(docids)).encode("utf-8")).hexdigest()
        return self.get_cache_path() / "state" / f"{digest}.pkl"

    def _cache_state(self, qids, docids):
        path = self.get_state_cache_file_path(qids, docids)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(self.get_state(), f, protocol=-1)

    def _load_state_from_cache(self, qids, docids) -> bool:
        path = self.get_state_cache_file_path(qids, docids)
        if not path.exists():
            return False
        try:
            with open(path, "rb") as f:
                self.set_state(pickle.load(f))
            return True
        except Exception as e:
            logger.warning("failed loading extractor state cache %s: %s", path, e)
            return False

    def save_state(self, path):
        """Serialize the preprocessed state to an explicit file. Serving
        handoff: a fresh process restores the TRAINING-TIME vocabulary/idf via
        ``load_state`` so trained checkpoints deserialize against identical
        embedding-table shapes (vocab-sized tables differ if the serving
        process re-preprocesses over a different docid set)."""
        from pathlib import Path

        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(self.get_state(), f, protocol=-1)

    def load_state(self, path):
        """Restore state written by ``save_state`` (marks preprocessed)."""
        with open(path, "rb") as f:
            self.set_state(pickle.load(f))

    def get_state(self):
        raise NotImplementedError

    def set_state(self, state):
        raise NotImplementedError

    def preprocess(self, qids, docids, topics):
        raise NotImplementedError

    def id2vec(self, qid, posid, negid=None, label=None, training=True):
        raise NotImplementedError


import_all_modules(__file__, __package__)
