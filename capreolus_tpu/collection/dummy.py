"""Tiny test-fixture collection (parity: /root/reference/capreolus/collection/dummy.py:15-22)."""

from capreolus_tpu.collection import Collection
from capreolus_tpu.core import constants


@Collection.register
class DummyCollection(Collection):
    """A 3-document TREC-format collection used by tests and the tutorial."""

    module_name = "dummy"
    collection_type = "trec"

    @property
    def _path(self):
        return constants["PACKAGE_PATH"] / "data" / "dummy" / "data"

    def doc_count_hint(self):
        return 3
