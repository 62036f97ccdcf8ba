"""SlowEmbedText: embedtext variant with collection-wide vocabulary and zerounk.

Capability parity with /root/reference/capreolus/extractor/slowembedtext.py:20
(feeds TFKNRM, CDSSM, ConvKNRM, DUET, HINT, POSITDRMM, TK). In this framework
the feature arrays are identical to EmbedText's; the differences kept are the
``zerounk`` option (drop OOV terms instead of giving them exact-match ids) and
the usecache flag.
"""

from __future__ import annotations

from capreolus_tpu.core import ConfigOption, Dependency
from capreolus_tpu.extractor import Extractor
from capreolus_tpu.extractor.embedtext import EmbedText


@Extractor.register
class SlowEmbedText(EmbedText):
    module_name = "slowembedtext"
    config_spec = [
        ConfigOption("embeddings", "glove6b", "embeddings: glove6b, glove6b.50d, w2vnews, fasttext, or random"),
        ConfigOption("zerounk", False, "use all-zero vectors for unknown terms (True) or exact-match ids (False)"),
        ConfigOption("calcidf", True, "compute idf for query terms from the index"),
        ConfigOption("maxqlen", 4, "maximum query length"),
        ConfigOption("maxdoclen", 800, "maximum doc length"),
        ConfigOption("usecache", False, "cache extracted features"),
    ]
    config_keys_not_in_path = ["usecache"]

    def _tok2vec(self, toks):
        ids = super()._tok2vec(toks)
        if self.config["zerounk"]:
            ids = [i if i > 0 else 0 for i in ids]
        return ids
