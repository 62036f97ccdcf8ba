"""Tokenizer modules.

Capability parity with /root/reference/capreolus/tokenizer/: ``lucene`` (the
Anserini/Lucene analyzer, here implemented natively — also registered under the
name ``anserini`` for config compatibility), ``bert`` (HuggingFace wordpiece), and
``punkt`` (sentence segmentation).
"""

from __future__ import annotations

from capreolus_tpu.analysis import get_analyzer
from capreolus_tpu.core import ConfigOption, ModuleBase, import_all_modules, register_module_type
from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)


@register_module_type
class Tokenizer(ModuleBase):
    """Base class for Tokenizer modules."""

    module_type = "tokenizer"

    def tokenize(self, sentences):
        raise NotImplementedError


@Tokenizer.register
class LuceneTokenizer(Tokenizer):
    """English analyzer with Lucene semantics (parity:
    /root/reference/capreolus/tokenizer/anserini.py:6-42)."""

    module_name = "lucene"
    config_spec = [
        ConfigOption("keepstops", True, "keep stopwords"),
        ConfigOption("stemmer", "none", "stemmer: porter or none"),
    ]

    def build(self):
        self._analyzer = get_analyzer(stemmer=self.config["stemmer"], keep_stopwords=self.config["keepstops"])

    def tokenize(self, sentences):
        if not sentences or len(sentences) == 0:
            return []
        if isinstance(sentences, str):
            return self._analyzer.analyze(sentences)
        return [self._analyzer.analyze(s) for s in sentences]


@Tokenizer.register
class AnseriniTokenizerAlias(LuceneTokenizer):
    """Alias so reference configs using tokenizer.name=anserini keep working."""

    module_name = "anserini"


class _HashWordpieceFallback:
    """Deterministic offline stand-in for a pretrained wordpiece vocab: whitespace +
    lowercase tokens hashed into the BERT id space. Used when the HF tokenizer cannot
    be downloaded, so the full cross-encoder pipeline stays runnable offline (models
    are randomly initialized in that case anyway)."""

    vocab_size = 30522
    pad_token, cls_token, sep_token, unk_token = "[PAD]", "[CLS]", "[SEP]", "[UNK]"
    pad_token_id, cls_token_id, sep_token_id, unk_token_id = 0, 101, 102, 100
    _special = {"[PAD]": 0, "[CLS]": 101, "[SEP]": 102, "[UNK]": 100, "[MASK]": 103}

    def tokenize(self, text):
        import re

        return re.findall(r"[^\W_]+|[^\w\s]", text.lower())

    def convert_tokens_to_ids(self, tokens):
        import hashlib

        out = []
        for tok in tokens:
            if tok in self._special:
                out.append(self._special[tok])
            else:
                h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)
                out.append(1000 + h % (self.vocab_size - 1000))
        return out


@Tokenizer.register
class BertTokenizer(Tokenizer):
    """HuggingFace wordpiece tokenizer (parity: tokenizer/bert.py:11-42), with a
    deterministic hash-vocab fallback when the pretrained vocab is unavailable."""

    module_name = "berttokenizer"
    config_spec = [
        ConfigOption("pretrained", "bert-base-uncased", "pretrained tokenizer name"),
        ConfigOption("vocabfile", "", "path to a WordPiece vocab.txt: used by the from-scratch "
                     "WordPiece tokenizer when the pretrained tokenizer cannot be downloaded"),
    ]

    def build(self):
        self._bert_tokenizer = None

    @property
    def bert_tokenizer(self):
        if self._bert_tokenizer is None:
            try:
                from transformers import AutoTokenizer

                self._bert_tokenizer = AutoTokenizer.from_pretrained(self.config["pretrained"], use_fast=True)
            except Exception as e:
                vocabfile = self.config.get("vocabfile", "")
                if vocabfile:
                    # from-scratch WordPiece (tokenizer/wordpiece.py), parity-tested
                    # against transformers' BertTokenizer — real ids, fully offline
                    from capreolus_tpu.tokenizer.wordpiece import WordPieceTokenizer

                    logger.info("cannot load pretrained tokenizer %s (%s); using from-scratch "
                                "WordPiece with vocab %s", self.config["pretrained"], e, vocabfile)
                    self._bert_tokenizer = WordPieceTokenizer(vocabfile)
                else:
                    logger.warning("cannot load pretrained tokenizer %s (%s); using offline "
                                   "hash-wordpiece fallback (ids are NOT real WordPiece — supply "
                                   "tokenizer.vocabfile for real offline tokenization)",
                                   self.config["pretrained"], e)
                    self._bert_tokenizer = _HashWordpieceFallback()
        return self._bert_tokenizer

    # special-token accessors used by the bertpassage extractors
    @property
    def pad_token(self):
        return self.bert_tokenizer.pad_token

    @property
    def cls_token(self):
        return self.bert_tokenizer.cls_token

    @property
    def sep_token(self):
        return self.bert_tokenizer.sep_token

    @property
    def pad_id(self):
        return self.bert_tokenizer.pad_token_id

    @property
    def cls_id(self):
        return self.bert_tokenizer.cls_token_id

    @property
    def sep_id(self):
        return self.bert_tokenizer.sep_token_id

    @property
    def vocab_size(self):
        tok = self.bert_tokenizer
        return int(getattr(tok, "vocab_size", len(getattr(tok, "vocab", {})) or 30522))

    @property
    def fingerprint(self):
        """Identity of the ACTUAL tokenizer in use (not just the requested name):
        distinguishes the HF tokenizer, the from-scratch WordPiece (keyed by its
        vocab file), and the hash fallback. Consumers that cache tokenized
        artifacts (e.g. dense doc embeddings) must fold this into their cache key
        so an offline hash-fallback run never poisons a later online run."""
        tok = self.bert_tokenizer
        if isinstance(tok, _HashWordpieceFallback):
            return "hashfallback"
        from capreolus_tpu.tokenizer.wordpiece import WordPieceTokenizer

        if isinstance(tok, WordPieceTokenizer):
            import os

            vf = self.config.get("vocabfile", "")
            try:
                st = os.stat(vf)
                return f"wordpiece:{vf}:{st.st_size}:{st.st_mtime_ns}"
            except OSError:
                return f"wordpiece:{vf}"
        return f"hf:{self.config['pretrained']}"

    def convert_tokens_to_ids(self, tokens):
        return self.bert_tokenizer.convert_tokens_to_ids(tokens)

    def tokenize(self, sentences):
        if not sentences or len(sentences) == 0:
            return []
        if isinstance(sentences, str):
            return self.bert_tokenizer.tokenize(sentences)
        return [self.bert_tokenizer.tokenize(s) for s in sentences]


@Tokenizer.register
class PunktTokenizer(Tokenizer):
    """Sentence segmentation (parity: tokenizer/punkt.py:6-22). Uses NLTK punkt
    when its data is available; otherwise the from-scratch abbreviation-aware
    splitter (analysis/segmentation.py split_sentences) — full sentence
    segmentation offline, no NLTK download needed."""

    module_name = "punkt"

    def build(self):
        self._punkt = None
        try:
            import nltk

            self._punkt = nltk.data.load("tokenizers/punkt/english.pickle")
        except Exception:
            logger.debug("nltk punkt data unavailable; using the built-in "
                         "abbreviation-aware sentence splitter")

    def tokenize(self, sentences):
        if not sentences or len(sentences) == 0:
            return []
        if isinstance(sentences, str):
            return self._split(sentences)
        return [self._split(s) for s in sentences]

    def _split(self, text):
        if self._punkt is not None:
            return self._punkt.tokenize(text)
        from capreolus_tpu.analysis.segmentation import split_sentences

        return split_sentences(text)


import_all_modules(__file__, __package__)
