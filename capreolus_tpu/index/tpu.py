"""TPU inverted index.

Replaces Anserini's Lucene index (/root/reference/capreolus/index/anserini.py) with a
from-scratch build path designed for TPU consumption (BASELINE.json north star):

  host tokenize -> (term, doc, tf) tuples -> segmented sort -> impact-sorted CSR
  postings resident in HBM, plus per-doc length norms (Lucene SmallFloat parity),
  df/cf stats tables, a forward index (for feedback models like RM3), and a
  memory-mapped docid -> contents store for ``get_doc``.

Artifacts written to the cache path:
  index/vocab.txt        one term per line (line number = term id)
  index/docids.txt       external docid per internal doc ordinal
  index/postings.npz     CSR postings + stats (see _save_artifacts)
  index/docs.bin         concatenated utf-8 contents
  index/doc_offsets.npy  int64 offsets into docs.bin
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from capreolus_tpu.analysis import get_analyzer
from capreolus_tpu.core import ConfigOption
from capreolus_tpu.index import Index
from capreolus_tpu.index.smallfloat import quantize_lengths
from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)


class IndexData:
    """In-memory (host) view of the index artifacts; arrays are numpy, ready to be
    placed in HBM by the search engine."""

    def __init__(self, term_offsets, doc_ids, tfs, doclens, norm_doclens, docid_strings, vocab,
                 fwd_offsets=None, fwd_term_ids=None, fwd_tfs=None):
        self.term_offsets = term_offsets  # int64 [V+1]
        self.doc_ids = doc_ids  # int32 [nnz], impact-sorted within each term
        self.tfs = tfs  # int32 [nnz]
        self.doclens = doclens  # int32 [N] exact lengths
        self.norm_doclens = norm_doclens  # int32 [N] Lucene-quantized lengths
        self.docid_strings = docid_strings  # list[str] length N
        self.vocab = vocab  # dict term -> term id
        self.fwd_offsets = fwd_offsets  # int64 [N+1]
        self.fwd_term_ids = fwd_term_ids  # int32 [nnz] sorted by doc
        self.fwd_tfs = fwd_tfs  # int32 [nnz]

    @property
    def num_docs(self):
        return len(self.doclens)

    @property
    def num_terms(self):
        return len(self.term_offsets) - 1

    @property
    def total_term_count(self):
        return int(self.doclens.sum())

    @property
    def avgdl(self):
        return self.total_term_count / max(1, self.num_docs)

    def df(self, term_id):
        return int(self.term_offsets[term_id + 1] - self.term_offsets[term_id])

    @property
    def df_array(self):
        return np.diff(self.term_offsets).astype(np.int32)

    @property
    def cf_array(self):
        cf = np.zeros(self.num_terms, dtype=np.int64)
        np.add.at(cf, np.repeat(np.arange(self.num_terms), np.diff(self.term_offsets)), self.tfs)
        return cf

    def postings(self, term_id):
        s, e = self.term_offsets[term_id], self.term_offsets[term_id + 1]
        return self.doc_ids[s:e], self.tfs[s:e]


@Index.register
class TpuIndex(Index):
    """From-scratch inverted index with Lucene-compatible statistics.

    Config parity with AnseriniIndex (/root/reference/capreolus/index/anserini.py:17-20):
    ``indexstops`` and ``stemmer``.
    """

    module_name = "tpu"
    config_spec = [
        ConfigOption("indexstops", False, "index stopwords (True) or remove them (False)"),
        ConfigOption("stemmer", "porter", "stemmer: porter, krovetz, or none"),
        ConfigOption("storepositions", False, "store the positional forward index "
                     "(per-doc token-id sequences; required by SDM)"),
    ]

    def _analyzer(self):
        return get_analyzer(stemmer=self.config["stemmer"], keep_stopwords=self.config["indexstops"])

    # ------------------------------------------------------------------ build
    def _create_index(self):
        analyzer = self._analyzer()
        index_path = self.get_index_path()
        index_path.mkdir(parents=True, exist_ok=True)

        logger.info("building TPU inverted index at %s", index_path)
        vocab: dict = {}
        docid_strings = []
        doclens = []
        # flat (term_id, doc_ord, tf) triples accumulated in chunks for the segmented sort
        term_chunks, doc_chunks, tf_chunks = [], [], []
        doc_byte_offsets = [0]
        docs_bin = open(index_path / "docs.bin", "wb")
        store_positions = self.config["storepositions"]
        docterms_bin = open(index_path / "docterms.bin", "wb") if store_positions else None
        docterm_offsets = [0]

        # tokenization runs on a thread pool: the native C++ analyzer releases the
        # GIL during ctypes calls, so MAX_THREADS-way host parallelism is real
        # (the reference gets this from Anserini's -threads, index/anserini.py:39-40)
        from concurrent.futures import ThreadPoolExecutor
        from itertools import islice

        from capreolus_tpu.core import constants

        doc_ord = 0
        doc_iter = self.collection.get_doc_iterator()
        pool = ThreadPoolExecutor(max_workers=max(1, constants["MAX_THREADS"]))
        try:
            while True:
                chunk = list(islice(doc_iter, 1024))
                if not chunk:
                    break
                token_lists = list(pool.map(analyzer.analyze, (c for _, c in chunk)))
                for (docid, contents), tokens in zip(chunk, token_lists):
                    counts = Counter(tokens)
                    docid_strings.append(docid)
                    doclens.append(len(tokens))
                    data = contents.encode("utf-8")
                    docs_bin.write(data)
                    doc_byte_offsets.append(doc_byte_offsets[-1] + len(data))
                    if store_positions:
                        seq = np.fromiter((vocab.setdefault(t, len(vocab)) for t in tokens),
                                          dtype=np.int32, count=len(tokens))
                        docterms_bin.write(seq.tobytes())
                        docterm_offsets.append(docterm_offsets[-1] + len(seq))
                    if counts:
                        tids = np.fromiter(
                            (vocab.setdefault(t, len(vocab)) for t in counts), dtype=np.int64, count=len(counts)
                        )
                        term_chunks.append(tids)
                        doc_chunks.append(np.full(len(counts), doc_ord, dtype=np.int64))
                        tf_chunks.append(np.fromiter(counts.values(), dtype=np.int64, count=len(counts)))
                    doc_ord += 1
                    if doc_ord % 100000 == 0:
                        logger.info("tokenized %d docs (%d terms so far)", doc_ord, len(vocab))
        finally:
            pool.shutdown()

        docs_bin.close()
        np.save(index_path / "doc_offsets.npy", np.asarray(doc_byte_offsets, dtype=np.int64))
        if store_positions:
            docterms_bin.close()
            np.save(index_path / "docterm_offsets.npy", np.asarray(docterm_offsets, dtype=np.int64))
        num_docs = len(docid_strings)
        if num_docs == 0:
            raise IOError(f"collection {self.collection.module_name} yielded no documents")

        term_ids = np.concatenate(term_chunks) if term_chunks else np.zeros(0, dtype=np.int64)
        doc_ords = np.concatenate(doc_chunks) if doc_chunks else np.zeros(0, dtype=np.int64)
        tfs = np.concatenate(tf_chunks) if tf_chunks else np.zeros(0, dtype=np.int64)
        del term_chunks, doc_chunks, tf_chunks

        # segmented sort: by term, then impact (tf desc), then doc id asc
        order = np.lexsort((doc_ords, -tfs, term_ids))
        term_ids, doc_ords, tfs = term_ids[order], doc_ords[order], tfs[order]

        num_terms = len(vocab)
        counts_per_term = np.bincount(term_ids, minlength=num_terms)
        term_offsets = np.zeros(num_terms + 1, dtype=np.int64)
        np.cumsum(counts_per_term, out=term_offsets[1:])

        doclens = np.asarray(doclens, dtype=np.int32)
        norm_doclens = quantize_lengths(doclens).astype(np.int32)

        # forward index: same triples sorted by (doc, term)
        fwd_order = np.lexsort((term_ids, doc_ords))
        fwd_term_ids = term_ids[fwd_order].astype(np.int32)
        fwd_tfs = tfs[fwd_order].astype(np.int32)
        fwd_counts = np.bincount(doc_ords, minlength=num_docs)
        fwd_offsets = np.zeros(num_docs + 1, dtype=np.int64)
        np.cumsum(fwd_counts, out=fwd_offsets[1:])

        self._save_artifacts(
            index_path,
            term_offsets=term_offsets,
            doc_ids=doc_ords.astype(np.int32),
            tfs=tfs.astype(np.int32),
            doclens=doclens,
            norm_doclens=norm_doclens,
            fwd_offsets=fwd_offsets,
            fwd_term_ids=fwd_term_ids,
            fwd_tfs=fwd_tfs,
            docid_strings=docid_strings,
            vocab=vocab,
        )
        logger.info(
            "index built: %d docs, %d terms, %d postings, avgdl %.2f",
            num_docs, num_terms, len(tfs), doclens.mean() if num_docs else 0.0,
        )

    @staticmethod
    def _save_artifacts(index_path, *, term_offsets, doc_ids, tfs, doclens, norm_doclens,
                        fwd_offsets, fwd_term_ids, fwd_tfs, docid_strings, vocab):
        terms_by_id = sorted(vocab, key=vocab.get)
        (index_path / "vocab.txt").write_text("\n".join(terms_by_id), encoding="utf-8")
        (index_path / "docids.txt").write_text("\n".join(docid_strings), encoding="utf-8")
        np.savez(
            index_path / "postings.npz",
            term_offsets=term_offsets,
            doc_ids=doc_ids,
            tfs=tfs,
            doclens=doclens,
            norm_doclens=norm_doclens,
            fwd_offsets=fwd_offsets,
            fwd_term_ids=fwd_term_ids,
            fwd_tfs=fwd_tfs,
        )

    # ------------------------------------------------------------------ load/access
    def _load(self):
        if getattr(self, "_data", None) is not None:
            return self._data
        self.create_index()
        index_path = self.get_index_path()
        npz = np.load(index_path / "postings.npz")
        vocab_list = (index_path / "vocab.txt").read_text(encoding="utf-8").splitlines()
        docid_strings = (index_path / "docids.txt").read_text(encoding="utf-8").splitlines()
        self._data = IndexData(
            term_offsets=npz["term_offsets"],
            doc_ids=npz["doc_ids"],
            tfs=npz["tfs"],
            doclens=npz["doclens"],
            norm_doclens=npz["norm_doclens"],
            docid_strings=docid_strings,
            vocab={t: i for i, t in enumerate(vocab_list)},
            fwd_offsets=npz["fwd_offsets"],
            fwd_term_ids=npz["fwd_term_ids"],
            fwd_tfs=npz["fwd_tfs"],
        )
        self._docid_to_ord = {d: i for i, d in enumerate(docid_strings)}
        self._doc_offsets = np.load(index_path / "doc_offsets.npy")
        self._docs_bin = np.memmap(index_path / "docs.bin", dtype=np.uint8, mode="r")
        if (index_path / "docterms.bin").exists():
            self._docterm_offsets = np.load(index_path / "docterm_offsets.npy")
            self._docterms_bin = np.memmap(index_path / "docterms.bin", dtype=np.int32, mode="r")
        else:
            self._docterm_offsets = None
        return self._data

    @property
    def data(self) -> IndexData:
        return self._load()

    def get_doc(self, docid):
        self._load()
        try:
            ord_ = self._docid_to_ord[docid]
        except KeyError:
            return None
        s, e = self._doc_offsets[ord_], self._doc_offsets[ord_ + 1]
        return bytes(self._docs_bin[s:e]).decode("utf-8")

    def get_df(self, term):
        """Document frequency of an already-analyzed term (parity:
        /root/reference/capreolus/index/anserini.py:append get_df)."""
        data = self._load()
        tid = data.vocab.get(term)
        return 0 if tid is None else data.df(tid)

    def get_idf(self, term):
        """BM25 idf log(1 + (N - df + 0.5) / (df + 0.5)), 0 for unseen terms
        (parity: /root/reference/capreolus/index/anserini.py:101-114)."""
        df = self.get_df(term)
        if df == 0:
            return 0.0
        n = self._load().num_docs
        return math.log(1 + (n - df + 0.5) / (df + 0.5))

    def get_doc_term_ids(self, doc_ord: int):
        """Positional forward index: the doc's analyzed token-id sequence
        (requires storepositions=True)."""
        self._load()
        if self._docterm_offsets is None:
            raise ValueError("index was built without storepositions=True")
        s, e = self._docterm_offsets[doc_ord], self._docterm_offsets[doc_ord + 1]
        return np.asarray(self._docterms_bin[s:e])

    def analyze(self, text):
        return self._analyzer().analyze(text)
