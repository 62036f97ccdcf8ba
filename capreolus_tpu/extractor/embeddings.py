"""Pretrained word-embedding loading with npy+vocab caching.

Capability parity with /root/reference/capreolus/extractor/common.py:19-48
(pymagnitude GloVe/word2vec/fastText streams converted once to a .npy matrix and a
vocab file). Offline environments can use the deterministic ``random`` family so
the full pipeline runs without downloads (the reference's tests monkeypatch
embeddings to small matrices for the same reason, reranker/tests/test_rerankers.py:43+).
"""

from __future__ import annotations

import numpy as np

from capreolus_tpu.core import constants
from capreolus_tpu.utils.common import OfflineEnvironmentError, download_file
from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)

EMBEDDING_SOURCES = {
    # name -> (url, dim); urls point at the standard public vectors (gated offline)
    "glove6b": ("http://nlp.stanford.edu/data/glove.6B.zip", 300),
    "glove6b.50d": ("http://nlp.stanford.edu/data/glove.6B.zip", 50),
    "w2vnews": ("https://s3.amazonaws.com/dl4j-distribution/GoogleNews-vectors-negative300.bin.gz", 300),
    "fasttext": ("https://dl.fbaipublicfiles.com/fasttext/vectors-wiki/wiki.en.zip", 300),
}
RANDOM_DIMS = {"random": 50, "random8": 8, "random300": 300}


def embedding_dim(name: str) -> int:
    if name in RANDOM_DIMS:
        return RANDOM_DIMS[name]
    if name in EMBEDDING_SOURCES:
        return EMBEDDING_SOURCES[name][1]
    raise ValueError(f"unknown embedding source {name!r}")


def load_pretrained_embeddings(name: str):
    """Returns (matrix float32 [V, dim], vocab dict term->row).

    Cached as <cache>/embeddings/<name>.npy + <name>.vocab.txt (same artifact
    format as the reference's magnitude cache).
    """
    cache_dir = constants["CACHE_BASE_PATH"] / "embeddings"
    npy_fn = cache_dir / f"{name}.npy"
    vocab_fn = cache_dir / f"{name}.vocab.txt"
    if npy_fn.exists() and vocab_fn.exists():
        matrix = np.load(npy_fn)
        vocab = {t: i for i, t in enumerate(vocab_fn.read_text(encoding="utf-8").splitlines())}
        return matrix, vocab

    if name in RANDOM_DIMS:
        # deterministic random embeddings for offline/CI runs: vectors are derived
        # per-term at lookup time (see hash_embed), so there is no fixed vocab
        return None, None

    if name not in EMBEDDING_SOURCES:
        raise ValueError(f"unknown embedding source {name!r}; known: {sorted(EMBEDDING_SOURCES) + sorted(RANDOM_DIMS)}")

    url, dim = EMBEDDING_SOURCES[name]
    raise OfflineEnvironmentError(
        f"embeddings {name!r} not cached at {npy_fn} and downloads are unavailable; "
        f"fetch {url}, convert to a [V,{dim}] .npy + vocab.txt, or use embeddings=random"
    )


def hash_embed(term: str, dim: int) -> np.ndarray:
    """Deterministic pseudo-random unit vector for a term (offline embedding mode)."""
    seed = np.frombuffer(term.encode("utf-8").ljust(8, b"\0")[:8], dtype=np.uint64)[0]
    rng = np.random.Generator(np.random.PCG64(int(seed)))
    v = rng.standard_normal(dim).astype(np.float32)
    return v / (np.linalg.norm(v) + 1e-9)


def build_embedding_matrix(name: str, terms):
    """Build an embedding matrix for ``terms`` with row 0 = padding zeros.

    Returns (matrix [n_found+1, dim], stoi, itos). Terms present in the pretrained
    vectors map to rows >= 1; terms absent from them get *negative* ids (the OOV
    exact-match convention of /root/reference/capreolus/extractor/embedtext.py:118-126).
    In the offline ``random`` modes every term gets a deterministic hash vector.
    """
    matrix_full, vocab = load_pretrained_embeddings(name)
    dim = embedding_dim(name)
    terms = list(terms)
    stoi, itos = {}, {0: None}
    rows = [np.zeros(dim, dtype=np.float32)]
    next_oov = -1
    for term in terms:
        if matrix_full is not None:
            row = vocab.get(term)
            if row is not None:
                stoi[term] = len(rows)
                itos[len(rows)] = term
                rows.append(matrix_full[row])
            else:
                stoi[term] = next_oov
                itos[next_oov] = term
                next_oov -= 1
        else:
            stoi[term] = len(rows)
            itos[len(rows)] = term
            rows.append(hash_embed(term, dim))
    if matrix_full is not None and next_oov < -1:
        logger.info("%d/%d terms missing from %s embeddings (negative OOV ids)", -next_oov - 1, len(terms), name)
    return np.stack(rows), stoi, itos
