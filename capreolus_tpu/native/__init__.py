"""Native (C++) components: build-on-first-use shared library driven via ctypes.

The analyzer library accelerates the hot host-side path of index building (the
analog of the reference's Java/Lucene analyzer). It is compiled once with g++
into the cache directory; when the toolchain or build is unavailable everything
falls back to the pure-Python implementations transparently.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)

_SOURCE = Path(__file__).parent / "analyzer.cpp"
_TREC_SOURCE = Path(__file__).parent / "trec_reader.cpp"
_LIB = None
_TRIED = False
_TREC_LIB = None
_TREC_TRIED = False


def _build_dir():
    from capreolus_tpu.core import constants

    d = Path(constants["CACHE_BASE_PATH"]) / "native"
    d.mkdir(parents=True, exist_ok=True)
    return d


def get_analyzer_lib():
    """Returns the loaded ctypes library, building it on first use (None on failure)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("CAPREOLUS_NATIVE", "1").lower() in ("0", "false", "no"):
        return None
    try:
        src = _SOURCE.read_bytes()
        digest = hashlib.md5(src).hexdigest()[:12]
        lib_path = _build_dir() / f"analyzer_{digest}.so"
        if not lib_path.exists():
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", str(_SOURCE), "-o", str(lib_path)]
            logger.info("building native analyzer: %s", " ".join(cmd))
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(lib_path))
        lib.ctpu_analyze.restype = ctypes.c_void_p
        lib.ctpu_analyze.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.ctpu_free.argtypes = [ctypes.c_void_p]
        lib.ctpu_porter_stem.restype = ctypes.c_void_p
        lib.ctpu_porter_stem.argtypes = [ctypes.c_char_p]
        _LIB = lib
        logger.debug("native analyzer loaded from %s", lib_path)
    except Exception as e:
        logger.info("native analyzer unavailable (%s); using pure-Python analysis", e)
        _LIB = None
    return _LIB


def native_analyze(text: str, use_porter: bool, keep_stops: bool):
    """Analyze ASCII text with the native library; returns None if unavailable."""
    lib = get_analyzer_lib()
    if lib is None:
        return None
    ptr = lib.ctpu_analyze(text.encode("ascii"), int(use_porter), int(keep_stops))
    try:
        raw = ctypes.string_at(ptr)
    finally:
        lib.ctpu_free(ptr)
    if not raw:
        return []
    return raw.decode("ascii").rstrip("\n").split("\n")


def get_trec_reader_lib():
    """Native TREC document reader (None when the toolchain is unavailable)."""
    global _TREC_LIB, _TREC_TRIED
    if _TREC_LIB is not None or _TREC_TRIED:
        return _TREC_LIB
    _TREC_TRIED = True
    if os.environ.get("CAPREOLUS_NATIVE", "1").lower() in ("0", "false", "no"):
        return None
    try:
        src = _TREC_SOURCE.read_bytes()
        digest = hashlib.md5(src).hexdigest()[:12]
        lib_path = _build_dir() / f"trec_reader_{digest}.so"
        if not lib_path.exists():
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", str(_TREC_SOURCE), "-o", str(lib_path)]
            logger.info("building native TREC reader: %s", " ".join(cmd))
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(lib_path))
        lib.ctpu_parse_trec.restype = ctypes.c_void_p
        lib.ctpu_parse_trec.argtypes = [ctypes.c_char_p, ctypes.c_long]
        lib.ctpu_free_trec.argtypes = [ctypes.c_void_p]
        _TREC_LIB = lib
    except Exception as e:
        logger.info("native TREC reader unavailable (%s); using the Python parser", e)
        _TREC_LIB = None
    return _TREC_LIB


def native_parse_trec(data: bytes):
    """Parse a TREC file's bytes into [(docid, contents)]; None if unavailable."""
    lib = get_trec_reader_lib()
    if lib is None:
        return None
    ptr = lib.ctpu_parse_trec(data, len(data))
    try:
        raw = ctypes.string_at(ptr)
    finally:
        lib.ctpu_free_trec(ptr)
    if not raw:
        return []
    records = raw.decode("utf-8", errors="replace").split("")
    out = []
    for rec in records:
        if not rec:
            continue
        docid, _, contents = rec.partition("")
        out.append((docid, contents))
    return out


def native_porter_stem(word: str):
    lib = get_analyzer_lib()
    if lib is None:
        return None
    ptr = lib.ctpu_porter_stem(word.encode("ascii"))
    try:
        return ctypes.string_at(ptr).decode("ascii")
    finally:
        lib.ctpu_free(ptr)


_PRUNER_SOURCE = Path(__file__).parent / "pruner.cpp"
_PRUNER_LIB = None
_PRUNER_TRIED = False


def get_pruner_lib():
    """Native block-max span builder (pruner.cpp); None when unavailable."""
    global _PRUNER_LIB, _PRUNER_TRIED
    if _PRUNER_LIB is not None or _PRUNER_TRIED:
        return _PRUNER_LIB
    _PRUNER_TRIED = True
    if os.environ.get("CAPREOLUS_NATIVE", "1").lower() in ("0", "false", "no"):
        return None
    try:
        src = _PRUNER_SOURCE.read_bytes()
        digest = hashlib.md5(src).hexdigest()[:12]
        lib_path = _build_dir() / f"pruner_{digest}.so"
        if not lib_path.exists():
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", str(_PRUNER_SOURCE), "-o", str(lib_path)]
            logger.info("building native pruner: %s", " ".join(cmd))
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(lib_path))
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.ctpu_prune_spans.restype = ctypes.c_int64
        lib.ctpu_prune_spans.argtypes = [
            i64p, ctypes.c_int64,                       # q_offsets, num_queries
            i64p, f32p, i64p, i64p,                     # tids, w1, starts, ends
            i64p, i32p, i64p, i64p, f32p, f32p,         # rt_offsets/range/start/end/max_tf/min_dl
            f32p, f32p,                                 # gmax_tf, gmin_dl (table-less terms)
            i32p, i32p, i32p,                           # doc_ids, tfs, norm_doclens
            ctypes.c_double, ctypes.c_double, ctypes.c_double,  # k1, b, avgdl
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,  # num_ranges, topk, tile, min_savings
            i32p, i64p, i64p, f32p, i64p,               # out_qix, out_s, out_e, out_w1, out_stats
        ]
        _PRUNER_LIB = lib
    except Exception as e:
        logger.info("native pruner unavailable (%s); using the numpy span builder", e)
        _PRUNER_LIB = None
    return _PRUNER_LIB
