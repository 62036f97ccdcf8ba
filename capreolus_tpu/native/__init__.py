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
_LIB = None
_TRIED = False


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


def native_porter_stem(word: str):
    lib = get_analyzer_lib()
    if lib is None:
        return None
    ptr = lib.ctpu_porter_stem(word.encode("ascii"))
    try:
        return ctypes.string_at(ptr).decode("ascii")
    finally:
        lib.ctpu_free(ptr)
