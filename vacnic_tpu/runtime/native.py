"""Native runtime bindings: compile-on-first-use C components via ctypes.

The framework's compute path is JAX/XLA/Pallas; the runtime around it keeps
its hot host-side loops in C (here: the BPE merge loop feeding the data
pipeline). The shared object is built once with the system compiler into a
cache directory and bound with ctypes — no pip, no pybind11. Every native
entry point has a pure-Python fallback, so the package works without a
compiler.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "fastbpe.c")
_LIB = None
_TRIED = False


def _build_dir() -> str:
    d = os.environ.get("VACNIC_NATIVE_CACHE") or os.path.join(
        tempfile.gettempdir(), f"vacnic_native_{os.getuid()}"
    )
    os.makedirs(d, exist_ok=True)
    return d


def load_fastbpe():
    """Return the ctypes lib or None (no compiler / build failure)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        so_path = os.path.join(_build_dir(), f"libfastbpe_{tag}.so")
        if not os.path.exists(so_path):
            for cc in ("cc", "gcc", "clang"):
                try:
                    subprocess.run(
                        [cc, "-O2", "-shared", "-fPIC", _SRC, "-o", so_path],
                        check=True, capture_output=True, timeout=60,
                    )
                    break
                except (FileNotFoundError, subprocess.CalledProcessError):
                    continue
            else:
                return None
        lib = ctypes.CDLL(so_path)
        lib.bpe_encode_batch.restype = ctypes.c_int
        lib.bpe_encode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32),  # syms
            ctypes.POINTER(ctypes.c_int64),  # offsets
            ctypes.POINTER(ctypes.c_int32),  # out_lens
            ctypes.c_int64,  # n_words
            ctypes.POINTER(ctypes.c_uint64),  # keys
            ctypes.POINTER(ctypes.c_int32),  # ranks
            ctypes.POINTER(ctypes.c_int32),  # merged
            ctypes.c_int64,  # n_table
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


class FastBpe:
    """Native BPE merge engine over a (keys, ranks, merged) table."""

    def __init__(self, pair_keys: np.ndarray, ranks: np.ndarray, merged: np.ndarray):
        order = np.argsort(pair_keys)
        self.keys = np.ascontiguousarray(pair_keys[order], np.uint64)
        self.ranks = np.ascontiguousarray(ranks[order], np.int32)
        self.merged = np.ascontiguousarray(merged[order], np.int32)
        self.lib = load_fastbpe()

    @property
    def available(self) -> bool:
        return self.lib is not None

    def encode_words(self, words: list[list[int]]) -> list[list[int]]:
        """Apply the merge loop to each word's initial symbol ids."""
        if not words:
            return []
        offsets = np.zeros(len(words) + 1, np.int64)
        for i, w in enumerate(words):
            offsets[i + 1] = offsets[i] + len(w)
        syms = np.zeros(int(offsets[-1]), np.int32)
        for i, w in enumerate(words):
            syms[offsets[i] : offsets[i + 1]] = w
        out_lens = np.zeros(len(words), np.int32)
        self.lib.bpe_encode_batch(
            syms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(words),
            self.keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            self.ranks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.merged.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(self.keys),
        )
        return [
            syms[offsets[i] : offsets[i] + int(out_lens[i])].tolist()
            for i in range(len(words))
        ]
