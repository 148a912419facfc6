"""ctypes binding for the native ARPA scorer (native/ngram_lm.cc).

Builds the shared library on demand with the repo Makefile if it is not
present (g++ is part of the toolchain); callers that cannot build fall back
to the pure-Python ArpaLanguageModel via ngram.load_language_model.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libngram_lm.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.lm_load.restype = ctypes.c_void_p
    lib.lm_load.argtypes = [ctypes.c_char_p]
    lib.lm_free.argtypes = [ctypes.c_void_p]
    lib.lm_order.restype = ctypes.c_int
    lib.lm_order.argtypes = [ctypes.c_void_p]
    lib.lm_score.restype = ctypes.c_double
    lib.lm_score.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


class NativeArpaLanguageModel:
    """Same .score contract as ngram.ArpaLanguageModel, C++ inside."""

    def __init__(self, path: str):
        self._lib = _load_lib()
        self._handle = self._lib.lm_load(path.encode())
        if not self._handle:
            raise IOError(f"failed to load ARPA model: {path}")
        self.order = self._lib.lm_order(self._handle)

    def score(self, sentence: str, bos: bool = True, eos: bool = True) -> float:
        return self._lib.lm_score(self._handle, sentence.encode(), int(bos), int(eos))

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.lm_free(self._handle)
                self._handle = None
        except Exception:
            pass
