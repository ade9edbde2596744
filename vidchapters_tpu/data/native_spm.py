"""ctypes binding for the native unigram-SPM encoder (native/spm_encoder.cpp).

The data factory tokenizes millions of ASR transcripts (reference scale:
HowTo100M + VidChapters-7M, asr via args.py max_input_tokens); the pure
Python Viterbi in data/tokenizer.py is exact but slow, so
``SentencePieceUnigramTokenizer`` routes ``_encode_text`` through this
C++ twin when a compiler is present (exact-id parity pinned by
tests/test_native_spm.py) and falls back to Python otherwise.

Builds the shared library on first use (g++, cached next to the source) —
same pattern as data/native_loader.py.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

_SRC = Path(__file__).resolve().parents[2] / "native" / "spm_encoder.cpp"
_LIB = _SRC.with_suffix(".so")


def _build() -> Optional[Path]:
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True)
        return _LIB
    except (FileNotFoundError, subprocess.CalledProcessError):
        return None


_handle = None
_load_failed = False


def _load_lib():
    global _handle, _load_failed
    if _handle is not None or _load_failed:
        return _handle
    lib_path = _build()
    if lib_path is None:
        _load_failed = True
        return None
    lib = ctypes.CDLL(str(lib_path))
    lib.spm_create.restype = ctypes.c_void_p
    lib.spm_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                               ctypes.POINTER(ctypes.c_double),
                               ctypes.c_int64, ctypes.c_int32,
                               ctypes.c_double]
    lib.spm_destroy.argtypes = [ctypes.c_void_p]
    lib.spm_encode.restype = ctypes.c_int64
    lib.spm_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                               ctypes.c_int64,
                               ctypes.POINTER(ctypes.c_int32),
                               ctypes.c_int64]
    _handle = lib
    return lib


class NativeSpmEncoder:
    """Viterbi encoder over a piece table; exact twin of the Python path."""

    def __init__(self, pieces: Sequence[Tuple[str, float, int]],
                 unk_id: int, unk_score: float):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native spm encoder unavailable (no g++?)")
        self._lib = lib
        n = len(pieces)
        self._piece_bufs = [p.encode("utf-8") for (p, _, _) in pieces]
        arr = (ctypes.c_char_p * n)(*self._piece_bufs)
        scores = (ctypes.c_double * n)(*[s for (_, s, _) in pieces])
        self._h = lib.spm_create(arr, scores, n, unk_id, unk_score)
        if not self._h:
            raise RuntimeError("spm_create failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.spm_destroy(h)
            self._h = None

    def encode(self, normalized_text: str) -> List[int]:
        """ids for an already-normalized string (caller applies the T5
        dummy-prefix/whitespace normalization, as in the Python path)."""
        raw = normalized_text.encode("utf-8")
        # explicit byte length: embedded NULs must tokenize (as unk, like
        # the Python twin), not truncate the transcript
        cap = len(raw) + 1  # every id consumes >= 1 byte
        out = (ctypes.c_int32 * cap)()
        got = self._lib.spm_encode(self._h, raw, len(raw), out, cap)
        if got < 0:  # cannot happen given cap, but honor the protocol
            cap = -got
            out = (ctypes.c_int32 * cap)()
            got = self._lib.spm_encode(self._h, raw, len(raw), out, cap)
        return list(out[:got])


def is_available() -> bool:
    return _load_lib() is not None
