"""Native (C++) components, loaded via ctypes with pure-Python fallbacks.

Built lazily with ``g++`` into a per-version cache; every native function has a
Python twin that is also the correctness oracle in tests.  Set
``MIMIC_TPU_NO_NATIVE=1`` to force the Python paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import List, Optional

_SRC = os.path.join(os.path.dirname(__file__), "ptb_tokenizer.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("MIMIC_TPU_NO_NATIVE"):
        return None
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache_dir = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "mimic_tpu",
        )
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"ptb_tokenizer-{digest}.so")
        if not os.path.exists(so_path):
            tmp = so_path + ".tmp"
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.ptb_tokenize_line.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.ptb_tokenize_line.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _build_and_load() is not None


def ptb_tokenize_native(line: str, lowercase: bool = True) -> Optional[List[str]]:
    """C++ PTB tokenization; None when the native library is unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    data = line.encode("utf-8")
    cap = max(256, 2 * len(data) + 64)
    buf = ctypes.create_string_buffer(cap)
    n = lib.ptb_tokenize_line(data, 1 if lowercase else 0, buf, cap)
    if n < 0:
        cap = 8 * len(data) + 1024
        buf = ctypes.create_string_buffer(cap)
        n = lib.ptb_tokenize_line(data, 1 if lowercase else 0, buf, cap)
        if n < 0:
            return None
    out = buf.value.decode("utf-8", errors="replace")
    return out.split(" ") if out else []
