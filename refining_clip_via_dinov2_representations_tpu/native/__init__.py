"""Native (C++) host-side accelerators.

Build on demand with g++ (no pybind11 — plain C ABI + ctypes). The first
import attempts a cached build; failures degrade silently to the pure-Python
implementations.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bpe_tokenizer.cpp")


def _so_path() -> str:
    # The binary is never committed (unreviewable, platform-specific); it is
    # built from source on first use and cached keyed on a source-content
    # hash, so edits to the .cpp force a rebuild and a stale/foreign-arch
    # binary can never be picked up.
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:12]
    cache_dir = os.environ.get("REFINING_CLIP_NATIVE_CACHE")
    if cache_dir is None:
        # per-user, 0700 cache: a shared world-writable path would let
        # another local user pre-plant a .so that we would CDLL-load
        base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
            os.path.expanduser("~"), ".cache"
        )
        if not os.path.isdir(os.path.dirname(base) or "/"):
            base = tempfile.gettempdir()
        cache_dir = os.path.join(base, f"refining_clip_native-{os.getuid()}")
    os.makedirs(cache_dir, mode=0o700, exist_ok=True)
    st = os.stat(cache_dir)
    if st.st_uid != os.getuid() or (st.st_mode & 0o022):
        raise RuntimeError(
            f"native cache dir {cache_dir!r} is not exclusively owned by the "
            "current user; refusing to load shared objects from it"
        )
    return os.path.join(cache_dir, f"_native-{h}.so")


def _build(so_path: str) -> bool:
    try:
        tmp = so_path + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", tmp],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, so_path)  # atomic: concurrent builders race safely
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        logging.debug("native build failed: %r", e)
        return False


_lib: Optional[ctypes.CDLL] = None


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    _SO_PATH = _so_path()
    if not os.path.exists(_SO_PATH):
        if not _build(_SO_PATH):
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.bpe_encode_word.restype = ctypes.c_int
        lib.bpe_encode_word.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.bpe_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib
    except OSError as e:
        logging.debug("native load failed: %r", e)
        return None


class NativeBPE:
    """ctypes wrapper over the C++ BPE core."""

    MAX_IDS = 1024

    def __init__(self, merges, vocab_tokens):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native BPE unavailable")
        self._lib = lib
        merges_blob = "\n".join(" ".join(m) for m in merges).encode("utf-8")
        vocab_blob = "\n".join(vocab_tokens).encode("utf-8")
        self._handle = lib.bpe_create(merges_blob, vocab_blob)
        self._buf = (ctypes.c_int32 * self.MAX_IDS)()

    def encode_word(self, mapped_word: str):
        n = self._lib.bpe_encode_word(
            self._handle, mapped_word.encode("utf-8"), self._buf, self.MAX_IDS
        )
        if n < 0:
            raise ValueError("word produced too many tokens")
        return list(self._buf[:n])

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.bpe_destroy(self._handle)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Native JPEG decode (jpeg_decoder.cpp) — separate shared object so a host
# without libjpeg dev files degrades ONLY the decode fast path, not the BPE
# core. Same cache/ownership discipline as the BPE build.
# ---------------------------------------------------------------------------

_JPEG_SRC = os.path.join(_DIR, "jpeg_decoder.cpp")


def _jpeg_so_path() -> str:
    with open(_JPEG_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(os.path.dirname(_so_path()), f"_native_jpeg-{h}.so")


def _build_jpeg(so_path: str) -> bool:
    try:
        tmp = so_path + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _JPEG_SRC,
             "-o", tmp, "-ljpeg"],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, so_path)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        logging.debug("native jpeg build failed: %r", e)
        return False


_jpeg_lib = None
_jpeg_lib_tried = False


def load_native_jpeg():
    """Load (building if needed) the JPEG decode library, or None."""
    global _jpeg_lib, _jpeg_lib_tried
    if _jpeg_lib is not None or _jpeg_lib_tried:
        return _jpeg_lib
    _jpeg_lib_tried = True
    so = _jpeg_so_path()
    if not os.path.exists(so):
        if not _build_jpeg(so):
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.rcd_jpeg_decode.restype = ctypes.c_int
        lib.rcd_jpeg_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.rcd_jpeg_free.restype = None
        lib.rcd_jpeg_free.argtypes = [ctypes.POINTER(ctypes.c_ubyte)]
        _jpeg_lib = lib
        return lib
    except OSError as e:
        logging.debug("native jpeg load failed: %r", e)
        return None


def decode_jpeg(data: bytes, target_min: int = 0):
    """Decode JPEG bytes to a uint8 [H,W,3] RGB array, DCT-downscaled so the
    shortest edge is the smallest M/8 multiple still >= `target_min`
    (`target_min <= 0` = full size). Returns None when the native library is
    unavailable or the stream is unsupported (CMYK) / corrupt — callers fall
    back to PIL."""
    lib = load_native_jpeg()
    if lib is None or len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    import numpy as np

    out = ctypes.POINTER(ctypes.c_ubyte)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.rcd_jpeg_decode(
        data, len(data), int(target_min),
        ctypes.byref(out), ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(out, shape=(h.value, w.value, 3)).copy()
    finally:
        lib.rcd_jpeg_free(out)
    return arr
