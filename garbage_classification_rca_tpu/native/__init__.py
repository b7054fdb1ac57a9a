"""ctypes loader / builder for the native preprocessing libraries.

Builds ``libpreprocess.so`` (pad+resize) and ``libdecode.so`` (fused
JPEG decode+pad+resize, needs libjpeg) from source on first use (g++ is
in the image; output cached next to the source). Falls back silently to
the Python/cv2 path when unavailable — set GC_RCA_NATIVE=0 to force the
fallback, GC_RCA_NATIVE=1 to require native (raises on failure).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "preprocess.cpp")
_LIB = os.path.join(_DIR, "libpreprocess.so")
_DEC_SRC = os.path.join(_DIR, "decode.cpp")
_DEC_LIB = os.path.join(_DIR, "libdecode.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False
_dec_lib: Optional[ctypes.CDLL] = None
_dec_tried = False


def _load_or_build(srcs: Sequence[str], lib_path: str, main_src: str,
                   extra_flags: Sequence[str] = ()) -> Optional[ctypes.CDLL]:
    """Shared env-gate + stale-check + g++ build + CDLL load.

    Rebuilds when the lib is older than ANY of `srcs` (decode.cpp
    #includes preprocess.cpp). GC_RCA_NATIVE=0 disables, =1 makes a
    build failure fatal; otherwise returns None for the Python fallback.
    """
    if os.environ.get("GC_RCA_NATIVE") == "0":
        return None
    src_mtime = max(os.path.getmtime(s) for s in srcs)
    if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < src_mtime:
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o",
                 lib_path, main_src, "-lpthread", *extra_flags],
                check=True, capture_output=True, timeout=120)
        except Exception:
            if os.environ.get("GC_RCA_NATIVE") == "1":
                raise RuntimeError(f"native build failed: {main_src}")
            return None
    return ctypes.CDLL(lib_path)


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    lib = _load_or_build([_SRC], _LIB, _SRC)
    if lib is None:
        return None
    lib.pad_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),                       # srcs
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.pad_resize_batch.restype = None
    _lib = lib
    return _lib


def decode_enabled() -> bool:
    """Opt-in (GC_RCA_NATIVE_DECODE=1): fused C++ JPEG decode+pad+resize.

    Off by default on purpose: the decode is bit-identical to PIL when
    both wrap the same libjpeg-turbo (asserted by tests/test_native.py in
    this image), but a container with a different decoder build could
    drift by a few LSBs, and the eval path's accuracy parity is judged on
    exact pixels. Enable for ingest-bound training/serving."""
    return os.environ.get("GC_RCA_NATIVE_DECODE") == "1"


def get_decode_lib() -> Optional[ctypes.CDLL]:
    global _dec_lib, _dec_tried
    if _dec_lib is not None or _dec_tried:
        return _dec_lib
    _dec_tried = True
    lib = _load_or_build([_DEC_SRC, _SRC], _DEC_LIB, _DEC_SRC, ["-ljpeg"])
    if lib is None:
        return None
    lib.decode_pad_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),                       # jpeg bufs
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
        ctypes.c_double, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p]
    lib.decode_pad_resize_batch.restype = None
    _dec_lib = lib
    return _dec_lib


def decode_pad_resize_batch(blobs: List[bytes], height: int, width: int,
                            target_ar: float, n_threads: int = 0):
    """Fused JPEG decode + pad-to-AR + resize; (batch, ok_mask) or None.

    blobs: raw JPEG file bytes per image. ok_mask[i]=False marks a decode
    the native path refused (non-JPEG, CMYK, corrupt/truncated,
    absurd-dimension header) — that slot is zeroed and the caller must
    fall back to the PIL route for it."""
    lib = get_decode_lib()
    if lib is None:
        return None
    n = len(blobs)
    out = np.empty((n, height, width, 3), np.uint8)
    oks = np.zeros(n, np.int32)
    bufs = (ctypes.c_void_p * n)()
    lens = (ctypes.c_size_t * n)()
    for i, b in enumerate(blobs):       # `blobs` keeps the bytes alive
        bufs[i] = ctypes.cast(ctypes.c_char_p(b), ctypes.c_void_p)
        lens[i] = len(b)
    lib.decode_pad_resize_batch(bufs, lens, n, ctypes.c_double(target_ar),
                                out.ctypes.data, height, width, n_threads,
                                oks.ctypes.data)
    return out, oks.astype(bool)


def pad_resize_batch(images: List[np.ndarray], height: int, width: int,
                     target_ar: float, n_threads: int = 0
                     ) -> Optional[np.ndarray]:
    """Batch pad-to-AR + resize via the native lib; None if unavailable.

    images: list of uint8 HWC arrays (contiguous).
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(images)
    out = np.empty((n, height, width, 3), np.uint8)
    srcs = (ctypes.c_void_p * n)()
    shs = (ctypes.c_int * n)()
    sws = (ctypes.c_int * n)()
    keep = []
    for i, im in enumerate(images):
        if not im.flags["C_CONTIGUOUS"] or im.dtype != np.uint8:
            im = np.ascontiguousarray(im, np.uint8)
        keep.append(im)
        srcs[i] = im.ctypes.data
        shs[i] = im.shape[0]
        sws[i] = im.shape[1]
    lib.pad_resize_batch(srcs, shs, sws, 3, n, ctypes.c_double(target_ar),
                         out.ctypes.data, height, width, n_threads)
    return out
