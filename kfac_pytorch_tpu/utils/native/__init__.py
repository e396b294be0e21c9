"""ctypes loader for the native augmentation kernels.

Compiles ``augment.cpp`` once with the system C++ toolchain into a cached
shared object and binds it with ctypes; callers use
``random_crop_flip(...)`` which transparently falls back to numpy when no
toolchain is available (same optional-native-fast-path pattern as the
reference's apex_C flatten/unflatten, ``kfac/distributed.py:12-24``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ['native_available', 'random_crop_flip']

_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build_and_load() -> ctypes.CDLL | None:
    src = os.path.join(os.path.dirname(__file__), 'augment.cpp')
    cache_dir = os.path.join(
        tempfile.gettempdir(),
        f'kfac_tpu_native_{os.getuid()}',
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, 'libkfacaug.so')
    if not os.path.exists(lib_path) or (
        os.path.getmtime(lib_path) < os.path.getmtime(src)
    ):
        cmd = [
            'g++', '-O3', '-march=native', '-shared', '-fPIC',
            src, '-o', lib_path,
        ]
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=120,
            )
        except (OSError, subprocess.SubprocessError) as e:
            logger.debug(f'native augment build failed: {e}')
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError as e:
        logger.debug(f'native augment load failed: {e}')
        return None
    lib.random_crop_flip.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        *([ctypes.c_int64] * 6),
    ]
    lib.random_crop_flip.restype = None
    return lib


def _get_lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build_and_load()
    return _LIB


def native_available() -> bool:
    """Whether the compiled fast path is usable on this host."""
    return _get_lib() is not None


def _crop_flip_numpy(
    padded: np.ndarray,
    offs: np.ndarray,
    flips: np.ndarray,
    h: int,
    w: int,
) -> np.ndarray:
    n = padded.shape[0]
    out = np.empty((n, h, w, padded.shape[3]), np.float32)
    for i in range(n):
        oy, ox = offs[i]
        crop = padded[i, oy:oy + h, ox:ox + w]
        out[i] = crop[:, ::-1] if flips[i] else crop
    return out


def random_crop_flip(
    padded: np.ndarray,
    offs: np.ndarray,
    flips: np.ndarray,
    h: int,
    w: int,
) -> np.ndarray:
    """Batched random crop + horizontal flip (native when available).

    Args:
        padded: ``(n, ph, pw, c)`` float32 padded images.
        offs: ``(n, 2)`` int32 crop offsets.
        flips: ``(n,)`` bool/uint8 flip mask.
        h/w: output spatial size.
    """
    lib = _get_lib()
    padded = np.ascontiguousarray(padded, np.float32)
    offs = np.ascontiguousarray(offs, np.int32)
    flips = np.ascontiguousarray(flips, np.uint8)
    if lib is None:
        return _crop_flip_numpy(padded, offs, flips, h, w)
    n, ph, pw, c = padded.shape
    out = np.empty((n, h, w, c), np.float32)
    lib.random_crop_flip(
        padded.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, ph, pw, h, w, c,
    )
    return out
