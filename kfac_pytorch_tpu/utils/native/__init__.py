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

__all__ = ['native_available', 'random_crop_flip', 'decode_cifar_records']

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
    lib.decode_cifar.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        *([ctypes.c_int64] * 4),
    ]
    lib.decode_cifar.restype = None
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


def decode_cifar_records(
    raw: np.ndarray,
    mean: np.ndarray,
    std: np.ndarray,
    h: int = 32,
    w: int = 32,
    c: int = 3,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode CIFAR binary records to normalized NHWC float32 images.

    ``raw`` is ``(n, 1 + c*h*w)`` uint8 (label byte + CHW planes, the
    ``cifar-10-batches-bin`` layout). Returns ``(images, labels)`` with
    images already ``(x/255 - mean) / std`` normalized. One fused native
    pass when the toolchain is available; numpy fallback otherwise.
    """
    raw = np.ascontiguousarray(raw, np.uint8)
    n = raw.shape[0]
    mean32 = np.ascontiguousarray(mean, np.float32)
    std32 = np.ascontiguousarray(std, np.float32)
    lib = _get_lib()
    if lib is None:
        labels = raw[:, 0].astype(np.int32)
        imgs = raw[:, 1:].reshape(n, c, h, w).transpose(0, 2, 3, 1)
        imgs = (imgs.astype(np.float32) / 255.0 - mean32) / std32
        return imgs, labels
    labels = np.empty((n,), np.int32)
    out = np.empty((n, h, w, c), np.float32)
    lib.decode_cifar(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mean32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, h, w, c,
    )
    return out, labels
