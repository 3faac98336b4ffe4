"""ctypes binding for the native data runtime (native/dataloader.cc).

Auto-builds ``libmcn_data.so`` with g++ on first use (cached next to the
source); every entry point has a numpy fallback so the framework stays
functional without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmcn_data.so")

_lock = threading.Lock()
_lib = None
_lib_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        if not os.path.exists(_SO_PATH):
            src = os.path.join(_NATIVE_DIR, "dataloader.cc")
            if not os.path.exists(src):
                return None
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-pthread",
                     "-std=c++17", "-o", _SO_PATH, src],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.mcn_shuffle_indices.argtypes = [
            ctypes.c_uint64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.mcn_gather_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int]
        lib.mcn_u8_to_f32_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def shuffle_indices(seed: int, n: int) -> np.ndarray:
    """Deterministic permutation of [0, n) (native Fisher-Yates, numpy
    fallback)."""
    lib = _load()
    if lib is None:
        return np.random.RandomState(seed & 0xFFFFFFFF).permutation(n)
    out = np.empty(n, np.int64)
    lib.mcn_shuffle_indices(
        ctypes.c_uint64(seed), ctypes.c_int64(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def gather_batch(pool: np.ndarray, idx: np.ndarray,
                 n_threads: int | None = None) -> np.ndarray:
    """pool[idx] as one contiguous batch via threaded memcpy.

    pool: [N, ...] uint8 C-contiguous; idx: int64 [B].
    """
    if pool.dtype != np.uint8 or not pool.flags.c_contiguous:
        return np.ascontiguousarray(pool[idx])
    lib = _load()
    if lib is None:
        return np.ascontiguousarray(pool[idx])
    idx = np.ascontiguousarray(idx, np.int64)
    item_bytes = int(np.prod(pool.shape[1:]))
    out = np.empty((len(idx), *pool.shape[1:]), np.uint8)
    threads = n_threads or min(8, os.cpu_count() or 1)
    lib.mcn_gather_batch(
        pool.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(idx)), ctypes.c_int64(item_bytes),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(threads))
    return out


def normalize_u8_host(images: np.ndarray, mean, std,
                      n_threads: int | None = None) -> np.ndarray:
    """(x/255 - mean)/std on host (CPU-only smoke path; production
    normalizes on-device)."""
    c = images.shape[-1]
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    scale = (1.0 / (255.0 * std)).astype(np.float32)
    shift = (-mean / std).astype(np.float32)
    lib = _load()
    if lib is None or images.dtype != np.uint8 or \
            not images.flags.c_contiguous:
        return images.astype(np.float32) * scale + shift
    out = np.empty(images.shape, np.float32)
    pixels = images.size // c
    threads = n_threads or min(8, os.cpu_count() or 1)
    lib.mcn_u8_to_f32_normalize(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        shift.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pixels), ctypes.c_int64(c), ctypes.c_int(threads))
    return out
