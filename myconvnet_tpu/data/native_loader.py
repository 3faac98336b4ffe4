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
        src = os.path.join(_NATIVE_DIR, "dataloader.cc")
        stale = (os.path.exists(_SO_PATH) and os.path.exists(src) and
                 os.path.getmtime(_SO_PATH) < os.path.getmtime(src))
        if not os.path.exists(_SO_PATH) or stale:
            if not os.path.exists(src):
                return None
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread",
                   "-std=c++17"]
            if os.path.exists("/usr/include/jpeglib.h"):
                cmd += ["-DMCN_WITH_JPEG"]
            if os.path.exists("/usr/include/png.h"):
                cmd += ["-DMCN_WITH_PNG"]
            cmd += ["-o", _SO_PATH, src]
            if "-DMCN_WITH_JPEG" in cmd:
                cmd += ["-ljpeg"]
            if "-DMCN_WITH_PNG" in cmd:
                cmd += ["-lpng"]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
            except Exception:
                if not os.path.exists(_SO_PATH):
                    return None
                # rebuild failed but a prebuilt (stale) library exists —
                # keep using it rather than losing the native path
                pass
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
        try:  # older prebuilt libraries may predate the JPEG entry points
            lib.mcn_has_jpeg.restype = ctypes.c_int
            if lib.mcn_has_jpeg():
                lib.mcn_decode_jpeg_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_void_p),
                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                    ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        except AttributeError:
            lib.mcn_has_jpeg = lambda: 0  # type: ignore[assignment]
        try:
            lib.mcn_has_png.restype = ctypes.c_int
            if lib.mcn_has_png():
                lib.mcn_png_info.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int)]
                lib.mcn_decode_png.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                    ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int64]
        except AttributeError:
            lib.mcn_has_png = lambda: 0  # type: ignore[assignment]
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


def native_jpeg_available() -> bool:
    lib = _load()
    return bool(lib is not None and lib.mcn_has_jpeg())


def decode_jpeg_batch(blobs: list[bytes], raw_hw: tuple[int, int],
                      n_threads: int | None = None) -> np.ndarray:
    """Decode JPEG byte strings to a [N, th, tw, 3] uint8 batch with the
    pipeline's cover-resize + center-crop semantics — threaded native
    libjpeg (DCT-prescaled), PIL fallback per image on failure.
    """
    th, tw = raw_hw
    n = len(blobs)
    out = np.empty((n, th, tw, 3), np.uint8)
    lib = _load()
    if lib is not None and lib.mcn_has_jpeg() and n:
        bufs = [np.frombuffer(b, np.uint8) for b in blobs]
        ptrs = (ctypes.c_void_p * n)(
            *[b.ctypes.data_as(ctypes.c_void_p).value for b in bufs])
        lens = np.asarray([len(b) for b in blobs], np.int64)
        status = np.zeros(n, np.int32)
        threads = n_threads or min(8, os.cpu_count() or 1)
        lib.mcn_decode_jpeg_batch(
            ptrs, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(n), ctypes.c_int(th), ctypes.c_int(tw),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.c_int(threads))
        failed = np.nonzero(status)[0]
    else:
        failed = np.arange(n)
    for i in failed:  # non-JPEG container / corrupt -> PIL path
        out[i] = _decode_pil(blobs[i], raw_hw)
    return out


def _decode_pil(blob: bytes, raw_hw: tuple[int, int]) -> np.ndarray:
    import io

    from PIL import Image

    from myconvnet_tpu.data.pipeline import cover_resize_center_crop
    return cover_resize_center_crop(
        Image.open(io.BytesIO(blob)).convert("RGB"), raw_hw)


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


def native_png_available() -> bool:
    lib = _load()
    return bool(lib is not None and lib.mcn_has_png())


def decode_png(blob: bytes, mode: str = "rgb") -> np.ndarray | None:
    """Decode one PNG natively.  mode "rgb" -> [H,W,3] uint8 (palette/
    gray expanded); mode "raw" -> [H,W] uint8 of palette INDICES or gray
    values (VOC-style segmentation masks: the class id is the index).
    Returns None when the native path is unavailable or declines (e.g.
    raw mode on a truecolor image) — callers fall back to PIL.
    """
    lib = _load()
    if lib is None or not lib.mcn_has_png():
        return None
    buf = np.frombuffer(blob, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.mcn_png_info(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(len(blob)), ctypes.byref(h),
            ctypes.byref(w)) != 0:
        return None
    raw = mode == "raw"
    out = np.empty((h.value, w.value) if raw else (h.value, w.value, 3),
                   np.uint8)
    rc = lib.mcn_decode_png(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(len(blob)), ctypes.c_int(1 if raw else 0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(out.nbytes))
    return out if rc == 0 else None
