"""ctypes binding + on-demand build of the native host library.

Builds native/host_ops.cpp with g++ on first use (cached as
native/libhost_ops.so); every caller has a pure-numpy fallback, so the
framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "host_ops.cpp")
_SO = os.path.join(_NATIVE_DIR, "libhost_ops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    # -march=native vectorizes the fused loader kernels (measured 2.1-2.2x
    # on color_distort/mixup chains); -ffp-contract=off keeps it BITWISE —
    # auto-vectorization is per-element IEEE-safe, but without it -O3 with
    # FMA hardware may contract mul+add and change rounding (the bitwise
    # contracts in tests/test_native.py would catch that).  Fall back to
    # baseline flags if -march=native is rejected (exotic/old toolchains).
    for flags in (["-O3", "-march=native", "-ffp-contract=off"], ["-O3"]):
        try:
            subprocess.run(
                ["g++", *flags, "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            continue
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not os.path.exists(_SRC) or not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        i64, u8p = ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)
        f64p = ctypes.POINTER(ctypes.c_double)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.bbox_iou_xywh.argtypes = [f64p, i64, f64p, i64, u8p, f64p]
        lib.match_greedy.argtypes = [f64p, i64, i64, u8p, u8p, f64p, i64,
                                     i64p, i64p]
        lib.gt2yolo_scatter.argtypes = [
            f32p, i32p, f32p, i32p, i64, i64, i32p, i64, f32p, f32p,
            i64, i64, i64, f32p]
        lib.f32_to_u8_rint.argtypes = [f32p, i64, u8p]
        lib.color_distort_u8.argtypes = [u8p, i64, i32p, f32p, i64, f32p]
        lib.color_distort_f32.argtypes = [f32p, i64, i32p, f32p, i64, f32p]
        lib.mixup_u8.argtypes = [u8p, i64, i64, u8p, i64, i64,
                                 ctypes.c_float, ctypes.c_float, i64, u8p]
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def bbox_iou_xywh(dt: np.ndarray, gt: np.ndarray,
                  iscrowd: np.ndarray) -> Optional[np.ndarray]:
    """Native pairwise xywh IoU with crowd semantics; None if lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    dt = np.ascontiguousarray(dt, np.float64)
    gt = np.ascontiguousarray(gt, np.float64)
    crowd = np.ascontiguousarray(iscrowd, np.uint8)
    out = np.zeros((len(dt), len(gt)), np.float64)
    lib.bbox_iou_xywh(_ptr(dt, ctypes.c_double), len(dt),
                      _ptr(gt, ctypes.c_double), len(gt),
                      _ptr(crowd, ctypes.c_uint8),
                      _ptr(out, ctypes.c_double))
    return out


def match_greedy(ious: np.ndarray, g_ignore: np.ndarray, g_crowd: np.ndarray,
                 thrs: np.ndarray):
    """Native greedy matching; returns (dt_m, gt_m) [nt,nd]/[nt,ng] or None.

    g_ignore marks gts excluded from scoring (crowd OR area-out-of-range);
    g_crowd marks ONLY crowd gts — the ones multiple dts may match
    (pycocotools cocoeval.py evaluateImg semantics)."""
    lib = get_lib()
    if lib is None:
        return None
    nd, ng = ious.shape
    nt = len(thrs)
    ious = np.ascontiguousarray(ious, np.float64)
    gi = np.ascontiguousarray(g_ignore, np.uint8)
    gc = np.ascontiguousarray(g_crowd, np.uint8)
    th = np.ascontiguousarray(thrs, np.float64)
    dt_m = np.zeros((nt, nd), np.int64)
    gt_m = np.zeros((nt, ng), np.int64)
    lib.match_greedy(_ptr(ious, ctypes.c_double), nd, ng,
                     _ptr(gi, ctypes.c_uint8), _ptr(gc, ctypes.c_uint8),
                     _ptr(th, ctypes.c_double), nt,
                     _ptr(dt_m, ctypes.c_int64), _ptr(gt_m, ctypes.c_int64))
    return dt_m, gt_m


def color_distort(img: np.ndarray, codes: np.ndarray,
                  params: np.ndarray) -> Optional[np.ndarray]:
    """Fused ColorDistort op chain in one native pass (zero temporaries).

    ``img`` is [H, W, 3] uint8 or float32 (any other dtype is pre-cast to
    float32, matching the numpy path's leading ``astype``); ``codes`` int32
    [n_ops] with 0/1/2/3 = brightness/contrast/saturation/hue; ``params``
    float32 [n_ops, 12] packed as host_ops.cpp documents.  Returns the new
    float32 image, or None when the native lib is unavailable — the caller
    falls back to the per-op numpy chain (bitwise-identical, pinned by
    tests/test_native.py)."""
    lib = get_lib()
    if lib is None or img.ndim != 3 or img.shape[2] != 3:
        return None  # kernel assumes HWC RGB; caller's numpy chain is general
    if img.dtype not in (np.uint8, np.float32):
        img = img.astype(np.float32, copy=False)
    img = np.ascontiguousarray(img)
    codes = np.ascontiguousarray(codes, np.int32)
    params = np.ascontiguousarray(params, np.float32)
    out = np.empty(img.shape, np.float32)
    n_px = img.shape[0] * img.shape[1]
    fn = (lib.color_distort_u8 if img.dtype == np.uint8
          else lib.color_distort_f32)
    fn(_ptr(img, ctypes.c_uint8 if img.dtype == np.uint8 else ctypes.c_float),
       n_px, _ptr(codes, ctypes.c_int32), _ptr(params, ctypes.c_float),
       len(codes), _ptr(out, ctypes.c_float))
    return out


def mixup_u8(im1: np.ndarray, im2: np.ndarray,
             factor: float) -> Optional[np.ndarray]:
    """Fused mixup blend in one native pass; None -> numpy fallback.

    Requires both images uint8 HWC with the same channel count (the
    post-decode case); the blended uint8 canvas is [max(h), max(w), C]
    with both images anchored at the origin, bitwise-identical to the
    numpy zeros/astype/add chain (tests/test_native.py)."""
    lib = get_lib()
    if (lib is None or im1.dtype != np.uint8 or im2.dtype != np.uint8
            or im1.ndim != 3 or im2.ndim != 3
            or im1.shape[2] != im2.shape[2]):
        return None
    im1 = np.ascontiguousarray(im1)
    im2 = np.ascontiguousarray(im2)
    h = max(im1.shape[0], im2.shape[0])
    w = max(im1.shape[1], im2.shape[1])
    out = np.empty((h, w, im1.shape[2]), np.uint8)
    lib.mixup_u8(_ptr(im1, ctypes.c_uint8), im1.shape[0], im1.shape[1],
                 _ptr(im2, ctypes.c_uint8), im2.shape[0], im2.shape[1],
                 np.float32(factor), np.float32(1.0 - factor),
                 im1.shape[2], _ptr(out, ctypes.c_uint8))
    return out


def pack_u8(src: np.ndarray, dst: np.ndarray) -> bool:
    """Single-pass clip(rint(src)).astype(uint8) into ``dst`` (native).

    ``src`` must be contiguous float32, ``dst`` contiguous uint8 of the same
    element count (e.g. one image's slot of a preallocated batch).  Returns
    False when the native lib is unavailable — caller falls back to numpy.
    Rounding is half-to-even (nearbyintf under the default FP environment ==
    np.rint), pinned bitwise by tests/test_native.py."""
    lib = get_lib()
    if lib is None:
        return False
    assert src.dtype == np.float32 and src.flags.c_contiguous
    assert dst.dtype == np.uint8 and dst.flags.c_contiguous
    assert src.size == dst.size
    lib.f32_to_u8_rint(_ptr(src, ctypes.c_float), src.size,
                       _ptr(dst, ctypes.c_uint8))
    return True
