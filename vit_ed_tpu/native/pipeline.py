"""ctypes binding for the native input-pipeline runtime (pipeline.cc).

Builds on first use (g++ -O3, same pattern as the native solver) and
exposes crop/resize/normalize primitives that are BIT-EXACT vs the
PIL + numpy reference chain in data/transforms.py, plus a persistent
worker pool for whole-batch preparation off the Python thread.

Everything degrades gracefully: ``is_available()`` is False when no
compiler exists or ``VIT_ED_NATIVE_PIPELINE=0``, and callers fall back
to the Python path.
"""

from __future__ import annotations

import ctypes
import math
import os
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pipeline.cc")
_LIB_PATH = os.path.join(_HERE, "libvtpipeline.so")
_lock = threading.Lock()
_lib = None
_build_failed = False

BILINEAR = 0
BICUBIC = 1

_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _load():
    global _lib, _build_failed
    if _lib is not None:   # lock-free fast path for the per-sample hot loop
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if os.environ.get("VIT_ED_NATIVE_PIPELINE", "1") == "0":
            _build_failed = True
            return None
        from vit_ed_tpu.native import build_and_load

        lib = build_and_load(_SRC, _LIB_PATH, extra_flags=("-pthread", "-ffp-contract=off",
                                      "-march=native",
                                      "-fno-math-errno", "-ljpeg"))
        if lib is None:
            # no system libjpeg: rebuild with the decoder compiled out
            lib = build_and_load(_SRC, _LIB_PATH,
                                 extra_flags=("-pthread", "-ffp-contract=off",
                                      "-march=native",
                                      "-fno-math-errno",
                                      "-DVT_NO_JPEG"))
        if lib is None:
            _build_failed = True
            return None
        lib.vt_resize_u8.restype = ctypes.c_int
        lib.vt_resize_u8.argtypes = [_u8] + [ctypes.c_int] * 7 + [_u8] + \
            [ctypes.c_int] * 3
        lib.vt_normalize_u8.restype = None
        lib.vt_normalize_u8.argtypes = [_u8, ctypes.c_int64, ctypes.c_int,
                                        _f32, _f32, _f32]
        lib.vt_rgb_to_gray.restype = None
        lib.vt_rgb_to_gray.argtypes = [_u8, ctypes.c_int64, ctypes.c_int, _u8]
        lib.vt_white_percentage.restype = ctypes.c_float
        lib.vt_white_percentage.argtypes = [_u8] + [ctypes.c_int] * 4
        lib.vt_prep_one.restype = ctypes.c_int
        lib.vt_prep_one.argtypes = [_u8] + [ctypes.c_int] * 10 + \
            [_f32, _f32, _f32]
        lib.vt_color_jitter.restype = None
        lib.vt_color_jitter.argtypes = [_u8, ctypes.c_int64, _i32, _f32,
                                        ctypes.c_int]
        lib.vt_warp_affine_u8.restype = None
        lib.vt_warp_affine_u8.argtypes = [_u8] + [ctypes.c_int] * 3 + \
            [np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"), _u8,
             ctypes.c_int, _u8]
        lib.vt_gaussian_blur_u8.argtypes = [_u8] + [ctypes.c_int] * 3 + \
            [ctypes.c_float, _u8]
        lib.vt_jpeg_dims.restype = ctypes.c_int
        lib.vt_jpeg_dims.argtypes = [_u8, ctypes.c_int64, _i32]
        lib.vt_jpeg_decode.restype = ctypes.c_int
        lib.vt_jpeg_decode.argtypes = [_u8, ctypes.c_int64, _u8,
                                       ctypes.c_int, ctypes.c_int]
        lib.vt_pool_create.restype = ctypes.c_void_p
        lib.vt_pool_create.argtypes = [ctypes.c_int]
        lib.vt_pool_destroy.restype = None
        lib.vt_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.vt_pool_prep_batch.restype = ctypes.c_int
        lib.vt_pool_prep_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            _i32, _i32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, _f32, _f32, _f32]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def _as_u8(img) -> np.ndarray:
    arr = np.ascontiguousarray(np.asarray(img, np.uint8))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def _f32v(x, c: int) -> np.ndarray:
    v = np.asarray(x, np.float32)
    if v.ndim > 0 and v.shape[0] not in (1, c):
        # numpy's Python path would broadcast (h, w, 1) against (3,) into a
        # DIFFERENT output shape — reject rather than silently diverge
        raise ValueError(
            f"mean/std of length {v.shape[0]} does not match {c} channels; "
            "use the Python transforms path for this input")
    return np.ascontiguousarray(np.broadcast_to(v, (c,)))


def resize_u8(img, size: Tuple[int, int], filter: int = BILINEAR,
              crop: Optional[Tuple[int, int, int, int]] = None) -> np.ndarray:
    """Crop (y0, x0, h, w) then resize to (oh, ow). Bit-exact vs
    ``PIL.Image.crop(...).resize(..., BILINEAR | BICUBIC)`` on uint8."""
    lib = _load()
    arr = _as_u8(img)
    h, w, c = arr.shape
    y0, x0, ch_, cw_ = crop if crop is not None else (0, 0, h, w)
    oh, ow = size
    out = np.empty((oh, ow, c), np.uint8)
    rc = lib.vt_resize_u8(arr, h, w, c, y0, x0, ch_, cw_, out, oh, ow, filter)
    if rc != 0:
        raise ValueError(f"vt_resize_u8 failed (crop {crop} of {arr.shape})")
    return out


def normalize_u8(img, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)) -> np.ndarray:
    """Fused (x/255 - mean)/std. Bit-exact vs normalize(to_tensor(img))."""
    lib = _load()
    arr = _as_u8(img)
    h, w, c = arr.shape
    out = np.empty((h, w, c), np.float32)
    lib.vt_normalize_u8(arr, h * w, c, _f32v(mean, c), _f32v(std, c), out)
    return out


def white_percentage(img, ref_size: int = 224) -> float:
    """Bit-exact vs transforms.compute_white_percentage (PIL "L" convert,
    BICUBIC shrink to ref when wider, fraction of pixels > 250)."""
    lib = _load()
    arr = _as_u8(img)
    h, w, c = arr.shape
    return float(lib.vt_white_percentage(arr, h, w, c, ref_size))


def prep(img, size: Tuple[int, int],
         crop: Optional[Tuple[int, int, int, int]] = None,
         filter: int = BILINEAR, mean=(0.5, 0.5, 0.5),
         std=(0.5, 0.5, 0.5)) -> np.ndarray:
    """Fused crop -> resize -> normalize, u8 HWC -> f32 HWC."""
    lib = _load()
    arr = _as_u8(img)
    h, w, c = arr.shape
    y0, x0, ch_, cw_ = crop if crop is not None else (0, 0, h, w)
    oh, ow = size
    out = np.empty((oh, ow, c), np.float32)
    rc = lib.vt_prep_one(arr, h, w, c, y0, x0, ch_, cw_, oh, ow, filter,
                         _f32v(mean, c), _f32v(std, c), out)
    if rc != 0:
        raise ValueError(f"vt_prep_one failed (crop {crop} of {arr.shape})")
    return out


def color_jitter(img, ops) -> np.ndarray:
    """In-place-on-copy color jitter on an RGB image.

    ``ops`` is a sequence of (op, factor) with op in {"brightness",
    "contrast", "saturation"} (factor = PIL ImageEnhance factor) or
    ("hue", integer shift in [-255, 255]). Bit-exact vs the numpy
    reference chain in data/transforms.py (the same formulas)."""
    lib = _load()
    arr = _as_u8(img).copy()
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("color_jitter requires RGB")
    codes = {"brightness": 0, "contrast": 1, "saturation": 2, "hue": 3}
    op_arr = np.asarray([codes[o] for o, _ in ops], np.int32)
    f_arr = np.asarray([f for _, f in ops], np.float32)
    lib.vt_color_jitter(arr.reshape(-1), h * w, op_arr, f_arr, len(ops))
    return arr


def warp_affine(img, m, border_value=None) -> np.ndarray:
    """Affine warp with the forward 2x3 matrix ``m`` — cv2.warpAffine
    INTER_LINEAR bit-exact (tests/test_native_pipeline.py). ``border_value``
    None means BORDER_REFLECT_101; a scalar/tuple means BORDER_CONSTANT."""
    lib = _load()
    arr = _as_u8(img)
    h, w, c = arr.shape
    m = np.ascontiguousarray(np.asarray(m, np.float64).reshape(6))
    out = np.empty_like(arr)
    if border_value is None:
        border = np.zeros(c, np.uint8)
        mode = 0
    else:
        v = np.asarray(border_value, np.float64).reshape(-1)
        if v.size > c:
            v = v[:c]  # cv2 Scalar semantics: extra entries ignored
        border = np.ascontiguousarray(
            np.clip(np.rint(np.broadcast_to(v, (c,))), 0, 255).astype(np.uint8))
        mode = 1
    lib.vt_warp_affine_u8(arr, h, w, c, m, out, mode, border)
    return out


def _blur_params(radius: float, passes: int = 3):
    """Pillow BoxBlur.c's box radius + 24.8 fixed-point weights, with the
    C FLOAT (not double) rounding of ImagingGaussianBlur's locals — the
    box radius, ww and fw must round identically to Pillow's or outputs
    shift by one at specific radii (the dense-sweep test)."""
    f32 = np.float32
    r = f32(radius)
    sigma2 = f32(f32(r * r) / f32(passes))
    L = f32(math.sqrt(12.0 * float(sigma2) + 1.0))
    l = f32(math.floor((float(L) - 1.0) / 2.0))
    num = f32(f32(f32(2) * l + f32(1))
              * f32(f32(l * f32(l + f32(1))) - f32(3) * sigma2))
    den = f32(f32(6) * f32(sigma2 - f32(f32(l + f32(1)) * f32(l + f32(1)))))
    fr = f32(l + f32(num / den))
    ri = int(fr)
    ww = int(f32(f32(1 << 24) / f32(fr * f32(2) + f32(1))))
    fw = ((1 << 24) - (ri * 2 + 1) * ww) // 2
    return ri, ww, fw


def _box_pass_np(arr: np.ndarray, radius: int, ww: int, fw: int) -> np.ndarray:
    """One box-blur pass along axis 0 of [n, ...] u8 (Pillow line blur:
    integer running window + fractional edge weights, per-pass rounding)."""
    n = arr.shape[0]
    last = n - 1
    edge_a = min(radius + 1, n)
    edge_b = max(n - radius - 1, 0)
    lin = arr.astype(np.int64)
    out = np.empty_like(arr)

    acc = lin[0] * (radius + 1)
    for y in range(edge_a - 1):
        acc = acc + lin[y]
    acc = acc + lin[last] * (radius - edge_a + 1)

    def emit(y, sub, add, far_a, far_b):
        nonlocal acc
        acc = acc + lin[add] - lin[sub]
        bulk = acc * ww + (lin[far_a] + lin[far_b]) * fw
        out[y] = ((bulk + (1 << 23)) >> 24).astype(np.uint8)

    if edge_a <= edge_b:
        for y in range(edge_a):
            emit(y, 0, y + radius, 0, y + radius + 1)
        for y in range(edge_a, edge_b):
            emit(y, y - radius - 1, y + radius, y - radius - 1,
                 y + radius + 1)
        for y in range(edge_b, last + 1):
            emit(y, y - radius - 1, last, y - radius - 1, last)
    else:
        for y in range(last + 1):
            emit(y, max(y - radius - 1, 0), min(y + radius, last),
                 max(y - radius - 1, 0), min(y + radius + 1, last))
    return out


def _gaussian_blur_np(arr: np.ndarray, radius: float) -> np.ndarray:
    """Bit-exact numpy mirror of PIL GaussianBlur (fallback + test oracle).
    Horizontal direction first, then vertical — Pillow's pass order."""
    ri, ww, fw = _blur_params(radius)
    out = arr.transpose(1, 0, 2)           # [w, h, c]: axis 0 == original W
    for _ in range(3):
        out = _box_pass_np(out, ri, ww, fw)
    out = np.ascontiguousarray(out.transpose(1, 0, 2))
    for _ in range(3):
        out = _box_pass_np(out, ri, ww, fw)
    return out


def gaussian_blur(img, radius: float) -> np.ndarray:
    """PIL ImageFilter.GaussianBlur, bit-exact, SIMD-wide native passes
    (tests/test_native_pipeline.py dense radius sweep)."""
    lib = _load()
    arr = _as_u8(img)
    if lib is None or not hasattr(lib, "vt_gaussian_blur_u8"):
        return _gaussian_blur_np(arr, radius)
    h, w, c = arr.shape
    out = np.empty_like(arr)
    lib.vt_gaussian_blur_u8(arr, h, w, c, float(radius), out)
    return out


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """Decode a JPEG byte string to an RGB u8 array, bit-exact vs
    PIL.Image.open(...).convert("RGB") (same libjpeg, same defaults).
    Returns None when the native decoder is unavailable or the stream is
    not decodable (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    hw = np.zeros(3, np.int32)
    if lib.vt_jpeg_dims(buf, len(data), hw) != 0:
        return None
    out = np.empty((int(hw[0]), int(hw[1]), 3), np.uint8)
    if lib.vt_jpeg_decode(buf, len(data), out.reshape(-1), int(hw[0]),
                          int(hw[1])) != 0:
        return None
    return out


class PipelinePool:
    """Persistent native worker pool preparing whole batches in parallel.

    The batch call releases the GIL for its entire duration, so Python-side
    decode threads (DataLoader workers) overlap with C++ transform work.
    """

    def __init__(self, num_threads: Optional[int] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native pipeline unavailable")
        if num_threads is None:
            num_threads = max(os.cpu_count() or 1, 1)
        self._lib = lib
        self._pool = lib.vt_pool_create(int(num_threads))
        self.num_threads = int(num_threads)

    def close(self):
        if getattr(self, "_pool", None):
            self._lib.vt_pool_destroy(self._pool)
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def prep_batch(self, images: Sequence[np.ndarray], size: Tuple[int, int],
                   crops: Optional[Sequence[Tuple[int, int, int, int]]] = None,
                   filter: int = BILINEAR, mean=(0.5, 0.5, 0.5),
                   std=(0.5, 0.5, 0.5)) -> np.ndarray:
        """Prepare n images (each u8 HWC, same channel count) into one
        [n, oh, ow, c] float32 batch."""
        arrs = [_as_u8(im) for im in images]
        n = len(arrs)
        oh, ow = size
        if crops is not None and len(crops) != n:
            raise ValueError(f"{len(crops)} crop rects for {n} images")
        if n == 0:
            return np.empty((0, oh, ow, 3), np.float32)
        c = arrs[0].shape[2]
        dims = np.empty((n, 2), np.int32)
        cr = np.empty((n, 4), np.int32)
        ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)()
        for i, a in enumerate(arrs):
            if a.shape[2] != c:
                raise ValueError("mixed channel counts in batch")
            dims[i] = (a.shape[0], a.shape[1])
            cr[i] = crops[i] if crops is not None else (0, 0, a.shape[0],
                                                        a.shape[1])
            ptrs[i] = a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        out = np.empty((n, oh, ow, c), np.float32)
        rc = self._lib.vt_pool_prep_batch(
            self._pool, ptrs, dims.reshape(-1), cr.reshape(-1), n, c, oh, ow,
            filter, _f32v(mean, c), _f32v(std, c), out)
        if rc != 0:
            raise ValueError("vt_pool_prep_batch failed (bad crop rect?)")
        # keep arrs alive until the C call returned
        del arrs
        return out
