"""Native image transforms (PIL / numpy / C++).

Replaces the reference's torchvision + albumentations stack
(/root/reference/data/transforms.py) with dependency-light equivalents that
produce float32 NHWC arrays (TPU-native layout). Tensors are normalized with
mean/std (0.5, 0.5, 0.5) exactly as the reference does everywhere.

The affine warps (shift_scale_rotate / random_affine) no longer call cv2:
the canonical warp is native/pipeline.cc::warp_affine_u8 (cv2 INTER_LINEAR
semantics under a deterministic float spec) with ``_warp_affine_np`` as the
bit-exact numpy mirror; measured agreement vs cv2 5.0 is >= 99.98% identical
pixels, max |diff| 1 (tests/test_native_pipeline.py).
"""

from __future__ import annotations

import math
import random
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageFilter

from vit_ed_tpu.utils.misc import UnableToCrop

# Native (C++) fast path for the deterministic numeric tail of the
# pipeline (crop/resize/normalize/white-percentage). BIT-EXACT vs the
# PIL + numpy chain below (tests/test_native_pipeline.py verifies), so it
# is used transparently whenever available; VIT_ED_NATIVE_PIPELINE=0
# disables it. Randomized augmentation decisions always stay in Python
# (RNG stream parity with the reference).
try:
    from vit_ed_tpu.native import pipeline as _npipe
except Exception:  # pragma: no cover - import cycle / broken build
    _npipe = None


def _native_ok(img) -> bool:
    return (_npipe is not None and isinstance(img, Image.Image)
            and img.mode == "RGB" and _npipe.is_available())


def open_rgb(path: str) -> Image.Image:
    """Image.open(path).convert("RGB") with the native libjpeg fast path.

    For .jpg/.jpeg files the C++ decoder (native/pipeline.cc) is used —
    bit-exact vs PIL (same system libjpeg, same defaults; verified in
    tests/test_native_pipeline.py) and without PIL's lazy-file plumbing.
    Everything else (or when the native build is unavailable) goes through
    PIL unchanged."""
    if (_npipe is not None and path.lower().endswith((".jpg", ".jpeg"))
            and _npipe.is_available()):
        try:
            with open(path, "rb") as f:
                arr = _npipe.decode_jpeg(f.read())
            if arr is not None:
                return Image.fromarray(arr)
        except OSError:
            pass
    with Image.open(path) as f:
        return f.convert("RGB")


def _resize_target(img: Image.Image, size) -> Tuple[int, int]:
    """(out_h, out_w) under torchvision Resize semantics (see resize())."""
    if isinstance(size, int):
        w, h = img.size
        if (w <= h and w == size) or (h <= w and h == size):
            return h, w
        if w < h:
            return int(size * h / w), size
        return size, int(size * w / h)
    return size[0], size[1]


# ---------------------------------------------------------------------------
# array conversion
# ---------------------------------------------------------------------------

def to_tensor(img: Image.Image) -> np.ndarray:
    """PIL -> float32 HWC in [0, 1] (torchvision ToTensor, but channel-last)."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def normalize(arr: np.ndarray, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)) -> np.ndarray:
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    return (arr - mean) / std


def normalize_image(img: Image.Image, mean=(0.5, 0.5, 0.5),
                    std=(0.5, 0.5, 0.5)) -> np.ndarray:
    """``normalize(to_tensor(img))`` with the fused native fast path
    (bit-exact; single memory pass in C++ for RGB images)."""
    if _native_ok(img):
        return _npipe.normalize_u8(np.asarray(img), mean, std)
    return normalize(to_tensor(img), mean, std)


def as_sample_array(image) -> np.ndarray:
    """Dataset output dtype policy. Transforms that deliberately emit
    uint8 ndarrays (the TPU.DEVICE_NORMALIZE u8 wire — ``emit_u8``
    composites, trainers' dev_norm train transforms) pass through
    untouched so the model's on-device normalize gate fires; everything
    else (PIL images, normalized float chains) ships float32 as before."""
    if isinstance(image, np.ndarray) and image.dtype == np.uint8:
        return image
    return np.asarray(image, np.float32)


def unnormalize(arr: np.ndarray, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)) -> np.ndarray:
    """Reference UnNormalize (transforms.py:103-118)."""
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    return arr * std + mean


# ---------------------------------------------------------------------------
# geometric ops
# ---------------------------------------------------------------------------

def resize(img: Image.Image, size, interpolation=Image.BILINEAR) -> Image.Image:
    """torchvision Resize semantics: int size resizes the SHORTER side."""
    if isinstance(size, int):
        w, h = img.size
        if (w <= h and w == size) or (h <= w and h == size):
            return img
        if w < h:
            return img.resize((size, int(size * h / w)), interpolation)
        return img.resize((int(size * w / h), size), interpolation)
    return img.resize((size[1], size[0]), interpolation)


def center_crop(img: Image.Image, size) -> Image.Image:
    if isinstance(size, int):
        size = (size, size)
    th, tw = size
    w, h = img.size
    if w < tw or h < th:
        # pad with zeros like torchvision CenterCrop on short images
        pad_w = max(tw - w, 0)
        pad_h = max(th - h, 0)
        new = Image.new(img.mode, (w + pad_w, h + pad_h))
        new.paste(img, (pad_w // 2, pad_h // 2))
        img = new
        w, h = img.size
    left = int(round((w - tw) / 2.0))
    top = int(round((h - th) / 2.0))
    return img.crop((left, top, left + tw, top + th))


def random_crop(img: Image.Image, size, pad_if_needed=False, fill=0,
                rng: Optional[random.Random] = None) -> Image.Image:
    if isinstance(size, int):
        size = (size, size)
    th, tw = size
    r = rng or random
    w, h = img.size
    if pad_if_needed and (w < tw or h < th):
        pad_w = max(tw - w, 0)
        pad_h = max(th - h, 0)
        color = (fill,) * len(img.getbands()) if isinstance(fill, int) else fill
        new = Image.new(img.mode, (w + pad_w, h + pad_h), color)
        new.paste(img, (pad_w // 2, pad_h // 2))
        img = new
        w, h = img.size
    if w == tw and h == th:
        return img
    left = r.randint(0, w - tw)
    top = r.randint(0, h - th)
    return img.crop((left, top, left + tw, top + th))


class PadCenterCrop:
    """transforms.py:39-58."""

    def __init__(self, size, pad_if_needed=False, fill=0):
        self.size = (int(size), int(size)) if isinstance(size, (int, float)) else size
        self.pad_if_needed = pad_if_needed
        self.fill = fill

    def __call__(self, img):
        return center_crop(img, self.size)


class RandomSizedCrop:
    """transforms.py:61-79 — random target size then random crop."""

    def __init__(self, min_width, min_height, pad_if_needed=False, fill=0):
        self.min_width = min_width
        self.min_height = min_height
        self.pad_if_needed = pad_if_needed
        self.fill = fill

    def __call__(self, img):
        width, height = img.size
        if self.min_width < img.width:
            width = random.randint(self.min_width, img.width)
        if self.min_height < img.height:
            height = random.randint(self.min_height, img.height)
        return random_crop(img, (height, width), pad_if_needed=self.pad_if_needed,
                           fill=self.fill)


class RandomResize:
    """transforms.py:165-174."""

    def __init__(self, img_size, ratio=(0.6, 1.0)):
        self.ratio = ratio
        self.img_size = img_size

    def __call__(self, img):
        ratio = random.uniform(self.ratio[0], self.ratio[1])
        w, h = int(img.width * ratio), int(img.height * ratio)
        return img.resize((w, h), Image.BILINEAR)


def rotation_matrix(center: Tuple[float, float], angle: float,
                    scale: float) -> np.ndarray:
    """cv2.getRotationMatrix2D (same closed form, float64; agrees with
    cv2 to <= 1 ulp per entry — cv2's private sincos differs from libm in
    the last bit for some angles, which is invisible after the warp's
    float32 coordinate rounding)."""
    a = angle * math.pi / 180.0
    alpha, beta = scale * math.cos(a), scale * math.sin(a)
    cx, cy = center
    return np.array([[alpha, beta, (1 - alpha) * cx - beta * cy],
                     [-beta, alpha, beta * cx + (1 - alpha) * cy]], np.float64)


def _invert_affine(m: np.ndarray) -> np.ndarray:
    """cv2.invertAffineTransform (double, same op order)."""
    d = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
    d = 1.0 / d if d != 0.0 else 0.0
    a11, a22 = m[1, 1] * d, m[0, 0] * d
    a12, a21 = -m[0, 1] * d, -m[1, 0] * d
    return np.array([[a11, a12, -a11 * m[0, 2] - a12 * m[1, 2]],
                     [a21, a22, -a21 * m[0, 2] - a22 * m[1, 2]]], np.float64)


def _reflect101(p: np.ndarray, n: int) -> np.ndarray:
    if n == 1:
        return np.zeros_like(p)
    per = 2 * (n - 1)
    out = np.abs(p) % per
    return np.where(out >= n, per - out, out)


def _warp_affine_np(arr: np.ndarray, m, border_value=None) -> np.ndarray:
    """numpy mirror of native/pipeline.cc::warp_affine_u8 — IDENTICAL op
    order (f32 row-constant + double product+add coords, f32 weight
    products, left-to-right tap sum, nearest-even rounding), so the two
    paths are bit-exact against each other (tests/test_native_pipeline.py).
    cv2.warpAffine(INTER_LINEAR) semantics; vs OpenCV 5's AVX2 kernel the
    measured agreement is >= 99.98% identical pixels, max |diff| 1."""
    f32, f64 = np.float32, np.float64
    m = np.asarray(m, f64).reshape(2, 3)
    im = _invert_affine(m)
    h, w = arr.shape[:2]
    arr3 = arr[:, :, None] if arr.ndim == 2 else arr
    ys, xs = np.mgrid[0:h, 0:w]
    ia = [f32(v) for v in im[0]]
    ib = [f32(v) for v in im[1]]
    rcx = (ia[1] * ys.astype(f32) + ia[2]).astype(f32)
    rcy = (ib[1] * ys.astype(f32) + ib[2]).astype(f32)
    sx = (f64(ia[0]) * xs + rcx.astype(f64)).astype(f32)
    sy = (f64(ib[0]) * xs + rcy.astype(f64)).astype(f32)
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = (sx - x0).astype(f32)
    fy = (sy - y0).astype(f32)
    w00 = ((1 - fx) * (1 - fy)).astype(f32)
    w01 = (fx * (1 - fy)).astype(f32)
    w10 = ((1 - fx) * fy).astype(f32)
    w11 = (fx * fy).astype(f32)
    c = arr3.shape[2]
    if border_value is None:
        x0r, x1r = _reflect101(x0, w), _reflect101(x0 + 1, w)
        y0r, y1r = _reflect101(y0, h), _reflect101(y0 + 1, h)

        def taps(ch):
            return (arr3[y0r, x0r, ch], arr3[y0r, x1r, ch],
                    arr3[y1r, x0r, ch], arr3[y1r, x1r, ch])
    else:
        bvv = np.asarray(border_value, f64).reshape(-1)
        if bvv.size > c:
            bvv = bvv[:c]  # cv2 Scalar semantics: extra entries ignored
            # (a 3-tuple borderValue on a grayscale image uses entry 0)
        bv = np.clip(np.rint(np.broadcast_to(bvv, (c,))), 0, 255)

        def taps(ch):
            def get(yy, xx):
                ok = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
                v = arr3[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1), ch]
                return np.where(ok, v, np.uint8(bv[ch]))
            return (get(y0, x0), get(y0, x0 + 1),
                    get(y0 + 1, x0), get(y0 + 1, x0 + 1))

    out = np.empty_like(arr3)
    for ch in range(c):
        p00, p01, p10, p11 = (t.astype(f32) for t in taps(ch))
        v = p00 * w00 + p01 * w01 + p10 * w10 + p11 * w11
        out[..., ch] = np.clip(np.rint(v), 0, 255).astype(np.uint8)
    return out[:, :, 0] if arr.ndim == 2 else out


def warp_affine(arr: np.ndarray, m, border_value=None) -> np.ndarray:
    """Affine warp with the forward 2x3 matrix (the framework's canonical
    warp: cv2 INTER_LINEAR semantics; border REFLECT_101 when
    ``border_value`` is None else CONSTANT). Native C++ when available,
    bit-exact numpy mirror otherwise."""
    if (_npipe is not None and _npipe.is_available() and arr.ndim == 3):
        return _npipe.warp_affine(arr, m, border_value)
    return _warp_affine_np(arr, m, border_value)


def shift_scale_rotate(img: Image.Image, shift_limit=0.05, scale_limit=0.15,
                       rotate_limit=20, p=0.5, border_value=None) -> Image.Image:
    """albumentations ShiftScaleRotate equivalent (affine warp)."""
    if random.random() >= p:
        return img
    arr = np.asarray(img)
    h, w = arr.shape[:2]
    angle = random.uniform(-rotate_limit, rotate_limit)
    scale = 1.0 + random.uniform(-scale_limit, scale_limit)
    dx = random.uniform(-shift_limit, shift_limit) * w
    dy = random.uniform(-shift_limit, shift_limit) * h
    m = rotation_matrix((w / 2, h / 2), angle, scale)
    m[0, 2] += dx
    m[1, 2] += dy
    return Image.fromarray(warp_affine(arr, m, border_value))


def rgb_shift(img: Image.Image, limit=15, p=0.5) -> Image.Image:
    """albumentations RGBShift equivalent."""
    if random.random() >= p:
        return img
    arr = np.asarray(img).astype(np.int16)
    for c in range(min(3, arr.shape[-1])):
        arr[..., c] += random.randint(-limit, limit)
    return Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))


def random_affine(img: Image.Image, degrees=5, translate=(0.1, 0.1), fill=0,
                  p=1.0) -> Image.Image:
    """torchvision RandomAffine equivalent (rotation + translation)."""
    if random.random() >= p:
        return img
    arr = np.asarray(img)
    h, w = arr.shape[:2]
    angle = random.uniform(-degrees, degrees)
    tx = random.uniform(-translate[0], translate[0]) * w
    ty = random.uniform(-translate[1], translate[1]) * h
    m = rotation_matrix((w / 2, h / 2), angle, 1.0)
    m[0, 2] += tx
    m[1, 2] += ty
    bv = (fill,) * 3 if isinstance(fill, int) else fill
    return Image.fromarray(warp_affine(arr, m, bv))


def _pil_l_channel(arr: np.ndarray) -> np.ndarray:
    """PIL convert("L"): (R*19595 + G*38470 + B*7471 + 0x8000) >> 16."""
    return ((arr[..., 0].astype(np.uint32) * 19595
             + arr[..., 1].astype(np.uint32) * 38470
             + arr[..., 2].astype(np.uint32) * 7471 + 0x8000) >> 16)


def _jitter_hue_int(arr: np.ndarray, shift: int) -> np.ndarray:
    """Hue rotation through EXACT integer HSV (h = floor(255*num/(6*cr)),
    s = floor(255*cr/maxc), v = maxc; back-conversion is PIL's float
    HSV->RGB, verified bit-exact vs Image.convert). PIL's own float
    RGB->HSV differs by +-1/255 hue on ~0.3% of pixels; the integer
    forward is deterministic and portable, and the native C++ path
    (native/pipeline.cc::jitter_hue) implements the identical formulas."""
    r = arr[..., 0].astype(np.int64)
    g = arr[..., 1].astype(np.int64)
    b = arr[..., 2].astype(np.int64)
    maxc = np.maximum(np.maximum(r, g), b)
    minc = np.minimum(np.minimum(r, g), b)
    cr = maxc - minc
    crs = np.maximum(cr, 1)
    num = np.where(r == maxc, g - b,
                   np.where(g == maxc, 2 * cr + (b - r), 4 * cr + (r - g)))
    num = num % (6 * crs)
    h = np.where(cr == 0, 0, (255 * num) // (6 * crs))
    s = np.where(cr == 0, 0, (255 * cr) // np.maximum(maxc, 1))
    v = maxc

    h = (h + shift) % 256
    f32 = np.float32
    hf = (h.astype(f32) / f32(255.0)).astype(f32)
    sf = (s.astype(f32) / f32(255.0)).astype(f32)
    vf = v.astype(f32)
    i6 = (hf * f32(6.0)).astype(np.int32)
    fr = (hf * f32(6.0) - i6.astype(f32)).astype(f32)
    p = (vf * (f32(1.0) - sf) + f32(0.5)).astype(np.int32)
    q = (vf * (f32(1.0) - sf * fr) + f32(0.5)).astype(np.int32)
    t = (vf * (f32(1.0) - sf * (f32(1.0) - fr)) + f32(0.5)).astype(np.int32)
    vi = v.astype(np.int32)
    im = i6 % 6
    sel = lambda a0, a1, a2, a3, a4, a5: np.select(
        [im == 0, im == 1, im == 2, im == 3, im == 4, im == 5],
        [a0, a1, a2, a3, a4, a5])
    out = np.stack([sel(vi, q, p, p, t, vi),
                    sel(t, vi, vi, q, p, p),
                    sel(p, p, t, vi, vi, q)], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


def _jitter_apply(arr: np.ndarray, ops) -> np.ndarray:
    """numpy reference for the jitter op sequence; formulas identical to
    native/pipeline.cc::vt_color_jitter (brightness/contrast/saturation
    are PIL ImageEnhance bit-exact: float32 blend with the degenerate
    image, truncating cast)."""
    f32 = np.float32
    for op, f in ops:
        x = arr.astype(f32)
        if op == "brightness":
            arr = np.clip((f32(f) * x).astype(np.int32), 0, 255).astype(np.uint8)
        elif op == "contrast":
            mean = f32(int(_pil_l_channel(arr).mean() + 0.5))
            arr = np.clip((mean + f32(f) * (x - mean)).astype(np.int32),
                          0, 255).astype(np.uint8)
        elif op == "saturation":
            l = _pil_l_channel(arr).astype(f32)[..., None]
            arr = np.clip((l + f32(f) * (x - l)).astype(np.int32),
                          0, 255).astype(np.uint8)
        elif op == "hue":
            arr = _jitter_hue_int(arr, int(f))
    return arr


def color_jitter(img: Image.Image, brightness=0.3, contrast=0.3, saturation=0.3,
                 hue=0.3, p=0.5) -> Image.Image:
    """torchvision ColorJitter equivalent (random order of 4 adjustments).

    Brightness/contrast/saturation keep PIL ImageEnhance semantics exactly
    (float32 blend, truncating cast — verified vs ImageEnhance in
    tests/test_native_pipeline.py); hue rotates through exact integer HSV
    (see _jitter_hue_int). The native C++ path applies the identical op
    sequence in fused passes and is bit-exact vs the numpy path."""
    if random.random() >= p:
        return img
    ops = []
    if brightness:
        ops.append(("brightness",
                    random.uniform(max(0, 1 - brightness), 1 + brightness)))
    if contrast:
        ops.append(("contrast",
                    random.uniform(max(0, 1 - contrast), 1 + contrast)))
    if saturation:
        ops.append(("saturation",
                    random.uniform(max(0, 1 - saturation), 1 + saturation)))
    if hue:
        ops.append(("hue", int(random.uniform(-hue, hue) * 255)))
    random.shuffle(ops)
    if _native_ok(img):
        return Image.fromarray(_npipe.color_jitter(img, ops))
    arr = np.asarray(img, np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        return img
    return Image.fromarray(_jitter_apply(arr, ops))


class GaussianBlur:
    """transforms.py:82-100."""

    def __init__(self, p=0.5, radius_min=0.1, radius_max=2.0):
        self.prob = p
        self.radius_min = radius_min
        self.radius_max = radius_max

    def __call__(self, img):
        if random.random() > self.prob:
            return img
        radius = random.uniform(self.radius_min, self.radius_max)
        if _native_ok(img):
            # bit-exact vs ImageFilter.GaussianBlur, SIMD-wide box passes
            # (native/pipeline.cc; ~2x PIL at the flagship fragment size)
            return Image.fromarray(_npipe.gaussian_blur(
                np.asarray(img), radius))
        return img.filter(ImageFilter.GaussianBlur(radius=radius))


# ---------------------------------------------------------------------------
# composite transforms used by the trainers
# ---------------------------------------------------------------------------

class TwoImgSyncEval:
    """Resize + normalize both images of a pair (transforms.py:12-26)."""

    def __init__(self, image_size):
        self.image_size = image_size

    def _one(self, img: Image.Image) -> np.ndarray:
        if _native_ok(img):
            return _npipe.prep(img, _resize_target(img, self.image_size))
        img = resize(img, self.image_size)
        return normalize(to_tensor(img))

    def __call__(self, first_img, second_img):
        return self._one(first_img), self._one(second_img)


class OneImgEval:
    """Resize + normalize a single image (ToTensor pipeline).

    ``emit_u8`` (TPU.DEVICE_NORMALIZE) skips the host normalize and
    returns the cropped/resized uint8 array — the model normalizes on
    device ((x/255-.5)/.5, ViTED._embed), so the batch ships 4x fewer
    bytes to the chip."""

    def __init__(self, image_size, crop=False, emit_u8=False):
        self.image_size = image_size
        self.crop = crop
        self.emit_u8 = emit_u8

    def pool_crop(self, shape_hw):
        """(crop_rect, out_size) for the native batch-prep pool, or None
        when this image needs the Python fallback (padding case, or the
        u8 wire — the pool's fused prep emits normalized f32)."""
        if self.emit_u8:
            return None
        h, w = shape_hw
        if self.crop:
            th, tw = ((self.image_size, self.image_size)
                      if isinstance(self.image_size, int) else self.image_size)
            if w >= tw and h >= th:
                left = int(round((w - tw) / 2.0))
                top = int(round((h - th) / 2.0))
                return (top, left, th, tw), (th, tw)
            return None
        class _Sz:
            size = (w, h)
        return (0, 0, h, w), _resize_target(_Sz, self.image_size)

    def __call__(self, img):
        if _native_ok(img):
            pc = self.pool_crop((img.size[1], img.size[0]))
            if pc is not None:
                return _npipe.prep(img, pc[1], crop=pc[0])
        img = center_crop(img, self.image_size) if self.crop else resize(img, self.image_size)
        if self.emit_u8:
            arr = np.asarray(img, np.uint8)
            return arr[:, :, None] if arr.ndim == 2 else arr
        return normalize(to_tensor(img))


class OneImgEvalZoom:
    """Michigan/Geshaem eval chain (reference michigan.py transforms):
    center-crop to (s, s) (padding short images), resize to int(s * zoom),
    center-crop back to s, normalize.

    Exposes the pooled whole-batch protocol: ``pool_crop`` maps the first
    crop + the resize; the trailing center-crop commutes with the
    pointwise normalize, so it becomes ``pool_post_crop`` — a plain slice
    of the pool's normalized output. Bit-exact vs ``__call__`` (the same
    resample kernels back both paths)."""

    def __init__(self, image_size: int, zoom: float = 1.15,
                 emit_u8: bool = False):
        self.image_size = int(image_size)
        self.zoom = zoom
        self.resized = int(self.image_size * zoom)
        self.emit_u8 = emit_u8

    def pool_crop(self, shape_hw):
        """(crop_rect, out_size) for the native batch-prep pool, or None
        when the image needs the Python fallback (padding case, or the
        u8 wire — the pool's fused prep emits normalized f32)."""
        if self.emit_u8:
            return None
        h, w = shape_hw
        s = self.image_size
        if h < s or w < s:
            return None
        top = int(round((h - s) / 2.0))
        left = int(round((w - s) / 2.0))
        return (top, left, s, s), (self.resized, self.resized)

    def pool_post_crop(self, out_hw):
        """Slice rect (y0, x0, h, w) applied to the pooled batch."""
        rh, rw = out_hw
        s = self.image_size
        return (int(round((rh - s) / 2.0)), int(round((rw - s) / 2.0)), s, s)

    def __call__(self, img):
        img = center_crop(img, (self.image_size, self.image_size))
        img = resize(img, self.resized)
        img = center_crop(img, self.image_size)
        if self.emit_u8:
            arr = np.asarray(img, np.uint8)
            return arr[:, :, None] if arr.ndim == 2 else arr
        return normalize_image(img)


# ---------------------------------------------------------------------------
# grid utilities (transforms.py:121-162)
# ---------------------------------------------------------------------------

def crop(im: Image.Image, n_cols: int, n_rows: int):
    """Split an image into a row-major grid of n_rows x n_cols patches."""
    width = im.width // n_cols
    height = im.height // n_rows
    patches = []
    for i in range(n_rows):
        for j in range(n_cols):
            box = (j * width, i * height, (j + 1) * width, (i + 1) * height)
            patches.append(im.crop(box))
    return patches


def split_with_gap(im: Image.Image, long_direction_ratio: float, gap: float):
    patches = []
    if im.width > im.height:
        patches.append(im.crop((0, 0, int(long_direction_ratio * im.width), im.height)))
        patches.append(im.crop((int((long_direction_ratio + gap) * im.width), 0,
                                im.width, im.height)))
    else:
        patches.append(im.crop((0, 0, im.width, int(long_direction_ratio * im.height))))
        patches.append(im.crop((0, int((long_direction_ratio + gap) * im.height),
                                im.width, im.height)))
    return patches


def make_square(im: Image.Image, fill_color=(0, 0, 0)):
    x, y = im.size
    size = max(x, y)
    new_im = Image.new("RGB", (size, size), fill_color)
    new_im.paste(im, (int((size - x) / 2), int((size - y) / 2)))
    return new_im


def compute_white_percentage(img: Image.Image, ref_size=224) -> float:
    if _native_ok(img):
        return _npipe.white_percentage(img, ref_size)
    gray = img.convert("L")
    if gray.width > ref_size:
        gray = gray.resize((ref_size, ref_size))
    arr = np.asarray(gray)
    return float(np.sum(arr > 250)) / (arr.shape[0] * arr.shape[1])


class CustomRandomCrop:
    """Retry-crop rejecting >60% white crops (transforms.py:177-196)."""

    def __init__(self, crop_size, white_percentage_limit=0.6, max_retry=1000, im_path=""):
        self.crop_size = crop_size
        self.white_percentage_limit = white_percentage_limit
        self.max_retry = max_retry
        self.im_path = im_path

    def __call__(self, img):
        current_retry = 0
        curr_w_p = 0.0
        while current_retry < self.max_retry:
            out = random_crop(img, self.crop_size, pad_if_needed=True, fill=255)
            curr_w_p = compute_white_percentage(out)
            if curr_w_p <= self.white_percentage_limit:
                return out
            current_retry += 1
        raise UnableToCrop(f"Unable to crop, curr wp: {curr_w_p}", im_path=self.im_path)
