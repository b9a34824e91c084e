"""Native (C++) input pipeline: bit-exactness vs the PIL + numpy chain.

The native runtime (native/pipeline.cc) reimplements the deterministic
numeric tail of data/transforms.py — crop, separable resampling
(bilinear/bicubic in 22-bit fixed point), grayscale conversion, white
percentage, and the fused (x/255 - mean)/std normalize — and must match
the reference chain BIT-FOR-BIT, because transforms.py dispatches to it
transparently whenever it is available.
"""

import numpy as np
import pytest
from PIL import Image

from vit_ed_tpu.data import transforms as T
from vit_ed_tpu.native import pipeline as npipe

pytestmark = pytest.mark.skipif(not npipe.is_available(),
                                reason="native pipeline unavailable")

RNG = np.random.default_rng(42)


def _rand_img(h, w):
    return RNG.integers(0, 256, (h, w, 3), np.uint8)


@pytest.mark.parametrize("filt,pil_filt", [(npipe.BILINEAR, Image.BILINEAR),
                                           (npipe.BICUBIC, Image.BICUBIC)])
@pytest.mark.parametrize("shape,out", [
    ((480, 640), (512, 512)),   # mixed up/down
    ((1000, 750), (64, 64)),    # strong downscale
    ((37, 53), (128, 96)),      # upscale
    ((64, 64), (64, 64)),       # identity
])
def test_resize_bit_exact_vs_pil(shape, out, filt, pil_filt):
    arr = _rand_img(*shape)
    ref = np.asarray(Image.fromarray(arr).resize((out[1], out[0]), pil_filt))
    got = npipe.resize_u8(arr, out, filter=filt)
    assert np.array_equal(ref, got)


def test_crop_resize_bit_exact_vs_pil():
    arr = _rand_img(400, 500)
    # PIL box is (left, top, right, bottom); native crop is (y0, x0, h, w)
    ref = np.asarray(Image.fromarray(arr).crop((30, 50, 363, 272))
                     .resize((64, 64), Image.BILINEAR))
    got = npipe.resize_u8(arr, (64, 64), crop=(50, 30, 222, 333))
    assert np.array_equal(ref, got)


def test_crop_out_of_bounds_rejected():
    arr = _rand_img(50, 50)
    with pytest.raises(ValueError):
        npipe.resize_u8(arr, (32, 32), crop=(20, 20, 40, 40))


def test_normalize_bit_exact():
    arr = _rand_img(57, 83)
    mean, std = (0.48, 0.45, 0.41), (0.23, 0.22, 0.25)
    ref = T.normalize(np.asarray(arr, np.float32) / 255.0, mean, std)
    got = npipe.normalize_u8(arr, mean, std)
    assert got.dtype == np.float32
    assert np.array_equal(ref.astype(np.float32), got)


def test_gray_and_white_percentage_match_python(monkeypatch):
    # force the Python path for the reference value
    monkeypatch.setattr(T, "_npipe", None)
    for h, w in [(300, 400), (100, 120), (512, 512), (224, 224)]:
        arr = RNG.integers(180, 256, (h, w, 3), np.uint8)
        img = Image.fromarray(arr)
        ref = T.compute_white_percentage(img)
        got = npipe.white_percentage(arr)
        assert abs(ref - got) < 1e-7, (h, w)


def test_prep_equals_resize_then_normalize():
    arr = _rand_img(300, 420)
    ref = npipe.normalize_u8(npipe.resize_u8(arr, (128, 128)))
    got = npipe.prep(arr, (128, 128))
    assert np.array_equal(ref, got)


def test_pool_batch_matches_sequential():
    images = [_rand_img(100 + 7 * i, 90 + 11 * i) for i in range(9)]
    crops = [(i, i, 64 + i, 70 + i) for i in range(9)]
    with npipe.PipelinePool(num_threads=3) as pool:
        batch = pool.prep_batch(images, (48, 56), crops=crops)
    assert batch.shape == (9, 48, 56, 3)
    for i, (im, cr) in enumerate(zip(images, crops)):
        assert np.array_equal(batch[i], npipe.prep(im, (48, 56), crop=cr))


def test_pool_empty_batch():
    with npipe.PipelinePool(num_threads=2) as pool:
        out = pool.prep_batch([], (16, 16))
    assert out.shape == (0, 16, 16, 3)


# ---------------------------------------------------------------------------
# transparent dispatch inside the transform classes
# ---------------------------------------------------------------------------

def _python_result(monkeypatch, fn, *args):
    with monkeypatch.context() as m:
        m.setattr(T, "_npipe", None)
        return fn(*args)


def test_two_img_sync_eval_native_matches_python(monkeypatch):
    t = T.TwoImgSyncEval(64)
    a = Image.fromarray(_rand_img(100, 80))
    b = Image.fromarray(_rand_img(64, 64))
    ref = _python_result(monkeypatch, t, a, b)
    got = t(a, b)
    assert np.array_equal(np.asarray(ref[0], np.float32), got[0])
    assert np.array_equal(np.asarray(ref[1], np.float32), got[1])


@pytest.mark.parametrize("crop", [False, True])
def test_one_img_eval_native_matches_python(monkeypatch, crop):
    t = T.OneImgEval(64, crop=crop)
    for shape in [(100, 80), (64, 64), (200, 300)]:
        img = Image.fromarray(_rand_img(*shape))
        ref = _python_result(monkeypatch, t, img)
        got = t(img)
        assert np.array_equal(np.asarray(ref, np.float32), got), shape


def test_one_img_eval_pad_fallback(monkeypatch):
    # image smaller than the crop: native path must defer to the Python
    # pad-and-center-crop branch
    t = T.OneImgEval(64, crop=True)
    img = Image.fromarray(_rand_img(40, 50))
    ref = _python_result(monkeypatch, t, img)
    got = t(img)
    assert np.array_equal(np.asarray(ref, np.float32), got)


def test_non_rgb_falls_back(monkeypatch):
    t = T.OneImgEval(32)
    img = Image.fromarray(RNG.integers(0, 256, (48, 48), np.uint8), "L")
    ref = _python_result(monkeypatch, t, img)
    got = t(img)
    assert np.array_equal(np.asarray(ref, np.float32), np.asarray(got, np.float32))


def test_white_percentage_rgba_stride():
    # 4-channel input must read with the real stride (PIL convert("L")
    # ignores alpha)
    rgb = RNG.integers(180, 256, (60, 80, 3), np.uint8)
    rgba = np.concatenate([rgb, np.full((60, 80, 1), 7, np.uint8)], axis=-1)
    assert npipe.white_percentage(rgba) == npipe.white_percentage(rgb)


def test_mean_std_channel_mismatch_rejected():
    gray = RNG.integers(0, 256, (20, 20), np.uint8)
    with pytest.raises(ValueError, match="channels"):
        npipe.normalize_u8(gray)  # (h, w, 1) vs default 3-tuple mean


def test_pool_crops_length_mismatch_rejected():
    imgs = [_rand_img(32, 32), _rand_img(32, 32)]
    with npipe.PipelinePool(num_threads=1) as pool:
        with pytest.raises(ValueError, match="crop rects"):
            pool.prep_batch(imgs, (16, 16), crops=[(0, 0, 16, 16)])


def test_build_and_load_recovers_from_corrupt_lib(tmp_path):
    # a corrupt cached .so (interrupted historical build) must be rebuilt,
    # not crash is_available()
    from vit_ed_tpu.native import build_and_load

    src = tmp_path / "mini.cc"
    src.write_text('extern "C" int forty_two() { return 42; }\n')
    lib_path = tmp_path / "libmini.so"
    lib_path.write_bytes(b"not an elf file")
    os_utime_after = src.stat().st_mtime + 10
    import os as _os
    _os.utime(lib_path, (os_utime_after, os_utime_after))  # newer than src
    lib = build_and_load(str(src), str(lib_path))
    assert lib is not None and lib.forty_two() == 42


def test_custom_random_crop_uses_native_white_pct():
    # deterministic because the image is all-white: every retry rejects
    img = Image.new("RGB", (100, 100), (255, 255, 255))
    c = T.CustomRandomCrop(32, white_percentage_limit=0.6, max_retry=3)
    with pytest.raises(Exception):
        c(img)
    dark = Image.new("RGB", (100, 100), (10, 10, 10))
    out = T.CustomRandomCrop(32)(dark)
    assert out.size == (32, 32)


def test_native_color_jitter_bit_exact_vs_numpy_reference():
    """vt_color_jitter == the numpy reference chain (transforms._jitter_apply)
    for every op and random sequences; brightness/contrast/saturation also
    == PIL ImageEnhance (the semantics they implement)."""
    import random

    from PIL import Image, ImageEnhance

    from vit_ed_tpu.data import transforms as T
    from vit_ed_tpu.native import pipeline as npipe

    if not npipe.is_available():
        pytest.skip("no C++ toolchain")

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (93, 71, 3), np.uint8)
    img = Image.fromarray(arr)
    for f in (0.55, 0.8, 1.0, 1.27, 1.6):
        np.testing.assert_array_equal(
            T._jitter_apply(arr.copy(), [("brightness", f)]),
            np.asarray(ImageEnhance.Brightness(img).enhance(f)))
        np.testing.assert_array_equal(
            T._jitter_apply(arr.copy(), [("contrast", f)]),
            np.asarray(ImageEnhance.Contrast(img).enhance(f)))
        np.testing.assert_array_equal(
            T._jitter_apply(arr.copy(), [("saturation", f)]),
            np.asarray(ImageEnhance.Color(img).enhance(f)))

    random.seed(7)
    for _ in range(10):
        ops = [("brightness", random.uniform(0.7, 1.3)),
               ("contrast", random.uniform(0.7, 1.3)),
               ("saturation", random.uniform(0.7, 1.3)),
               ("hue", random.randint(-76, 76))]
        random.shuffle(ops)
        np.testing.assert_array_equal(npipe.color_jitter(arr, ops),
                                      T._jitter_apply(arr.copy(), ops))


def test_native_jpeg_decode_bit_exact_vs_pil():
    """vt_jpeg_decode == PIL.Image.open(...).convert("RGB") (same system
    libjpeg, same defaults) for baseline, progressive, and grayscale."""
    import io

    from PIL import Image

    from vit_ed_tpu.native import pipeline as npipe

    if not npipe.is_available():
        pytest.skip("no C++ toolchain")

    rng = np.random.default_rng(1)

    def check(pil_img, **save_kw):
        b = io.BytesIO()
        pil_img.save(b, format="JPEG", **save_kw)
        data = b.getvalue()
        got = npipe.decode_jpeg(data)
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert got is not None
        np.testing.assert_array_equal(got, ref)

    for q in (70, 85, 95):
        check(Image.fromarray(rng.integers(0, 256, (223, 117, 3), np.uint8)),
              quality=q)
    check(Image.fromarray(rng.integers(0, 256, (100, 80, 3), np.uint8)),
          quality=85, progressive=True)
    check(Image.fromarray(rng.integers(0, 256, (64, 64), np.uint8), "L"),
          quality=85)
    # non-JPEG bytes degrade to None (caller falls back to PIL)
    assert npipe.decode_jpeg(b"not a jpeg") is None


def test_open_rgb_jpeg_matches_pil(tmp_path):
    from PIL import Image

    from vit_ed_tpu.data import transforms as T

    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (120, 90, 3), np.uint8)
    path = str(tmp_path / "img.jpg")
    Image.fromarray(arr).save(path, quality=90)
    np.testing.assert_array_equal(
        np.asarray(T.open_rgb(path)),
        np.asarray(Image.open(path).convert("RGB")))
    # png path goes through PIL unchanged
    path2 = str(tmp_path / "img.png")
    Image.fromarray(arr).save(path2)
    np.testing.assert_array_equal(np.asarray(T.open_rgb(path2)), arr)


def test_native_warp_affine_bit_exact_vs_numpy_mirror():
    """The canonical affine warp (native/pipeline.cc::warp_affine_u8) and
    its numpy mirror (transforms._warp_affine_np) implement the identical
    float spec — bit-exact across sizes, matrices and both border modes."""
    from vit_ed_tpu.data import transforms as T
    from vit_ed_tpu.native import pipeline as npipe

    if not npipe.is_available():
        import pytest

        pytest.skip("native pipeline unavailable")
    rng = np.random.default_rng(11)
    for t in range(40):
        h = int(rng.integers(3, 140))
        w = int(rng.integers(3, 140))
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        m = T.rotation_matrix((w / 2, h / 2), float(rng.uniform(-180, 180)),
                              float(rng.uniform(0.4, 2.0)))
        m[0, 2] += float(rng.uniform(-1.0, 1.0)) * w
        m[1, 2] += float(rng.uniform(-1.0, 1.0)) * h
        bv = None if t % 2 else tuple(int(x) for x in rng.integers(0, 256, 3))
        np.testing.assert_array_equal(npipe.warp_affine(img, m, bv),
                                      T._warp_affine_np(img, m, bv))
    # identity matrix reproduces the image exactly on both paths
    img = rng.integers(0, 256, (33, 47, 3), np.uint8)
    ident = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    np.testing.assert_array_equal(npipe.warp_affine(img, ident, None), img)
    np.testing.assert_array_equal(T._warp_affine_np(img, ident, None), img)


def test_warp_affine_matches_cv2_closely():
    """The canonical warp implements cv2.warpAffine INTER_LINEAR semantics:
    vs OpenCV's own kernel, >= 99.9% of pixels bit-identical and max |diff|
    1 (the remainder are exact-rounding-boundary pixels where OpenCV 5's
    private SIMD op order differs in the last float ulp)."""
    cv2 = pytest.importorskip("cv2")
    from vit_ed_tpu.data import transforms as T

    rng = np.random.default_rng(13)
    diff_px = 0
    total_px = 0
    for t in range(25):
        h = int(rng.integers(8, 160))
        w = int(rng.integers(8, 160))
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        m = T.rotation_matrix((w / 2, h / 2), float(rng.uniform(-180, 180)),
                              float(rng.uniform(0.4, 2.0)))
        m[0, 2] += float(rng.uniform(-0.5, 0.5)) * w
        m[1, 2] += float(rng.uniform(-0.5, 0.5)) * h
        if t % 2:
            ref = cv2.warpAffine(img, m, (w, h),
                                 borderMode=cv2.BORDER_REFLECT_101)
            got = T.warp_affine(img, m, None)
        else:
            bv = tuple(int(x) for x in rng.integers(0, 256, 3))
            ref = cv2.warpAffine(img, m, (w, h),
                                 borderMode=cv2.BORDER_CONSTANT,
                                 borderValue=bv)
            got = T.warp_affine(img, m, bv)
        d = np.abs(ref.astype(int) - got.astype(int))
        assert d.max() <= 1, f"trial {t}: max diff {d.max()}"
        diff_px += int((d > 0).any(-1).sum())
        total_px += h * w
    assert diff_px / total_px < 1e-3
    # rotation matrix builder: cos/sin agree with cv2 to a few ulps; the
    # translation column matches to ~1e-5 relative (OpenCV 5 computes it
    # at reduced precision — ours is the full-double closed form)
    for c0, a, s, c1 in rng.uniform(-200, 200, (50, 4)):
        ours = T.rotation_matrix((float(c0), float(c1)), float(a), float(s))
        ref = cv2.getRotationMatrix2D((float(c0), float(c1)), float(a),
                                      float(s))
        np.testing.assert_allclose(ours[:, :2], ref[:, :2],
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(ours[:, 2], ref[:, 2], rtol=5e-5,
                                   atol=1e-5)


def test_shift_scale_rotate_and_random_affine_no_cv2():
    """The augmentation entry points run end to end on the canonical warp
    (no cv2 import in the hot path) and draw the same RNG stream as the
    previous cv2-backed implementation (5 uniforms / 3 uniforms + the
    gate)."""
    import random as pyrandom

    from PIL import Image

    from vit_ed_tpu.data import transforms as T

    rng = np.random.default_rng(17)
    img = Image.fromarray(rng.integers(0, 256, (60, 80, 3), np.uint8))
    pyrandom.seed(3)
    out = T.shift_scale_rotate(img, p=1.0)
    assert out.size == img.size
    pyrandom.seed(3)
    draws = [pyrandom.random()] + [pyrandom.uniform(0, 1) for _ in range(4)]
    assert len(draws) == 5  # gate + angle/scale/dx/dy
    pyrandom.seed(4)
    out2 = T.random_affine(img, p=1.0, fill=255)
    assert out2.size == img.size
    arr2 = np.asarray(out2)
    assert arr2.shape == (60, 80, 3)


def test_random_affine_grayscale_no_crash():
    """random_affine on an 'L'-mode image: the 3-tuple fill follows cv2
    Scalar semantics on a 1-channel array (extra entries ignored)."""
    from vit_ed_tpu.data import transforms as T

    rng = np.random.default_rng(2)
    img = Image.fromarray(rng.integers(0, 256, (40, 50), np.uint8), "L")
    out = T.random_affine(img, degrees=10, translate=(0.2, 0.2), fill=0,
                          p=1.0)
    assert out.size == img.size and out.mode == "L"
    # the numpy mirror agrees with an explicit 1-channel border value
    arr = np.asarray(img)
    m = T.rotation_matrix((25.0, 20.0), 7.0, 1.0)
    np.testing.assert_array_equal(T._warp_affine_np(arr, m, (9, 0, 0)),
                                  T._warp_affine_np(arr, m, (9,)))


def test_native_warp_upscale_bottom_right_corner_parity():
    """Upscale warps (inverse x-step < 1) produce RUNS of pixels whose
    taps sit at the bottom-right source corner (x0 == w-2, y0 == h-2);
    those must drop out of the SSE fast path (whose 8-byte tap load
    would read past the buffer) and still blend bit-exactly."""
    from vit_ed_tpu.data import transforms as T
    from vit_ed_tpu.native import pipeline as npipe

    if not npipe.is_available():
        import pytest

        pytest.skip("native pipeline unavailable")
    rng = np.random.default_rng(13)
    for h, w, s in [(32, 48, 1.15), (17, 33, 2.5), (64, 64, 1.02)]:
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        # pure upscale about the centre pushes the bottom-right output
        # region onto the (w-2, h-2) source tap
        m = T.rotation_matrix((w / 2, h / 2), 0.0, s)
        for bv in (None, (0, 0, 0)):
            np.testing.assert_array_equal(
                npipe.warp_affine(img, m, bv),
                T._warp_affine_np(img, m, bv))


def test_gaussian_blur_bit_exact_vs_pil_dense_sweep():
    """Native AND numpy-mirror Gaussian blur vs PIL across a dense radius
    grid — the C-float radius/weight derivation (Pillow BoxBlur.c locals)
    must round identically or specific radii shift outputs by one."""
    from PIL import ImageFilter

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (48, 61, 3), np.uint8)
    pim = Image.fromarray(img)
    for radius in np.linspace(0.0, 6.0, 61):
        r = float(radius)
        want = np.asarray(pim.filter(ImageFilter.GaussianBlur(radius=r)))
        np.testing.assert_array_equal(
            want, npipe.gaussian_blur(img, r), err_msg=f"native r={r}")
        np.testing.assert_array_equal(
            want, npipe._gaussian_blur_np(img, r), err_msg=f"numpy r={r}")


def test_gaussian_blur_edge_shapes():
    """Radius >= image size exercises Pillow's clamped single-loop branch."""
    from PIL import ImageFilter

    rng = np.random.default_rng(2)
    for h, w in [(1, 1), (1, 5), (2, 2), (3, 40), (40, 3)]:
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        pim = Image.fromarray(img)
        for r in (0.3, 2.0, 10.0, 25.0):
            want = np.asarray(pim.filter(ImageFilter.GaussianBlur(radius=r)))
            np.testing.assert_array_equal(want, npipe.gaussian_blur(img, r))
            np.testing.assert_array_equal(
                want, npipe._gaussian_blur_np(img, r))


def test_gaussian_blur_transform_routes_native(monkeypatch):
    """transforms.GaussianBlur p=1 produces the PIL-filter result through
    the native path (PIL in/out contract preserved)."""
    import random as _random

    from PIL import ImageFilter

    rng = np.random.default_rng(3)
    img = Image.fromarray(rng.integers(0, 256, (32, 37, 3), np.uint8))
    t = T.GaussianBlur(p=1.0, radius_min=0.8, radius_max=0.8)
    _random.seed(7)
    got = t(img)
    assert isinstance(got, Image.Image)
    # radius drawn from uniform(0.8, 0.8) == 0.8 regardless of seed
    want = img.filter(ImageFilter.GaussianBlur(radius=0.8))
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
