import numpy as np
import pytest
from PIL import Image

from vit_ed_tpu.data.grouping import add_items_to_group
from vit_ed_tpu.data import transforms as T
from vit_ed_tpu.data.loader import DataLoader
from vit_ed_tpu.data.samplers import (
    DistributedEvalSampler,
    DistributedRepeatSampler,
    MPerClassSampler,
)


def test_add_items_to_group_merges():
    groups = []
    add_items_to_group(["a", "b"], groups)
    add_items_to_group(["c", "d"], groups)
    assert len(groups) == 2
    add_items_to_group(["b", "c"], groups)
    assert len(groups) == 1
    assert groups[0] == {"a", "b", "c", "d"}


def test_two_img_sync_eval():
    img = Image.fromarray(np.full((100, 80, 3), 128, np.uint8))
    t = T.TwoImgSyncEval(64)
    a, b = t(img, img)
    # shorter side resized to 64
    assert a.shape[0] == 80 and a.shape[1] == 64
    np.testing.assert_allclose(a, (128 / 255 - 0.5) / 0.5, atol=1e-3)


def test_center_crop_and_random_crop():
    img = Image.fromarray(np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3) % 255)
    c = T.center_crop(img, 32)
    assert c.size == (32, 32)
    r = T.random_crop(img, 32)
    assert r.size == (32, 32)
    padded = T.random_crop(Image.new("RGB", (16, 16)), 32, pad_if_needed=True)
    assert padded.size == (32, 32)


def test_grid_crop():
    img = Image.new("RGB", (96, 64))
    patches = T.crop(img, 3, 2)
    assert len(patches) == 6
    assert patches[0].size == (32, 32)


def test_distributed_repeat_sampler_partitions():
    idx = [list(DistributedRepeatSampler(10, num_replicas=3, rank=r, shuffle=False))
           for r in range(3)]
    # padded to equal size, all indices covered
    assert all(len(x) == 4 for x in idx)
    assert set(i for x in idx for i in x) == set(range(10))


def test_distributed_eval_sampler_exact():
    idx = [list(DistributedEvalSampler(10, num_replicas=3, rank=r)) for r in range(3)]
    flat = sorted(i for x in idx for i in x)
    assert flat == list(range(10))  # no padding/duplication


def test_m_per_class_sampler():
    labels = [0] * 6 + [1] * 6 + [2] * 6
    s = MPerClassSampler(labels, m=3, batch_size=6, length_before_new_iter=36)
    idx = list(s)
    assert len(idx) == 36
    labels = np.asarray(labels)
    for b in range(0, 36, 6):
        batch = labels[idx[b:b + 6]]
        # each batch draws m=3 from each of 2 classes
        vals, counts = np.unique(batch, return_counts=True)
        assert all(c == 3 for c in counts)


def test_loader_with_workers():
    class DS:
        def __getitem__(self, i):
            return np.full((2, 2), i), i

        def __len__(self):
            return 10

    loader = DataLoader(DS(), batch_size=3, num_workers=2)
    batches = list(loader)
    assert len(batches) == 4
    np.testing.assert_array_equal(batches[0][1], [0, 1, 2])
    loader = DataLoader(DS(), batch_size=3, num_workers=2, drop_last=True)
    assert len(list(loader)) == 3


def test_shift_scale_rotate_identity_when_p0():
    img = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (32, 32, 3), np.uint8))
    out = T.shift_scale_rotate(img, p=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_loader_native_batch_matches_per_sample(tmp_path):
    """The DataLoader's native whole-batch path (raw_image + item_meta +
    pool_crop -> PipelinePool.prep_batch) must yield exactly the batches of
    the per-sample path, including the per-batch fallback when the pool
    cannot express a sample (center-crop padding case)."""
    from vit_ed_tpu.data.hisfrag import HisFrag20Test, Split
    from vit_ed_tpu.data.transforms import OneImgEval
    from vit_ed_tpu.native import pipeline as npipe

    if not npipe.is_available():
        import pytest

        pytest.skip("no C++ toolchain")

    rng = np.random.default_rng(3)
    d = tmp_path / "test"
    d.mkdir()
    # 7 croppable images + 1 smaller than the crop (forces the fallback)
    sizes = [(72, 80)] * 4 + [(90, 70), (64, 64), (80, 72), (40, 40)]
    for k, (h, w) in enumerate(sizes):
        arr = rng.integers(0, 256, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(str(d / f"w{k}_0_0.jpg"), quality=92)

    ds = HisFrag20Test(str(tmp_path), Split.TEST,
                       transform=OneImgEval(64, crop=True))
    serial = list(DataLoader(ds, batch_size=3, num_workers=0))
    loader = DataLoader(ds, batch_size=3, num_workers=2)
    assert loader._native_pool() is not None  # the path is active
    pooled = list(loader)
    assert len(pooled) == len(serial)
    for (si, sj), (pi, pj) in zip(serial, pooled):
        np.testing.assert_array_equal(si, pi)
        np.testing.assert_array_equal(sj, pj)
    # second epoch reuses the cached persistent pool
    for (si, sj), (pi, pj) in zip(serial, list(loader)):
        np.testing.assert_array_equal(si, pi)
        np.testing.assert_array_equal(sj, pj)


def test_one_img_eval_zoom_matches_inline_chain():
    """OneImgEvalZoom must equal the inline Michigan eval chain
    (center_crop -> 1.15x resize -> center_crop -> normalize) on every
    size class, including short images that take the padding path."""
    rng = np.random.default_rng(5)
    t = T.OneImgEvalZoom(48)
    for h, w in [(64, 80), (48, 48), (100, 49), (30, 60), (20, 20)]:
        img = Image.fromarray(rng.integers(0, 256, (h, w, 3), np.uint8))
        ref = T.normalize_image(
            T.center_crop(T.resize(T.center_crop(img, (48, 48)),
                                   int(48 * 1.15)), 48))
        np.testing.assert_array_equal(t(img), ref)


def test_loader_native_batch_with_post_crop(tmp_path):
    """The pooled loader path with a pool_post_crop transform
    (OneImgEvalZoom over MichiganTest) must match per-sample batches."""
    from vit_ed_tpu.data.michigan import MichiganTest, Split
    from vit_ed_tpu.native import pipeline as npipe

    if not npipe.is_available():
        import pytest

        pytest.skip("no C++ toolchain")

    rng = np.random.default_rng(11)
    files = []
    # croppable sizes + one short image (padding fallback batch)
    for k, (h, w) in enumerate([(72, 80), (64, 64), (90, 70), (80, 72),
                                (100, 100), (40, 40)]):
        p = tmp_path / f"frag{k}.png"
        Image.fromarray(rng.integers(0, 256, (h, w, 3), np.uint8)).save(str(p))
        files.append(str(p))

    ds = MichiganTest(str(tmp_path), Split.VAL, T.OneImgEvalZoom(56),
                      samples=files, lower_bound=1)
    serial = list(DataLoader(ds, batch_size=2, num_workers=0))
    loader = DataLoader(ds, batch_size=2, num_workers=2)
    assert loader._native_pool() is not None
    pooled = list(loader)
    assert len(pooled) == len(serial)
    for (si, sj), (pi, pj) in zip(serial, pooled):
        np.testing.assert_array_equal(si, pi)
        np.testing.assert_array_equal(sj, pj)


def test_hisfrag20_eval_loader_pools_but_train_does_not(tmp_path):
    """HisFrag20 (train-style dataset) pools only when the transform
    carries pool_crop: OneImgEval activates the native path and matches
    per-sample; a train-time function transform keeps the plain path."""
    from vit_ed_tpu.data.hisfrag import HisFrag20, Split
    from vit_ed_tpu.native import pipeline as npipe

    if not npipe.is_available():
        import pytest

        pytest.skip("no C++ toolchain")

    rng = np.random.default_rng(13)
    d = tmp_path / "train"
    d.mkdir()
    for w in range(3):
        for f in range(2):
            arr = rng.integers(0, 256, (70 + 6 * f, 80, 3), np.uint8)
            Image.fromarray(arr).save(str(d / f"w{w}_0_{f}.jpg"), quality=92)

    ds = HisFrag20(str(tmp_path), Split.TRAIN,
                   transform=T.OneImgEval(64, crop=True))
    serial = list(DataLoader(ds, batch_size=2, num_workers=0))
    loader = DataLoader(ds, batch_size=2, num_workers=2)
    assert loader._native_pool() is not None
    for (si, sl), (pi, pl) in zip(serial, list(loader)):
        np.testing.assert_array_equal(si, pi)
        np.testing.assert_array_equal(sl, pl)

    ds_train = HisFrag20(str(tmp_path), Split.TRAIN,
                         transform=lambda im: np.asarray(im, np.float32))
    assert DataLoader(ds_train, batch_size=2,
                      num_workers=2)._native_pool() is None


def _div2k_fixture(tmp_path, image_size=8):
    """One DIV2K val image whose 3x2 grid cells carry distinct constant
    values, so every output crop identifies its source cell by value."""
    import os

    from PIL import Image

    d = os.path.join(str(tmp_path), "DIV2K_valid_HR")
    os.makedirs(d, exist_ok=True)
    h, w = image_size * 2, image_size * 3
    img = np.zeros((h, w, 3), np.uint8)
    for r in range(2):
        for c in range(3):
            img[r * image_size:(r + 1) * image_size,
                c * image_size:(c + 1) * image_size] = 10 + (r * 3 + c) * 20
    Image.fromarray(img).save(os.path.join(d, "0000.png"))
    return str(tmp_path)


def test_div2k_label_branches_match_reference(tmp_path, monkeypatch):
    """The 4-bin label pipeline maps each branch combination to EXACTLY the
    reference's (label, first-crop, second-crop) outcomes
    (/root/reference/data/datasets/div2k_patch.py:131-153; cells row-major
    0..5, pairs start as first=c0, second=c1, third=c4, fourth=c3).

    The reference branches on torch.rand; ours on random.random with the
    same probabilities (0.3 negative, 0.5 per swap). TAKE=branch taken,
    SKIP=not taken."""
    import random as _random

    from vit_ed_tpu.data.div2k import DIV2KPatch, Split

    size = 8
    root = _div2k_fixture(tmp_path, size)
    ds = DIV2KPatch(root, Split.VAL, transform=None, image_size=size,
                    erosion_ratio=0.07, with_negative=True)

    TAKE, SKIP = 0.01, 0.99  # random.random() < p takes the branch
    cell_value = lambda arr: int(round(float(np.mean(arr))))
    cv = [10 + i * 20 for i in range(6)]

    # (neg?, d2, d3) -> (label, first cell, second cell), transcribed from
    # the reference's branch outcomes
    cases = [
        ((SKIP, SKIP, SKIP), ([1, 0, 0, 0], cv[0], cv[1])),  # right
        ((SKIP, TAKE, SKIP), ([0, 1, 0, 0], cv[0], cv[3])),  # below
        ((SKIP, SKIP, TAKE), ([0, 0, 1, 0], cv[1], cv[0])),  # left
        ((SKIP, TAKE, TAKE), ([0, 0, 0, 1], cv[3], cv[0])),  # above
        ((TAKE, TAKE, SKIP), ([0, 0, 0, 0], cv[0], cv[4])),  # neg: diag
        ((TAKE, TAKE, TAKE), ([0, 0, 0, 0], cv[4], cv[0])),
        ((TAKE, SKIP, SKIP), ([0, 0, 0, 0], cv[0], cv[2])),  # neg: 2 apart
        ((TAKE, SKIP, TAKE), ([0, 0, 0, 0], cv[2], cv[0])),
    ]
    for draws, (want_label, want_first, want_second) in cases:
        seq = iter(draws)
        monkeypatch.setattr(_random, "random", lambda: next(seq))
        stacked, label = ds[0]
        assert label.tolist() == want_label, draws
        assert cell_value(stacked[0]) == want_first, draws
        assert cell_value(stacked[1]) == want_second, draws


def test_div2k_label_probabilities(tmp_path):
    """Empirical label distribution matches the reference's closed-form
    probabilities: P(negative)=0.3, each direction 0.7/4=0.175
    (div2k_patch.py:131-153)."""
    import random as _random

    from vit_ed_tpu.data.div2k import DIV2KPatch, Split

    root = _div2k_fixture(tmp_path)
    ds = DIV2KPatch(root, Split.VAL, transform=None, image_size=8,
                    erosion_ratio=0.07, with_negative=True)
    _random.seed(123)
    n = 4000
    counts = {}
    for _ in range(n):
        _, label = ds[0]
        counts[tuple(label.tolist())] = counts.get(tuple(label.tolist()), 0) + 1
    probs = {k: v / n for k, v in counts.items()}
    assert abs(probs[(0.0, 0.0, 0.0, 0.0)] - 0.3) < 0.03
    for direction in range(4):
        key = tuple(1.0 if i == direction else 0.0 for i in range(4))
        assert abs(probs[key] - 0.175) < 0.03, (direction, probs)
