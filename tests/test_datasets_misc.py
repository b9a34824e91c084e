"""Michigan / Geshaem / Pajigsaw dataset construction on synthetic trees."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def _img(path, size=64):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (size, size, 3), np.uint8)).save(path)


def test_michigan_dataset(tmp_path):
    """Path scheme: .../<im_name>/<rv>/<sum_det>/<sub_name>/<im_type>/x/y.png
    with grouping of im_name+sub_name (michigan_dataset.py:54-62)."""
    root = tmp_path / "mich"
    for im_name, sub in [("p1", "p1a"), ("p2", "p2a"), ("p1b", "p1")]:
        for rv in ["front", "back"]:
            _img(str(root / im_name / rv / "detail" / sub / "papyrus" / "x" /
                     f"{im_name}_{rv}.png"))

    from vit_ed_tpu.data.michigan import MichiganDataset

    ds = MichiganDataset(str(root), MichiganDataset.Split.ALL,
                         transforms=lambda im: np.asarray(im, np.float32))
    # only front/papyrus images included
    assert len(ds) == 3
    img, label = ds[0]
    assert img.shape == (64, 64, 3)


def test_geshaem_parse_name():
    from vit_ed_tpu.data.geshaem import parse_name

    frag, rv, col = parse_name("G123_r_col1")
    assert (frag, rv, col) == ("G123", "r", "col1")
    frag, rv, col = parse_name("G1_G2_v_col2")
    assert frag == "G1_G2" and rv == "v"
    with pytest.raises(ValueError):
        parse_name("###")


def test_geshaem_dataset(tmp_path):
    """Tree: <root>/<image_name>/a/papyrus/<x>/*.jpg with image_name like
    frag_r_col; multi-fragment names define groups
    (geshaem_dataset.py:156-179)."""
    root = tmp_path / "gesh"
    for name in ["A_r_c1", "B_r_c1", "A_B_r_c1", "C_r_c1"]:
        _img(str(root / name / "papyrus" / "x" / "im.jpg"), size=128)

    from vit_ed_tpu.data.geshaem import GeshaemPatch

    ds = GeshaemPatch(str(root), GeshaemPatch.Split.VAL,
                      transform=lambda im: np.asarray(im, np.float32),
                      min_size_limit=16)
    # A and B are grouped via the assembled A_B fragment
    gid_a = ds.fragment_to_group_id["A"]
    gid_b = ds.fragment_to_group_id["B"]
    assert gid_a == gid_b
    assert "B" in ds.fragment_to_group["A"]
    stacked, labels = ds[0]
    assert stacked.shape[0] == 2


def test_geshaem_train_excludes_assembled(tmp_path):
    root = tmp_path / "gesh2"
    for name in ["A_r_c1", "B_r_c1", "A_B_r_c1"]:
        _img(str(root / name / "papyrus" / "x" / "im.jpg"), size=128)

    from vit_ed_tpu.data.geshaem import GeshaemPatch

    ds = GeshaemPatch(str(root), GeshaemPatch.Split.TRAIN,
                      transform=None, min_size_limit=16)
    assert "A_B" not in ds.fragments  # leakage prevention


def test_pajigsaw_dataset(tmp_path):
    root = tmp_path / "pjs"
    os.makedirs(root)
    fragments = []
    for r in range(2):
        for c in range(2):
            rel = f"img0/{r}_{c}.jpg"
            _img(str(root / rel))
            fragments.append({"im_path": rel, "row": r, "col": c, "degree": 0,
                              "white_percentage": 0.0})
    manifest = {"img0": {"Fragment1v1Rotate90": fragments}}
    with open(root / "train.json", "w") as f:
        json.dump(manifest, f)
    with open(root / "val.json", "w") as f:
        json.dump(manifest, f)

    from vit_ed_tpu.data.pajigsaw import Pajigsaw, PajigsawPieces

    ds = Pajigsaw(str(root), Pajigsaw.Split.TRAIN)
    assert len(ds) == 4
    stacked, label = ds[0]
    assert stacked.shape[0] == 2
    assert label.shape == (4,)
    assert label.sum() in (0.0, 1.0)

    pieces_ds = PajigsawPieces(str(root), Pajigsaw.Split.VAL)
    pieces, im_name, grid = pieces_ds[0]
    assert grid == (2, 2)
    assert len(pieces) == 4


def test_geshaem_pooled_loader_matches_per_sample(tmp_path):
    """GeshaemPatch items are stacked pairs; the loader's multi-image
    pooled path (raw_images + OneImgEval.pool_crop) must reproduce the
    per-sample batches exactly."""
    from vit_ed_tpu.data import transforms as T
    from vit_ed_tpu.data.geshaem import GeshaemPatch
    from vit_ed_tpu.data.loader import DataLoader
    from vit_ed_tpu.native import pipeline as npipe

    if not npipe.is_available():
        pytest.skip("no C++ toolchain")

    root = tmp_path / "gesh3"
    rng = np.random.default_rng(9)
    for k, name in enumerate(["A_r_c1", "B_r_c1", "C_r_c1", "D_r_c1",
                              "A_B_r_c1"]):
        p = str(root / name / "papyrus" / "x" / "im.jpg")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(rng.integers(0, 255, (100 + 4 * k, 120, 3),
                                     np.uint8)).save(p, quality=92)

    ds = GeshaemPatch(str(root), GeshaemPatch.Split.VAL,
                      transform=T.OneImgEval(64, crop=True),
                      min_size_limit=16)
    assert len(ds) >= 6
    serial = list(DataLoader(ds, batch_size=3, num_workers=0))
    loader = DataLoader(ds, batch_size=3, num_workers=2)
    assert loader._native_pool() is not None
    pooled = list(loader)
    assert len(pooled) == len(serial)
    for (si, sl), (pi, pl) in zip(serial, pooled):
        np.testing.assert_array_equal(si, pi)
        np.testing.assert_array_equal(sl, pl)


def test_geshaem_stacked_pairs_preserve_u8(tmp_path):
    """GeshaemPatch stacked pairs ride the u8 device wire: when the
    transform emits uint8 (OneImgEvalZoom(emit_u8=True)), the stacked
    [2, H, W, 3] sample stays uint8 end to end; a PIL/f32 transform
    still ships float32."""
    from vit_ed_tpu.data.geshaem import GeshaemPatch
    from vit_ed_tpu.data.transforms import OneImgEvalZoom

    root = tmp_path / "gesh_u8"
    for name in ["A_r_c1", "B_r_c1", "A_B_r_c1", "C_r_c1"]:
        _img(str(root / name / "papyrus" / "x" / "im.jpg"), size=128)

    ds_u8 = GeshaemPatch(str(root), GeshaemPatch.Split.VAL,
                         transform=OneImgEvalZoom(64, emit_u8=True),
                         min_size_limit=16)
    stacked, _labels = ds_u8[0]
    assert stacked.dtype == np.uint8 and stacked.shape == (2, 64, 64, 3)

    ds_f32 = GeshaemPatch(str(root), GeshaemPatch.Split.VAL,
                          transform=OneImgEvalZoom(64),
                          min_size_limit=16)
    stacked_f, _ = ds_f32[0]
    assert stacked_f.dtype == np.float32
    np.testing.assert_allclose(
        (stacked.astype(np.float32) / 255.0 - 0.5) / 0.5, stacked_f,
        atol=1e-6)
