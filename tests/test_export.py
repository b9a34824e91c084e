"""Serving-export round trips: the jax.export StableHLO bundle must
replay every scorer stage without model code — at any batch size
(symbolic) or at bucketed batches — and the staged composition must
match the live pair pipeline. TPU artifacts must cross-export from this
CPU-only host (Mosaic custom calls lower without a device)."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ed_tpu.models.vit_ed import ViTED
from vit_ed_tpu.serve import export_scorer, load_scorer, stage_fns


@pytest.fixture(scope="module")
def tiny():
    model = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=16,
                  depth=1, c_depth=2, num_heads=2, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 32, 32, 3)))["params"]
    return model, params


def test_symbolic_bundle_roundtrip(tiny, tmp_path):
    model, params = tiny
    meta = export_scorer(model, params, str(tmp_path))
    assert meta["batch_mode"] == "symbolic"
    assert os.path.exists(tmp_path / "pair.jaxexp")
    assert os.path.exists(tmp_path / "params.msgpack")

    scorer = load_scorer(str(tmp_path))
    fns = stage_fns(model)
    rng = np.random.default_rng(0)
    # one artifact serves every batch size
    for b in (1, 5):
        x = jnp.asarray(rng.normal(size=(b, 2, 32, 32, 3)), jnp.float32)
        np.testing.assert_allclose(scorer("pair", x),
                                   fns["pair"](params, x), atol=1e-5)

    # staged serving pipeline == live staged calls (the production scan
    # schedule: encode + kv once per row, prepare once per column batch)
    x1 = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(3, 32, 32, 3)), jnp.float32)
    feats = scorer("encode", x1)
    kv = scorer("kv", feats)
    tokens = scorer("prepare", x2)
    got = scorer("score_row", kv, tokens)
    live = fns["score_row"](
        params, fns["kv"](params, fns["encode"](params, x1)),
        fns["prepare"](params, x2))
    np.testing.assert_allclose(got, live, atol=1e-5)
    assert got.shape == (3, 4)


def test_bucketed_bundle_dispatch(tiny, tmp_path):
    model, params = tiny
    meta = export_scorer(model, params, str(tmp_path), batch_sizes=[2, 4],
                         stages=("pair",))
    assert meta["batch_mode"] == [2, 4]
    scorer = load_scorer(str(tmp_path))
    fns = stage_fns(model)
    rng = np.random.default_rng(1)
    for b in (2, 4):
        x = jnp.asarray(rng.normal(size=(b, 2, 32, 32, 3)), jnp.float32)
        np.testing.assert_allclose(scorer("pair", x),
                                   fns["pair"](params, x), atol=1e-5)
    with pytest.raises(ValueError, match="no pair artifact for batch 3"):
        scorer("pair", jnp.zeros((3, 2, 32, 32, 3), jnp.float32))


def test_format_version_guard(tiny, tmp_path):
    model, params = tiny
    export_scorer(model, params, str(tmp_path), stages=("pair",))
    meta_path = tmp_path / "serving_meta.json"
    meta = json.loads(meta_path.read_text())
    meta["format_version"] = 99
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="newer than this loader"):
        load_scorer(str(tmp_path))


def test_tpu_cross_export_from_cpu_host(tiny, tmp_path):
    """platforms=("tpu",) must serialize from this CPU-only process —
    including the Pallas attention kernels (Mosaic custom calls embed in
    the StableHLO at lowering time, no device needed)."""
    _, params = tiny
    pallas_model = ViTED(img_size=32, patch_size=16, num_classes=4,
                         embed_dim=16, depth=1, c_depth=2, num_heads=2,
                         use_pallas=True)
    meta = export_scorer(pallas_model, params, str(tmp_path),
                         platforms=("tpu",))
    for stage, entries in meta["stages"].items():
        assert entries[0]["platforms"] == ["tpu"]
        assert os.path.getsize(tmp_path / entries[0]["file"]) > 0
    # a TPU-only bundle must refuse nothing at load time (replay is the
    # serving host's job); deserialization itself must work here
    scorer = load_scorer(str(tmp_path))
    assert set(scorer.stages()) == set(meta["stages"])


def test_multichip_bundle(tiny, tmp_path):
    """mesh= exports a batch-sharded bundle: the symbolic batch carries
    the divisibility constraint (any multiple of the data axis), the
    loader requires a matching mesh and commits inputs to the recorded
    shardings, and results equal the single-device pipeline."""
    from vit_ed_tpu.parallel.mesh import create_mesh

    model, params = tiny
    mesh = create_mesh()  # 8 virtual CPU devices
    meta = export_scorer(model, params, str(tmp_path), mesh=mesh)
    assert meta["mesh"]["data_axis"] == "data"
    assert meta["stages"]["pair"][0]["nr_devices"] == 8

    with pytest.raises(ValueError, match="pass a matching mesh"):
        load_scorer(str(tmp_path))

    scorer = load_scorer(str(tmp_path), mesh=mesh)
    fns = stage_fns(model)
    rng = np.random.default_rng(3)
    for b in (8, 16):
        x = jnp.asarray(rng.normal(size=(b, 2, 32, 32, 3)), jnp.float32)
        np.testing.assert_allclose(np.asarray(scorer("pair", x)),
                                   np.asarray(fns["pair"](params, x)),
                                   atol=1e-5)
    # staged pipeline across the mesh: one shared row, sharded columns
    x1 = jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32)
    kv = scorer("kv", scorer("encode", x1))
    kv_row = jnp.asarray(np.asarray(kv)[:, :1])
    tokens = scorer("prepare", x1)
    got = scorer("score_row", kv_row, tokens)
    live = fns["score_row"](
        params,
        jax.tree.map(lambda a: a[:, :1],
                     fns["kv"](params, fns["encode"](params, x1))),
        fns["prepare"](params, x1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(live), atol=1e-5)


def test_scan_pairs_matches_training_scorer(tiny, tmp_path):
    """The headless bundle scan (serve/scan.py, zero model code) must
    reproduce PairwiseScorer.score_dataset's matrix — single-chip
    symbolic bundle AND mesh-sharded bundle with ragged (padded)
    chunks."""
    from vit_ed_tpu.parallel.mesh import create_mesh
    from vit_ed_tpu.parallel.pairs import PairwiseScorer
    from vit_ed_tpu.serve import scan_pairs

    class ArrayDataset:
        def __init__(self, imgs):
            self.imgs = imgs

        def __getitem__(self, i):
            return self.imgs[i], i

        def __len__(self):
            return len(self.imgs)

    model, params = tiny
    rng = np.random.default_rng(4)
    imgs = rng.normal(size=(7, 32, 32, 3)).astype(np.float32)
    mesh = create_mesh()
    ps = PairwiseScorer(model, params, mesh, num_outputs=4, pair_chunk=8)
    ref = ps.score_dataset(ArrayDataset(imgs), batch_size=3, num_workers=0)

    export_scorer(model, params, str(tmp_path / "one"))
    got = scan_pairs(load_scorer(str(tmp_path / "one")), imgs, batch_size=3)
    np.testing.assert_allclose(got.astype(np.float32),
                               ref.astype(np.float32), atol=2e-2)

    export_scorer(model, params, str(tmp_path / "mc"), mesh=mesh)
    got_mc = scan_pairs(load_scorer(str(tmp_path / "mc"), mesh=mesh),
                        imgs, batch_size=3)
    np.testing.assert_allclose(got_mc.astype(np.float32),
                               ref.astype(np.float32), atol=2e-2)

    # degenerate input: empty image set -> empty matrix, no crash
    assert scan_pairs(load_scorer(str(tmp_path / "one")),
                      imgs[:0], batch_size=3).shape == (0, 0)


def test_flagship_tpu_cross_export(tmp_path):
    """The REAL deployment artifact: pjs-S patch16_512 with the Pallas
    kernels, symbolic batch, cross-exported for TPU from this CPU host.
    Regression: the kernels' Mosaic CostEstimate must be dropped (not
    crash) when the batch is symbolic — tiny-shape tests skip the Pallas
    path, so this must run at flagship geometry."""
    model = ViTED(img_size=512, patch_size=16, num_classes=1,
                  embed_dim=384, depth=12, c_depth=12, num_heads=6,
                  dtype=jnp.bfloat16, use_pallas=True)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 2, 512, 512, 3))),
        jax.random.PRNGKey(0))["params"]
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    meta = export_scorer(model, params, str(tmp_path),
                         stages=("pair", "score_row"), platforms=("tpu",))
    for entries in meta["stages"].values():
        assert entries[0]["platforms"] == ["tpu"]
        assert os.path.getsize(tmp_path / entries[0]["file"]) > 0


def test_moe_bundle_roundtrip(tmp_path):
    """MoE encoder MLPs (Switch routing, static capacity) must export and
    replay like dense models — the dense-dispatch einsums have no ragged
    shapes, so even the symbolic-batch artifact serves any batch."""
    model = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=16,
                  depth=2, c_depth=1, num_heads=2, use_pallas=False,
                  moe_experts=2, moe_interval=1, moe_capacity=1.5)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 32, 32, 3)))["params"]
    export_scorer(model, params, str(tmp_path), stages=("pair",))
    scorer = load_scorer(str(tmp_path))
    fns = stage_fns(model)
    rng = np.random.default_rng(5)
    for b in (2, 5):
        x = jnp.asarray(rng.normal(size=(b, 2, 32, 32, 3)), jnp.float32)
        np.testing.assert_allclose(np.asarray(scorer("pair", x)),
                                   np.asarray(fns["pair"](params, x)),
                                   atol=1e-5)


def test_export_cli(tmp_path):
    """scripts/export_serving.py end to end on the CPU platform, with
    --verify replaying the bundle against the live model."""
    env = dict(os.environ, VIT_ED_PLATFORM="cpu")
    out = tmp_path / "bundle"
    r = subprocess.run(
        [sys.executable, "scripts/export_serving.py",
         "--cfg", "configs/test/test_pjs_hisfrag20_patch32_64.yaml",
         "--output", str(out), "--verify",
         "--opts", "MODEL.PJS.EMBED_DIM", "16", "MODEL.PJS.DEPTH", "1",
         "MODEL.PJS.C_DEPTH", "1", "MODEL.PJS.NUM_HEADS", "2"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out / "serving_meta.json").exists()
    scorer = load_scorer(str(out))
    assert set(scorer.stages()) == set(
        ("pair", "pair_u8", "encode", "prepare", "kv", "score_row"))


def test_pair_u8_stage_bit_identical_to_host_normalize(tmp_path, tiny):
    """The u8-wire stage normalizes on device: scores match the f32
    'pair' stage fed the host-normalized image to float32 rounding (XLA
    lowers the /255 as *(1/255), a last-ulp difference in the inputs)."""
    model, params = tiny
    export_scorer(model, params, str(tmp_path), stages=("pair", "pair_u8"))
    scorer = load_scorer(str(tmp_path))
    rng = np.random.default_rng(0)
    x_u8 = rng.integers(0, 256, (3, 2, 32, 32, 3), np.uint8)
    x_f32 = (x_u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(
        np.asarray(scorer("pair_u8", x_u8)),
        np.asarray(scorer("pair", x_f32)), rtol=1e-4, atol=1e-5)
