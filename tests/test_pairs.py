"""Sharded-vs-replicated equivalence for the O(N^2) pairwise scan,
mirroring the reference's tests/hisfrag_evaluation_test.py contract: the
block-tiled sharded path must produce the same similarity matrix (and hence
the same mAP) as straightforward full pair forwards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ed_tpu.metrics import get_metrics
from vit_ed_tpu.models.vit_ed import ViTED
from vit_ed_tpu.parallel.mesh import create_mesh
from vit_ed_tpu.parallel.pairs import PairwiseScorer


class ArrayDataset:
    def __init__(self, imgs):
        self.imgs = imgs

    def __getitem__(self, i):
        return self.imgs[i], i

    def __len__(self):
        return len(self.imgs)


@pytest.fixture(scope="module")
def setup():
    model = ViTED(img_size=32, patch_size=16, num_classes=1, embed_dim=16,
                  depth=1, c_depth=1, num_heads=2, use_pallas=False)
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(13, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 32, 32, 3)))
    return model, variables["params"], imgs


def _replicated_scores(model, params, imgs):
    n = len(imgs)
    sim = np.zeros((n, n), np.float16)
    for i in range(n):
        for j in range(i, n):
            pair = jnp.asarray(np.stack([imgs[i], imgs[j]])[None])
            s = float(model.apply({"params": params}, pair)[0, 0])
            sim[i, j] = sim[j, i] = np.float16(s)
    return sim


def test_sharded_matches_replicated(setup, tmp_path):
    model, params, imgs = setup
    mesh = create_mesh()  # 8 virtual CPU devices
    assert mesh.devices.size == 8
    scorer = PairwiseScorer(model, params, mesh, num_outputs=1, pair_chunk=16)
    sim = scorer.score_dataset(ArrayDataset(imgs), batch_size=4,
                               out_dir=str(tmp_path), tag="t", num_workers=0)
    sim_ref = _replicated_scores(model, params, imgs)
    np.testing.assert_allclose(sim.astype(np.float32), sim_ref.astype(np.float32),
                               atol=2e-2)
    # mAP equivalence (the actual reference test assertion)
    labels = np.arange(13) // 3
    m1 = get_metrics(1 - sim.astype(np.float32), labels)[0]
    m2 = get_metrics(1 - sim_ref.astype(np.float32), labels)[0]
    np.testing.assert_almost_equal(m1, m2)


def test_row_shared_matches_mixed_schedule(setup, tmp_path):
    """The row-sharded schedule (default) and the mixed-chunk schedule
    (row_shared=False) must produce the same matrix — they score the
    same pairs through mathematically identical paths."""
    model, params, imgs = setup
    mesh = create_mesh()
    ds = ArrayDataset(imgs)
    row = PairwiseScorer(model, params, mesh, num_outputs=1, pair_chunk=16)
    assert row.row_shared
    mixed = PairwiseScorer(model, params, mesh, num_outputs=1, pair_chunk=16,
                           row_shared=False)
    assert not mixed.row_shared
    s_row = row.score_dataset(ds, batch_size=4, num_workers=0)
    s_mixed = mixed.score_dataset(ds, batch_size=4, num_workers=0)
    np.testing.assert_array_equal(s_row, s_mixed)
    # score_dense keeps f32: the kv projection GEMM batches differently
    # between the schedules (whole-block vs per-row), so CPU reassociates
    # the f32 accumulation at the ulp level (score_dataset rounds to
    # fp16, hence bitwise above)
    d_row = row.score_dense(imgs[:5], batch_size=4)
    d_mixed = mixed.score_dense(imgs[:5], batch_size=4)
    np.testing.assert_allclose(d_row, d_mixed, atol=1e-6)


def test_token_cache_matches_streaming(setup, tmp_path):
    """The device-resident x2 token cache (round 5: decode + upload +
    prepare each column image ONCE instead of once per row block) must
    produce the same matrix as the streaming path — identical per-pair
    math, only the column tokens' residency changes."""
    model, params, imgs = setup
    mesh = create_mesh()
    ds = ArrayDataset(imgs)
    scorer = PairwiseScorer(model, params, mesh, num_outputs=1,
                            pair_chunk=16)
    s_stream = scorer.score_dataset(ds, batch_size=4, num_workers=0,
                                    token_cache=False)
    s_cache = scorer.score_dataset(ds, batch_size=4, num_workers=0,
                                   token_cache=True)
    np.testing.assert_array_equal(s_stream, s_cache)
    # auto mode enables the cache at this tiny size (fits any budget)
    s_auto = scorer.score_dataset(ds, batch_size=4, num_workers=0)
    np.testing.assert_array_equal(s_stream, s_auto)
    # and the slab-on-disk + resume path composes with the cache
    rows_disk, _ = scorer.score_dataset(
        ds, batch_size=4, num_workers=0, out_dir=str(tmp_path), tag="tc",
        assemble=False, slab_on_disk=True, token_cache=True)
    np.testing.assert_array_equal(np.asarray(rows_disk), s_stream)


def test_resume_from_cached_blocks(setup, tmp_path):
    model, params, imgs = setup
    mesh = create_mesh()
    scorer = PairwiseScorer(model, params, mesh, num_outputs=1, pair_chunk=16)
    ds = ArrayDataset(imgs)
    sim1 = scorer.score_dataset(ds, batch_size=4, out_dir=str(tmp_path),
                                tag="r", num_workers=0)
    # second run must hit the .npz caches and reproduce the matrix
    sim2 = scorer.score_dataset(ds, batch_size=4, out_dir=str(tmp_path),
                                tag="r", num_workers=0)
    np.testing.assert_array_equal(sim1, sim2)


def test_slab_on_disk_matches_in_memory(setup, tmp_path):
    """slab_on_disk=True backs the row slab with a memmap under out_dir:
    scores identical to the in-memory slab, a second run resumes entirely
    from the .done markers (no re-encoding), and a stale layout (different
    N under the same tag) is recreated instead of corrupting results."""
    import glob

    model, params, imgs = setup
    mesh = create_mesh()
    ds = ArrayDataset(imgs)
    scorer = PairwiseScorer(model, params, mesh, num_outputs=1, pair_chunk=16)
    rows_mem, rng_mem = scorer.score_dataset(ds, batch_size=4, num_workers=0,
                                             assemble=False)
    rows_disk, rng_disk = scorer.score_dataset(
        ds, batch_size=4, num_workers=0, assemble=False,
        out_dir=str(tmp_path), tag="d", slab_on_disk=True)
    assert isinstance(rows_disk, np.memmap)
    assert rng_mem == rng_disk
    np.testing.assert_array_equal(np.asarray(rows_disk), rows_mem)
    assert glob.glob(str(tmp_path / "d_rank0_rows*.done"))

    calls = {"n": 0}
    orig = scorer._encode

    def counting(*a):
        calls["n"] += 1
        return orig(*a)

    scorer._encode = counting
    rows2, _ = scorer.score_dataset(
        ds, batch_size=4, num_workers=0, assemble=False,
        out_dir=str(tmp_path), tag="d", slab_on_disk=True)
    assert calls["n"] == 0  # every block resumed from the memmap
    np.testing.assert_array_equal(np.asarray(rows2), rows_mem)
    scorer._encode = orig

    # same tag, different dataset size: slab meta mismatch -> recreate
    ds2 = ArrayDataset(imgs[:9])
    rows3, _ = scorer.score_dataset(ds2, batch_size=4, num_workers=0,
                                    assemble=False, out_dir=str(tmp_path),
                                    tag="d", slab_on_disk=True)
    ref3, _ = scorer.score_dataset(ds2, batch_size=4, num_workers=0,
                                   assemble=False)
    np.testing.assert_array_equal(np.asarray(rows3), ref3)

    # assembling N x N from a disk slab is refused
    with pytest.raises(ValueError):
        scorer.score_dataset(ds, batch_size=4, num_workers=0,
                             out_dir=str(tmp_path), tag="d",
                             slab_on_disk=True)


def test_blocked_mirror_single_process(setup):
    """_complete_rows' banded single-process mirror (forced multi-block)
    equals the naive whole-matrix transpose mirror, incl. num_outputs>1."""
    model, params, imgs = setup
    mesh = create_mesh()
    rng = np.random.default_rng(1)
    n = 23
    for c in (1, 2):
        scorer = PairwiseScorer(model, params, mesh, num_outputs=c,
                                pair_chunk=16)
        up = rng.normal(size=(n, n, c)).astype(np.float16)
        up[np.tril_indices(n, -1)] = 0
        naive = up.copy()
        il = np.tril_indices(n, -1)
        naive[il] = np.swapaxes(naive, 0, 1)[il]
        got = scorer._complete_rows(up.copy(), [range(0, n)], 0, 1,
                                    mirror_block=5)
        np.testing.assert_array_equal(
            got, naive if c > 1 else naive[..., 0])


def test_blocked_mirror_multiprocess_replay(setup, monkeypatch):
    """The multi-process banded mirror, replayed deterministically: a fake
    broadcast_one_to_all serves each (process, chunk) step of the global
    schedule from the known upper-triangle matrix; every rank's completed
    slab must tile the fully mirrored matrix."""
    from vit_ed_tpu.data.samplers import balanced_row_ranges

    model, params, imgs = setup
    mesh = create_mesh()
    scorer = PairwiseScorer(model, params, mesh, num_outputs=1,
                            pair_chunk=16)
    rng = np.random.default_rng(2)
    n, world, mb = 13, 3, 4
    up = rng.normal(size=(n, n, 1)).astype(np.float16)
    up[np.tril_indices(n, -1)] = 0
    full = up.copy()
    il = np.tril_indices(n, -1)
    full[il] = np.swapaxes(full, 0, 1)[il]
    ranges = balanced_row_ranges(np.triu_indices(n)[0], world)

    import jax.experimental.multihost_utils as mh

    for rank in range(world):
        seq = iter([(j0, min(j0 + mb, pr.stop))
                    for pr in ranges for j0 in range(pr.start, pr.stop, mb)])

        def fake_broadcast(pad, is_source):
            j0, j1 = next(seq)
            out = np.zeros_like(pad)
            out[: j1 - j0] = up[j0:j1]
            return out

        monkeypatch.setattr(mh, "broadcast_one_to_all", fake_broadcast)
        my = ranges[rank]
        slab = up[my.start:my.stop].copy()
        got = scorer._complete_rows(slab, ranges, rank, world,
                                    mirror_block=mb)
        np.testing.assert_array_equal(got, full[my.start:my.stop, :, 0])


def test_row_ranges_cover_all_rows():
    from vit_ed_tpu.data.samplers import balanced_row_ranges

    n = 57
    iu = np.triu_indices(n)
    ranges = balanced_row_ranges(iu[0], 4)
    rows = [r for rg in ranges for r in rg]
    assert rows == list(range(n))


def test_native_pool_batch_prep_matches_per_sample(tmp_path):
    """score_dataset with the native PipelinePool batch-prep path
    (num_workers>0 + raw_image + OneImgEval.pool_crop) must produce the
    same matrix as the per-sample path."""
    from PIL import Image

    from vit_ed_tpu.data.hisfrag import HisFrag20Test, Split
    from vit_ed_tpu.data.transforms import OneImgEval
    from vit_ed_tpu.models.vit_ed import ViTED
    from vit_ed_tpu.native import pipeline as npipe
    from vit_ed_tpu.parallel.mesh import create_mesh
    from vit_ed_tpu.parallel.pairs import PairwiseScorer

    if not npipe.is_available():
        pytest.skip("no C++ toolchain")

    rng = np.random.default_rng(0)
    d = tmp_path / "test"
    d.mkdir()
    for w in range(3):
        for f in range(3):
            arr = rng.integers(0, 256, (72 + 8 * f, 80, 3), np.uint8)
            Image.fromarray(arr).save(str(d / f"w{w}_0_{f}.jpg"), quality=92)

    dataset = HisFrag20Test(str(tmp_path), Split.TEST,
                            transform=OneImgEval(64, crop=True))
    model = ViTED(img_size=64, patch_size=32, num_classes=1, embed_dim=16,
                  depth=1, c_depth=1, num_heads=2, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 64, 64, 3)))["params"]
    mesh = create_mesh()
    scorer = PairwiseScorer(model, params, mesh, num_outputs=1, pair_chunk=16)
    sim_serial = scorer.score_dataset(dataset, batch_size=4, num_workers=0)
    sim_pool = scorer.score_dataset(dataset, batch_size=4, num_workers=2)
    np.testing.assert_array_equal(sim_serial, sim_pool)
