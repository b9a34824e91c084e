"""Row-sharded wi19 metrics == unsharded wi19 metrics, and the
assemble=False scorer path returns complete rows that reproduce them."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_ed_tpu.metrics import get_metrics
from vit_ed_tpu.metrics.wi19_sharded import merge_partials, row_partials


def _fixture(n=40, n_classes=7, seed=0, with_singletons=False):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_classes, size=n)
    if with_singletons:
        labels[:3] = [100, 101, 102]  # guaranteed singleton queries
    emb = rng.normal(size=(n, 8)) + labels[:, None] * 0.8
    D = np.linalg.norm(emb[:, None] - emb[None, :], axis=-1)
    return D, labels


@pytest.mark.parametrize("with_singletons", [False, True])
@pytest.mark.parametrize("world", [1, 2, 3, 5])
def test_sharded_equals_full(world, with_singletons):
    D, labels = _fixture(with_singletons=with_singletons)
    ref = get_metrics(D, labels)

    bounds = np.linspace(0, len(D), world + 1).astype(int)
    partials = [
        row_partials(D[lo:hi], labels, row_labels=labels[lo:hi])
        for lo, hi in zip(bounds[:-1], bounds[1:])
    ]
    got = merge_partials(partials)
    for r, g in zip(ref, got):
        if np.isnan(r):
            assert np.isnan(g)
        else:
            np.testing.assert_allclose(g, r, rtol=1e-12)


def test_all_singleton_queries_nan_map_matches_unsharded():
    # every label unique -> wi19.get_metrics mAP = mean([]) = nan; the
    # sharded merge must reproduce that, not return 0.0
    rng = np.random.default_rng(1)
    n = 12
    labels = np.arange(n)
    emb = rng.normal(size=(n, 8))
    D = np.linalg.norm(emb[:, None] - emb[None, :], axis=-1)
    ref = get_metrics(D, labels)
    got = merge_partials([row_partials(D[:6], labels, row_labels=labels[:6]),
                          row_partials(D[6:], labels, row_labels=labels[6:])])
    assert np.isnan(ref[0]) and np.isnan(got[0])
    for r, g in zip(ref[1:], got[1:]):
        if np.isnan(r):
            assert np.isnan(g)
        else:
            np.testing.assert_allclose(g, r, rtol=1e-12)


def test_assemble_false_rows_match_full_matrix():
    from vit_ed_tpu.models.vit_ed import ViTED
    from vit_ed_tpu.parallel.mesh import create_mesh
    from vit_ed_tpu.parallel.pairs import PairwiseScorer

    model = ViTED(img_size=32, patch_size=16, num_classes=1, embed_dim=16,
                  depth=1, c_depth=1, num_heads=2, use_pallas=False)
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(11, 32, 32, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 32, 32, 3)))["params"]

    class _DS:
        def __getitem__(self, i):
            return imgs[i], i

        def __len__(self):
            return len(imgs)

    mesh = create_mesh()
    scorer = PairwiseScorer(model, params, mesh, num_outputs=1, pair_chunk=16)
    sim = scorer.score_dataset(_DS(), batch_size=4, num_workers=0)
    rows, rng_rows = scorer.score_dataset(_DS(), batch_size=4, num_workers=0,
                                          assemble=False)
    assert rng_rows == range(0, len(imgs))
    np.testing.assert_array_equal(rows, sim)

    # metrics from the sharded rows equal metrics from the full matrix
    labels = np.arange(len(imgs)) // 3
    ref = get_metrics(1 - sim.astype(np.float32), labels)
    got = merge_partials([row_partials(1 - rows.astype(np.float32), labels)])
    np.testing.assert_allclose(got, ref, rtol=1e-12)
