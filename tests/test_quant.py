"""int8 scoring-path tests: the dynamic-int8 GEMM (ops/quant.py) must be a
checkpoint-compatible drop-in whose retrieval quality matches bf16.

This is the gate required before TPU.INT8_SCORE may be used: an mAP-parity
test on synthetic writer data (same-writer images share a base pattern, so
even a random-init ViT-ED produces strongly writer-correlated scores, and
the test is deterministic under fixed seeds).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from vit_ed_tpu.metrics import get_metrics
from vit_ed_tpu.models.vit_ed import ViTED
from vit_ed_tpu.ops.quant import QuantDense, int8_matmul
from vit_ed_tpu.parallel.mesh import create_mesh
from vit_ed_tpu.parallel.pairs import PairwiseScorer


def test_int8_matmul_close_to_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(96, 128)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)) * 0.01, jnp.float32)
    ref = np.asarray(x @ w + b)
    got = np.asarray(int8_matmul(x, w, b))
    # dynamic symmetric int8: worst-case error ~ amax(x)*amax(w)*sqrt(K)/127^2
    denom = np.maximum(np.abs(ref), 0.3)
    assert np.max(np.abs(got - ref) / denom) < 0.08


def test_quant_dense_param_tree_matches_dense():
    x = jnp.zeros((2, 16))
    d = nn.Dense(24)
    q = QuantDense(24)
    vd = d.init(jax.random.PRNGKey(0), x)
    vq = q.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vd) == jax.tree_util.tree_structure(vq)
    for a, b in zip(jax.tree.leaves(vd), jax.tree.leaves(vq)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_int8_model_shares_checkpoint_params():
    # the int8 clone must init to the exact same param tree (names/shapes),
    # so a bf16-trained checkpoint applies unchanged
    model = ViTED(img_size=32, patch_size=16, num_classes=1, embed_dim=16,
                  depth=1, c_depth=1, num_heads=2, use_pallas=False)
    x = jnp.zeros((1, 2, 32, 32, 3))
    v_bf = model.init(jax.random.PRNGKey(0), x)
    v_i8 = model.clone(int8_gemm=True).init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v_bf)
            == jax.tree_util.tree_structure(v_i8))


def _writer_dataset(n_writers=4, per_writer=4, img=32, seed=0):
    """Same-writer images share a base pattern plus small noise."""
    rng = np.random.default_rng(seed)
    bases = rng.normal(size=(n_writers, img, img, 3)).astype(np.float32)
    imgs, labels = [], []
    for w in range(n_writers):
        for _ in range(per_writer):
            imgs.append(bases[w] + 0.15 * rng.normal(size=(img, img, 3)))
        labels += [w] * per_writer
    return np.asarray(imgs, np.float32), np.asarray(labels)


class _DS:
    def __init__(self, imgs):
        self.imgs = imgs

    def __getitem__(self, i):
        return self.imgs[i], i

    def __len__(self):
        return len(self.imgs)


def _train_tiny(model, params, imgs, labels, steps=80, batch=16, seed=3):
    """A few supervised steps on the same-writer pair task, so the scoring
    model produces separated (meaningful) similarity scores."""
    import optax

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    rng = np.random.default_rng(seed)
    n = len(imgs)

    def loss_fn(p, pairs, y):
        logits = model.apply({"params": p}, pairs)[:, 0]
        return optax.sigmoid_binary_cross_entropy(logits, y).mean()

    @jax.jit
    def step(p, o, pairs, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, pairs, y)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    for _ in range(steps):
        i = rng.integers(0, n, size=batch)
        j = rng.integers(0, n, size=batch)
        pairs = jnp.asarray(np.stack([imgs[i], imgs[j]], axis=1))
        y = jnp.asarray((labels[i] == labels[j]).astype(np.float32))
        params, opt_state, loss = step(params, opt_state, pairs, y)
    return params, float(loss)


def test_int8_map_parity():
    model = ViTED(img_size=32, patch_size=16, num_classes=1, embed_dim=32,
                  depth=1, c_depth=2, num_heads=2, use_pallas=False)
    imgs, labels = _writer_dataset()
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, 32, 32, 3)))
    params, final_loss = _train_tiny(model, variables["params"], imgs, labels)
    mesh = create_mesh()

    sims = {}
    for name, int8 in (("bf16", False), ("int8", True)):
        scorer = PairwiseScorer(model, params, mesh, num_outputs=1,
                                pair_chunk=16, int8=int8)
        sims[name] = scorer.score_dataset(_DS(imgs), batch_size=4,
                                          num_workers=0)

    m_bf = get_metrics(1 - sims["bf16"].astype(np.float32), labels)[0]
    m_i8 = get_metrics(1 - sims["int8"].astype(np.float32), labels)[0]
    # sanity: the synthetic task is actually solvable (scores carry signal)
    assert m_bf > 0.5, f"fixture produced chance-level mAP {m_bf}"
    assert abs(m_bf - m_i8) < 1e-3, (m_bf, m_i8)
    # raw score fidelity
    d = sims["bf16"].astype(np.float32) - sims["int8"].astype(np.float32)
    assert np.max(np.abs(d)) < 0.25, np.max(np.abs(d))
