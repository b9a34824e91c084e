"""MoE encoder MLPs (models/moe.py) + expert parallelism (parallel/ep.py):
routing semantics vs an independent per-token computation, capacity
drops, EP-sharded == replicated numerics, and the TPU.EXPERT_PARALLEL
config surface through the unmodified main.py CLI."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from PIL import Image

from vit_ed_tpu.models.moe import MoeMlp
from vit_ed_tpu.parallel.ep import ep_param_specs, shard_params_ep
from vit_ed_tpu.parallel.mesh import create_mesh, replicated_sharding


def _erf_gelu(x):
    return 0.5 * x * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))


def test_moe_routing_matches_per_token_reference():
    """With ample capacity every token's output is gate_prob * its top
    expert's MLP — checked against a straight numpy per-token loop."""
    e, d, h, b, t = 4, 8, 16, 2, 12
    mod = MoeMlp(hidden_dim=h, out_dim=d, num_experts=e, capacity_factor=4.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    out = np.asarray(mod.apply({"params": params}, x))

    router = np.asarray(params["router"]["kernel"])
    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    w2, b2 = np.asarray(params["w2"]), np.asarray(params["b2"])
    xn = np.asarray(x)
    logits = xn @ router
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    for bi in range(b):
        for ti in range(t):
            ei = int(np.argmax(probs[bi, ti]))
            tok = xn[bi, ti]
            hid = _erf_gelu(tok @ w1[ei] + b1[ei])
            want = (hid @ w2[ei] + b2[ei]) * probs[bi, ti, ei]
            np.testing.assert_allclose(out[bi, ti], want, atol=1e-5)


def test_moe_top2_routing_matches_per_token_reference():
    """route_k=2 (GShard): each token's output is the renormalized-gate
    mix of its two best experts — checked against a numpy per-token loop."""
    e, d, h, b, t = 4, 8, 16, 2, 12
    mod = MoeMlp(hidden_dim=h, out_dim=d, num_experts=e, capacity_factor=8.0,
                 route_k=2)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    out = np.asarray(mod.apply({"params": params}, x))

    router = np.asarray(params["router"]["kernel"])
    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    w2, b2 = np.asarray(params["w2"]), np.asarray(params["b2"])
    xn = np.asarray(x)
    logits = xn @ router
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    for bi in range(b):
        for ti in range(t):
            order = np.argsort(-probs[bi, ti])
            e1, e2 = int(order[0]), int(order[1])
            p1, p2 = probs[bi, ti, e1], probs[bi, ti, e2]
            g1, g2 = p1 / (p1 + p2), p2 / (p1 + p2)
            tok = xn[bi, ti]
            want = np.zeros(d)
            for ei, g in ((e1, g1), (e2, g2)):
                hid = _erf_gelu(tok @ w1[ei] + b1[ei])
                want = want + (hid @ w2[ei] + b2[ei]) * g
            np.testing.assert_allclose(out[bi, ti], want, atol=1e-5)


def test_moe_eval_is_batch_independent():
    """Expert capacity is allocated PER SAMPLE (positions cumsum within
    each batch row), so a sample's eval output cannot depend on what else
    shares the batch — unlike token-global capacity schemes."""
    e, d, h, t = 4, 8, 16, 12
    mod = MoeMlp(hidden_dim=h, out_dim=d, num_experts=e, capacity_factor=0.5)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(4, t, d)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    full = np.asarray(mod.apply({"params": params}, x))
    for i in range(4):
        solo = np.asarray(mod.apply({"params": params}, x[i:i + 1]))
        np.testing.assert_array_equal(full[i], solo[0])


def test_moe_router_z_loss_and_weighted_collection():
    """router_z = mean(logsumexp(logits)^2) is sown alongside the balance
    term, and collect_moe_aux applies the two weights by sow name."""
    from vit_ed_tpu.models.moe import collect_moe_aux

    e, d, h, b, t = 4, 8, 16, 2, 6
    mod = MoeMlp(hidden_dim=h, out_dim=d, num_experts=e)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    _, mut = mod.apply({"params": params}, x, mutable=["moe_aux"])

    logits = np.asarray(x) @ np.asarray(params["router"]["kernel"])
    lse = (np.log(np.sum(np.exp(logits - logits.max(-1, keepdims=True)), -1))
           + logits.max(-1))
    z_want = np.mean(lse ** 2)
    z_got = float(np.asarray(mut["moe_aux"]["router_z"][0]))
    np.testing.assert_allclose(z_got, z_want, rtol=1e-5)

    bal = float(np.asarray(mut["moe_aux"]["load_balance"][0]))
    tot = float(collect_moe_aux(mut, 0.01, 0.001))
    np.testing.assert_allclose(tot, 0.01 * bal + 0.001 * z_got, rtol=1e-6)
    # z term excluded when its weight is 0
    np.testing.assert_allclose(float(collect_moe_aux(mut, 0.01, 0.0)),
                               0.01 * bal, rtol=1e-6)


def test_moe_router_jitter_train_only():
    """jitter perturbs routing only in training mode; eval is untouched."""
    e, d, h, b, t = 4, 8, 16, 2, 16
    mod = MoeMlp(hidden_dim=h, out_dim=d, num_experts=e, jitter=0.5)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]

    base = MoeMlp(hidden_dim=h, out_dim=d, num_experts=e)
    det = mod.apply({"params": params}, x, deterministic=True)
    np.testing.assert_array_equal(
        np.asarray(det), np.asarray(base.apply({"params": params}, x)))

    t1 = mod.apply({"params": params}, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = mod.apply({"params": params}, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 0


def test_moe_capacity_drops_overflow_tokens():
    """Capacity 1 token/expert: for each (batch, expert) only the FIRST
    routed token gets expert output; later ones fall back to zero (their
    block residual passes them through)."""
    e, d, h, b, t = 2, 8, 16, 1, 10
    # capacity_factor such that C = 1: ceil(10/2 * f) == 1 -> f = 0.2
    mod = MoeMlp(hidden_dim=h, out_dim=d, num_experts=e, capacity_factor=0.2)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    out = np.asarray(mod.apply({"params": params}, x))

    router = np.asarray(params["router"]["kernel"])
    logits = np.asarray(x) @ router
    top = np.argmax(logits, axis=-1)[0]          # [T]
    seen = set()
    for ti in range(t):
        ei = int(top[ti])
        if ei in seen:
            np.testing.assert_allclose(out[0, ti], 0.0, atol=1e-7)
        else:
            assert np.abs(out[0, ti]).max() > 0
            seen.add(ei)


def test_ep_specs_and_sharded_forward_matches_replicated():
    from vit_ed_tpu.models.vit_ed import ViTED

    mesh = create_mesh((2, 4), axis_names=("data", "expert"))
    model = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=32,
                  depth=2, c_depth=2, num_heads=2, use_pallas=False,
                  moe_experts=4, moe_interval=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 2, 32, 32, 3)), jnp.float32)
    host_params = jax.device_get(
        jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"])

    specs = ep_param_specs(host_params)
    assert specs["blocks_1"]["mlp"]["w1"] == P("expert", None, None)
    assert specs["blocks_1"]["mlp"]["b2"] == P("expert", None)
    assert specs["blocks_1"]["mlp"]["router"]["kernel"] == P()
    assert specs["blocks_0"]["mlp"]["fc1"]["kernel"] == P()

    fwd = jax.jit(lambda p, xx: model.apply({"params": p}, xx))
    rep = jax.tree.map(
        lambda a: jax.device_put(a, replicated_sharding(mesh)), host_params)
    xb = jax.device_put(x, NamedSharding(mesh, P("data")))
    want = np.asarray(fwd(rep, xb))

    ep = shard_params_ep(host_params, mesh)
    w1 = ep["blocks_1"]["mlp"]["w1"]
    assert w1.sharding.spec == P("expert", None, None)
    assert w1.addressable_shards[0].data.shape[0] == 1   # 4 experts / 4-way
    got = np.asarray(fwd(ep, xb))
    np.testing.assert_allclose(got, want, atol=1e-5)


CFG = """
MODEL:
  TYPE: pjs
  NAME: tiny_moe
  NUM_CLASSES: 4
  DROP_PATH_RATE: 0.0
  PJS:
    EMBED_DIM: 32
    PATCH_SIZE: 32
    NUM_HEADS: 4
    DEPTH: 2
    C_DEPTH: 2
    MOE:
      EXPERTS: 4
      INTERVAL: 2
      AUX_WEIGHT: 0.01
DATA:
  DATASET: div2k
  IMG_SIZE: 64
  BATCH_SIZE: 2
  NUM_WORKERS: 0
TRAIN:
  EPOCHS: 1
  WARMUP_EPOCHS: 0
SAVE_FREQ: 1
PRINT_FREQ: 1
TPU:
  MESH_SHAPE: [2, 4]
  MESH_AXES: [data, expert]
  EXPERT_PARALLEL: true
"""


class Args:
    cfg = None
    opts = None
    batch_size = None
    data_path = None
    pretrained = None
    resume = None
    accumulation_steps = None
    use_checkpoint = None
    disable_amp = True
    output = None
    tag = "test"
    mode = "train"
    eval = None
    throughput = None
    optim = None
    keep_attn = None
    eval_n_items_per_category = None


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("moe_train")
    data = tmp / "data"
    rng = np.random.default_rng(0)
    for sub in ["DIV2K_train_HR", "DIV2K_valid_HR"]:
        d = data / sub
        os.makedirs(d, exist_ok=True)
        for i in range(4):
            arr = rng.integers(0, 255, size=(220, 220, 3), dtype=np.uint8)
            Image.fromarray(arr).save(str(d / f"{i:04d}.png"))
    cfg = tmp / "cfg.yaml"
    cfg.write_text(CFG)
    return tmp, data, cfg


def test_ep_train_from_config(env):
    from main import DefaultTrainer

    tmp, data, cfg = env
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp / "out")

    trainer = DefaultTrainer(args)
    assert trainer.mesh.shape == {"data": 2, "expert": 4}
    w1 = trainer.params["blocks_1"]["mlp"]["w1"]
    assert w1.sharding.spec == P("expert", None, None)

    state = trainer.train()
    assert int(state.step) > 0
    assert np.isfinite(trainer.min_loss)
    # trailing Nones may be trimmed by the compiler's output sharding
    post = state.params["blocks_1"]["mlp"]["w1"].sharding.spec
    assert post and post[0] == "expert"
    out = os.path.join(args.output, "tiny_moe", "test")
    assert any(f.endswith(".ckpt") for f in os.listdir(out))


def test_ep_without_expert_axis_rejected(env, tmp_path):
    from main import DefaultTrainer

    _tmp, data, _cfg = env
    cfg = tmp_path / "bad.yaml"
    cfg.write_text(CFG.replace("MESH_AXES: [data, expert]",
                               "MESH_AXES: [data, model]"))
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp_path / "out")
    with pytest.raises(ValueError, match="expert"):
        DefaultTrainer(args)


def test_moe_split_forward_matches_full():
    """encode-once / decode-many dispatch stays exact with MoE encoder
    blocks (the O(N^2) scan path runs through the same encode())."""
    from vit_ed_tpu.models.vit_ed import ViTED

    m = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=32,
              depth=2, c_depth=2, num_heads=2, use_pallas=False,
              moe_experts=4, moe_interval=2)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 2, 32, 32, 3)),
                    jnp.float32)
    variables = {"params": m.init(jax.random.PRNGKey(0), x)["params"]}
    full = m.apply(variables, x)
    feats = m.apply(variables, x[:, 0], forward_first_part=True)
    split = m.apply(variables, feats, x[:, 1])
    np.testing.assert_allclose(np.asarray(full), np.asarray(split), atol=1e-5)
    tokens = m.apply(variables, x[:, 1], method=ViTED.prepare_x2)
    scored = m.apply(variables, feats, tokens, method=ViTED.score_tokens)
    np.testing.assert_allclose(np.asarray(full), np.asarray(scored), atol=1e-5)


def test_moe_model_overfits_fixed_batch():
    """Learning signal through the sparse path: gradients flow through
    router + expert banks (incl. the aux loss) well enough to fit a fixed
    4-bin pair batch — a broken dispatch/combine transpose fails here."""
    import optax

    from tests.test_learning import _make_direction_pairs
    from vit_ed_tpu.models.vit_ed import ViTED
    from vit_ed_tpu.train.engine import TrainState, make_train_step
    from vit_ed_tpu.train.losses import bce_with_logits

    rng = np.random.default_rng(0)
    imgs, labels = _make_direction_pairs(rng, 64)
    model = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=32,
                  depth=1, c_depth=1, num_heads=2, use_pallas=False,
                  moe_experts=4, moe_interval=1, moe_capacity=2.0)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 32, 32, 3)))["params"]
    assert "w1" in params["blocks_0"]["mlp"]   # the MoE block is really on
    tx = optax.adamw(1e-3)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step_fn = make_train_step(model, tx, bce_with_logits, accum_steps=2,
                              moe_aux_weight=0.01)
    batch = {"samples": jnp.asarray(imgs.reshape(2, 32, 2, 32, 32, 3)),
             "targets": jnp.asarray(labels.reshape(2, 32, 4))}
    key = jax.random.PRNGKey(1)
    first_loss = None
    for _ in range(400):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    assert final_loss < 0.08, f"loss did not converge: {first_loss} -> {final_loss}"

    logits = model.apply({"params": state.params}, jnp.asarray(imgs))
    preds = (np.asarray(logits) > 0).astype(np.float32)
    acc = (preds == labels).all(axis=1).mean()
    assert acc >= 0.95, f"4-bin exact accuracy too low: {acc}"


def test_dense_checkpoint_upcycles_into_moe(env, tmp_path):
    """Sparse upcycling: MODEL.PRETRAINED with a DENSE checkpoint on a MoE
    config initialises every expert from the dense fc1/fc2 (router stays
    random), through the unmodified CLI surface."""
    from main import DefaultTrainer

    _tmp, data, _cfg = env
    dense_cfg = tmp_path / "dense.yaml"
    dense_cfg.write_text(
        CFG.replace("EXPERTS: 4", "EXPERTS: 0")
           .replace("EXPERT_PARALLEL: true", "EXPERT_PARALLEL: false")
           .replace("NAME: tiny_moe", "NAME: tiny_dense"))
    args = Args()
    args.cfg = str(dense_cfg)
    args.data_path = str(data)
    args.output = str(tmp_path / "out_dense")
    trainer = DefaultTrainer(args)
    trainer.train()
    dense_fc1 = np.asarray(
        jax.device_get(trainer.params["blocks_1"]["mlp"]["fc1"]["kernel"]))
    ckpt = os.path.join(args.output, "tiny_dense", "test", "best_model.ckpt")
    assert os.path.isdir(ckpt)

    moe_cfg = tmp_path / "moe.yaml"
    moe_cfg.write_text(CFG)
    args2 = Args()
    args2.cfg = str(moe_cfg)
    args2.data_path = str(data)
    args2.output = str(tmp_path / "out_upcycled")
    args2.pretrained = ckpt
    trainer2 = DefaultTrainer(args2)
    w1 = np.asarray(jax.device_get(trainer2.params["blocks_1"]["mlp"]["w1"]))
    assert w1.shape[0] == 4
    for e in range(4):
        np.testing.assert_array_equal(w1[e], dense_fc1)
    # EP shardings survived the pretrained merge + upcycle
    assert trainer2.params["blocks_1"]["mlp"]["w1"].sharding.spec[0] == "expert"
    # dense encoder weights rode along too
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(trainer2.params["blocks_0"]["mlp"]["fc1"]["kernel"])),
        np.asarray(jax.device_get(trainer.params["blocks_0"]["mlp"]["fc1"]["kernel"])))


def test_moe_under_remat_matches_unremat():
    """TRAIN.USE_CHECKPOINT wraps blocks in nn.remat: the sown aux loss
    must not double-count and gradients must match the unremat model."""
    from vit_ed_tpu.models.vit_ed import ViTED

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 32, 32, 3)),
                    jnp.float32)
    outs = {}
    for remat in (False, True):
        m = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=32,
                  depth=2, c_depth=2, num_heads=2, use_pallas=False,
                  moe_experts=4, moe_interval=2, remat=remat)
        p = m.init(jax.random.PRNGKey(0), x)["params"]

        def loss(p, m=m):
            lg, mu = m.apply({"params": p}, x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["moe_aux"])
            aux = sum(jnp.asarray(v, jnp.float32).sum()
                      for v in jax.tree.leaves(mu["moe_aux"]))
            return jnp.sum(lg.astype(jnp.float32) ** 2) + 0.01 * aux, aux

        (val, aux), grads = jax.jit(jax.value_and_grad(loss, has_aux=True))(p)
        outs[remat] = (float(val), float(aux), jax.device_get(grads))
    assert abs(outs[False][0] - outs[True][0]) < 1e-6
    assert abs(outs[False][1] - outs[True][1]) < 1e-6
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
                 outs[False][2], outs[True][2])


def test_moe_tree_rejected_by_torch_exporter():
    """MoE expert banks have no reference counterpart: exporting to .pth
    must fail with a clear error, not emit a silently-wrong state dict."""
    from vit_ed_tpu.models.convert import params_to_torch_state_dict
    from vit_ed_tpu.models.vit_ed import ViTED

    m = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=32,
              depth=2, c_depth=2, num_heads=2, use_pallas=False,
              moe_experts=2, moe_interval=2)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 32, 32, 3)))["params"]
    with pytest.raises(ValueError, match="expert bank"):
        params_to_torch_state_dict(p)


def test_ep_without_moe_rejected(env, tmp_path):
    from main import DefaultTrainer

    _tmp, data, _cfg = env
    cfg = tmp_path / "bad2.yaml"
    cfg.write_text(CFG.replace("EXPERTS: 4", "EXPERTS: 0"))
    args = Args()
    args.cfg = str(cfg)
    args.data_path = str(data)
    args.output = str(tmp_path / "out")
    with pytest.raises(ValueError, match="MOE.EXPERTS"):
        DefaultTrainer(args)
