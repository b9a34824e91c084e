"""Component-level timing of the patch16_512 decoder at batch 32/64.

Times, at decoder shapes [B, 1025, 384] / context [B, 1024, 384]:
  - full decode (pallas attn)          (the bench headline op)
  - full decode (XLA attn)             (attention-share probe)
  - GEMM-only stack: the 12 blocks' projections + MLPs, no attention/LN
  - LN-only stack: the 12 blocks' 4 layernorms
  - attention-only: 12x (self + cross) fused_attention calls
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from vit_ed_tpu.models.vit_ed import ViTED
from vit_ed_tpu.ops.attention import fused_attention


def timed(fn, args, iters=20):
    def multi(n, x0, *rest):
        def body(acc, _):
            xi = x0 + acc.astype(x0.dtype) * 1e-24
            out = fn(xi, *rest)
            return jnp.sum(out.astype(jnp.float32)) * 1e-12, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return acc

    jm = jax.jit(multi, static_argnums=0)
    np.asarray(jm(iters, *args))
    t0 = time.time()
    np.asarray(jm(iters, *args))
    return (time.time() - t0) / iters


D, H, HD, MLP = 384, 6, 64, 1536
SQ, SK = 1025, 1024


def gemm_stack(x, ws):
    w_qkv, w_q, w_kv, w_o, w_fc1, w_fc2 = ws
    for _ in range(12):
        x = ((x @ w_qkv)[..., :D] @ w_o + x)
        x = ((x @ w_q) @ w_o + x)
        y = x @ w_fc1
        x = y @ w_fc2 + x
    return x


def ln_stack(x):
    for i in range(48):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-6)
    return x


def attn_stack(q, k, v, kc, vc):
    o = q
    for _ in range(12):
        o = fused_attention(o, k, v, use_pallas=True)      # self
        o = fused_attention(o, kc, vc, use_pallas=True)    # cross
    return o


def main():
    rng = np.random.default_rng(0)
    model = ViTED(img_size=512, patch_size=16, num_classes=1, embed_dim=384,
                  depth=12, c_depth=12, num_heads=6, dtype=jnp.bfloat16)
    model_xla = ViTED(img_size=512, patch_size=16, num_classes=1, embed_dim=384,
                      depth=12, c_depth=12, num_heads=6, dtype=jnp.bfloat16,
                      use_pallas=False)
    x = jnp.asarray(rng.normal(size=(4, 2, 512, 512, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    params = variables["params"]
    feats = jax.jit(lambda p, a: model.apply({"params": p}, a,
                                             forward_first_part=True))(params, x[:, 0])
    tokens = jax.jit(lambda p, a: model.apply({"params": p}, a,
                                              method=model.prepare_x2))(params, x[:, 1])

    for B in (32, 64):
        print(f"=== batch {B}")
        pi = jnp.asarray(rng.integers(0, 4, size=B), jnp.int32)
        pj = jnp.asarray(rng.integers(0, 4, size=B), jnp.int32)

        for name, m in [("decode pallas", model), ("decode XLA-attn", model_xla)]:
            sec = timed(
                lambda f, p, t, i, j: m.apply(
                    {"params": p}, jnp.take(f, i, axis=0), jnp.take(t, j, axis=0),
                    method=m.score_tokens),
                (feats, params, tokens, pi, pj))
            print(f"  {name:22s} {sec*1e3:8.2f} ms  {B/sec:7.1f} pairs/s", flush=True)

        xt = jnp.asarray(rng.normal(size=(B, SQ, D)), jnp.bfloat16)
        ws = [jnp.asarray(rng.normal(size=s) * 0.02, jnp.bfloat16) for s in
              [(D, 3 * D), (D, D), (D, 2 * D), (D, D), (D, MLP), (MLP, D)]]
        sec = timed(gemm_stack, (xt, ws))
        gemm_flops = 12 * B * SQ * 2 * (D * 3 * D + D * D + D * D + D * D
                                        + D * MLP + MLP * D)
        print(f"  {'gemm stack':22s} {sec*1e3:8.2f} ms  "
              f"{gemm_flops/sec/1e12:6.1f} TF/s", flush=True)

        sec = timed(ln_stack, (xt,))
        print(f"  {'LN x48':22s} {sec*1e3:8.2f} ms", flush=True)

        q = jnp.asarray(rng.normal(size=(B, H, SQ, HD)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, H, SQ, HD)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, SQ, HD)), jnp.bfloat16)
        kc = jnp.asarray(rng.normal(size=(B, H, SK, HD)), jnp.bfloat16)
        vc = jnp.asarray(rng.normal(size=(B, H, SK, HD)), jnp.bfloat16)
        sec = timed(attn_stack, (q, k, v, kc, vc))
        attn_flops = 12 * 4 * B * H * (SQ * SQ + SQ * SK) * HD
        print(f"  {'attn x24':22s} {sec*1e3:8.2f} ms  "
              f"{attn_flops/sec/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
