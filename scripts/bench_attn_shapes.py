"""What do the pair kernel's constituent matmul shapes run at in pure XLA?

The kernel plateaus at ~96 executed TF/s. If XLA's batched GEMMs of the
SAME shapes also plateau there, the kernel is at the shape's hardware
wall; if XLA is faster, the gap is Mosaic scheduling.

Shapes per (b, g) program at the flagship decode config:
  QK: [1024, 128] x [128, 1024] -> f32      (x2 heads)
  PV: [1024, 1024](bf16) x [1024, 128]      (x2 heads)
batched over b*g = 192.
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


def timed(fn, args, iters=30):
    def multi(n, x0, *rest):
        def body(acc, _):
            xi = x0 + acc.astype(x0.dtype) * 1e-24
            out = fn(xi, *rest)
            return jnp.sum(out.astype(jnp.float32)) * 1e-24, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return acc

    jm = jax.jit(multi, static_argnums=0)
    np.asarray(jm(iters, *args))
    t0 = time.time()
    np.asarray(jm(iters, *args))
    return (time.time() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    B = 192   # b * g

    # QK shape: batched [B, 1024, 128] x [B, 128, 1024] -> f32
    a = jnp.asarray(rng.normal(size=(B, 1024, 128)), jnp.bfloat16)
    bm = jnp.asarray(rng.normal(size=(B, 128, 1024)), jnp.bfloat16)

    def qk(a_, b_):
        return jax.lax.dot_general(a_, b_, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    t = timed(qk, (a, bm))
    fl = 2 * B * 1024 * 1024 * 128
    print(f"QK  [B,1024,128]x[B,128,1024] f32-out: {t*1e6:.0f}us "
          f"{fl/t/1e12:.1f} TF/s")

    def qk_bf16(a_, b_):
        return jax.lax.dot_general(a_, b_, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.bfloat16)

    t = timed(qk_bf16, (a, bm))
    print(f"QK  same, bf16-out:                    {t*1e6:.0f}us "
          f"{fl/t/1e12:.1f} TF/s")

    # PV shape: [B, 1024, 1024] bf16 x [B, 1024, 128] -> f32
    p = jnp.asarray(rng.normal(size=(B, 1024, 1024)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, 1024, 128)), jnp.bfloat16)

    def pv(p_, v_):
        return jax.lax.dot_general(p_, v_, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    t = timed(pv, (p, v))
    print(f"PV  [B,1024,1024]x[B,1024,128] f32-out: {t*1e6:.0f}us "
          f"{fl/t/1e12:.1f} TF/s")

    # combined chain mimicking the kernel's MXU sequence (QK -> cast -> PV)
    def chain(a_, b_, v_):
        l = qk(a_, b_)
        e = l.astype(jnp.bfloat16)
        return jax.lax.dot_general(e, v_, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    t = timed(chain, (a, bm, v))
    print(f"QK+cast+PV chain:                      {t*1e6:.0f}us "
          f"{2*fl/t/1e12:.1f} TF/s")

    # wider contraction for reference: [B,1024,384]x[B,384,1024]
    a3 = jnp.asarray(rng.normal(size=(B, 1024, 384)), jnp.bfloat16)
    b3 = jnp.asarray(rng.normal(size=(B, 384, 1024)), jnp.bfloat16)
    t = timed(lambda x, y: jax.lax.dot_general(
        x, y, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32),
        (a3, b3))
    fl3 = 2 * B * 1024 * 1024 * 384
    print(f"ref [B,1024,384]x[B,384,1024] f32-out: {t*1e6:.0f}us "
          f"{fl3/t/1e12:.1f} TF/s")


if __name__ == "__main__":
    main()


def probe_m_scaling():
    rng = np.random.default_rng(1)
    print("--- M scaling probes (single GEMM, K=128) ---")
    for M in [1024, 4096, 16384, 65536, 196608]:
        a = jnp.asarray(rng.normal(size=(M, 128)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(128, 1024)), jnp.bfloat16)
        t = timed(lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32),
            (a, b))
        fl = 2 * M * 128 * 1024
        print(f"  [{M},128]x[128,1024]: {t*1e6:.0f}us {fl/t/1e12:.1f} TF/s")
    print("--- deep-K single GEMM, N=128 ---")
    for M in [1024, 4096, 16384, 65536]:
        a = jnp.asarray(rng.normal(size=(M, 1024)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(1024, 128)), jnp.bfloat16)
        t = timed(lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32),
            (a, b))
        fl = 2 * M * 1024 * 128
        print(f"  [{M},1024]x[1024,128]: {t*1e6:.0f}us {fl/t/1e12:.1f} TF/s")


probe_m_scaling()
