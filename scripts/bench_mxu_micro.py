"""In-kernel MXU rate by matmul shape (operands VMEM-resident, looped).

Answers: is QK^T [512,64]@[64,1024] intrinsically slow, or is the kernel's
surrounding structure the problem?
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 64


def mm_kernel(a_ref, b_ref, o_ref, *, reps):
    a = a_ref[...]
    acc = jnp.zeros((a.shape[0], b_ref.shape[1]), jnp.float32)
    b = b_ref[...]
    for i in range(reps):
        # perturb a so the loop isn't folded
        ai = a + jnp.float32(i).astype(a.dtype) * 1e-8
        acc += jax.lax.dot_general(ai, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def bench_mm(m, k, n, iters=20):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
    f = pl.pallas_call(
        functools.partial(mm_kernel, reps=REPS),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
    )

    def multi(it, a_, b_):
        def body(acc, _):
            ai = a_ + acc.astype(a_.dtype) * 1e-24
            return jnp.sum(f(ai, b_).astype(jnp.float32)) * 1e-12, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=it)
        return acc

    jm = jax.jit(multi, static_argnums=0)
    np.asarray(jm(iters, a, b))
    t0 = time.time()
    np.asarray(jm(iters, a, b))
    sec = (time.time() - t0) / iters / REPS
    flops = 2 * m * k * n
    print(f"  [{m:5d},{k:5d}]@[{k:5d},{n:5d}]  {sec*1e6:8.2f} us  "
          f"{flops/sec/1e12:7.2f} TF/s", flush=True)


if __name__ == "__main__":
    print("in-kernel matmul rates (bf16, f32 accum):")
    bench_mm(512, 64, 1024)     # QK^T per head
    bench_mm(512, 1024, 64)     # PV per head
    bench_mm(512, 128, 1024)    # QK^T if d were 128
    bench_mm(512, 384, 384)     # out/q projection
    bench_mm(512, 384, 1536)    # mlp fc1
    bench_mm(1024, 64, 1024)    # QK^T whole-q
    bench_mm(512, 64, 128)      # tiny N
    bench_mm(512, 512, 512)     # square ref
