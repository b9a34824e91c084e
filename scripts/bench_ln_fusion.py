"""Microbenchmark the decode's residual+LayerNorm-stats fusion shape.

xprof on score_tokens_scan (batch 64) shows ~23 fusions of the form
  out_bf16[64,1025,384] = x + attn_out;  mean/var over the last dim
at ~1.5 ms each (convert_reduce_fusion.*) — ~25% of decode wall time,
vs a ~0.2 ms HBM roofline (3 x 50 MB of bf16 traffic).  This isolates
the pattern to see whether 1.5 ms reproduces outside the big program.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

B, S, C = 64, 1025, 384


def timed(fn, args, iters=50):
    def multi(n, x0, *rest):
        def body(acc, _):
            xi = x0 + acc.astype(x0.dtype) * 1e-24
            out = fn(xi, *rest)
            return jnp.sum(out.astype(jnp.float32)) * 1e-12, None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return acc
    j = jax.jit(multi, static_argnums=0)
    np.asarray(j(iters, *args))
    t0 = time.time()
    np.asarray(j(iters, *args))
    return (time.time() - t0) / iters


def ln_stats(x):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1)
    var = jnp.maximum(0.0, (xf * xf).mean(-1) - mu * mu)
    return mu, var


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, S, C)), jnp.bfloat16)
y = jnp.asarray(rng.normal(size=(B, S, C)), jnp.bfloat16)
g = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
b = jnp.asarray(rng.normal(size=(C,)), jnp.float32)

mb = B * S * C * 2 / 1e6

t = timed(lambda a, c: a + c, (x, y))
print(f"residual add only:            {t*1e3:7.3f} ms  ({3*mb/t/1e3:6.1f} GB/s eff)")

def res_stats(a, c):
    r = a + c
    mu, var = ln_stats(r)
    return r + mu[..., None].astype(r.dtype) + var[..., None].astype(r.dtype)
t = timed(res_stats, (x, y))
print(f"residual + LN stats:          {t*1e3:7.3f} ms  ({3*mb/t/1e3:6.1f} GB/s eff)")

def res_full_ln(a, c):
    r = a + c
    mu, var = ln_stats(r)
    out = (r.astype(jnp.float32) - mu[..., None]) * jax.lax.rsqrt(var[..., None] + 1e-6)
    out = out * g + b
    return r + out.astype(r.dtype)
t = timed(res_full_ln, (x, y))
print(f"residual + full LN + use:     {t*1e3:7.3f} ms  ({3*mb/t/1e3:6.1f} GB/s eff)")

# the actual flax module, applied to the sum (what the model does)
import flax.linen as nn
ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)
v = ln.init(jax.random.PRNGKey(0), x)
def flax_ln(a, c, p):
    r = a + c
    return r + ln.apply(p, r)
t = timed(lambda a, c: flax_ln(a, c, v), (x, y))
print(f"residual + flax LN + use:     {t*1e3:7.3f} ms  ({3*mb/t/1e3:6.1f} GB/s eff)")

# mean over a MAJOR axis for comparison (is the minor-axis reduce the problem?)
def res_stats_major(a, c):
    r = a + c
    mu = r.astype(jnp.float32).mean(1)
    return r + mu[:, None, :].astype(r.dtype)
t = timed(res_stats_major, (x, y))
print(f"residual + mean over axis 1:  {t*1e3:7.3f} ms  ({3*mb/t/1e3:6.1f} GB/s eff)")
