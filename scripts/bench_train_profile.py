"""xprof the flagship training step: per-op-family device-time breakdown.

Same trace-parsing approach as bench_decode_profile.py, applied to the
fwd+bwd+optimizer step of bench_train_step.py (batch 16, no remat).
"""

import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import V5E_BF16_PEAK_TFLOPS  # noqa: E402  (sets up the jax cache)

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    from vit_ed_tpu.models.vit_ed import ViTED
    from vit_ed_tpu.train.losses import bce_with_logits

    model = ViTED(img_size=512, patch_size=16, num_classes=1, embed_dim=384,
                  depth=12, c_depth=12, num_heads=6, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = 16
    x = jnp.asarray(rng.normal(size=(batch, 2, 512, 512, 3)), jnp.float32)
    y = jnp.asarray(rng.random(size=(batch, 1)) > 0.5, jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    params = variables["params"]
    tx = optax.adamw(1e-4, weight_decay=0.05)
    opt_state = tx.init(params)

    def loss_fn(p, key):
        logits = model.apply({"params": p}, x, train=True,
                             rngs={"dropout": key})
        return bce_with_logits(logits.astype(jnp.float32), y)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    p2, o2, l2 = step(params, opt_state, key)
    np.asarray(l2)  # compile+warm

    tmp = tempfile.mkdtemp(prefix="trainprof_")
    n_calls = 3
    with jax.profiler.trace(tmp):
        for _ in range(n_calls):
            p2, o2, l2 = step(p2, o2, key)
            np.asarray(l2)

    traces = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"), recursive=True)
    if not traces:
        print("no trace found under", tmp)
        return
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    names = {p.get("pid"): p.get("args", {}).get("name", "")
             for p in data["traceEvents"] if p.get("ph") == "M"
             and p.get("name") == "process_name"}
    tpu_pids = [pid for pid, n in names.items() if "TPU" in n]
    agg = {}
    for e in events:
        if e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        agg[name] = agg.get(name, 0.0) + e.get("dur", 0.0)
    total = sum(agg.values())
    print(f"total device time ({n_calls} calls): {total/1e3:.2f} ms")
    fam = {}
    for name, dur in agg.items():
        base = re.sub(r"[.\d]+$", "", name)
        fam[base] = fam.get(base, 0.0) + dur
    print("--- by family ---")
    for name, dur in sorted(fam.items(), key=lambda kv: -kv[1])[:22]:
        print(f"  {dur/1e3/n_calls:8.3f} ms/call  {100*dur/total:5.1f}%  {name[:80]}")
    print("--- top ops ---")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {dur/1e3/n_calls:8.3f} ms/call  {100*dur/total:5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
