"""xprof the flagship decode (score_tokens_scan) and print the top device
ops — where the remaining time is after the round-3 deferred kernel."""

import gzip
import glob
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from vit_ed_tpu.models.vit_ed import ViTED


def main():
    model = ViTED(img_size=512, patch_size=16, num_classes=1, embed_dim=384,
                  depth=12, c_depth=12, num_heads=6, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = 64
    x = jnp.asarray(rng.normal(size=(batch, 2, 512, 512, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    params = variables["params"]
    feats = jax.jit(lambda p, a: model.apply({"params": p}, a,
                                             forward_first_part=True))(params, x[:, 0])
    tokens = jax.jit(lambda p, a: model.apply({"params": p}, a,
                                              method=model.prepare_x2_scan))(params, x[:, 1])
    pi = jnp.asarray(rng.integers(0, batch, size=batch), jnp.int32)
    pj = jnp.asarray(rng.integers(0, batch, size=batch), jnp.int32)

    fn = jax.jit(lambda f, p, t, i, j: model.apply(
        {"params": p}, jnp.take(f, i, axis=0), jnp.take(t, j, axis=0),
        method=model.score_tokens_scan))
    np.asarray(fn(feats, params, tokens, pi, pj))  # compile+warm

    tmp = tempfile.mkdtemp(prefix="decprof_")
    with jax.profiler.trace(tmp):
        for _ in range(3):
            np.asarray(fn(feats, params, tokens, pi, pj))

    traces = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"), recursive=True)
    if not traces:
        print("no trace found under", tmp)
        return
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    # find the TPU pid
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
    print(f"total device time (3 calls): {total/1e3:.2f} ms")
    # group by op family
    fam = {}
    for name, dur in agg.items():
        base = re.sub(r"[.\d]+$", "", name)
        fam[base] = fam.get(base, 0.0) + dur
    print("--- by family ---")
    for name, dur in sorted(fam.items(), key=lambda kv: -kv[1])[:18]:
        print(f"  {dur/1e3/3:8.3f} ms/call  {100*dur/total:5.1f}%  {name[:80]}")
    print("--- top ops ---")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {dur/1e3/3:8.3f} ms/call  {100*dur/total:5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
