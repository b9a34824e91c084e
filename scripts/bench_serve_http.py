"""HTTP serving throughput + latency under concurrent clients (TPU).

Exports the flagship ``pair`` stage (the reference's whole eval-time
forward, vision_transformer.py:407-420) as a serving bundle, starts the
stdlib BundleServer with dynamic micro-batching, and fires C concurrent
clients x R requests of b pairs each. Reports:

- end-to-end HTTP pairs/s and per-request p50/p99 latency,
- in-process batcher pairs/s (same DynamicBatcher, no wire) — the gap
  between the two IS the wire cost (np.savez + loopback HTTP),
- coalescing evidence: batcher requests vs actual device calls.

Usage: python scripts/bench_serve_http.py [--config patch16_512]
       [--clients 4] [--requests 6] [--batch 4] [--max-wait-ms 10]
"""

import argparse
import io
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import vit_ed_tpu  # noqa: E402,F401

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from scripts.bench_train_step import CONFIGS  # noqa: E402
from vit_ed_tpu.models.vit_ed import ViTED  # noqa: E402
from vit_ed_tpu.serve import (BundleServer, ServeClient, export_scorer,  # noqa: E402
                              load_scorer)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="patch16_512", choices=sorted(CONFIGS))
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--requests", type=int, default=6, help="per client")
    ap.add_argument("--batch", type=int, default=4, help="pairs per request")
    ap.add_argument("--max-wait-ms", type=float, default=10.0)
    ap.add_argument("--wire", default="f32", choices=("f32", "u8"),
                    help="f32 = host-normalized 'pair' stage; u8 = raw "
                         "uint8 pixels with on-device normalize "
                         "('pair_u8', 4x less wire + transfer)")
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--out", default="/tmp/vit_ed_http_bundle")
    args = ap.parse_args()

    cfg = CONFIGS[args.config]
    img = cfg["img_size"]
    model = ViTED(dtype=jnp.bfloat16, **cfg)
    x0 = jnp.zeros((1, 2, img, img, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]

    meta_path = os.path.join(args.out, "serving_meta.json")
    have = set()
    if os.path.exists(meta_path):
        import json
        with open(meta_path) as f:
            have = set(json.load(f)["stages"])
    if not {"pair", "pair_u8"} <= have:
        print(f"exporting {args.config} pair bundle (symbolic batch)...")
        t0 = time.time()
        export_scorer(model, params, args.out, stages=("pair", "pair_u8"))
        print(f"export took {time.time() - t0:.1f}s")

    stage = "pair" if args.wire == "f32" else "pair_u8"
    server = BundleServer(load_scorer(args.out),
                          batch_stages=("pair", "pair_u8"),
                          max_batch=args.max_batch,
                          max_wait_ms=args.max_wait_ms)
    server.start()
    try:
        rng = np.random.default_rng(0)
        if args.wire == "f32":
            payload = rng.normal(size=(args.batch, 2, img, img, 3)
                                 ).astype(np.float32)
        else:
            payload = rng.integers(0, 256, (args.batch, 2, img, img, 3),
                                   np.uint8)

        # warm the device executable (compile + first dispatch)
        server.call(stage, [payload])

        # --- in-process batcher (no wire) ---
        lat_ip = []
        def worker_ip(times):
            for _ in range(args.requests):
                t0 = time.perf_counter()
                out = server.call(stage, [payload])
                assert np.isfinite(np.asarray(out, np.float32)).all()
                times.append(time.perf_counter() - t0)
        threads = [threading.Thread(target=worker_ip, args=(lat_ip,))
                   for _ in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads: t.start()
        for t in threads: t.join()
        wall_ip = time.perf_counter() - t0
        n_pairs = args.clients * args.requests * args.batch

        # --- HTTP end to end ---
        client = ServeClient(server.url, timeout=600.0)
        lat_http = []
        def worker_http(times):
            c = ServeClient(server.url, timeout=600.0)
            for _ in range(args.requests):
                t0 = time.perf_counter()
                out = c.stage(stage, payload)
                assert out.shape[0] == args.batch
                times.append(time.perf_counter() - t0)
        threads = [threading.Thread(target=worker_http, args=(lat_http,))
                   for _ in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads: t.start()
        for t in threads: t.join()
        wall_http = time.perf_counter() - t0

        stats = server.stats()["batched"][stage]
        p = lambda xs, q: float(np.percentile(np.asarray(xs) * 1e3, q))
        print(f"{args.config} {stage} serving ({args.wire} wire), {args.clients} clients x "
              f"{args.requests} req x {args.batch} pairs "
              f"(max_wait {args.max_wait_ms} ms, max_batch {args.max_batch}):")
        print(f"  in-process batcher: {n_pairs / wall_ip:8.1f} pairs/s | "
              f"p50 {p(lat_ip, 50):7.1f} ms  p99 {p(lat_ip, 99):7.1f} ms")
        print(f"  HTTP end-to-end:    {n_pairs / wall_http:8.1f} pairs/s | "
              f"p50 {p(lat_http, 50):7.1f} ms  p99 {p(lat_http, 99):7.1f} ms")
        print(f"  coalescing: {stats['requests']} requests -> "
              f"{stats['device_calls']} device calls")
    finally:
        server.shutdown()


if __name__ == "__main__":
    main()
