"""The HTTP serving host: bundle replay over the wire must equal direct
scorer calls, dynamic micro-batching must coalesce concurrent requests
into fewer (padded) device calls with per-request results intact, and
error paths must map to clean HTTP statuses. The reference has no
serving tier (deployment = torch .pth + model source,
/root/reference/models/build.py:15-95); this is the deployable twin of
the exported-bundle story."""

import os
import subprocess
import sys
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ed_tpu.models.vit_ed import ViTED
from vit_ed_tpu.serve import (BundleServer, DynamicBatcher, ServeClient,
                              ServeError, export_scorer, load_scorer,
                              stage_fns)


@pytest.fixture(scope="module")
def tiny():
    model = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=16,
                  depth=1, c_depth=2, num_heads=2, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 32, 32, 3)))["params"]
    return model, params


@pytest.fixture(scope="module")
def served(tiny, tmp_path_factory):
    model, params = tiny
    out = tmp_path_factory.mktemp("bundle")
    export_scorer(model, params, str(out))
    server = BundleServer(load_scorer(str(out)), max_wait_ms=20.0)
    server.start()
    yield ServeClient(server.url), server
    server.shutdown()


def test_health_meta_stats(served):
    client, _ = served
    assert client.health() == {"ok": True}
    meta = client.meta()
    assert meta["batch_mode"] == "symbolic"
    assert set(meta["stages"]) == {"pair", "pair_u8", "encode", "prepare",
                                   "kv", "score_row"}
    stats = client.stats()
    assert "pair" in stats["batched"]


def test_score_matches_direct(served, tiny):
    client, _ = served
    model, params = tiny
    fns = stage_fns(model)
    rng = np.random.default_rng(0)
    for b in (1, 3):
        x = rng.normal(size=(b, 2, 32, 32, 3)).astype(np.float32)
        np.testing.assert_allclose(client.score(x),
                                   np.asarray(fns["pair"](params, x)),
                                   atol=1e-5)


def test_staged_pipeline_over_http(served, tiny):
    """encode + kv once, prepare per column batch, score_row per row —
    the production scan schedule, driven through the HTTP surface."""
    client, _ = served
    model, params = tiny
    fns = stage_fns(model)
    rng = np.random.default_rng(1)
    x1 = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    x2 = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
    kv = client.stage("kv", client.stage("encode", x1))
    got = client.stage("score_row", kv, client.stage("prepare", x2))
    live = fns["score_row"](
        params, fns["kv"](params, fns["encode"](params, x1)),
        fns["prepare"](params, x2))
    np.testing.assert_allclose(got, np.asarray(live), atol=1e-5)


def test_http_error_paths(served):
    client, _ = served
    with pytest.raises(ServeError, match=r"\[404\].*nope"):
        client.stage("nope", np.zeros((1, 2, 32, 32, 3), np.float32))
    # wrong input count -> 400 naming the expected signature
    with pytest.raises(ServeError, match=r"\[400\].*2 input"):
        client.stage("score_row", np.zeros((1, 1, 5, 32), np.float32))
    # garbage body -> 400
    with pytest.raises(ServeError, match=r"\[400\]"):
        client._request("/v1/score", b"not an npz", "application/x-npz")
    with pytest.raises(ServeError, match=r"\[404\]"):
        client._get_json("/v1/nothing")


def test_dynamic_batcher_coalesces():
    """Three queued requests become ONE padded device call, each caller
    getting exactly its slice back."""
    calls = []

    def fake(x):
        calls.append(x.shape[0])
        return x * 2.0

    batcher = DynamicBatcher(fake, lambda b: -(-b // 8) * 8,
                             max_batch=64, max_wait_ms=50.0, start=False)
    xs = [np.full((n, 3), float(i)) for i, n in enumerate((1, 2, 1))]
    futs = [batcher.submit(x) for x in xs]
    batcher.start()
    for x, fut in zip(xs, futs):
        np.testing.assert_array_equal(fut.result(timeout=30), x * 2.0)
    batcher.close()
    assert calls == [8]  # one call, padded 4 -> 8
    assert batcher.device_calls == 1 and batcher.requests == 3


def test_dynamic_batcher_scatters_errors():
    def boom(x):
        raise RuntimeError("device on fire")

    batcher = DynamicBatcher(boom, max_wait_ms=10.0, start=False)
    futs = [batcher.submit(np.zeros((1,))) for _ in range(2)]
    batcher.start()
    for fut in futs:
        with pytest.raises(RuntimeError, match="device on fire"):
            fut.result(timeout=30)
    batcher.close()


def test_concurrent_scores_are_batched(served, tiny):
    """End to end: concurrent HTTP clients coalesce into fewer device
    calls than requests, results still per-request exact."""
    client, server = served
    model, params = tiny
    fns = stage_fns(model)
    rng = np.random.default_rng(2)
    xs = [rng.normal(size=(1, 2, 32, 32, 3)).astype(np.float32)
          for _ in range(4)]
    want = [np.asarray(fns["pair"](params, x)) for x in xs]
    got = [None] * len(xs)
    before = server.batchers["pair"].device_calls

    def worker(i):
        got[i] = client.score(xs[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(xs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-5)
    # coalescing is timing-dependent under this host's single core, but
    # it can never take MORE device calls than requests
    assert server.batchers["pair"].device_calls - before <= len(xs)


def test_bucketed_bundle_pads_through_batcher(tiny, tmp_path):
    """With a bucketed bundle the batcher pads a batch-3 request up to
    the 4-bucket (a raw stage call would 400), so the host owns the
    padding policy exactly like parallel/pairs.py's fixed chunks."""
    model, params = tiny
    export_scorer(model, params, str(tmp_path), batch_sizes=[4],
                  stages=("pair",))
    server = BundleServer(load_scorer(str(tmp_path)), max_wait_ms=5.0,
                          max_batch=32)
    assert server.batchers["pair"].max_batch == 4  # capped at the bucket
    server.start()
    try:
        client = ServeClient(server.url)
        fns = stage_fns(model)
        rng = np.random.default_rng(3)
        x = rng.normal(size=(3, 2, 32, 32, 3)).astype(np.float32)
        np.testing.assert_allclose(client.score(x),
                                   np.asarray(fns["pair"](params, x)),
                                   atol=1e-5)
        # an over-bucket request is the client's error, cleanly surfaced
        with pytest.raises(ServeError, match=r"\[400\].*bucket"):
            client.score(rng.normal(size=(5, 2, 32, 32, 3))
                         .astype(np.float32))
    finally:
        server.shutdown()


def test_batcher_never_merges_past_max_batch():
    """Two batch-3 requests against max_batch 4 must NOT merge into an
    unservable batch-6 group: the second carries into its own group and
    both succeed (review finding: overshoot failed every coalesced
    request on bucketed bundles)."""
    calls = []

    def fake(x):
        calls.append(x.shape[0])
        if x.shape[0] > 4:
            raise ValueError(f"batch {x.shape[0]} exceeds largest bucket 4")
        return x + 1.0

    def bucket(b):
        if b > 4:
            raise ValueError(f"batch {b} exceeds largest bucket 4")
        return 4

    batcher = DynamicBatcher(fake, bucket, max_batch=4, max_wait_ms=50.0,
                             start=False)
    xs = [np.full((3, 2), float(i)) for i in range(2)]
    futs = [batcher.submit(x) for x in xs]
    batcher.start()
    for x, fut in zip(xs, futs):
        np.testing.assert_array_equal(fut.result(timeout=30), x + 1.0)
    batcher.close()
    assert calls == [4, 4]  # two padded groups, never one batch-6
    with pytest.raises(RuntimeError, match="closed"):
        batcher.submit(np.zeros((1, 2)))


def test_kv_stage_refuses_dynamic_batching(tiny, tmp_path):
    """kv's output batches on axis 1 ([L, b, Sk, 2C]); slicing a merged
    result on axis 0 would hand back layer slices (review finding). The
    exporter records out_batch_axis and the server refuses at init."""
    model, params = tiny
    meta = export_scorer(model, params, str(tmp_path))
    assert meta["stages"]["kv"][0]["out_batch_axis"] == 1
    assert meta["stages"]["pair"][0]["out_batch_axis"] == 0
    with pytest.raises(ValueError, match="kv.*cannot be dynamically"):
        BundleServer(load_scorer(str(tmp_path)), batch_stages=("kv",))


def test_malformed_request_fails_alone(served):
    """Shape validation happens BEFORE the batcher, so a wrong-geometry
    request 400s by itself instead of poisoning the group it would have
    been coalesced with (np.concatenate would raise for everyone)."""
    client, _ = served
    with pytest.raises(ServeError, match=r"\[400\].*dim 2 must be 32"):
        client.score(np.zeros((1, 2, 64, 64, 3), np.float32))
    with pytest.raises(ServeError, match=r"\[400\].*must have 5 dims"):
        client.score(np.zeros((2, 32, 32, 3), np.float32))
    # and the server still works afterwards
    assert client.health() == {"ok": True}


def test_duplicate_bucket_sizes_dedupe(tiny, tmp_path):
    """batch_sizes=[2,2,4] must not desync batch_mode from the artifact
    list (review finding: zip() paired buckets with wrong artifacts)."""
    model, params = tiny
    meta = export_scorer(model, params, str(tmp_path),
                         batch_sizes=[2, 2, 4], stages=("pair",))
    assert meta["batch_mode"] == [2, 4]
    scorer = load_scorer(str(tmp_path))
    fns = stage_fns(model)
    rng = np.random.default_rng(6)
    x = rng.normal(size=(4, 2, 32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(scorer("pair", x), fns["pair"](params, x),
                               atol=1e-5)
    with pytest.raises(ValueError, match="non-empty"):
        export_scorer(model, params, str(tmp_path), batch_sizes=[],
                      stages=("pair",))


def test_bf16_bundle_staged_round_trip(tmp_path):
    """bf16 models record bf16 stage signatures but the wire is plain
    numpy: the host must cast incoming arrays to the exported dtypes so
    staged outputs (upcast f32 on the wire) feed back into later stages.
    Caught live: score_row 400'd with 'Dtype mismatch' before the fix."""
    model = ViTED(img_size=32, patch_size=16, num_classes=4, embed_dim=16,
                  depth=1, c_depth=1, num_heads=2, use_pallas=False,
                  dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 2, 32, 32, 3)))["params"]
    export_scorer(model, params, str(tmp_path))
    server = BundleServer(load_scorer(str(tmp_path)), max_wait_ms=5.0)
    server.start()
    try:
        client = ServeClient(server.url)
        rng = np.random.default_rng(5)
        x1 = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
        # float64 client arrays (numpy's default) must be accepted too
        x2 = rng.normal(size=(2, 32, 32, 3))
        kv = client.stage("kv", client.stage("encode", x1))
        assert kv.dtype == np.float32  # wire dtype, upcast from bf16
        got = client.stage("score_row", kv, client.stage("prepare", x2))
        fns = stage_fns(model)
        live = fns["score_row"](
            params, fns["kv"](params, fns["encode"](
                params, jnp.asarray(x1))),
            fns["prepare"](params, jnp.asarray(x2, jnp.float32)))
        np.testing.assert_allclose(got, np.asarray(live, np.float32),
                                   atol=0.02)
    finally:
        server.shutdown()


def test_server_cli_end_to_end(tiny, tmp_path):
    """python -m vit_ed_tpu.serve --bundle ... serves a bundle exported
    by the CLI flow; a fresh-process client scores against it."""
    model, params = tiny
    export_scorer(model, params, str(tmp_path), stages=("pair",))
    env = dict(os.environ, VIT_ED_PLATFORM="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-m", "vit_ed_tpu.serve",
         "--bundle", str(tmp_path), "--port", "0"],
        stdout=subprocess.PIPE, text=True, env=env, cwd=repo)
    try:
        line = proc.stdout.readline()
        assert "serving" in line, line
        url = line.strip().rsplit(" on ", 1)[1]
        client = ServeClient(url)
        assert client.health() == {"ok": True}
        fns = stage_fns(model)
        rng = np.random.default_rng(4)
        x = rng.normal(size=(2, 2, 32, 32, 3)).astype(np.float32)
        np.testing.assert_allclose(client.score(x),
                                   np.asarray(fns["pair"](params, x)),
                                   atol=1e-5)
    finally:
        proc.terminate()
        proc.wait(timeout=30)
