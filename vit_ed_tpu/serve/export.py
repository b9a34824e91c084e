"""Serving export: versioned, self-contained StableHLO artifacts.

TPU-native redesign of the reference's deployment story. The reference
serves by loading a torch ``.pth`` checkpoint back into its Python model
code at eval time (/root/reference/models/build.py:15-95, pretrained
usage /root/reference/README.md:47-66) — the model source must ship with
the weights. Here the flagship scorer exports ONCE through ``jax.export``
into portable StableHLO: a serving host replays the artifact with no
model code at all (any jax-capable runtime on the export platform), the
batch dimension stays SYMBOLIC so one artifact serves every batch size,
and the Pallas attention kernels ride along as Mosaic custom calls —
cross-platform export for TPU works from a CPU-only build host.

Artifacts under ``out_dir``:

    <stage>.jaxexp       serialized ``jax.export.Exported`` (symbolic b)
    <stage>_b<N>.jaxexp  bucketed concrete-batch variant (opt-in)
    params.msgpack       flax param tree (framework-free msgpack)
    serving_meta.json    format version, model geometry, stage table,
                         platforms, per-stage input/output signatures

Stages — the O(N^2) scan decomposition (models/vit_ed.py), so a serving
tier can amortise exactly like ``parallel/pairs.py`` does:

    pair       f(params, x [b,2,H,W,3])              -> [b, classes]
    encode     f(params, x1 [b,H,W,3])               -> feats [b,Sk,C]
    prepare    f(params, x2 [b,H,W,3])               -> tokens [b,Sq,C]
    kv         f(params, feats [b,Sk,C])             -> kv [L,b,Sk,2C]
    score_row  f(params, kv [L,1,Sk,2C], t [b,Sq,C]) -> [b, classes]
    pair_u8    f(params, x [b,2,H,W,3] uint8) -> [b, classes]  (on-device
               normalize; matches ``pair`` to f32 rounding, 4x less wire)

``pair`` is the reference's full pair forward
(vision_transformer.py:407-420); encode/prepare/kv/score_row compose to
the row-sharded scan schedule (exactness locked by tests/test_model.py).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1

STAGES = ("pair", "pair_u8", "encode", "prepare", "kv", "score_row")


def stage_fns(model) -> Dict[str, Any]:
    """The five serving entry points as pure ``f(params, *arrays)``."""
    return {
        "pair": lambda p, x: model.apply({"params": p}, x),
        "encode": lambda p, x: model.apply(
            {"params": p}, x, forward_first_part=True),
        "prepare": lambda p, x: model.apply(
            {"params": p}, x, method=model.prepare_x2_scan),
        "kv": lambda p, f: model.apply(
            {"params": p}, f, method=model.context_kv_cache),
        "score_row": lambda p, kv, t: model.apply(
            {"params": p}, kv, t, method=model.score_tokens_row),
        # u8-wire pair scoring: raw [b, 2, H, W, 3] uint8 pixels in, the
        # (x/255 - 0.5) / 0.5 normalize runs ON DEVICE in f32 — scores
        # match "pair" on the host-normalized image to float32 rounding
        # (XLA folds /255 into *(1/255); tests/test_export.py) while the
        # wire + host->device transfer carries 4x fewer bytes (the
        # measured bottleneck of the tunneled-v5e HTTP host,
        # docs/PERFORMANCE.md serving table)
        "pair_u8": lambda p, x: model.apply(
            {"params": p},
            (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5),
    }


def _stage_specs(model, params, dtype=jnp.float32):
    """Concrete per-stage input ShapeDtypeStructs (batch=1 placeholder)
    and, per input, the index of its batch axis (None = unbatched)."""
    img = model.img_size
    p_struct = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        params)
    fns = stage_fns(model)
    x_pair = jax.ShapeDtypeStruct((1, 2, img, img, 3), dtype)
    x_one = jax.ShapeDtypeStruct((1, img, img, 3), dtype)
    feats = jax.eval_shape(fns["encode"], p_struct, x_one)
    tokens = jax.eval_shape(fns["prepare"], p_struct, x_one)
    kv = jax.eval_shape(fns["kv"], p_struct, feats)
    kv_row = jax.ShapeDtypeStruct((kv.shape[0], 1) + kv.shape[2:], kv.dtype)
    x_pair_u8 = jax.ShapeDtypeStruct((1, 2, img, img, 3), jnp.uint8)
    return p_struct, {
        "pair": ((x_pair,), (0,)),
        "pair_u8": ((x_pair_u8,), (0,)),
        "encode": ((x_one,), (0,)),
        "prepare": ((x_one,), (0,)),
        "kv": ((feats,), (0,)),
        # kv axis 1 is the (fixed, =1) row, NOT a batch axis: the served
        # row chunk shares one x1 row like the production scan
        "score_row": ((kv_row, tokens), (None, 0)),
    }


def _with_batch(spec: jax.ShapeDtypeStruct, axis: Optional[int], b):
    if axis is None:
        return spec
    shape = list(spec.shape)
    shape[axis] = b
    return jax.ShapeDtypeStruct(tuple(shape), spec.dtype)


def export_scorer(model, params, out_dir: str, *,
                  stages: Sequence[str] = STAGES,
                  batch_sizes: Optional[Sequence[int]] = None,
                  platforms: Optional[Sequence[str]] = None,
                  mesh=None, data_axis: str = "data",
                  dtype=jnp.float32, extra_meta: Optional[dict] = None
                  ) -> dict:
    """Export the scorer stages to ``out_dir``; returns the meta dict.

    batch_sizes None -> ONE artifact per stage with a symbolic batch
    dimension (serves any b >= 1); otherwise one artifact per (stage,
    batch size) bucket. ``platforms`` None -> the current default jax
    platform; pass ``("tpu",)`` to cross-export TPU artifacts from a
    CPU-only host (the Pallas kernels lower to Mosaic custom calls
    without needing a device).

    ``mesh`` -> MULTI-CHIP bundle: the batch axis of every stage shards
    over the mesh's ``data_axis`` (params replicated), so a serving pod
    replays the distributed computation straight from the artifact —
    the symbolic batch becomes ``ndev*b`` (any multiple of the axis
    size) and bucketed sizes must divide evenly. Loading requires a
    same-shape mesh (``load_scorer(dir, mesh=...)``).
    """
    from jax import export as jexport

    import flax.serialization

    os.makedirs(out_dir, exist_ok=True)
    fns = stage_fns(model)
    p_struct, specs = _stage_specs(model, params, dtype)
    plat = tuple(platforms) if platforms else None

    if batch_sizes is not None:
        batch_sizes = sorted(set(int(b) for b in batch_sizes))
        if not batch_sizes:
            raise ValueError("batch_sizes must be non-empty (or None "
                             "for a symbolic-batch bundle)")

    ndev = 1
    shardings = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        ndev = int(mesh.shape[data_axis])
        rep = NamedSharding(mesh, PartitionSpec())

        def shardings(stage):  # noqa: F811
            shs = []
            for s, ax in zip(*specs[stage]):
                if ax is None:
                    shs.append(rep)
                else:
                    spec = [None] * len(s.shape)
                    spec[ax] = data_axis
                    shs.append(NamedSharding(mesh, PartitionSpec(*spec)))
            return (jax.tree.map(lambda _: rep, p_struct), *shs)

        if batch_sizes is not None:
            bad = [n for n in batch_sizes if n % ndev]
            if bad:
                raise ValueError(f"bucketed batch sizes {bad} do not "
                                 f"divide the {data_axis} axis ({ndev})")

    meta: dict = {
        "format_version": FORMAT_VERSION,
        "batch_mode": "symbolic" if batch_sizes is None else batch_sizes,
        "stages": {},
        "model": {
            "img_size": int(model.img_size),
            "patch_size": int(model.patch_size),
            "num_classes": int(model.num_classes),
            "embed_dim": int(model.embed_dim),
            "depth": int(model.depth),
            "c_depth": int(model.c_depth),
            "num_heads": int(model.num_heads),
            "dtype": jnp.dtype(model.dtype).name,
        },
    }
    if mesh is not None:
        meta["mesh"] = {"axis_names": list(mesh.axis_names),
                        "shape": [int(mesh.shape[a]) for a in mesh.axis_names],
                        "data_axis": data_axis}
    if extra_meta:
        meta.update(extra_meta)

    def one(stage, b, fname):
        in_specs = tuple(
            _with_batch(s, ax, b)
            for s, ax in zip(*specs[stage]))
        jfn = (jax.jit(fns[stage]) if shardings is None
               else jax.jit(fns[stage], in_shardings=shardings(stage)))
        exp = jexport.export(jfn, platforms=plat)(p_struct, *in_specs)
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
        # locate the OUTPUT batch axis (None = output does not scale with
        # the batch): the symbolic dim, or — bucketed — the axis that
        # changes when the batch doubles. Serving hosts need this to know
        # which stages may coalesce+slice (kv batches on axis 1, not 0).
        out_shape = exp.out_avals[0].shape
        if batch_sizes is None:
            sym = [i for i, d in enumerate(out_shape)
                   if jexport.is_symbolic_dim(d)]
            out_axis = sym[0] if sym else None
        else:
            alt = tuple(_with_batch(s, ax, 2 * b)
                        for s, ax in zip(*specs[stage]))
            alt_shape = jax.eval_shape(fns[stage], p_struct, *alt).shape
            out_axis = next(
                (i for i, (x, y) in enumerate(zip(out_shape, alt_shape))
                 if x != y), None)
        return {
            "file": fname,
            "out_batch_axis": out_axis,
            "inputs": [[str(d) for d in s.shape] + [s.dtype.name]
                       for s in in_specs],
            "batch_axes": list(specs[stage][1]),
            "outputs": [list(map(int, exp.out_avals[0].shape))
                        if not any(jexport.is_symbolic_dim(d)
                                   for d in exp.out_avals[0].shape)
                        else [str(d) for d in exp.out_avals[0].shape]],
            "platforms": list(exp.platforms),
            "nr_devices": int(exp.nr_devices),
        }

    for stage in stages:
        if batch_sizes is None:
            b, = jexport.symbolic_shape(
                "b" if ndev == 1 else f"{ndev}*b")
            meta["stages"][stage] = [one(stage, b, f"{stage}.jaxexp")]
        else:
            meta["stages"][stage] = [
                one(stage, int(n), f"{stage}_b{int(n)}.jaxexp")
                for n in sorted(set(int(b) for b in batch_sizes))]

    host_params = jax.tree.map(lambda a: np.asarray(jax.device_get(a)),
                               params)
    with open(os.path.join(out_dir, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.msgpack_serialize(host_params))
    with open(os.path.join(out_dir, "serving_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedScorer:
    """Loaded serving bundle: ``scorer(stage, *arrays)`` replays the
    exported computation with the bundled params — NO model code needed.

    Symbolic-batch bundles accept any leading batch size; bucketed
    bundles dispatch to the matching batch artifact (exact match
    required — the serving tier owns padding policy, as
    ``parallel/pairs.py`` does with its fixed-shape chunks). Multi-chip
    bundles need a ``mesh`` whose ``data_axis`` matches the exporter's;
    inputs are committed to their recorded shardings before the call."""

    def __init__(self, out_dir: str, mesh=None):
        from jax import export as jexport

        import flax.serialization

        with open(os.path.join(out_dir, "serving_meta.json")) as f:
            self.meta = json.load(f)
        if self.meta["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"serving bundle format {self.meta['format_version']} is "
                f"newer than this loader ({FORMAT_VERSION})")
        with open(os.path.join(out_dir, "params.msgpack"), "rb") as f:
            self.params = flax.serialization.msgpack_restore(f.read())
        self._exported: Dict[str, list] = {}
        for stage, entries in self.meta["stages"].items():
            loaded = []
            for e in entries:
                with open(os.path.join(out_dir, e["file"]), "rb") as f:
                    loaded.append(jexport.deserialize(bytearray(f.read())))
            self._exported[stage] = loaded
        # Exported.call re-traces and re-lowers on every EAGER invocation
        # (it is designed to compose under an enclosing jit); one jit
        # wrapper per artifact makes repeat calls hit the C++ dispatch
        # cache — on a real TPU the difference is a multi-second lowering
        # per request vs microseconds (docs/PERFORMANCE.md serving table)
        self._jitted: Dict[str, list] = {
            stage: [jax.jit(e.call) for e in loaded2]
            for stage, loaded2 in self._exported.items()}

        self._rep = self._data_sh = None
        if "mesh" in self.meta:
            from jax.sharding import NamedSharding, PartitionSpec

            m = self.meta["mesh"]
            if mesh is None:
                raise ValueError(
                    f"multi-chip bundle (mesh {m['shape']} axes "
                    f"{m['axis_names']}): pass a matching mesh to "
                    "load_scorer")
            axname = m["data_axis"]
            if (axname not in mesh.axis_names
                    or int(mesh.shape[axname]) != m["shape"][
                        m["axis_names"].index(axname)]):
                raise ValueError(
                    f"bundle expects {axname}={m['shape']} over axes "
                    f"{m['axis_names']}; got mesh {dict(mesh.shape)}")
            self._rep = NamedSharding(mesh, PartitionSpec())
            self._data_sh = lambda ndim, axis: NamedSharding(
                mesh, PartitionSpec(*[
                    axname if i == axis else None for i in range(ndim)]))
            self.params = jax.tree.map(
                lambda a: jax.device_put(a, self._rep), self.params)
        else:
            # pin the restored (host-numpy) params on device ONCE — left
            # as numpy every call re-uploads ~the full parameter set,
            # which on a tunneled TPU costs more than the compute
            self.params = jax.device_put(self.params)

    def stages(self):
        return sorted(self._exported)

    def servable_batch(self, b: int) -> int:
        """Batch to actually send to the device for a ``b``-row request:
        the next power of two (x the mesh data axis for sharded bundles),
        or the smallest explicit bucket >= ``b``. The caller owns padding
        up and truncating back — the same fixed-shape policy as
        ``parallel/pairs.py``'s pair chunks.

        Symbolic bundles CAN run any concrete batch, but every distinct
        size lowers a fresh XLA executable — on a real TPU that is a
        multi-second compile per size, which an un-bucketed dynamic
        batcher hits on almost every coalesced group (measured at 1.5
        pairs/s un-bucketed on the v5e HTTP host,
        scripts/bench_serve_http.py + docs/PERFORMANCE.md serving table).
        Power-of-two buckets bound the executable count to
        log2(max_batch) while wasting < 2x rows."""
        mode = self.meta["batch_mode"]
        if mode == "symbolic":
            ndev = 1
            if "mesh" in self.meta:
                m = self.meta["mesh"]
                ndev = m["shape"][m["axis_names"].index(m["data_axis"])]
            units = -(-b // ndev)
            p = 1
            while p < units:
                p *= 2
            return p * ndev
        for n in mode:
            if n >= b:
                return n
        raise ValueError(f"batch {b} exceeds largest bucket {mode[-1]}")

    def _place(self, stage, arrays):
        if self._rep is None:
            return arrays
        axes = self.meta["stages"][stage][0]["batch_axes"]
        return tuple(
            jax.device_put(a, self._rep if ax is None
                           else self._data_sh(np.ndim(a), ax))
            for a, ax in zip(arrays, axes))

    def __call__(self, stage: str, *arrays):
        arrays = self._place(stage, arrays)
        exps = self._jitted[stage]
        if self.meta["batch_mode"] == "symbolic":
            return exps[0](self.params, *arrays)
        # bucketed: dispatch on the batch axis of the last input (the
        # batched stream input for every stage)
        b = int(np.shape(arrays[-1])[0])
        for e, n in zip(exps, self.meta["batch_mode"]):
            if n == b:
                return e(self.params, *arrays)
        raise ValueError(
            f"no {stage} artifact for batch {b}; buckets: "
            f"{self.meta['batch_mode']} (pad to a bucket, or export "
            f"with symbolic batch)")


def load_scorer(out_dir: str, mesh=None) -> ExportedScorer:
    return ExportedScorer(out_dir, mesh=mesh)
