"""Export a (pretrained) pjs scorer into a serving bundle.

StableHLO artifacts via jax.export (vit_ed_tpu/serve/export.py): the
five scan stages + params.msgpack + serving_meta.json land in --output;
a serving host replays them with ``vit_ed_tpu.serve.load_scorer`` (or
any StableHLO-capable runtime) without the model code. Replaces the
reference's deploy-the-.pth-with-the-model-source flow
(/root/reference/models/build.py:15-95).

Usage:
    python scripts/export_serving.py --cfg configs/... \
        [--pretrained <orbax dir | torch .pth>] --output serving/ \
        [--batch-sizes 64,128 | sym] [--platforms tpu[,cpu]] [--verify]

Defaults: symbolic batch (one artifact serves every batch size), the
current jax platform. Cross-exporting TPU artifacts from a CPU-only
host works (Mosaic custom calls lower without a device).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vit_ed_tpu.config import get_config  # noqa: E402


def parse_option():
    parser = argparse.ArgumentParser("serving export")
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE")
    parser.add_argument("--opts", default=None, nargs="+")
    parser.add_argument("--pretrained", default="",
                        help="orbax checkpoint dir or torch .pth")
    parser.add_argument("--output", required=True)
    parser.add_argument("--batch-sizes", default="sym",
                        help='"sym" (symbolic batch) or comma ints')
    parser.add_argument("--platforms", default="",
                        help="comma list, e.g. tpu or tpu,cpu; "
                             "default: current jax platform")
    parser.add_argument("--mesh-data", type=int, default=0,
                        help="export a MULTI-CHIP bundle: batch sharded "
                             "over a 'data' mesh of this many devices")
    parser.add_argument("--verify", action="store_true",
                        help="replay the bundle against the live model "
                             "on this host and compare (current-platform "
                             "bundles only)")
    parser.add_argument("--tag", default="export")
    args, _ = parser.parse_known_args()
    return args, get_config(args)


def main():
    args, config = parse_option()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit_ed_tpu.models import build_model
    from vit_ed_tpu.serve import export_scorer, load_scorer, stage_fns
    from vit_ed_tpu.train import checkpoint as ckpt
    from vit_ed_tpu.utils import create_logger

    os.makedirs(args.output, exist_ok=True)
    logger = create_logger(args.output, name="export")

    model = build_model(config)
    if config.TPU.INT8_SCORE:
        # int8 scoring bundle (--opts TPU.INT8_SCORE True): the exported
        # stages run dynamic-int8 projection GEMMs; measured faster at
        # pjs-B/L decode shapes, slower at S (docs/PERFORMANCE.md int8
        # section). Params are the SAME bf16/f32 checkpoint tree.
        model = model.clone(int8_gemm=True)
    img = config.DATA.IMG_SIZE
    params = model.init(jax.random.PRNGKey(config.SEED),
                        jnp.zeros((1, 2, img, img, 3)))["params"]
    if args.pretrained:
        # get_config already copied --pretrained into MODEL.PRETRAINED
        params = ckpt.load_pretrained(config, params, logger)

    batch_sizes = (None if args.batch_sizes.strip() == "sym"
                   else [int(x) for x in args.batch_sizes.split(",")])
    platforms = ([p.strip() for p in args.platforms.split(",") if p.strip()]
                 or None)
    mesh = None
    if args.mesh_data:
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < args.mesh_data:
            raise SystemExit(f"--mesh-data {args.mesh_data} but only "
                             f"{len(devs)} devices visible")
        mesh = Mesh(np.array(devs[: args.mesh_data]), ("data",))
    meta = export_scorer(
        model, params, args.output, batch_sizes=batch_sizes,
        platforms=platforms, mesh=mesh,
        extra_meta={"config": os.path.basename(args.cfg),
                    "pretrained": args.pretrained,
                    "int8_score": bool(config.TPU.INT8_SCORE)})
    for stage, entries in meta["stages"].items():
        logger.info(f"exported {stage}: "
                    + ", ".join(e["file"] for e in entries))

    if args.verify:
        scorer = load_scorer(args.output, mesh=mesh)
        fns = stage_fns(model)
        rng = np.random.default_rng(0)
        b = ((2 * (args.mesh_data or 1)) if batch_sizes is None
             else batch_sizes[0])
        x = jnp.asarray(rng.normal(size=(b, 2, img, img, 3)), jnp.float32)
        # the bundle and the live model are SEPARATE compilations: allow
        # a couple of ulps of the model's compute dtype (bf16 on the
        # flagship configs)
        atol = 2e-3 if jnp.dtype(model.dtype) == jnp.bfloat16 else 1e-5
        np.testing.assert_allclose(
            np.asarray(scorer("pair", x), np.float32),
            np.asarray(fns["pair"](params, x), np.float32), atol=atol)
        logger.info(f"verify ok: pair stage replay matches at batch {b}")


if __name__ == "__main__":
    main()
