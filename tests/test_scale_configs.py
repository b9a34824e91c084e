"""The configs/scale/ family must construct through the real trainers:
BASE inheritance resolves, the mesh/axis validations pass, and the
composed shardings land on the params (dims shrunk via --opts, exactly
how a user would dry-run them on a dev box)."""

import os

import pytest
from jax.sharding import PartitionSpec as P

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SHRINK = ["MODEL.PJS.EMBED_DIM", "32", "MODEL.PJS.NUM_HEADS", "4",
          "MODEL.PJS.DEPTH", "2", "MODEL.PJS.C_DEPTH", "2",
          "DATA.IMG_SIZE", "64", "DATA.BATCH_SIZE", "1"]


class Args:
    cfg = None
    opts = None
    batch_size = None
    data_path = None
    pretrained = None
    resume = None
    accumulation_steps = None
    use_checkpoint = None
    disable_amp = True
    output = None
    tag = "test"
    mode = "train"
    eval = None
    throughput = None
    optim = None
    keep_attn = None
    eval_n_items_per_category = 2
    distance_reduction = "min"


def _trainer(cls, cfg_rel, opts, tmp_path):
    args = Args()
    args.cfg = os.path.join(REPO, cfg_rel)
    args.opts = SHRINK + opts
    args.output = str(tmp_path / "out")
    return cls(args)


def test_scale_tp_sp_config(tmp_path):
    from hisfrag import HisfragTrainer

    tr = _trainer(HisfragTrainer, "configs/scale/hisfrag20_pjsL_tp_sp.yaml",
                  [], tmp_path)
    assert tr.mesh.shape == {"data": 2, "model": 4}
    assert tr.model.act_sharding is not None
    assert tr.params["blocks_0"]["attn"]["qkv"]["kernel"].sharding.spec \
        == P(None, "model")


def test_scale_moe_hybrid_config(tmp_path):
    from hisfrag import HisfragTrainer

    tr = _trainer(HisfragTrainer,
                  "configs/scale/hisfrag20_pjsL_moe_hybrid.yaml",
                  ["MODEL.PJS.MOE.EXPERTS", "2"], tmp_path)
    assert tr.mesh.shape == {"data": 2, "model": 2, "expert": 2}
    assert tr.model.moe_route_k == 2
    assert tr.params["blocks_0"]["attn"]["qkv"]["kernel"].sharding.spec \
        == P(None, "model")
    assert tr.params["blocks_1"]["mlp"]["w1"].sharding.spec[0] == "expert"


def test_scale_fsdp_config(tmp_path):
    from main import DefaultTrainer

    tr = _trainer(DefaultTrainer, "configs/scale/div2k_pjsS_fsdp.yaml",
                  [], tmp_path)
    assert tr.config.TPU.FSDP
    fc1 = tr.params["blocks_0"]["mlp"]["fc1"]["kernel"]
    assert "data" in fc1.sharding.spec
