import os
import textwrap

from vit_ed_tpu.config import ConfigNode, default_config, get_config


class Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def test_defaults():
    c = default_config()
    assert c.MODEL.TYPE == "pjs"
    assert c.MODEL.PJS.DEPTH == 8
    assert c.TRAIN.LR_SCHEDULER.NAME == "cosine"


def test_freeze():
    c = default_config()
    c.freeze()
    try:
        c.MODEL.TYPE = "vit"
        assert False, "should have raised"
    except AttributeError:
        pass
    c.defrost()
    c.MODEL.TYPE = "vit"
    assert c.MODEL.TYPE == "vit"


def test_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(textwrap.dedent("""
        MODEL:
          TYPE: pjs
          PJS:
            EMBED_DIM: 384
    """))
    child = tmp_path / "child.yaml"
    child.write_text(textwrap.dedent("""
        BASE: ['base.yaml']
        MODEL:
          PJS:
            DEPTH: 12
    """))
    c = default_config()
    c.merge_from_file(str(child))
    assert c.MODEL.PJS.EMBED_DIM == 384
    assert c.MODEL.PJS.DEPTH == 12


def test_opts_merge():
    c = default_config()
    c.merge_from_list(["TRAIN.EPOCHS", "10", "DATA.IMG_SIZE", "64",
                       "MODEL.NAME", "foo", "TRAIN.BASE_LR", "0.01"])
    assert c.TRAIN.EPOCHS == 10
    assert c.DATA.IMG_SIZE == 64
    assert c.MODEL.NAME == "foo"
    assert abs(c.TRAIN.BASE_LR - 0.01) < 1e-12


def test_get_config(tmp_path):
    cfg = tmp_path / "t.yaml"
    cfg.write_text("MODEL:\n  NAME: test_model\n")
    args = Args(cfg=str(cfg), output=str(tmp_path), tag="t1",
                opts=["SEED", "3"], batch_size=4)
    c = get_config(args)
    assert c.MODEL.NAME == "test_model"
    assert c.OUTPUT == os.path.join(str(tmp_path), "test_model", "t1")
    assert c.SEED == 3
    assert c.DATA.BATCH_SIZE == 4
    assert c.is_frozen()


def test_roundtrip_dump():
    c = default_config()
    d = ConfigNode(__import__("yaml").safe_load(c.dump()))
    assert d.MODEL.PJS.EMBED_DIM == c.MODEL.PJS.EMBED_DIM
