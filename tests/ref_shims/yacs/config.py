from vit_ed_tpu.config import ConfigNode as CfgNode  # noqa: F401
