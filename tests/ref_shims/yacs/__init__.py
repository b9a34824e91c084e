"""yacs shim: the reference config.py only needs CfgNode; our ConfigNode
implements the same surface (clone/freeze/defrost/merge_from_file/
merge_from_list/dump)."""

from . import config  # noqa: F401
