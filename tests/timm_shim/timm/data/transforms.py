"""timm.data.transforms stub: the reference only monkeypatches
_pil_interp onto this module (data/build.py:29-33)."""

def _pil_interp(method):  # replaced by the reference at import time
    raise RuntimeError("timm.data.transforms stub")
