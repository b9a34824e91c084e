"""Minimal timm shim: just enough surface for the reference
models/vision_transformer.py to import and run under plain torch.

Semantics mirror timm's PatchEmbed / Mlp / DropPath / VisionTransformer
for the configurations the reference model actually uses (token pooling,
class_token=True, no_embed_class=False, no pre-norm, no patch dropout).
Only used by the parity tests — NOT a runtime dependency.
"""

import sys as _sys

from . import layers, models, scheduler  # noqa: F401

# the reference's resnet.py imports `timm.models.layers`; models is a plain
# module here, so register the alias explicitly
models.layers = layers
_sys.modules.setdefault(__name__ + ".models.layers", layers)
