from .build import build_model, compute_dtype
from .vit import ViT
from .vit_ed import ViTED

__all__ = ["ViT", "ViTED", "build_model", "compute_dtype"]
