from .attention import fused_attention, fused_attention_packed, reference_attention
from .ring_attention import ring_attention

__all__ = ["fused_attention", "fused_attention_packed", "reference_attention",
           "ring_attention"]
