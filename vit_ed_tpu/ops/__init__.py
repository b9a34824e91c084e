from .attention import fused_attention, fused_attention_packed, reference_attention

__all__ = ["fused_attention", "fused_attention_packed", "reference_attention"]
