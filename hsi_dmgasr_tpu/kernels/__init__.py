from .attention import spatial_attention

__all__ = ["spatial_attention"]
