from .attention import dot_product_attention_xla, multi_head_attention

__all__ = ["dot_product_attention_xla", "multi_head_attention"]
