from .attention import dot_product_attention, attention_with_probs

__all__ = ['dot_product_attention', 'attention_with_probs']
