from t2v.kernels.attention import attention, flash_attention, xla_attention

__all__ = ["attention", "flash_attention", "xla_attention"]
