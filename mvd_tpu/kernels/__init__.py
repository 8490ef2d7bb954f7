from .flash_attention import attention, flash_attention, xla_attention  # noqa: F401
