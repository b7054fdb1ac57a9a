from .attention import (  # noqa: F401
    self_attention, reverse_cross_attention,
    init_self_attention, init_cross_attention,
)
