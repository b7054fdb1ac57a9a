from .multimodal import FusionConfig, build_fusion, FUSION_STRATEGIES  # noqa: F401
