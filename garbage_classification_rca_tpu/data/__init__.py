from .manifest import pre_process_text, find_classes, build_manifest, Manifest, Sample  # noqa: F401
from .images import pad_to_aspect_ratio, load_rgb, eval_preprocess_image  # noqa: F401
