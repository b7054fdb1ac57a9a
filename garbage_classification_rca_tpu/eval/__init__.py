from .harness import run_image_eval, make_eval_step  # noqa: F401
from .report import generate_report_and_image, classification_report_dict  # noqa: F401
