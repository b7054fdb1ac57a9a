"""Model zoo.

Uniform API: every architecture registers a :class:`ModelDef` with

  * ``init(key, num_classes) -> (params, state)``   — random init
    (torch-default initializers so from-scratch training matches the
    reference's behavior when ``--no-tl``),
  * ``apply(params, state, x, *, train=False, rng=None) -> (out, state)``
    — pure function, jit/pjit-friendly,
  * metadata (input size, feature width, torch state-dict converter).

Image registry mirrors the reference factory set (reference models.py:9-277),
text registry mirrors CVPR_code/text_models.py, fusion registry mirrors
CVPR_code/multimodal_model.py.
"""

from .registry import ModelDef, get_image_model, get_text_model, IMAGE_MODELS, TEXT_MODELS  # noqa: F401
