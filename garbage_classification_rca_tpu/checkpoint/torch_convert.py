"""Reference ``.pth`` checkpoint loading.

The reference saves ``torch.save(model.state_dict())`` on every new best
val accuracy (reference main_image.py:185-209) and loads with
``load_state_dict`` in the test scripts (calculate_test_accuracy_image.py:222);
BLIP-2 checkpoints may instead wrap the dict under ``'model_state_dict'``
(blip_2_test_set.py:253-259). Training runs under ``nn.DataParallel``
(main_image.py:404-406) so keys may carry a ``module.`` prefix.

This module normalizes all of that into a flat ``{name: np.ndarray}`` dict;
per-architecture converters (in each model module) then map it to our
parameter pytrees. Torch is imported lazily and only used host-side — the
device pipeline never sees it.

Checkpoint state_dicts contain EVERY fusion head's params regardless of the
strategy trained (reference multimodal_model.py:199-328 builds all heads in
__init__) — converters must tolerate unused keys (SURVEY.md §2 #15).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch  # host-side only

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        # BLIP-2-style wrapper (reference blip_2_test_set.py:253-259)
        obj = obj["model_state_dict"]
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):      # nn.DataParallel prefix
            k = k[len("module."):]
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def numpy_state_dict(torch_module) -> Dict[str, np.ndarray]:
    """state_dict of a live torch module -> numpy dict (test helper)."""
    return {k: v.detach().cpu().numpy()
            for k, v in torch_module.state_dict().items()}
