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


class TrackingDict(dict):
    """State-dict wrapper that records which keys a converter consumed.

    ``audit()`` reports leftovers so tests can assert a converter reads
    EVERY checkpoint tensor (a silently-ignored key usually means a
    misremembered layout — the failure mode behind round-1's converter-
    fidelity risk). ``num_batches_tracked`` counters are bookkeeping with
    no numerical content and are pre-excused."""

    IGNORABLE = ("num_batches_tracked",)

    def __init__(self, sd: Dict[str, np.ndarray]):
        super().__init__(sd)
        self.accessed: set = set()
        self._parent = None
        self._prefix = ""

    def _mark(self, k):
        self.accessed.add(k)
        if self._parent is not None:
            km = getattr(self, "_keymap", None)
            self._parent._mark(km[k] if km is not None
                               else self._prefix + k)

    def __getitem__(self, k):
        self._mark(k)
        return super().__getitem__(k)

    def child(self, prefix: str, mapping: Dict[str, np.ndarray]
              ) -> "TrackingDict":
        """Prefix-stripped view whose reads also mark this dict
        (keeps tracking alive through ``strip_prefix``)."""
        c = TrackingDict(mapping)
        c._parent = self
        c._prefix = prefix
        return c

    def view(self, keymap: Dict[str, str]) -> "TrackingDict":
        """Arbitrary renamed view: {new_key: original_key}. Reads of the
        view mark the original keys (for converters that restructure key
        names, e.g. the fusion image-tower remap)."""
        c = TrackingDict({nk: dict.__getitem__(self, ok)
                          for nk, ok in keymap.items()})
        c._parent = self
        c._keymap = keymap
        return c


    def get(self, k, default=None):
        if super().__contains__(k):
            return self[k]
        return default

    def unconsumed(self) -> list:
        return sorted(k for k in self
                      if k not in self.accessed
                      and not k.endswith(self.IGNORABLE))

    def audit(self, allow_unconsumed=()) -> None:
        """Raise if any non-ignorable key was never read."""
        left = [k for k in self.unconsumed()
                if not any(k.startswith(p) for p in allow_unconsumed)]
        if left:
            raise ValueError(
                f"converter left {len(left)} checkpoint keys unconsumed "
                f"(first 8: {left[:8]})")


def convert_checked(convert_fn, sd, what: str, **kw):
    """Run a converter with a readable error when the checkpoint's key
    layout doesn't match the requested architecture (a raw KeyError from
    deep inside a converter is unhelpful to CLI users)."""
    try:
        return convert_fn(sd, **kw)
    except KeyError as e:
        sample = sorted(sd)[:3]
        raise SystemExit(
            f"checkpoint does not match {what}: converter needs key {e} "
            f"but the file contains keys like {sample}. Did you pass the "
            "right --image_model/--text_model/--late_fusion for this "
            ".pth?") from e


def subdict(sd, prefix: str):
    """Prefix-stripped sub-dict; tracking-aware when sd is a TrackingDict."""
    out = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    if hasattr(sd, "child"):
        return sd.child(prefix, out)
    return out
