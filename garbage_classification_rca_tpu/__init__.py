"""TPU-native garbage-classification framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of the
reference repo ``espiriki/Garbage_Classification_RCA`` (plain single-GPU
PyTorch): 4-class (black/blue/green/ttr) classification of photographed
objects plus filename-derived text, with

  * 13 image backbones and 6 text encoders with replaced heads,
  * 7 multimodal late-fusion strategies headlined by MM-RCA
    (reverse cross-attention, fused into a Pallas TPU kernel here),
  * BLIP-2 LoRA and Q-Former-head VLM classifiers,
  * a fused, batched XLA input pipeline (pad-to-aspect-ratio, resize,
    augment, normalize),
  * two-phase (frozen backbone -> full fine-tune) training with gradient
    accumulation, class weighting, modality dropout and an imbalanced
    sampler,
  * evaluation CLIs emitting reference-compatible confusion matrices and
    CSV reports, able to load the reference ``.pth`` checkpoints.

Design: explicit parameter pytrees (nested dicts of ``jnp.ndarray``) +
pure-functional apply functions, jit/pjit-compiled end to end, sharded over
a ``jax.sharding.Mesh`` (axis ``data`` for batch parallelism; axis ``model``
reserved for the BLIP-2 towers).
"""

__version__ = "0.1.0"

CLASSES = ("black", "blue", "green", "ttr")
CLASS_DISPLAY_NAMES = ("Black", "Blue", "Green", "TTR")
NUM_CLASSES = 4
