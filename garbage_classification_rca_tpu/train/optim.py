"""Optimizers + LR scheduling.

Reference (main_image.py:529-545): torch AdamW(lr, weight_decay=reg) or
SGD(lr, weight_decay=reg, no momentum), with ReduceLROnPlateau('max',
factor=0.2) stepped on val accuracy, and the fine-tune phase restarting at
lr/fraction_lr (main_image.py:630-632).

Here: optax equivalents wrapped in ``inject_hyperparams`` so the host-side
:class:`PlateauScheduler` can rewrite the learning rate between epochs
without recompiling the train step.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import optax


def make_optimizer(opt: str, lr: float, reg: float,
                   trainable_mask=None) -> optax.GradientTransformation:
    """opt in {'sgd', 'adamw'} — torch-parity update rules.

    torch SGD(weight_decay=reg) folds decay into the gradient (g + reg*w),
    which optax.sgd does via add_decayed_weights; torch AdamW decouples it,
    matching optax.adamw.
    """
    if opt == "adamw":
        base = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=reg)
    elif opt == "sgd":
        def sgd_wd(learning_rate, weight_decay):
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.sgd(learning_rate))
        base = optax.inject_hyperparams(sgd_wd)(
            learning_rate=lr, weight_decay=reg)
    else:
        raise ValueError(f"Invalid optimizer: {opt}")
    if trainable_mask is not None:
        # freeze = zero update (NOT optax.masked, which passes raw grads
        # through for unmasked leaves)
        labels = jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", trainable_mask)
        return optax.multi_transform(
            {"train": base, "freeze": optax.set_to_zero()}, labels)
    return base


def set_learning_rate(opt_state, lr: float):
    """Rewrite the injected learning rate inside (possibly masked) state.

    InjectHyperparamsState.hyperparams is a plain dict — swap the scalar
    in place; no recompile (the jitted step reads it as a traced input).
    """
    import jax.numpy as jnp

    inner = _find_hyperparams_state(opt_state)
    inner.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def _find_hyperparams_state(opt_state):
    """Walk multi_transform/masked wrappers to the InjectHyperparamsState."""
    s = opt_state
    while True:
        if hasattr(s, "hyperparams"):
            return s
        if hasattr(s, "inner_states"):        # multi_transform
            s = s.inner_states["train"]
        elif hasattr(s, "inner_state"):       # masked wrapper
            s = s.inner_state
        else:
            raise ValueError("no InjectHyperparamsState found in opt state")


def get_learning_rate(opt_state) -> float:
    return float(_find_hyperparams_state(opt_state).hyperparams["learning_rate"])


class PlateauScheduler:
    """torch ReduceLROnPlateau parity (mode='max', factor, patience=10,
    threshold=1e-4 rel) — host-side, feeds set_learning_rate."""

    def __init__(self, lr: float, factor: float = 0.2, patience: int = 10,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = -math.inf
        self.num_bad = 0

    def state_dict(self) -> dict:
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d: dict) -> None:
        self.lr = float(d["lr"])
        self.best = float(d["best"])
        self.num_bad = int(d["num_bad"])

    def step(self, metric: float) -> float:
        """Feed the epoch's val metric; returns the (possibly reduced) lr."""
        if metric > self.best * (1.0 + self.threshold) if self.best > 0 \
                else metric > self.best + self.threshold:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr
