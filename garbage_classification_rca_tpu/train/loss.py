"""Classification loss — torch.nn.CrossEntropyLoss parity.

The reference criterion (main_image.py:91-96): CE with optional per-class
weights (``--balance_weights``, weights = total/(C*count_c)) and optional
label smoothing (``--label_smoothing``).

torch semantics reproduced exactly:
  * per-sample: l_i = (1-eps) * (-w_{y_i} log p_{y_i})
                + (eps/C) * sum_c (-w_c log p_c)
  * mean reduction divides by sum_i w_{y_i}  (NOT by N) when weights are
    given — this is the part naive ports get wrong.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_loss_and_weight(
        logits: jnp.ndarray, labels: jnp.ndarray,
        class_weights: Optional[jnp.ndarray] = None,
        label_smoothing: float = 0.0,
        valid: Optional[jnp.ndarray] = None):
    """Mean CE over the batch plus its denominator ``sum_i w_{y_i}``.

    valid: optional 0/1 mask for tail padding — masked samples contribute
    nothing to numerator or denominator. A fully-masked batch returns
    (0.0, 0.0), NOT NaN — the grad-accum scan weights microbatches by the
    returned w_sum, so padded stacks are exact (train/loop.py).
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    n, c = logits.shape
    onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)

    if class_weights is None:
        w_per_class = jnp.ones((c,), jnp.float32)
    else:
        w_per_class = jnp.asarray(class_weights, jnp.float32)

    w_label = (onehot * w_per_class).sum(-1)               # w_{y_i}
    nll = -(onehot * logp).sum(-1) * w_label               # (bs,)
    if label_smoothing > 0.0:
        smooth = -(logp * w_per_class).sum(-1)             # sum_c w_c(-logp_c)
        per_sample = (1.0 - label_smoothing) * nll + \
            (label_smoothing / c) * smooth
    else:
        per_sample = nll

    if valid is not None:
        vm = valid.astype(jnp.float32)
        per_sample = per_sample * vm
        w_label = w_label * vm
    w_sum = w_label.sum()
    # guard the 0/0 of a fully-masked microbatch (numerator is exactly 0
    # there, so the quotient — and its gradient — are exactly 0 too)
    return per_sample.sum() / jnp.maximum(w_sum, 1e-30), w_sum


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       class_weights: Optional[jnp.ndarray] = None,
                       label_smoothing: float = 0.0,
                       valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean CE over the batch, torch CrossEntropyLoss-compatible."""
    loss, _ = cross_entropy_loss_and_weight(
        logits, labels, class_weights, label_smoothing, valid)
    return loss
