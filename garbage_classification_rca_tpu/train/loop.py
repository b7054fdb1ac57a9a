"""Training step + two-phase epoch loop.

Reference shape (main_image.py:85-130 run_one_epoch; :547-709 epoch loops):
per-batch forward/CE/backward with gradient accumulation every
``acc_steps`` batches, phase 1 on a frozen backbone for ``--epochs``,
then unfreeze-all fine-tuning at lr/fraction_lr for ``--ft_epochs`` with
ReduceLROnPlateau on val accuracy, checkpointing on best val accuracy.

TPU-native re-design:
  * ONE jitted train step consumes a [acc, B, ...] microbatch stack and
    runs ``lax.scan`` over it, accumulating gradients in fp32 — the whole
    effective batch is a single device program (no per-microbatch host
    round-trip like the reference's optimizer-step-every-N-batches loop).
  * gradients are AVERAGED over microbatches. The reference divides the
    loss by acc_steps only AFTER backward() (main_image.py:107-110), so
    its gradients are actually summed — a known defect (SURVEY.md §2); we
    fix it and document here rather than copy it.
  * freezing = optax.masked: phase-1 only head params update; BatchNorm
    running stats still update in train mode exactly like torch modules in
    ``model.train()`` with requires_grad=False params.
  * batch sharded over mesh axis 'data'; params/opt-state replicated;
    gradient psums inserted by XLA from the shardings.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..data.images import normalize_on_device
from .loss import cross_entropy_loss_and_weight


def head_only_mask(params, head_keys=("head",)):
    """Trainable mask: True only for subtrees whose top-level key is a head.

    Mirrors reference transfer learning: freeze backbone, replaced head
    trains (models.py:18-24 et al).
    """
    def mark(tree, trainable):
        return jax.tree_util.tree_map(lambda _: trainable, tree)

    return {k: mark(v, k in head_keys) for k, v in params.items()}


def all_trainable_mask(params):
    return jax.tree_util.tree_map(lambda _: True, params)


def make_train_step(apply_fn: Callable, optimizer: optax.GradientTransformation,
                    *, class_weights=None, label_smoothing: float = 0.0,
                    compute_dtype=jnp.bfloat16, mesh=None,
                    batch_to_inputs: Optional[Callable] = None,
                    donate: bool = False, log_norms: bool = False):
    """Build the jitted (grad-accumulating) train step.

    batch leaves carry a leading [acc_steps] axis (use acc_steps=1 stacks
    for no accumulation). batch_to_inputs maps a microbatch dict to the
    model's positional input (default: normalized image).

    ``log_norms=True`` (the production CLIs): the step returns a SIXTH
    element ``{"grad_norm", "param_norm"}`` — fp32 global L2 norms of the
    averaged accumulated gradients and of the updated params, the scalar
    summary of the reference's ``wandb.watch(model)`` telemetry
    (main_image.py:397; VERDICT r3 missing #5). Two tree reductions per
    optimizer step — negligible next to fwd+bwd.
    """
    cw = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)

    if batch_to_inputs is None:
        def batch_to_inputs(mb, rng=None):
            return normalize_on_device(mb["image"], dtype=compute_dtype)

    # batch_to_inputs may take (mb) or (mb, rng) — rng enables device-side
    # augmentation inside the step (data/augment.py). Arity is resolved
    # ONCE here from the signature: an exception-driven probe would
    # swallow genuine TypeErrors raised inside a two-arg body and retry
    # without rng, silently training un-randomized.
    import inspect

    try:
        takes_rng = len(inspect.signature(batch_to_inputs).parameters) >= 2
    except (TypeError, ValueError):     # builtins/partials without sigs
        takes_rng = True

    def _inputs(mb, rng):
        return batch_to_inputs(mb, rng) if takes_rng else batch_to_inputs(mb)

    def loss_fn(params, state, mb, rng):
        r_in, r_model = jax.random.split(rng)
        logits, new_state = apply_fn(params, state, _inputs(mb, r_in),
                                     train=True, rng=r_model)
        loss, w_sum = cross_entropy_loss_and_weight(
            logits, mb["label"], cw, label_smoothing, mb.get("valid"))
        return loss, (new_state, w_sum)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(params, state, opt_state, batch, rng):
        acc = jax.tree_util.tree_leaves(batch)[0].shape[0]

        # Microbatch gradients are combined weighted by each microbatch's
        # CE denominator (sum of valid label weights): the result equals
        # the mean-reduction gradient of the whole effective batch exactly,
        # including uneven/padded tails (a fully-padded microbatch has
        # weight 0 and contributes nothing — no NaN; see loss.py).
        def micro(carry, inp):
            state, grads_acc, loss_acc, w_acc = carry
            mb, mb_rng = inp
            (loss, (new_state, w_sum)), grads = grad_fn(params, state, mb,
                                                        mb_rng)
            grads = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32) * w_sum,
                grads_acc, grads)
            return (new_state, grads, loss_acc + loss * w_sum,
                    w_acc + w_sum), loss

        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        rngs = jax.random.split(rng, acc)
        (state, grads, loss_sum, w_total), losses = jax.lax.scan(
            micro, (state, zero_grads, 0.0, 0.0), (batch, rngs))
        w_total = jnp.maximum(w_total, 1e-30)
        grads = jax.tree_util.tree_map(lambda g: g / w_total, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if log_norms:
            norms = {"grad_norm": optax.global_norm(grads),
                     "param_norm": optax.global_norm(
                         jax.tree_util.tree_map(
                             lambda p: p.astype(jnp.float32), params))}
            return (params, state, opt_state, loss_sum / w_total, losses,
                    norms)
        return params, state, opt_state, loss_sum / w_total, losses

    # Shardings are inferred from operand placement: the caller replicates
    # params/state/opt_state (parallel.shard_params) and device_puts batches
    # with PartitionSpec(None, 'data') (microbatch axis replicated, batch
    # axis sharded). XLA then inserts the gradient all-reduces.
    # donate=True (production epoch loops) lets XLA reuse the param/opt
    # buffers in place — halves peak HBM; leave off when the caller keeps
    # references to the old params.
    return jax.jit(step, donate_argnums=(0, 1, 2) if donate else ())


def microbatch_sharding(mesh):
    """Sharding for [acc, B, ...] stacked batches: batch axis over 'data'.

    Data-less meshes (e.g. a pure pipe: mesh) replicate the stack — see
    parallel.mesh.batch_sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if "data" not in mesh.axis_names:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(None, "data"))


def stack_microbatches(batches):
    """List of microbatch dicts -> one dict with leading [acc] axis."""
    import numpy as np

    keys = batches[0].keys()
    return {k: np.stack([b[k] for b in batches]) for k in keys}
