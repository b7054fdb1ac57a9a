"""dtype policy helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_float_params(params, dtype):
    """Cast floating leaves to `dtype` (ints/bools untouched).

    Used by the eval CLIs for bf16 inference: weights in bf16 halve HBM
    traffic; LayerNorm/softmax/BN still accumulate fp32 internally
    (nn.core), so accuracy drift stays within the bf16 rounding of the
    matmuls themselves.
    """
    def cast(p):
        if hasattr(p, "dtype") and jnp.issubdtype(p.dtype, jnp.floating):
            return p.astype(dtype)
        return p

    return jax.tree_util.tree_map(cast, params)


def cast_for_training(args, params, resumed: bool):
    """Param storage cast for the train CLIs: fp32 master weights unless
    --param_dtype overrides. A FULL resume with the flag left empty keeps
    the checkpoint's own dtype — casting there would silently change the
    run's precision mid-training (a --param_dtype=bfloat16 run resumed
    with default flags would upcast params to fp32 while restore_opt_state
    reloads the checkpoint's bf16 moments) and break the bit-identical
    continuation contract (train/engine.py resume tests)."""
    if resumed and not args.param_dtype:
        return params
    return cast_float_params(params, resolve_param_dtype(args, "float32"))


def resolve_param_dtype(args, default: str):
    """--param_dtype -> jnp storage dtype, falling back to the calling
    path's policy when the flag is left empty (eval CLIs pass
    args.compute_dtype — weights stored at compute precision; train CLIs
    pass "float32" — fp32 master weights for the optimizer)."""
    s = args.param_dtype or default
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[s]
