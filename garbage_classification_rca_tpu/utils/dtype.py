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


def resolve_param_dtype(args, default: str):
    """--param_dtype -> jnp storage dtype, falling back to the calling
    path's policy when the flag is left empty (eval CLIs pass
    args.compute_dtype — weights stored at compute precision; train CLIs
    pass "float32" — fp32 master weights for the optimizer)."""
    s = args.param_dtype or default
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[s]
