"""Expert parallelism (EP) for a mixture-of-experts FFN.

The reference has no MoE anywhere (SURVEY §2.3: TP/PP/SP/EP absent; grep
finds no gating/expert modules in models.py, text_models.py,
multimodal_model.py), so — like SP (parallel/sp.py) — this is a
beyond-reference capability that completes the parallelism matrix: a
top-k-routed MoE FFN whose EXPERT axis is sharded over mesh axis
``expert``, so each chip holds and computes only its local experts and
one ``psum`` over the expert axis combines the gated outputs.

Design (TPU-first, no token dropping): at this framework's scale
(≤512-token encoders, a handful of experts) the exact dense-dispatch
formulation wins over capacity-bucketed all-to-all dispatch — every
chip runs its local experts' FFN over all tokens as ONE large matmul
(MXU-friendly static shapes, no sort/scatter), multiplies by the gate
probabilities (zero for unrouted tokens), and ``psum``s across
``expert``. Compute per chip is tokens x local_experts — embarrassingly
parallel in the expert count — and the result is bit-comparable to the
unsharded oracle because the combine is a plain sum. Capacity-factor
all-to-all dispatch (GShard-style) only pays when experts >> chips or
tokens are expensive to replicate; neither holds here.

Routing follows the Switch/GShard convention: softmax over ALL router
logits, keep the top-k probabilities per token, renormalize them to sum
to 1. The router is tiny (d_model x n_experts) and stays replicated.

MoE layers shard over ``expert``; this composes with ``data`` (batch
axis) the same way SP composes in parallel/sp.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn import core as nn
from .mesh import DATA_AXIS

EXPERT_AXIS = "expert"


def init_moe_ffn(key, d_model: int, d_ffn: int, n_experts: int,
                 dtype=jnp.float32) -> Dict[str, Any]:
    """Router + stacked expert FFNs.

    Experts are stored STACKED on a leading [E, ...] axis (not a Python
    list) so the whole bank shards with one ``PartitionSpec('expert')``
    and the per-chip compute is a single batched matmul.
    """
    kr, k1, k2 = jax.random.split(key, 3)
    ks1 = jax.random.split(k1, n_experts)
    ks2 = jax.random.split(k2, n_experts)
    fc1 = [nn.init_linear(ks1[e], d_model, d_ffn, dtype)
           for e in range(n_experts)]
    fc2 = [nn.init_linear(ks2[e], d_ffn, d_model, dtype)
           for e in range(n_experts)]
    stack = lambda ps, k: jnp.stack([p[k] for p in ps])  # noqa: E731
    return {
        "router": nn.init_linear(kr, d_model, n_experts, dtype),
        "fc1_w": stack(fc1, "w"), "fc1_b": stack(fc1, "b"),
        "fc2_w": stack(fc2, "w"), "fc2_b": stack(fc2, "b"),
    }


def moe_gates(router: Dict[str, Any], x: jnp.ndarray,
              top_k: int) -> jnp.ndarray:
    """[..., E] renormalized top-k gate probabilities (fp32).

    Softmax over all experts, zero everything outside each token's
    top-k, renormalize the survivors to sum to 1 (GShard top-2 / Switch
    top-1 convention).
    """
    logits = nn.linear(router, x.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    if top_k >= probs.shape[-1]:
        return probs
    kth = jnp.sort(probs, axis=-1)[..., -top_k][..., None]
    kept = jnp.where(probs >= kth, probs, 0.0)
    return kept / jnp.sum(kept, axis=-1, keepdims=True)


def _expert_bank(params: Dict[str, Any], x: jnp.ndarray, gates: jnp.ndarray,
                 act) -> jnp.ndarray:
    """Sum of gate-weighted expert FFN outputs for the experts in
    ``params`` (all of them single-device; the local shard under EP).

    x: [B, T, D], gates: [B, T, E_local] fp32 -> [B, T, D].
    """
    h = jnp.einsum("btd,edf->betf", x, params["fc1_w"].astype(x.dtype))
    h = act(h + params["fc1_b"].astype(x.dtype)[None, :, None, :])
    y = jnp.einsum("betf,efd->betd", h, params["fc2_w"].astype(x.dtype))
    y = y + params["fc2_b"].astype(x.dtype)[None, :, None, :]
    return jnp.einsum("bte,betd->btd", gates.astype(x.dtype), y)


def moe_ffn(params: Dict[str, Any], x: jnp.ndarray, *, top_k: int = 2,
            act=nn.gelu) -> jnp.ndarray:
    """Single-device oracle: exact dense-dispatch top-k MoE FFN."""
    return _expert_bank(params, x, moe_gates(params["router"], x, top_k),
                        act)


def _check_divisible(mesh: Mesh, n_experts: int) -> int:
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_exp = axes.get(EXPERT_AXIS, 1)
    if n_experts % n_exp != 0:
        raise ValueError(
            f"{n_experts} experts do not divide over {EXPERT_AXIS}:{n_exp}")
    return n_exp


def shard_moe_params(mesh: Mesh, params: Dict[str, Any]):
    """Place the expert bank sharded over ``expert``; router replicated."""
    _check_divisible(mesh, params["fc1_w"].shape[0])
    espec = NamedSharding(mesh, P(EXPERT_AXIS))
    rspec = NamedSharding(mesh, P())
    out = dict(params)
    out["router"] = jax.device_put(params["router"], rspec)
    for k in ("fc1_w", "fc1_b", "fc2_w", "fc2_b"):
        out[k] = jax.device_put(params[k], espec)
    return out


def moe_ffn_ep(params: Dict[str, Any], x: jnp.ndarray, mesh: Mesh, *,
               top_k: int = 2, act=nn.gelu) -> jnp.ndarray:
    """Expert-parallel twin of :func:`moe_ffn`.

    The expert bank's leading [E] axis is sharded over mesh axis
    ``expert`` (see :func:`shard_moe_params`); tokens replicate across
    it (and shard over ``data`` on the batch axis when the mesh has
    one). Each chip computes the full router (replicated, tiny), slices
    its local experts' gate columns, runs ONE batched FFN matmul over
    its local experts, and a single ``psum`` over ``expert`` sums the
    gated contributions — numerics-identical to the oracle because the
    top-k combine is a plain weighted sum.
    """
    n_experts = params["fc1_w"].shape[0]
    n_exp = _check_divisible(mesh, n_experts)
    e_local = n_experts // n_exp
    dp: Optional[str] = DATA_AXIS if DATA_AXIS in mesh.axis_names else None

    def shard_fn(p, xl):
        i = jax.lax.axis_index(EXPERT_AXIS)
        gates = moe_gates(p["router"], xl, top_k)
        local = jax.lax.dynamic_slice_in_dim(gates, i * e_local, e_local,
                                             axis=-1)
        y = _expert_bank(p, xl, local, act)
        return jax.lax.psum(y, EXPERT_AXIS)

    espec = {k: P(EXPERT_AXIS) for k in
             ("fc1_w", "fc1_b", "fc2_w", "fc2_b")}
    espec["router"] = {"w": P(), "b": P()}
    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(espec, P(dp)),
                       out_specs=P(dp))
    return fn(params, x)
