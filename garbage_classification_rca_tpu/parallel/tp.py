"""Tensor-parallel sharding rules for the BLIP-2 towers.

The reference never shards a model (largest is BLIP-2 2.7B on one GPU,
blip_2_training.py:187-206). On TPU we provide Megatron-style TP over mesh
axis 'model' for HBM headroom / latency (SURVEY §2.3, §7 'BLIP-2 scale'):

  OPT decoder layer:
    q/k/v kernels column-sharded  [H, H/mp]  (heads split across chips),
    out_proj row-sharded          [H/mp, H]  -> psum by XLA,
    fc1 column-sharded, fc2 row-sharded,
    token/position embeddings + LayerNorms replicated.

Expressed purely as a PartitionSpec pytree over the params — `jax.jit`
with these shardings lets XLA insert the all-reduces on ICI; no shard_map
needed because every contraction is a plain matmul whose sharded operand
layout implies the collective.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def _spec_like(tree, spec):
    return jax.tree_util.tree_map(lambda _: spec, tree)


def opt_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec tree for an opt.init()/convert_torch() params dict."""
    specs: Dict[str, Any] = {
        "embed_tokens": _spec_like(params["embed_tokens"], P()),
        "embed_positions": _spec_like(params["embed_positions"], P()),
        "final_ln": _spec_like(params["final_ln"], P()),
        "layers": [],
    }
    # Built per actual keys so weight-only-int8 trees (ops/quant.py adds a
    # "w_scale" [1, out] leaf per linear) shard identically: the scale
    # follows its weight's OUTPUT dim — sharded for column-parallel,
    # replicated for row-parallel (out dim unsharded there).
    def col(lp_lin):
        s = {"w": P(None, MODEL_AXIS)}
        if "w_scale" in lp_lin:
            s["w_scale"] = P(None, MODEL_AXIS)
        if "b" in lp_lin:
            s["b"] = P(MODEL_AXIS)
        return s

    def row(lp_lin):
        s = {"w": P(MODEL_AXIS, None)}
        if "w_scale" in lp_lin:
            s["w_scale"] = P()
        if "b" in lp_lin:
            s["b"] = P()
        return s

    for lp in params["layers"]:
        specs["layers"].append({
            "ln1": _spec_like(lp["ln1"], P()),
            "q": col(lp["q"]), "k": col(lp["k"]), "v": col(lp["v"]),
            "out": row(lp["out"]),
            "ln2": _spec_like(lp["ln2"], P()),
            "fc1": col(lp["fc1"]),
            "fc2": row(lp["fc2"]),
        })
    return specs


def blip2_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Full BLIP-2: vision + qformer + projection replicated (small),
    OPT tower TP-sharded."""
    return {
        "vision": _spec_like(params["vision"], P()),
        "qformer": _spec_like(params["qformer"], P()),
        "projection": _spec_like(params["projection"], P()),
        "opt": opt_param_specs(params["opt"]),
    }


def shard_with_specs(mesh: Mesh, params, specs):
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)
