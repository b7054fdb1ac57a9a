"""BLIP-2 vision tower (EVA ViT-g/14 as shipped in HF Blip2VisionModel).

Backs the reference blip_2_training.py / q_former_training.py pipelines
('Salesforce/blip2-opt-2.7b', blip_2_training.py:188-190).

HF parity: class+patch+position embeddings, pre-LN encoder layers with a
PACKED qkv projection (bias carried fully; the EVA k-bias is zero inside
the checkpoint), gelu MLP, post_layernorm on the sequence output.
Defaults are the 2.7b geometry: 39 layers, hidden 1408, heads 16, ffn
6144, patch 14, image 224, LN eps 1e-6.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...kernels import mha_fused, transformer_block
from ...nn import core as nn
from ..text.encoder_common import lin, ln_


@dataclass(frozen=True)
class VisionConfig:
    layers: int = 39
    hidden: int = 1408
    heads: int = 16
    ffn: int = 6144
    patch: int = 14
    image_size: int = 224
    ln_eps: float = 1e-6


def init(key, cfg: VisionConfig, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.layers + 3)
    n_pos = (cfg.image_size // cfg.patch) ** 2 + 1
    params = {
        "class_emb": jax.random.normal(ks[0], (cfg.hidden,), dtype) * 0.02,
        "patch_emb": nn.init_conv(ks[1], cfg.patch, cfg.patch, 3, cfg.hidden,
                                  dtype=dtype, bias=True),
        "pos_emb": jax.random.normal(ks[2], (n_pos, cfg.hidden), dtype) * 0.02,
        "post_ln": nn.init_layernorm(cfg.hidden, dtype),
        "layers": [],
    }
    for i in range(cfg.layers):
        k = jax.random.split(jax.random.fold_in(key, 10 + i), 4)
        params["layers"].append({
            "ln1": nn.init_layernorm(cfg.hidden, dtype),
            "qkv": nn.init_linear(k[0], cfg.hidden, 3 * cfg.hidden, dtype),
            "proj": nn.init_linear(k[1], cfg.hidden, cfg.hidden, dtype),
            "ln2": nn.init_layernorm(cfg.hidden, dtype),
            "fc1": nn.init_linear(k[2], cfg.hidden, cfg.ffn, dtype),
            "fc2": nn.init_linear(k[3], cfg.ffn, cfg.hidden, dtype),
        })
    return params


def _layer(p, x, heads, eps):
    d_model = x.shape[-1]
    ffn = p["fc1"]["w"].shape[1]
    if mha_fused.fused_attention_enabled() \
            and transformer_block.blocks_fit(d_model, ffn):
        # fully fused pre-LN encoder layer (tiny-config tests); the real
        # EVA ViT-g geometry (1408/6144) exceeds VMEM-resident weights, so
        # full size uses the attention-only kernel below
        h = transformer_block.attn_block_trainable(
            x, p["ln1"]["scale"], p["ln1"]["bias"],
            p["qkv"]["w"], p["qkv"]["b"], p["proj"]["w"], p["proj"]["b"],
            heads=heads, eps=eps)
        return transformer_block.mlp_block_trainable(
            h, p["ln2"]["scale"], p["ln2"]["bias"],
            p["fc1"]["w"], p["fc1"]["b"], p["fc2"]["w"], p["fc2"]["b"],
            eps=eps)
    b, n, d = x.shape
    if mha_fused.fused_attention_enabled():
        h = nn.layernorm(p["ln1"], x, eps=eps)
        qkv = nn.linear(p["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        att = mha_fused.mha_trainable(q, k, v, heads=heads)
        x = x + nn.linear(p["proj"], att)
        h = nn.layernorm(p["ln2"], x, eps=eps)
        return x + nn.linear(p["fc2"], nn.gelu(nn.linear(p["fc1"], h)))
    h = nn.layernorm(p["ln1"], x, eps=eps)
    qkv = nn.linear(p["qkv"], h).reshape(b, n, 3, heads, d // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scores = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k,
        preferred_element_type=jnp.float32) / np.sqrt(d // heads)
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    att = jnp.einsum("bhnm,bmhd->bnhd", w, v).reshape(b, n, d)
    x = x + nn.linear(p["proj"], att)
    h = nn.layernorm(p["ln2"], x, eps=eps)
    return x + nn.linear(p["fc2"], nn.gelu(nn.linear(p["fc1"], h)))


def encode(params, pixel_values, cfg: VisionConfig):
    """NHWC fp image -> [B, 257, hidden] (post-layernormed)."""
    b = pixel_values.shape[0]
    h = nn.conv2d(params["patch_emb"], pixel_values, stride=cfg.patch)
    h = h.reshape(b, -1, cfg.hidden)
    cls = jnp.broadcast_to(params["class_emb"].astype(h.dtype),
                           (b, 1, cfg.hidden))
    h = jnp.concatenate([cls, h], axis=1)
    h = h + params["pos_emb"][None, :h.shape[1]].astype(h.dtype)
    for lp in params["layers"]:
        h = _layer(lp, h, cfg.heads, cfg.ln_eps)
    return nn.layernorm(params["post_ln"], h, eps=cfg.ln_eps)


def convert_torch(sd, cfg: VisionConfig):
    """HF keys under vision_model.* (already prefix-stripped)."""
    g = lambda k: jnp.asarray(sd[k])
    params = {
        "class_emb": g("embeddings.class_embedding").reshape(-1),
        "patch_emb": {"w": g("embeddings.patch_embedding.weight").transpose(2, 3, 1, 0),
                      "b": g("embeddings.patch_embedding.bias")},
        "pos_emb": g("embeddings.position_embedding").reshape(
            -1, cfg.hidden),
        "post_ln": ln_(sd, "post_layernorm"),
        "layers": [],
    }
    for i in range(cfg.layers):
        pre = f"encoder.layers.{i}."
        params["layers"].append({
            "ln1": ln_(sd, pre + "layer_norm1"),
            "qkv": lin(sd, pre + "self_attn.qkv"),
            "proj": lin(sd, pre + "self_attn.projection"),
            "ln2": ln_(sd, pre + "layer_norm2"),
            "fc1": lin(sd, pre + "mlp.fc1"),
            "fc2": lin(sd, pre + "mlp.fc2"),
        })
    return params
