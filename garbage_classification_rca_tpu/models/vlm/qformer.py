"""BLIP-2 Q-Former (image-grounded feature extractor path).

32 learned query tokens attend to the frozen vision states: BERT-style
self-attention every layer, cross-attention to image embeds every
``cross_frequency`` layers (=2 for blip2-opt-2.7b), query-specific FFN
(intermediate_query/output_query). LN eps 1e-12.

The reference taps ``qformer_outputs.last_hidden_state[:, 0, :]`` as the
classifier feature (q_former_training.py:289-291); generation projects all
32 outputs into the LM (blip2.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import core as nn
from ..text.encoder_common import lin, ln_

LN_EPS = 1e-12
# Salesforce/blip2-opt-2.7b qformer config: hidden_dropout_prob /
# attention_probs_dropout_prob (modeling_blip_2 Blip2QFormer*) — active
# only when an nn.HFDropout is threaded in (--hf_internal_dropout)
HIDDEN_DROPOUT = 0.1
ATTN_DROPOUT = 0.1


@dataclass(frozen=True)
class QFormerConfig:
    layers: int = 12
    hidden: int = 768
    heads: int = 12
    ffn: int = 3072
    n_query: int = 32
    cross_frequency: int = 2
    vision_hidden: int = 1408


def init(key, cfg: QFormerConfig, dtype=jnp.float32):
    params = {
        "query_tokens": jax.random.normal(
            key, (cfg.n_query, cfg.hidden), dtype) * 0.02,
        "ln_emb": nn.init_layernorm(cfg.hidden, dtype),
        "layers": [],
    }
    for i in range(cfg.layers):
        k = jax.random.split(jax.random.fold_in(key, 10 + i), 8)
        layer = {
            "att": {"q": nn.init_linear(k[0], cfg.hidden, cfg.hidden, dtype),
                    "k": nn.init_linear(k[1], cfg.hidden, cfg.hidden, dtype),
                    "v": nn.init_linear(k[2], cfg.hidden, cfg.hidden, dtype),
                    "out": nn.init_linear(k[3], cfg.hidden, cfg.hidden, dtype),
                    "ln": nn.init_layernorm(cfg.hidden, dtype)},
            "fc1_q": nn.init_linear(k[4], cfg.hidden, cfg.ffn, dtype),
            "fc2_q": nn.init_linear(k[5], cfg.ffn, cfg.hidden, dtype),
            "ln_ffn_q": nn.init_layernorm(cfg.hidden, dtype),
        }
        if i % cfg.cross_frequency == 0:
            layer["cross"] = {
                "q": nn.init_linear(k[6], cfg.hidden, cfg.hidden, dtype),
                "k": nn.init_linear(k[7], cfg.vision_hidden, cfg.hidden, dtype),
                "v": nn.init_linear(jax.random.fold_in(k[7], 1),
                                    cfg.vision_hidden, cfg.hidden, dtype),
                "out": nn.init_linear(jax.random.fold_in(k[7], 2),
                                      cfg.hidden, cfg.hidden, dtype),
                "ln": nn.init_layernorm(cfg.hidden, dtype),
            }
        params["layers"].append(layer)
    return params


def _mha(p, x_q, x_kv, heads, drop=None):
    """HF Blip2QFormer{Self,Cross}Attention + SelfOutput: dropout on the
    attention probs and on the out-projection pre-residual (both p=0.1,
    active only with an nn.HFDropout)."""
    b, nq, d = x_q.shape[0], x_q.shape[1], p["q"]["w"].shape[1]
    nk = x_kv.shape[1]
    hd = d // heads
    q = nn.linear(p["q"], x_q).reshape(b, nq, heads, hd)
    k = nn.linear(p["k"], x_kv).reshape(b, nk, heads, hd)
    v = nn.linear(p["v"], x_kv).reshape(b, nk, heads, hd)
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    if drop is not None:
        w = drop(w, ATTN_DROPOUT)
    att = jnp.einsum("bhnm,bmhd->bnhd", w, v).reshape(b, nq, d)
    att = nn.linear(p["out"], att)
    if drop is not None:
        att = drop(att, HIDDEN_DROPOUT)
    return nn.layernorm(p["ln"], x_q + att, eps=LN_EPS)


def encode(params, image_embeds, cfg: QFormerConfig, drop=None):
    """image_embeds [B, 257, vision_hidden] -> query outputs [B, 32, 768].

    HF-internal dropout sites (Blip2QFormerModel, --hf_internal_dropout):
    embeddings output post-LN, then per layer self-attn probs/out,
    cross-attn probs/out (every cross_frequency layers), FFN output."""
    b = image_embeds.shape[0]
    h = jnp.broadcast_to(params["query_tokens"].astype(image_embeds.dtype),
                         (b, cfg.n_query, cfg.hidden))
    h = nn.layernorm(params["ln_emb"], h, eps=LN_EPS)
    if drop is not None:
        h = drop(h, HIDDEN_DROPOUT)
    for lp in params["layers"]:
        h = _mha(lp["att"], h, h, cfg.heads, drop=drop)
        if "cross" in lp:
            h = _mha(lp["cross"], h, image_embeds, cfg.heads, drop=drop)
        ff = nn.linear(lp["fc2_q"], nn.gelu(nn.linear(lp["fc1_q"], h)))
        if drop is not None:
            ff = drop(ff, HIDDEN_DROPOUT)
        h = nn.layernorm(lp["ln_ffn_q"], h + ff, eps=LN_EPS)
    return h


def convert_torch(sd, cfg: QFormerConfig, query_tokens):
    """HF keys under qformer.* (prefix-stripped) + the top-level
    query_tokens tensor [1, 32, 768]."""
    params = {
        "query_tokens": jnp.asarray(query_tokens).reshape(cfg.n_query,
                                                          cfg.hidden),
        "ln_emb": ln_(sd, "layernorm"),
        "layers": [],
    }
    for i in range(cfg.layers):
        pre = f"encoder.layer.{i}."
        layer = {
            "att": {"q": lin(sd, pre + "attention.attention.query"),
                    "k": lin(sd, pre + "attention.attention.key"),
                    "v": lin(sd, pre + "attention.attention.value"),
                    "out": lin(sd, pre + "attention.output.dense"),
                    "ln": ln_(sd, pre + "attention.output.LayerNorm")},
            "fc1_q": lin(sd, pre + "intermediate_query.dense"),
            "fc2_q": lin(sd, pre + "output_query.dense"),
            "ln_ffn_q": ln_(sd, pre + "output_query.LayerNorm"),
        }
        if i % cfg.cross_frequency == 0:
            layer["cross"] = {
                "q": lin(sd, pre + "crossattention.attention.query"),
                "k": lin(sd, pre + "crossattention.attention.key"),
                "v": lin(sd, pre + "crossattention.attention.value"),
                "out": lin(sd, pre + "crossattention.output.dense"),
                "ln": ln_(sd, pre + "crossattention.output.LayerNorm"),
            }
        params["layers"].append(layer)
    return params
