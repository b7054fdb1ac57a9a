"""DistilBERT encoder + CLS classifier head.

Capability parity with reference text_models.py:9-41 (``DistilBert``:
frozen ``DistilBertModel`` 'distilbert-base-uncased' + Dropout +
``Linear(768, n_classes)`` on the CLS token) and the fusion text tower
(multimodal_model.py:128-135).

Architecture (HF modeling_distilbert): word+position embeddings ->
LayerNorm(eps 1e-12) -> 6 post-norm layers (12 heads, GELU FFN 3072).

Converter maps HF keys ``embeddings.*``, ``transformer.layer.{i}.
{attention.{q,k,v,out}_lin, sa_layer_norm, ffn.lin{1,2},
output_layer_norm}`` (+ optional ``model.`` / ``text_model.`` /
``distilbert.`` wrappers and the head's ``out.{weight,bias}``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...nn import core as nn
from ..registry import ModelDef
from .encoder_common import (attention_bias, init_postnorm_layer, lin, ln_,
                             postnorm_layer, strip_prefix)

HIDDEN = 768
LAYERS = 6
HEADS = 12
FFN = 3072
VOCAB = 30522
MAX_POS = 512
LN_EPS = 1e-12
# HF distilbert-base-uncased config: dropout / attention_dropout — active
# in the reference's train-mode towers (--hf_internal_dropout reproduces)
DROPOUT = 0.1
ATTN_DROPOUT = 0.1


def init_encoder(key, dtype=jnp.float32):
    ks = jax.random.split(key, LAYERS + 2)
    return {
        "word_emb": nn.init_embedding(ks[0], VOCAB, HIDDEN, dtype),
        "pos_emb": nn.init_embedding(ks[1], MAX_POS, HIDDEN, dtype),
        "ln_emb": nn.init_layernorm(HIDDEN, dtype),
        "layers": [init_postnorm_layer(ks[2 + i], HIDDEN, FFN, dtype)
                   for i in range(LAYERS)],
    }


def encode(params, input_ids, attention_mask, train=False, drop=None,
           fused_blocks=True):
    """-> last_hidden_state [B, L, 768] (HF output[0] parity).

    `drop`: optional nn.HFDropout reproducing HF DistilBERT's internal
    train-mode dropout — embeddings output, attention probs, FFN output
    (modeling_distilbert has NO attention-output dropout site)."""
    l = input_ids.shape[1]
    h = nn.embedding(params["word_emb"], input_ids)
    pos = jnp.arange(l)[None, :]
    h = h + nn.embedding(params["pos_emb"], pos)
    h = nn.layernorm(params["ln_emb"], h, eps=LN_EPS)
    if drop is not None:
        h = drop(h, DROPOUT)
    bias = attention_bias(attention_mask)
    for lp in params["layers"]:
        h = postnorm_layer(lp, h, bias, HEADS, LN_EPS, mask=attention_mask,
                           train=train, drop=drop, attn_p=ATTN_DROPOUT,
                           hidden_p=DROPOUT, fused_blocks=fused_blocks)
    return h


def cls_feature(params, input_ids, attention_mask, train=False, drop=None):
    """hidden_state[:, 0] — reference text_models.py:30-31."""
    return encode(params, input_ids, attention_mask, train=train,
                  drop=drop)[:, 0]


def init(key, num_classes: int = 4, dtype=jnp.float32, drop_ratio: float = 0.6):
    k1, k2 = jax.random.split(key)
    params = {
        "encoder": init_encoder(k1, dtype),
        "head": nn.init_linear(k2, HIDDEN, num_classes, dtype),
    }
    return params, {}


def apply(params, state, batch, *, train: bool = False,
          rng: Optional[jax.Array] = None, drop_ratio: float = 0.6,
          hf_internal_dropout: bool = False):
    input_ids, attention_mask = batch
    drop = None
    if hf_internal_dropout and train and rng is not None:
        # reference text_models.py:23-34 keeps the frozen tower in train
        # mode, so HF-internal p=0.1 dropout is active during training
        rng, r_int = jax.random.split(rng)
        drop = nn.HFDropout(r_int)
    pooled = cls_feature(params["encoder"], input_ids, attention_mask,
                         train=train, drop=drop)
    pooled = nn.dropout(rng, pooled, drop_ratio, train)
    return nn.linear(params["head"], pooled), state


# ---------------------------------------------------------------------------
# HF/.pth conversion
# ---------------------------------------------------------------------------


def convert_encoder(sd) -> dict:
    sd = strip_prefix(sd, "distilbert.", "model.", "text_model.")
    p = {
        "word_emb": {"w": jnp.asarray(sd["embeddings.word_embeddings.weight"])},
        "pos_emb": {"w": jnp.asarray(sd["embeddings.position_embeddings.weight"])},
        "ln_emb": ln_(sd, "embeddings.LayerNorm"),
        "layers": [],
    }
    for i in range(LAYERS):
        pre = f"transformer.layer.{i}."
        p["layers"].append({
            "q": lin(sd, pre + "attention.q_lin"),
            "k": lin(sd, pre + "attention.k_lin"),
            "v": lin(sd, pre + "attention.v_lin"),
            "out": lin(sd, pre + "attention.out_lin"),
            "ln_att": ln_(sd, pre + "sa_layer_norm"),
            "fc1": lin(sd, pre + "ffn.lin1"),
            "fc2": lin(sd, pre + "ffn.lin2"),
            "ln_ffn": ln_(sd, pre + "output_layer_norm"),
        })
    return p


def convert_torch(sd, num_classes: int = 4):
    """Full reference DistilBert classifier .pth -> (params, state)."""
    head = lin(sd, "out") if "out.weight" in sd else None
    params = {"encoder": convert_encoder(sd)}
    if head is not None:
        if head["w"].shape[1] != num_classes:
            raise ValueError("head class-count mismatch")
        params["head"] = head
    return params, {}


def model_def(name: str = "distilbert") -> ModelDef:
    return ModelDef(
        name=name, init=init, apply=apply, input_size=(0, 0),
        feature_dim=HIDDEN, convert_torch=convert_torch,
        extras={"max_token_size": MAX_POS, "encode": encode,
                "cls_feature": cls_feature,
                "convert_encoder": convert_encoder},
    )
