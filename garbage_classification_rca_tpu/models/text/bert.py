"""BERT-base encoder + CLS classifier head.

Capability parity with reference text_models.py:74-103 (``Bert``: frozen
``BertModel`` 'bert-base-uncased' + Dropout + Linear(768, n)) and the
fusion text tower option (multimodal_model.py:146-153).

HF layout converted: embeddings.{word,position,token_type}_embeddings +
LayerNorm (eps 1e-12); encoder.layer.{i}.attention.self.{query,key,value},
attention.output.{dense,LayerNorm}, intermediate.dense,
output.{dense,LayerNorm}. The pooler exists in checkpoints but is unused —
the reference pools ``hidden_state[:, 0]`` directly (text_models.py:93-94);
converter ignores pooler keys (unused-key tolerance, SURVEY.md §2 #15).

``encode`` can also return all hidden states — the hierarchical fusion taps
layers 2 and 4 (multimodal_model.py:755-757).
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
LAYERS = 12
HEADS = 12
FFN = 3072
VOCAB = 30522
MAX_POS = 512
TYPE_VOCAB = 2
LN_EPS = 1e-12
# HF bert-base-uncased config: hidden_dropout_prob / attention_probs_
# dropout_prob (active in the reference's train-mode towers)
HIDDEN_DROPOUT = 0.1
ATTN_DROPOUT = 0.1


def init_encoder(key, dtype=jnp.float32):
    ks = jax.random.split(key, LAYERS + 3)
    return {
        "word_emb": nn.init_embedding(ks[0], VOCAB, HIDDEN, dtype),
        "pos_emb": nn.init_embedding(ks[1], MAX_POS, HIDDEN, dtype),
        "type_emb": nn.init_embedding(ks[2], TYPE_VOCAB, HIDDEN, dtype),
        "ln_emb": nn.init_layernorm(HIDDEN, dtype),
        "layers": [init_postnorm_layer(ks[3 + i], HIDDEN, FFN, dtype)
                   for i in range(LAYERS)],
    }


def encode(params, input_ids, attention_mask, *, output_hidden_states=False,
           train=False, drop=None, fused_blocks=True):
    """`drop`: optional nn.HFDropout — HF BERT internal dropout sites:
    embeddings output, attention probs, attention output (BertSelfOutput),
    FFN output (BertOutput)."""
    l = input_ids.shape[1]
    h = nn.embedding(params["word_emb"], input_ids)
    h = h + nn.embedding(params["pos_emb"], jnp.arange(l)[None, :])
    h = h + params["type_emb"]["w"][0][None, None, :]   # token_type_ids = 0
    h = nn.layernorm(params["ln_emb"], h, eps=LN_EPS)
    if drop is not None:
        h = drop(h, HIDDEN_DROPOUT)
    bias = attention_bias(attention_mask)
    hiddens = [h]
    for lp in params["layers"]:
        h = postnorm_layer(lp, h, bias, HEADS, LN_EPS, mask=attention_mask,
                           train=train, drop=drop, attn_p=ATTN_DROPOUT,
                           attn_out_p=HIDDEN_DROPOUT,
                           hidden_p=HIDDEN_DROPOUT,
                           fused_blocks=fused_blocks)
        hiddens.append(h)
    if output_hidden_states:
        return h, hiddens
    return h


def cls_feature(params, input_ids, attention_mask, train=False, drop=None):
    return encode(params, input_ids, attention_mask, train=train,
                  drop=drop)[:, 0]


def init(key, num_classes: int = 4, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"encoder": init_encoder(k1, dtype),
            "head": nn.init_linear(k2, HIDDEN, num_classes, dtype)}, {}


def apply(params, state, batch, *, train=False, rng=None,
          drop_ratio: float = 0.6, hf_internal_dropout: bool = False):
    input_ids, attention_mask = batch
    drop = None
    if hf_internal_dropout and train and rng is not None:
        rng, r_int = jax.random.split(rng)
        drop = nn.HFDropout(r_int)
    pooled = cls_feature(params["encoder"], input_ids, attention_mask,
                         train=train, drop=drop)
    pooled = nn.dropout(rng, pooled, drop_ratio, train)
    return nn.linear(params["head"], pooled), state


def convert_encoder(sd) -> dict:
    sd = strip_prefix(sd, "bert.", "model.", "text_model.")
    p = {
        "word_emb": {"w": jnp.asarray(sd["embeddings.word_embeddings.weight"])},
        "pos_emb": {"w": jnp.asarray(sd["embeddings.position_embeddings.weight"])},
        "type_emb": {"w": jnp.asarray(sd["embeddings.token_type_embeddings.weight"])},
        "ln_emb": ln_(sd, "embeddings.LayerNorm"),
        "layers": [],
    }
    for i in range(LAYERS):
        pre = f"encoder.layer.{i}."
        p["layers"].append({
            "q": lin(sd, pre + "attention.self.query"),
            "k": lin(sd, pre + "attention.self.key"),
            "v": lin(sd, pre + "attention.self.value"),
            "out": lin(sd, pre + "attention.output.dense"),
            "ln_att": ln_(sd, pre + "attention.output.LayerNorm"),
            "fc1": lin(sd, pre + "intermediate.dense"),
            "fc2": lin(sd, pre + "output.dense"),
            "ln_ffn": ln_(sd, pre + "output.LayerNorm"),
        })
    # BertModel ships a pooler, but the reference pools the raw CLS hidden
    # state (text_models.py:91-97 `hidden_state[:, 0]`) — read-and-discard
    # so real checkpoints audit as fully consumed
    for k in ("pooler.dense.weight", "pooler.dense.bias"):
        if k in sd:
            sd[k]
    return p


def convert_torch(sd, num_classes: int = 4):
    params = {"encoder": convert_encoder(sd)}
    if "out.weight" in sd:
        head = lin(sd, "out")
        if head["w"].shape[1] != num_classes:
            raise ValueError("head class-count mismatch")
        params["head"] = head
    return params, {}


def model_def(name: str = "bert") -> ModelDef:
    return ModelDef(
        name=name, init=init, apply=apply, input_size=(0, 0),
        feature_dim=HIDDEN, convert_torch=convert_torch,
        extras={"max_token_size": MAX_POS, "encode": encode,
                "cls_feature": cls_feature,
                "convert_encoder": convert_encoder},
    )
