"""RoBERTa-base encoder + CLS classifier head.

Capability parity with reference text_models.py:43-72 (``Roberta``: frozen
``RobertaModel`` 'roberta-base' + Dropout + Linear(768, n) on <s>).

Same block math as BERT; differences handled here:
  * position ids are offset past padding_idx=1 and computed from the
    attention mask (HF create_position_ids_from_input_ids):
    pos = cumsum(mask)*mask + 1
  * vocab 50265, max positions 514.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...nn import core as nn
from ..registry import ModelDef
from .encoder_common import attention_bias, lin, ln_, postnorm_layer, strip_prefix
from . import bert as _bert

HIDDEN = 768
LAYERS = 12
HEADS = 12
VOCAB = 50265
MAX_POS = 514
LN_EPS = 1e-12
PAD_IDX = 1
# HF roberta-base config: hidden_dropout_prob / attention_probs_dropout_prob
HIDDEN_DROPOUT = 0.1
ATTN_DROPOUT = 0.1


def encode(params, input_ids, attention_mask, train=False, drop=None,
           fused_blocks=True):
    mask = attention_mask.astype(jnp.int32)
    pos_ids = jnp.cumsum(mask, axis=1) * mask + PAD_IDX
    h = nn.embedding(params["word_emb"], input_ids)
    h = h + nn.embedding(params["pos_emb"], pos_ids)
    h = h + params["type_emb"]["w"][0][None, None, :]
    h = nn.layernorm(params["ln_emb"], h, eps=LN_EPS)
    if drop is not None:                 # same BERT-layout sites
        h = drop(h, HIDDEN_DROPOUT)
    bias = attention_bias(attention_mask)
    for lp in params["layers"]:
        h = postnorm_layer(lp, h, bias, HEADS, LN_EPS, mask=attention_mask,
                           train=train, drop=drop, attn_p=ATTN_DROPOUT,
                           attn_out_p=HIDDEN_DROPOUT,
                           hidden_p=HIDDEN_DROPOUT,
                           fused_blocks=fused_blocks)
    return h


def cls_feature(params, input_ids, attention_mask, train=False, drop=None):
    return encode(params, input_ids, attention_mask, train=train,
                  drop=drop)[:, 0]


def init(key, num_classes: int = 4, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    enc = _bert.init_encoder(k1, dtype)
    enc["word_emb"] = nn.init_embedding(k1, VOCAB, HIDDEN, dtype)
    enc["pos_emb"] = nn.init_embedding(k1, MAX_POS, HIDDEN, dtype)
    enc["type_emb"] = nn.init_embedding(k1, 1, HIDDEN, dtype)
    return {"encoder": enc,
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
    sd = strip_prefix(sd, "roberta.", "model.", "text_model.")
    # identical intra-layer layout to BERT
    return _bert.convert_encoder(sd)


def convert_torch(sd, num_classes: int = 4):
    params = {"encoder": convert_encoder(sd)}
    if "out.weight" in sd:
        head = lin(sd, "out")
        if head["w"].shape[1] != num_classes:
            raise ValueError("head class-count mismatch")
        params["head"] = head
    return params, {}


def model_def(name: str = "roberta") -> ModelDef:
    return ModelDef(
        name=name, init=init, apply=apply, input_size=(0, 0),
        feature_dim=HIDDEN, convert_torch=convert_torch,
        extras={"max_token_size": MAX_POS, "encode": encode,
                "cls_feature": cls_feature,
                "convert_encoder": convert_encoder},
    )
