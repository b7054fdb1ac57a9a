"""BART-large encoder-decoder + sequence-classification head.

Capability parity with reference text_models.py:105-131 (``Bart``: frozen
``BartForSequenceClassification`` 'facebook/bart-large' with the
classification head's out_proj replaced by Linear(1024, n)) and the fusion
text tower option (multimodal_model.py:137-144 uses the bare BartModel).

HF semantics reproduced:
  * post-norm transformer, gelu (exact), 12+12 layers, d=1024, 16 heads;
  * learned positional embeddings with the BART +2 offset;
  * layernorm_embedding on both stacks; no embed scaling (bart-large);
  * decoder_input_ids = shift_tokens_right(input_ids, pad=1, start=2) when
    unspecified (HF BartModel default for classification);
  * decoder causal mask only (no decoder padding mask by default) +
    cross-attention over the encoder padding mask;
  * pooling = decoder hidden state at the LAST eos(=2) position of
    input_ids; head = dense(1024) -> tanh -> out_proj.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import core as nn
from ..registry import ModelDef
from .encoder_common import lin, ln_, multi_head_attention, strip_prefix

HIDDEN = 1024
LAYERS = 12
HEADS = 16
FFN = 4096
VOCAB = 50265
MAX_POS = 1024
POS_OFFSET = 2
LN_EPS = 1e-5
PAD_ID = 1
EOS_ID = 2
START_ID = 2
# facebook/bart-large hub config.json: dropout / attention_dropout /
# activation_dropout all 0.1 (the BartConfig DEFAULTS are 0.1/0.0/0.0 —
# the shipped checkpoint overrides them)
DROPOUT = 0.1
ATTN_DROPOUT = 0.1
ACT_DROPOUT = 0.1


def _attn(p, x_q, x_kv, bias, drop=None):
    q = nn.linear(p["q"], x_q)
    k = nn.linear(p["k"], x_kv)
    v = nn.linear(p["v"], x_kv)
    b, lq, d = q.shape
    lk = k.shape[1]
    hd = d // HEADS
    q = q.reshape(b, lq, HEADS, hd)
    k = k.reshape(b, lk, HEADS, hd)
    v = v.reshape(b, lk, HEADS, hd)
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    scores = scores + bias
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    if drop is not None:                  # HF BartAttention probs dropout
        w = drop(w, ATTN_DROPOUT)
    return jnp.einsum("bhnm,bmhd->bnhd", w, v).reshape(b, lq, d)


def _ffn(p, x, drop):
    """fc1 -> gelu -> activation_dropout -> fc2 -> dropout (HF
    Bart{Encoder,Decoder}Layer FFN order)."""
    h = nn.gelu(nn.linear(p["fc1"], x))
    if drop is not None:
        h = drop(h, ACT_DROPOUT)
    h = nn.linear(p["fc2"], h)
    if drop is not None:
        h = drop(h, DROPOUT)
    return h


def _res(p_out, h, drop):
    """attention out-projection + post-attention dropout (pre-residual)."""
    h = nn.linear(p_out, h)
    if drop is not None:
        h = drop(h, DROPOUT)
    return h


def _enc_layer(p, x, bias, drop=None):
    h = _attn(p["self"], x, x, bias, drop=drop)
    x = nn.layernorm(p["ln_self"], x + _res(p["self"]["out"], h, drop),
                     eps=LN_EPS)
    h = _ffn(p, x, drop)
    return nn.layernorm(p["ln_final"], x + h, eps=LN_EPS)


def _dec_layer(p, x, enc, self_bias, cross_bias, drop=None):
    h = _attn(p["self"], x, x, self_bias, drop=drop)
    x = nn.layernorm(p["ln_self"], x + _res(p["self"]["out"], h, drop),
                     eps=LN_EPS)
    h = _attn(p["cross"], x, enc, cross_bias, drop=drop)
    x = nn.layernorm(p["ln_cross"], x + _res(p["cross"]["out"], h, drop),
                     eps=LN_EPS)
    h = _ffn(p, x, drop)
    return nn.layernorm(p["ln_final"], x + h, eps=LN_EPS)


def shift_tokens_right(input_ids: jnp.ndarray) -> jnp.ndarray:
    shifted = jnp.roll(input_ids, 1, axis=1)
    return shifted.at[:, 0].set(START_ID)


def encode_decoder(params, input_ids, attention_mask, drop=None):
    """BartModel forward -> decoder last hidden state [B, L, 1024]."""
    l = input_ids.shape[1]
    shared = params["shared"]["w"]

    # encoder
    h = jnp.take(shared, input_ids, axis=0)
    h = h + params["enc_pos"]["w"][POS_OFFSET:POS_OFFSET + l][None]
    h = nn.layernorm(params["enc_ln_emb"], h, eps=LN_EPS)
    if drop is not None:                 # HF BartEncoder embeddings dropout
        h = drop(h, DROPOUT)
    enc_bias = ((1.0 - attention_mask.astype(jnp.float32))
                * jnp.finfo(jnp.float32).min)[:, None, None, :]
    for lp in params["enc_layers"]:
        h = _enc_layer(lp, h, enc_bias, drop=drop)
    enc_out = h

    # decoder
    dec_ids = shift_tokens_right(input_ids)
    d = jnp.take(shared, dec_ids, axis=0)
    d = d + params["dec_pos"]["w"][POS_OFFSET:POS_OFFSET + l][None]
    d = nn.layernorm(params["dec_ln_emb"], d, eps=LN_EPS)
    if drop is not None:                 # HF BartDecoder embeddings dropout
        d = drop(d, DROPOUT)
    causal = jnp.tril(jnp.ones((l, l), jnp.float32))[None, None]
    self_bias = (1.0 - causal) * jnp.finfo(jnp.float32).min
    for lp in params["dec_layers"]:
        d = _dec_layer(lp, d, enc_out, self_bias, enc_bias, drop=drop)
    return d


def eos_pooled(params, input_ids, attention_mask, drop=None):
    """Decoder hidden state at the LAST eos position of input_ids."""
    h = encode_decoder(params, input_ids, attention_mask, drop=drop)
    is_eos = (input_ids == EOS_ID).astype(jnp.int32)
    pos = jnp.arange(input_ids.shape[1])[None, :]
    last_eos = jnp.max(jnp.where(is_eos == 1, pos, -1), axis=1)
    last_eos = jnp.clip(last_eos, 0, h.shape[1] - 1)
    return h[jnp.arange(h.shape[0]), last_eos]


def apply(params, state, batch, *, train=False, rng=None,
          drop_ratio: float = 0.6, hf_internal_dropout: bool = False):
    # HF BartClassificationHead: dropout -> dense -> tanh -> dropout -> out
    # (reference swaps in its own dropout p at text_models.py:115)
    input_ids, attention_mask = batch
    drop = None
    if hf_internal_dropout and train and rng is not None:
        rng, r_int = jax.random.split(rng)
        drop = nn.HFDropout(r_int)
    pooled = eos_pooled(params, input_ids, attention_mask, drop=drop)
    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    h = nn.dropout(r1, pooled, drop_ratio, train)
    h = jnp.tanh(nn.linear(params["head_dense"], h))
    h = nn.dropout(r2, h, drop_ratio, train)
    return nn.linear(params["head_out"], h), state


def init(key, num_classes: int = 4, dtype=jnp.float32):
    ks = jax.random.split(key, 2 * LAYERS + 6)
    def attn_p(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {"q": nn.init_linear(k1, HIDDEN, HIDDEN, dtype),
                "k": nn.init_linear(k2, HIDDEN, HIDDEN, dtype),
                "v": nn.init_linear(k3, HIDDEN, HIDDEN, dtype),
                "out": nn.init_linear(k4, HIDDEN, HIDDEN, dtype)}
    params = {
        "shared": nn.init_embedding(ks[0], VOCAB, HIDDEN, dtype),
        "enc_pos": nn.init_embedding(ks[1], MAX_POS + POS_OFFSET, HIDDEN, dtype),
        "dec_pos": nn.init_embedding(ks[2], MAX_POS + POS_OFFSET, HIDDEN, dtype),
        "enc_ln_emb": nn.init_layernorm(HIDDEN, dtype),
        "dec_ln_emb": nn.init_layernorm(HIDDEN, dtype),
        "enc_layers": [], "dec_layers": [],
        "head_dense": nn.init_linear(ks[3], HIDDEN, HIDDEN, dtype),
        "head_out": nn.init_linear(ks[4], HIDDEN, num_classes, dtype),
    }
    for i in range(LAYERS):
        k = ks[5 + i]
        k1, k2, k3 = jax.random.split(k, 3)
        params["enc_layers"].append({
            "self": attn_p(k1),
            "ln_self": nn.init_layernorm(HIDDEN, dtype),
            "fc1": nn.init_linear(k2, HIDDEN, FFN, dtype),
            "fc2": nn.init_linear(k3, FFN, HIDDEN, dtype),
            "ln_final": nn.init_layernorm(HIDDEN, dtype),
        })
        k = ks[5 + LAYERS + i]
        k1, k2, k3, k4 = jax.random.split(k, 4)
        params["dec_layers"].append({
            "self": attn_p(k1),
            "ln_self": nn.init_layernorm(HIDDEN, dtype),
            "cross": attn_p(k2),
            "ln_cross": nn.init_layernorm(HIDDEN, dtype),
            "fc1": nn.init_linear(k3, HIDDEN, FFN, dtype),
            "fc2": nn.init_linear(k4, FFN, HIDDEN, dtype),
            "ln_final": nn.init_layernorm(HIDDEN, dtype),
        })
    return params, {}


def _attn_c(sd, pre):
    return {"q": lin(sd, pre + ".q_proj"), "k": lin(sd, pre + ".k_proj"),
            "v": lin(sd, pre + ".v_proj"), "out": lin(sd, pre + ".out_proj")}


def convert_torch(sd, num_classes: int = 4, n_layers: int = None):
    """Accepts BartForSequenceClassification ('model.*' +
    'classification_head.*') or bare BartModel layouts."""
    n_layers = n_layers or LAYERS
    head_dense = head_out = None
    if "classification_head.dense.weight" in sd:
        head_dense = lin(sd, "classification_head.dense")
        head_out = lin(sd, "classification_head.out_proj")
        if head_out["w"].shape[1] != num_classes:
            raise ValueError("head class-count mismatch")
    sd = strip_prefix(sd, "model.", "text_model.")
    params = {
        "shared": {"w": jnp.asarray(sd["shared.weight"])},
        "enc_pos": {"w": jnp.asarray(sd["encoder.embed_positions.weight"])},
        "dec_pos": {"w": jnp.asarray(sd["decoder.embed_positions.weight"])},
        "enc_ln_emb": ln_(sd, "encoder.layernorm_embedding"),
        "dec_ln_emb": ln_(sd, "decoder.layernorm_embedding"),
        "enc_layers": [], "dec_layers": [],
    }
    for i in range(n_layers):
        pre = f"encoder.layers.{i}."
        params["enc_layers"].append({
            "self": _attn_c(sd, pre + "self_attn"),
            "ln_self": ln_(sd, pre + "self_attn_layer_norm"),
            "fc1": lin(sd, pre + "fc1"), "fc2": lin(sd, pre + "fc2"),
            "ln_final": ln_(sd, pre + "final_layer_norm"),
        })
        pre = f"decoder.layers.{i}."
        params["dec_layers"].append({
            "self": _attn_c(sd, pre + "self_attn"),
            "ln_self": ln_(sd, pre + "self_attn_layer_norm"),
            "cross": _attn_c(sd, pre + "encoder_attn"),
            "ln_cross": ln_(sd, pre + "encoder_attn_layer_norm"),
            "fc1": lin(sd, pre + "fc1"), "fc2": lin(sd, pre + "fc2"),
            "ln_final": ln_(sd, pre + "final_layer_norm"),
        })
    if head_dense is not None:
        params["head_dense"] = head_dense
        params["head_out"] = head_out
    # HF ties encoder/decoder embed_tokens to `shared`; state_dict() keeps
    # the duplicate keys — read-and-discard so real checkpoints audit as
    # fully consumed
    for k in ("encoder.embed_tokens.weight", "decoder.embed_tokens.weight"):
        if k in sd:
            sd[k]
    return params, {}


def model_def(name: str = "bart") -> ModelDef:
    return ModelDef(
        name=name, init=init, apply=apply, input_size=(0, 0),
        feature_dim=HIDDEN, convert_torch=convert_torch,
        extras={"max_token_size": MAX_POS, "encode_decoder": encode_decoder},
    )
