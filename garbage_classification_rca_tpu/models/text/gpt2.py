"""GPT-2 (small) causal decoder + sequence-classification head.

Capability parity with reference text_models.py:133-160 (``GPT2``: frozen
``GPT2ForSequenceClassification`` 'gpt2' with the ``score`` head replaced
by Linear(768, n) and pad_token = eos_token).

HF semantics reproduced:
  * pre-norm blocks (ln_1 -> attn -> res, ln_2 -> mlp -> res), final ln_f;
  * Conv1D weights are already [in, out] — no transpose on conversion;
  * gelu_new (tanh approximation) in the MLP;
  * causal mask + padding mask;
  * classification pools the hidden state at the LAST non-pad token:
    sequence_lengths = (input_ids != pad_id).sum(-1) - 1 (HF
    GPT2ForSequenceClassification), ``score`` is bias-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import core as nn
from ..registry import ModelDef
from .encoder_common import strip_prefix

HIDDEN = 768
LAYERS = 12
HEADS = 12
FFN = 3072
VOCAB = 50257
MAX_POS = 1024
LN_EPS = 1e-5
PAD_ID = 50256  # eos (reference text_models.py:138)
# HF gpt2 config: embd_pdrop / attn_pdrop / resid_pdrop
EMBD_PDROP = 0.1
ATTN_PDROP = 0.1
RESID_PDROP = 0.1


def _block(p, x, bias, drop=None):
    """HF-internal dropout sites (GPT2Attention / GPT2MLP): attention
    probs, attention c_proj output (resid), MLP c_proj output (resid)."""
    b, l, d = x.shape
    h = nn.layernorm(p["ln_1"], x, eps=LN_EPS)
    qkv = nn.linear(p["c_attn"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = d // HEADS
    q = q.reshape(b, l, HEADS, hd)
    k = k.reshape(b, l, HEADS, hd)
    v = v.reshape(b, l, HEADS, hd)
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    scores = scores + bias
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    if drop is not None:
        w = drop(w, ATTN_PDROP)
    att = jnp.einsum("bhnm,bmhd->bnhd", w, v).reshape(b, l, d)
    att = nn.linear(p["c_proj"], att)
    if drop is not None:
        att = drop(att, RESID_PDROP)
    x = x + att
    h = nn.layernorm(p["ln_2"], x, eps=LN_EPS)
    h = nn.linear(p["mlp_fc"], h)
    h = nn.gelu(h, approximate=True)        # gelu_new
    h = nn.linear(p["mlp_proj"], h)
    if drop is not None:
        h = drop(h, RESID_PDROP)
    return x + h


def encode(params, input_ids, attention_mask, drop=None):
    """-> last hidden state [B, L, 768] after ln_f."""
    l = input_ids.shape[1]
    h = nn.embedding(params["wte"], input_ids)
    h = h + nn.embedding(params["wpe"], jnp.arange(l)[None, :])
    if drop is not None:
        h = drop(h, EMBD_PDROP)
    causal = jnp.tril(jnp.ones((l, l), jnp.float32))[None, None]
    pad = attention_mask.astype(jnp.float32)[:, None, None, :]
    bias = (1.0 - causal * pad) * jnp.finfo(jnp.float32).min
    for lp in params["layers"]:
        h = _block(lp, h, bias, drop=drop)
    return nn.layernorm(params["ln_f"], h, eps=LN_EPS)


def pooled_feature(params, input_ids, attention_mask, drop=None):
    """Hidden state at the last non-pad token (HF sequence classification)."""
    h = encode(params, input_ids, attention_mask, drop=drop)
    seq_len = jnp.sum((input_ids != PAD_ID).astype(jnp.int32), axis=-1) - 1
    seq_len = jnp.clip(seq_len, 0, h.shape[1] - 1)
    return h[jnp.arange(h.shape[0]), seq_len]


def init(key, num_classes: int = 4, dtype=jnp.float32):
    ks = jax.random.split(key, LAYERS + 3)
    params = {
        "wte": nn.init_embedding(ks[0], VOCAB, HIDDEN, dtype),
        "wpe": nn.init_embedding(ks[1], MAX_POS, HIDDEN, dtype),
        "ln_f": nn.init_layernorm(HIDDEN, dtype),
        "layers": [],
        "score": {"w": nn.init_linear(ks[2], HIDDEN, num_classes, dtype,
                                      bias=False)["w"]},
    }
    for i in range(LAYERS):
        k1, k2, k3, k4 = jax.random.split(ks[3 + i], 4)
        params["layers"].append({
            "ln_1": nn.init_layernorm(HIDDEN, dtype),
            "c_attn": nn.init_linear(k1, HIDDEN, 3 * HIDDEN, dtype),
            "c_proj": nn.init_linear(k2, HIDDEN, HIDDEN, dtype),
            "ln_2": nn.init_layernorm(HIDDEN, dtype),
            "mlp_fc": nn.init_linear(k3, HIDDEN, FFN, dtype),
            "mlp_proj": nn.init_linear(k4, FFN, HIDDEN, dtype),
        })
    return params, {}


def apply(params, state, batch, *, train=False, rng=None,
          hf_internal_dropout: bool = False):
    input_ids, attention_mask = batch
    drop = None
    if hf_internal_dropout and train and rng is not None:
        drop = nn.HFDropout(jax.random.fold_in(rng, 0x4F02))
    pooled = pooled_feature(params, input_ids, attention_mask, drop=drop)
    return jnp.matmul(pooled, params["score"]["w"]), state


def _conv1d(sd, prefix):
    """HF Conv1D stores weight [in, out] — no transpose."""
    return {"w": jnp.asarray(sd[prefix + ".weight"]),
            "b": jnp.asarray(sd[prefix + ".bias"])}


def convert_torch(sd, num_classes: int = 4):
    sd = strip_prefix(sd, "model.")                  # reference wrapper
    score = None
    if "score.weight" in sd:
        w = jnp.asarray(sd["score.weight"]).T
        if w.shape[1] != num_classes:
            raise ValueError("score head class-count mismatch")
        score = {"w": w}
    # strip_prefix drops the score.* keys (they don't carry the prefix)
    # while keeping TrackingDict consumption linked — a plain dict rebuild
    # here would break the every-key-consumed audit's accounting
    sd = strip_prefix(sd, "transformer.")
    from .encoder_common import ln_
    params = {
        "wte": {"w": jnp.asarray(sd["wte.weight"])},
        "wpe": {"w": jnp.asarray(sd["wpe.weight"])},
        "ln_f": ln_(sd, "ln_f"),
        "layers": [],
    }
    for i in range(LAYERS):
        pre = f"h.{i}."
        params["layers"].append({
            "ln_1": ln_(sd, pre + "ln_1"),
            "c_attn": _conv1d(sd, pre + "attn.c_attn"),
            "c_proj": _conv1d(sd, pre + "attn.c_proj"),
            "ln_2": ln_(sd, pre + "ln_2"),
            "mlp_fc": _conv1d(sd, pre + "mlp.c_fc"),
            "mlp_proj": _conv1d(sd, pre + "mlp.c_proj"),
        })
    if score is not None:
        params["score"] = score
    return params, {}


def model_def(name: str = "gpt2") -> ModelDef:
    return ModelDef(
        name=name, init=init, apply=apply, input_size=(0, 0),
        feature_dim=HIDDEN, convert_torch=convert_torch,
        extras={"max_token_size": MAX_POS, "encode": encode},
    )
