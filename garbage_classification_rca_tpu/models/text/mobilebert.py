"""MobileBERT + classification head.

Capability parity with reference text_models.py:162-188 (``MobileBERT``:
frozen ``MobileBertForSequenceClassification`` 'google/mobilebert-uncased'
with the classifier replaced by Linear(512, n)).

HF modeling_mobilebert semantics reproduced (the uncased config):
  * trigram input embeddings: cat(shift-left, self, shift-right) of the
    128-d word embeddings -> Linear(384 -> 512);
  * NoNorm (y = x*scale + bias) everywhere instead of LayerNorm;
  * 24 bottleneck layers: query/key from a shared 512->128 bottleneck,
    value from the raw 512 hidden, residual target = 128-d bottleneck
    input; 4 heads over 128; 3 stacked FFNs (relu, 128->512->128) after
    attention; final intermediate/output + 128->512 output bottleneck with
    residual to the 512 stream;
  * classifier pools token 0 (classifier_activation=False -> pooler is
    identity) -> dropout -> Linear(512, n).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import core as nn
from ..registry import ModelDef
from .encoder_common import lin, strip_prefix

HIDDEN = 512
EMB = 128
INTRA = 128          # intra_bottleneck_size (true hidden size)
LAYERS = 24
HEADS = 4
FFN = 512
N_FFN = 3            # extra ffn modules (num_feedforward_networks=4)
VOCAB = 30522
MAX_POS = 512
# google/mobilebert-uncased config: hidden_dropout_prob=0.0 (distillation
# recipe), attention_probs_dropout_prob=0.1 — so the ONLY active
# HF-internal train-mode dropout site is the attention probs
ATTN_DROPOUT = 0.1


def nonorm(p, x):
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _self_attention(p, q_in, k_in, v_in, layer_input, bias, drop=None):
    q = nn.linear(p["q"], q_in)
    k = nn.linear(p["k"], k_in)
    v = nn.linear(p["v"], v_in)
    b, l, d = q.shape
    hd = d // HEADS
    scores = jnp.einsum("bnhd,bmhd->bhnm",
                        q.reshape(b, l, HEADS, hd),
                        k.reshape(b, l, HEADS, hd),
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    w = jax.nn.softmax(scores + bias, axis=-1).astype(v.dtype)
    if drop is not None:
        w = drop(w, ATTN_DROPOUT)
    att = jnp.einsum("bhnm,bmhd->bnhd", w,
                     v.reshape(b, l, HEADS, hd)).reshape(b, l, d)
    return nonorm(p["out_norm"], nn.linear(p["out"], att) + layer_input)


def _layer(p, hidden, bias, drop=None):
    bottleneck = nonorm(p["bn_in_norm"], nn.linear(p["bn_in"], hidden))
    shared_qk = nonorm(p["bn_att_norm"], nn.linear(p["bn_att"], hidden))
    att = _self_attention(p["att"], shared_qk, shared_qk, hidden,
                          bottleneck, bias, drop=drop)
    for f in p["ffn"]:
        h = jax.nn.relu(nn.linear(f["fc1"], att))
        att = nonorm(f["norm"], nn.linear(f["fc2"], h) + att)
    inter = jax.nn.relu(nn.linear(p["intermediate"], att))
    out = nonorm(p["out_norm"], nn.linear(p["out_dense"], inter) + att)
    out = nn.linear(p["bn_out"], out)
    return nonorm(p["bn_out_norm"], out + hidden)


def encode(params, input_ids, attention_mask, drop=None):
    emb = nn.embedding(params["word_emb"], input_ids)       # [B, L, 128]
    left = jnp.pad(emb[:, 1:], ((0, 0), (0, 1), (0, 0)))
    right = jnp.pad(emb[:, :-1], ((0, 0), (1, 0), (0, 0)))
    tri = jnp.concatenate([left, emb, right], axis=2)       # [B, L, 384]
    h = nn.linear(params["emb_transform"], tri)
    l = input_ids.shape[1]
    h = h + nn.embedding(params["pos_emb"], jnp.arange(l)[None, :])
    h = h + params["type_emb"]["w"][0][None, None, :]
    h = nonorm(params["emb_norm"], h)
    bias = ((1.0 - attention_mask.astype(jnp.float32))
            * jnp.finfo(jnp.float32).min)[:, None, None, :]
    for lp in params["layers"]:
        h = _layer(lp, h, bias, drop=drop)
    return h


def apply(params, state, batch, *, train=False, rng=None,
          drop_ratio: float = 0.0, hf_internal_dropout: bool = False):
    input_ids, attention_mask = batch
    drop = None
    if hf_internal_dropout and train and rng is not None:
        rng, r_int = jax.random.split(rng)
        drop = nn.HFDropout(r_int)
    pooled = encode(params, input_ids, attention_mask, drop=drop)[:, 0]
    # MobileBertPooler: tanh(dense(.)) when classifier_activation=True,
    # identity otherwise (google/mobilebert-uncased ships False)
    if "pooler" in params:
        pooled = jnp.tanh(nn.linear(params["pooler"], pooled))
    pooled = nn.dropout(rng, pooled, drop_ratio, train)
    return nn.linear(params["classifier"], pooled), state


def init(key, num_classes: int = 4, dtype=jnp.float32):
    ks = jax.random.split(key, LAYERS + 5)
    params = {
        "word_emb": nn.init_embedding(ks[0], VOCAB, EMB, dtype),
        "emb_transform": nn.init_linear(ks[1], 3 * EMB, HIDDEN, dtype),
        "pos_emb": nn.init_embedding(ks[2], MAX_POS, HIDDEN, dtype),
        "type_emb": nn.init_embedding(ks[3], 2, HIDDEN, dtype),
        "emb_norm": {"scale": jnp.ones((HIDDEN,), dtype),
                     "bias": jnp.zeros((HIDDEN,), dtype)},
        "layers": [],
        "classifier": nn.init_linear(ks[4], HIDDEN, num_classes, dtype),
    }
    def nn_p():
        return {"scale": jnp.ones((INTRA,), dtype),
                "bias": jnp.zeros((INTRA,), dtype)}
    for i in range(LAYERS):
        k = jax.random.split(jax.random.fold_in(key, 100 + i), 12)
        params["layers"].append({
            "bn_in": nn.init_linear(k[0], HIDDEN, INTRA, dtype),
            "bn_in_norm": nn_p(),
            "bn_att": nn.init_linear(k[1], HIDDEN, INTRA, dtype),
            "bn_att_norm": nn_p(),
            "att": {"q": nn.init_linear(k[2], INTRA, INTRA, dtype),
                    "k": nn.init_linear(k[3], INTRA, INTRA, dtype),
                    "v": nn.init_linear(k[4], HIDDEN, INTRA, dtype),
                    "out": nn.init_linear(k[5], INTRA, INTRA, dtype),
                    "out_norm": nn_p()},
            "ffn": [{"fc1": nn.init_linear(jax.random.fold_in(k[6], j), INTRA, FFN, dtype),
                     "fc2": nn.init_linear(jax.random.fold_in(k[7], j), FFN, INTRA, dtype),
                     "norm": nn_p()} for j in range(N_FFN)],
            "intermediate": nn.init_linear(k[8], INTRA, FFN, dtype),
            "out_dense": nn.init_linear(k[9], FFN, INTRA, dtype),
            "out_norm": nn_p(),
            "bn_out": nn.init_linear(k[10], INTRA, HIDDEN, dtype),
            "bn_out_norm": {"scale": jnp.ones((HIDDEN,), dtype),
                            "bias": jnp.zeros((HIDDEN,), dtype)},
        })
    return params, {}


def _nonorm_c(sd, pre):
    return {"scale": jnp.asarray(sd[pre + ".weight"]),
            "bias": jnp.asarray(sd[pre + ".bias"])}


def convert_torch(sd, num_classes: int = 4, n_layers: int = None):
    n_layers = n_layers or LAYERS
    sd = strip_prefix(sd, "model.") if any(
        k.startswith("model.") for k in sd) else sd
    classifier = pooler = None
    if "classifier.weight" in sd:
        classifier = lin(sd, "classifier")
        if classifier["w"].shape[1] != num_classes:
            raise ValueError("classifier class-count mismatch")
    if "mobilebert.pooler.dense.weight" in sd or "pooler.dense.weight" in sd:
        pooler = lin(sd, "mobilebert.pooler.dense"
                     if "mobilebert.pooler.dense.weight" in sd
                     else "pooler.dense")
    sd = strip_prefix(sd, "mobilebert.")
    params = {
        "word_emb": {"w": jnp.asarray(sd["embeddings.word_embeddings.weight"])},
        "emb_transform": lin(sd, "embeddings.embedding_transformation"),
        "pos_emb": {"w": jnp.asarray(sd["embeddings.position_embeddings.weight"])},
        "type_emb": {"w": jnp.asarray(sd["embeddings.token_type_embeddings.weight"])},
        "emb_norm": _nonorm_c(sd, "embeddings.LayerNorm"),
        "layers": [],
    }
    for i in range(n_layers):
        pre = f"encoder.layer.{i}."
        params["layers"].append({
            "bn_in": lin(sd, pre + "bottleneck.input.dense"),
            "bn_in_norm": _nonorm_c(sd, pre + "bottleneck.input.LayerNorm"),
            "bn_att": lin(sd, pre + "bottleneck.attention.dense"),
            "bn_att_norm": _nonorm_c(sd, pre + "bottleneck.attention.LayerNorm"),
            "att": {"q": lin(sd, pre + "attention.self.query"),
                    "k": lin(sd, pre + "attention.self.key"),
                    "v": lin(sd, pre + "attention.self.value"),
                    "out": lin(sd, pre + "attention.output.dense"),
                    "out_norm": _nonorm_c(sd, pre + "attention.output.LayerNorm")},
            "ffn": [{"fc1": lin(sd, pre + f"ffn.{j}.intermediate.dense"),
                     "fc2": lin(sd, pre + f"ffn.{j}.output.dense"),
                     "norm": _nonorm_c(sd, pre + f"ffn.{j}.output.LayerNorm")}
                    for j in range(N_FFN)],
            "intermediate": lin(sd, pre + "intermediate.dense"),
            "out_dense": lin(sd, pre + "output.dense"),
            "out_norm": _nonorm_c(sd, pre + "output.LayerNorm"),
            "bn_out": lin(sd, pre + "output.bottleneck.dense"),
            "bn_out_norm": _nonorm_c(sd, pre + "output.bottleneck.LayerNorm"),
        })
    if classifier is not None:
        params["classifier"] = classifier
    if pooler is not None:
        params["pooler"] = pooler
    return params, {}


def model_def(name: str = "mobilebert") -> ModelDef:
    return ModelDef(
        name=name, init=init, apply=apply, input_size=(0, 0),
        feature_dim=HIDDEN, convert_torch=convert_torch,
        extras={"max_token_size": MAX_POS, "encode": encode},
    )
