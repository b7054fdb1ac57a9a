"""Legacy fusion + spam classifiers (reference CVPR_code/models.py).

Inventory component #17 (SURVEY.md §2): dead code in the reference, kept
for capability completeness:

  * Spam classifiers (:36-90) — DistilBERT / BERT / RoBERTa encoder +
    dropout + Linear head. Functionally identical to our text zoo; exposed
    as thin aliases.
  * ``RobertaAndMBNet`` (:93-330) — RoBERTa + MobileNetV3-Large with
    concat (`forward`) and gated (`forward_gated`) heads over 256-d
    projections.

Latent reference bug documented rather than copied: its forward feeds the
4-class MobileNet OUTPUT logits into a Linear(1280, 256)
(CVPR_code/models.py:207-210 vs :112-115) which cannot run; the intended
graph — the 1280-d hidden after classifier[0]+hardswish — is what we
implement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...nn import core as nn
from ..image import mobilenet_v3 as mb
from ..text import roberta as rb

FC = 256
IMG_HIDDEN = 1280


def init(key, num_classes: int = 4, dtype=jnp.float32):
    ks = jax.random.split(key, 10)
    text_params, _ = rb.init(ks[0], num_classes, dtype)
    text_params.pop("head")
    img_params, img_state = mb.init(ks[1], num_classes, dtype)
    L = lambda k, i, o: nn.init_linear(k, i, o, dtype)
    params = {
        "text": text_params["encoder"],
        "image": img_params,
        "image_to_hidden": L(ks[2], IMG_HIDDEN, FC),
        "text_to_hidden": L(ks[3], 768, FC),
        "concat": L(ks[4], 2 * FC, FC),
        "fc": L(ks[5], FC, num_classes),
        "img_feats_hidden": L(ks[6], IMG_HIDDEN, FC),
        "txt_feats_hidden": L(ks[7], 768, FC),
        "z": L(ks[8], 2 * FC, FC),
        "fc_gated": L(ks[9], FC, num_classes),
    }
    return params, {"image": img_state}


def _towers(params, state, input_ids, attention_mask, images, *, train):
    text = rb.cls_feature(params["text"], input_ids, attention_mask)
    # MobileNetV3 trunk up to the 1280-d hidden (classifier[0] + hardswish)
    p, s = params["image"], state["image"]
    new_state = dict(s)
    h, new_state["stem"] = mb._cna(p["stem"], s["stem"], images, k=3, stride=2,
                                   act=nn.hardswish, train=train)
    blocks_state = []
    for i, r in enumerate(mb.ROWS):
        bp, bs = p["blocks"][i], s["blocks"][i]
        act = nn.hardswish if r.hs else nn.relu
        ns = {}
        inp = h
        y = h
        if "expand" in bp:
            y, ns["expand"] = mb._cna(bp["expand"], bs["expand"], y, k=1,
                                      act=act, train=train)
        y, ns["dw"] = mb._cna(bp["dw"], bs["dw"], y, k=r.kernel, stride=r.stride,
                              groups=r.exp, act=act, train=train)
        if r.se:
            y = mb._se(bp["se"], y)
        y, ns["project"] = mb._cna(bp["project"], bs["project"], y, k=1,
                                   act=None, train=train)
        if r.stride == 1 and inp.shape[-1] == r.out:
            y = y + inp
        h = y
        blocks_state.append(ns)
    new_state["blocks"] = blocks_state
    h, new_state["last"] = mb._cna(p["last"], s["last"], h, k=1,
                                   act=nn.hardswish, train=train)
    img = nn.hardswish(nn.linear(p["fc1"], nn.global_avg_pool(h)))
    return text, img, {"image": new_state}


def forward_concat(params, state, batch, *, train=False, rng=None,
                   drop_ratio: float = 0.6):
    input_ids, attention_mask, images = batch
    text, img, new_state = _towers(params, state, input_ids, attention_mask,
                                   images, train=train)
    h = jnp.concatenate([nn.linear(params["image_to_hidden"], img),
                         nn.linear(params["text_to_hidden"], text)], axis=1)
    h = nn.linear(params["concat"], h)
    h = nn.dropout(rng, h, drop_ratio, train)
    return nn.linear(params["fc"], h), new_state


def forward_gated(params, state, batch, *, train=False, rng=None,
                  drop_ratio: float = 0.6):
    input_ids, attention_mask, images = batch
    text, img, new_state = _towers(params, state, input_ids, attention_mask,
                                   images, train=train)
    it = jnp.tanh(nn.linear(params["img_feats_hidden"], img))
    tt = jnp.tanh(nn.linear(params["txt_feats_hidden"], text))
    cat = jnp.concatenate([nn.linear(params["img_feats_hidden"], img),
                           nn.linear(params["txt_feats_hidden"], text)], axis=1)
    z = jax.nn.softmax(nn.linear(params["z"], cat).astype(jnp.float32),
                       axis=1).astype(cat.dtype)
    gate = z * it + (1 - z) * tt
    gate = nn.dropout(rng, gate, drop_ratio, train)
    return nn.linear(params["fc_gated"], gate), new_state


def convert_torch(sd, num_classes: int = 4):
    """Reference RobertaAndMBNet state dict -> our pytree.

    Keys: text_model.* (HF roberta-base), image_model.* (torchvision
    mobilenet_v3_large incl. its 4-class classifier), plus the fusion
    heads (CVPR_code/models.py:110-137)."""
    from ...checkpoint.torch_convert import subdict

    text = rb.convert_encoder(subdict(sd, "text_model."))
    img_params, img_state = mb.convert_torch(subdict(sd, "image_model."),
                                             num_classes)

    def lin(prefix):
        return {"w": jnp.asarray(sd[prefix + ".weight"]).T,
                "b": jnp.asarray(sd[prefix + ".bias"])}

    params = {
        "text": text,
        "image": img_params,
        "image_to_hidden": lin("image_to_hidden_size"),
        "text_to_hidden": lin("text_to_hidden_size"),
        "concat": lin("concat_layer"),
        "fc": lin("fc_layer"),
        "img_feats_hidden": lin("image_features_hidden_layer"),
        "txt_feats_hidden": lin("text_features_hidden_layer"),
        "z": lin("z_layer"),
        "fc_gated": lin("fc_layer_gated"),
    }
    return params, {"image": img_state}


# spam classifiers (:36-90) are exactly the text zoo classifiers:
from ..text.distilbert import apply as spam_distilbert_apply  # noqa: E402,F401
from ..text.bert import apply as spam_bert_apply  # noqa: E402,F401
from ..text.roberta import apply as spam_roberta_apply  # noqa: E402,F401
