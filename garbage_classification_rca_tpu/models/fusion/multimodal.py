"""Multimodal late-fusion family — all 7 strategies of the reference.

Re-implements CVPR_code/multimodal_model.py:156-888 TPU-first:

  * towers: EfficientNetV2-M multi-stage extractor (stem+stage1..6+final
    conv, NO classifier linear — reference :113-126 keeps only the dropout)
    + a text encoder (distilbert | bert | bart, reference :178-186);
  * ALL fusion heads are built regardless of strategy — reference __init__
    builds every head (:199-328), so checkpoint state_dicts contain every
    head's params and load into any strategy (SURVEY.md §2 #15);
  * strategies (forward overrides :489-888): gated, classic, normalized,
    clip, MM_RCA, hierarchical, bimodal;
  * constructor-arity defects of main_both.py:272-343 fixed: every knob is
    a keyword field of FusionConfig with a default;
  * modality dropout (:420-455) as explicit masking — train: per-batch coin
    at image_text_dropout then image-vs-text at image_prob_dropout, from
    the step rng (the reference uses host numpy RNG); eval: forced
    remove_image / remove_text flags. Zeroed text = input_ids and
    attention_mask all zero (the reference's Dropout1d(p=1) on int tensors);
  * bimodal GRU quirk preserved: the reference feeds 2-D [B, 400] tensors
    to batch_first GRUs, which torch treats as UNBATCHED sequences of
    length B — i.e. the GRU scans across the batch. Reproduced exactly
    (documented defect, multimodal_model.py:869-880).

The MM-RCA block (reshape-to-patches -> self-attn x2 -> reverse cross-attn
x2) runs through ops.attention (pure-JAX) or the fused Pallas kernel
(kernels.rca_fused) when enabled.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import LATE_FUSION_STRATEGIES
from ...nn import core as nn
from ...ops import attention as att
from ..image import efficientnet_v2 as effv2
from ..image import efficientnet_common as eff
from ..text import bart as bart_mod
from ..text import bert as bert_mod
from ..text import distilbert as distil_mod

# single source of truth in config.py (dependency-free leaf), re-exported
# here for the model-level API
FUSION_STRATEGIES = LATE_FUSION_STRATEGIES

# attention geometry — reference multimodal_model.py:249-264
NUM_PATCHES = 16
SA_HIDDEN = 128
SA_OUT = 96
CA_HIDDEN = 64
CA_OUT = 48
IMG_FEAT = 1280
GATED_HIDDEN = 256

# bimodal GRU head — reference :300-328
MODALITY_DIM = 400
BIMODAL_HIDDEN = 500
BIMODAL_PROJ = 450


@dataclass(frozen=True)
class FusionConfig:
    strategy: str = "MM_RCA"
    text_model_name: str = "distilbert"
    num_classes: int = 4
    drop_ratio: float = 0.6                  # --model_dropout
    image_or_text_dropout_chance: float = 0.33   # --image_text_dropout
    img_prob_dropout: float = 0.7            # --image_prob_dropout
    num_neurons_fc: int = 256                # --num_neurons_FC
    batch_size: int = 16                     # CLIP head only
    reverse: bool = False                    # --reverse
    features_only: bool = False              # --features_only
    cross_attention_only: bool = False       # --cross_attention_only
    use_pallas_rca: bool = False
    # --hf_internal_dropout: reference main_both keeps the frozen HF text
    # tower in train() mode, so its internal p=0.1 dropout regularizes
    # training (PARITY.md); opt-in here, eval unaffected
    hf_internal_dropout: bool = False

    @property
    def text_hidden(self) -> int:
        return 1024 if self.text_model_name == "bart" else 768

    @property
    def txt_patch(self) -> int:
        return 768 // NUM_PATCHES

    @property
    def img_patch(self) -> int:
        return IMG_FEAT // NUM_PATCHES


_TEXT_MODS = {"distilbert": distil_mod, "bert": bert_mod, "bart": bart_mod}


def _text_encode(cfg: FusionConfig, params, input_ids, attention_mask,
                 need_hiddens: bool = False, train: bool = False,
                 drop=None):
    """-> (cls_features [B, hid], hidden_states list or None).

    `drop`: optional nn.HFDropout threaded into the tower's HF-internal
    dropout sites (--hf_internal_dropout)."""
    if cfg.text_model_name == "distilbert":
        if need_hiddens:
            h, hiddens = _distil_encode_hiddens(params, input_ids,
                                                attention_mask, train=train,
                                                drop=drop)
            return h[:, 0], hiddens
        # fused_blocks=False: inside the fusion graph the text tower's
        # matmuls are co-scheduled with the (data-independent) EffNetV2-M
        # conv stream by XLA; opaque pallas text blocks serialize against
        # it and measured 4.5% SLOWER end-to-end at bs128 despite being
        # 28% faster standalone (v5e 2026-08-20, DESIGN.md)
        return distil_mod.encode(params, input_ids, attention_mask,
                                 train=train, drop=drop,
                                 fused_blocks=False)[:, 0], None
    if cfg.text_model_name == "bert":
        if need_hiddens:
            h, hiddens = bert_mod.encode(params, input_ids, attention_mask,
                                         output_hidden_states=True,
                                         train=train, drop=drop,
                                         fused_blocks=False)
            return h[:, 0], hiddens
        return bert_mod.encode(params, input_ids, attention_mask,
                               train=train, drop=drop,
                               fused_blocks=False)[:, 0], None
    if cfg.text_model_name == "bart":
        return bart_mod.encode_decoder(params, input_ids, attention_mask,
                                       drop=drop)[:, 0], None
    raise ValueError(f"Wrong text model: {cfg.text_model_name}")


def _distil_encode_hiddens(params, input_ids, attention_mask,
                           train: bool = False, drop=None):
    """DistilBERT encode that also returns per-layer hidden states
    (hierarchical fusion taps layers 2 and 4, multimodal_model.py:755-757)."""
    from ..text.encoder_common import attention_bias, postnorm_layer

    l = input_ids.shape[1]
    h = nn.embedding(params["word_emb"], input_ids)
    h = h + nn.embedding(params["pos_emb"], jnp.arange(l)[None, :])
    h = nn.layernorm(params["ln_emb"], h, eps=distil_mod.LN_EPS)
    if drop is not None:
        h = drop(h, distil_mod.DROPOUT)
    bias = attention_bias(attention_mask)
    hiddens = [h]
    for lp in params["layers"]:
        h = postnorm_layer(lp, h, bias, distil_mod.HEADS, distil_mod.LN_EPS,
                           mask=attention_mask, train=train, drop=drop,
                           attn_p=distil_mod.ATTN_DROPOUT,
                           hidden_p=distil_mod.DROPOUT, fused_blocks=False)
        hiddens.append(h)
    return h, hiddens


# ---------------------------------------------------------------------------
# init — builds EVERY head (reference parity)
# ---------------------------------------------------------------------------


def init(key, cfg: FusionConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 32)
    n = cfg.num_classes
    hid = cfg.text_hidden
    fcn = cfg.num_neurons_fc

    text_mod = _TEXT_MODS[cfg.text_model_name]
    if cfg.text_model_name == "bart":
        text_params, _ = text_mod.init(ks[0], num_classes=n, dtype=dtype)
        for k in ("head_dense", "head_out"):
            text_params.pop(k, None)
    else:
        text_params = text_mod.init_encoder(ks[0], dtype)
    img_params, img_state = eff.init(ks[1], effv2.CONFIGS["eff_v2_medium"],
                                     num_classes=n, dtype=dtype)
    img_params.pop("classifier")            # extractor keeps no head

    L = lambda k, i, o: nn.init_linear(k, i, o, dtype)
    params = {
        "text": text_params,
        "image": img_params,
        # classic/normalized heads (:199-213)
        "image_to_hidden": L(ks[2], IMG_FEAT, fcn),
        "text_to_hidden": L(ks[3], hid, fcn),
        "concat": L(ks[4], 2 * fcn, fcn),
        "fc": L(ks[5], fcn, n),
        # gated heads (:215-234)
        "img_feats_hidden": L(ks[6], IMG_FEAT, GATED_HIDDEN),
        "txt_feats_hidden": L(ks[7], hid, GATED_HIDDEN),
        "z": L(ks[8], 2 * GATED_HIDDEN, GATED_HIDDEN),
        "fc_gated": L(ks[9], GATED_HIDDEN, n),
        # CLIP relics (:236-247)
        "clip_fc": L(ks[10], cfg.batch_size, n),
        # torch ConvTranspose1d layout [in=8, out=8, k=2]
        "trans_conv": {"w": jax.random.normal(ks[11], (8, 8, 2), dtype) * 0.1,
                       "b": jnp.zeros((8,), dtype)},
        "logit_scale": jnp.asarray(np.log(1 / 0.07), dtype),
        "output_all_features": L(ks[12], 640, n),
        # MM-RCA blocks (:266-292)
        "sa_img": att.init_self_attention(ks[13], cfg.img_patch, SA_HIDDEN,
                                          SA_OUT, dtype),
        "sa_txt": att.init_self_attention(ks[14], cfg.txt_patch, SA_HIDDEN,
                                          SA_OUT, dtype),
        "rca_ti": att.init_cross_attention(ks[15], SA_OUT, SA_OUT, CA_HIDDEN,
                                           CA_OUT, dtype),
        "rca_it": att.init_cross_attention(ks[16], SA_OUT, SA_OUT, CA_HIDDEN,
                                           CA_OUT, dtype),
        "final": L(ks[17], CA_OUT * NUM_PATCHES * 2, n),
        "final_with_everything": L(ks[18], CA_OUT * NUM_PATCHES * 2 + IMG_FEAT
                                   + 768, n),
        # hierarchical heads (:294-296)
        "hier_img": L(ks[19], 1280 + 2560 + 2048, 512),
        "hier_txt": L(ks[20], 768 * 3, 512),
        "hier_all": L(ks[21], 1024, n),
        # bimodal GRU head (:300-328)
        "gru_text": nn.init_gru(ks[22], MODALITY_DIM, MODALITY_DIM, dtype),
        "gru_audio": nn.init_gru(ks[23], MODALITY_DIM, MODALITY_DIM, dtype),
        "hadamard": {"kernel1": jax.random.normal(ks[24], (MODALITY_DIM,), dtype),
                     "kernel2": jax.random.normal(ks[25], (MODALITY_DIM,), dtype),
                     "bias": jnp.zeros((MODALITY_DIM,), dtype)},
        "gru_bimodal": nn.init_gru(ks[26], MODALITY_DIM, BIMODAL_HIDDEN, dtype),
        "concat_fc": L(ks[27], MODALITY_DIM + BIMODAL_HIDDEN, BIMODAL_PROJ),
        "mod_img_to_dim": L(ks[28], IMG_FEAT, MODALITY_DIM),
        "mod_txt_to_dim": L(ks[29], 768, MODALITY_DIM),
        "bimodal_classifier": L(ks[30], BIMODAL_PROJ, n),
    }
    if cfg.features_only:
        params["final_features_only"] = L(ks[31], IMG_FEAT + 768, n)
    if cfg.cross_attention_only:
        params["final_cross_only"] = L(
            jax.random.fold_in(key, 777), CA_OUT * NUM_PATCHES * 2, n)
    state = {"image": img_state}
    return params, state


# ---------------------------------------------------------------------------
# modality dropout (reference drop_modalities :420-455)
# ---------------------------------------------------------------------------


def drop_modalities(cfg: FusionConfig, images, input_ids, attention_mask,
                    *, train, rng, eval_mode=False, remove_image=False,
                    remove_text=False):
    """Returns (images, input_ids, attention_mask, img_keep, txt_keep).

    The keep flags (None outside stochastic train dropout) gradient-gate
    the dropped tower in _towers: BN-train backward on an all-zero batch
    amplifies the cotangent by rsqrt(eps) PER LAYER (zero batch variance),
    overflowing to inf across EffNetV2-M's ~50 BNs and NaN'ing the whole
    image tower. The reference has the same latent defect (verified: a
    torch Conv/BN/SiLU stack on zeros yields NaN first-conv grads) but
    never hits it — every reference launcher pins --image_text_dropout=0.0
    (slurm_files/multimodal/*.sh:26). Forward semantics are unchanged
    (inputs zeroed, BN running stats still see the zero batch, reference
    drop_modalities :420-455); only the cotangent into the dropped tower
    is severed."""
    if eval_mode or not train or rng is None:
        if remove_image:
            images = jnp.zeros_like(images)
        if remove_text:
            input_ids = jnp.zeros_like(input_ids)
            attention_mask = jnp.zeros_like(attention_mask)
        return images, input_ids, attention_mask, None, None
    k1, k2 = jax.random.split(rng)
    drop_any = jax.random.uniform(k1) < cfg.image_or_text_dropout_chance
    drop_image = jax.random.uniform(k2) < cfg.img_prob_dropout
    img_keep = jnp.logical_not(jnp.logical_and(drop_any, drop_image))
    txt_keep = jnp.logical_not(jnp.logical_and(drop_any,
                                               jnp.logical_not(drop_image)))
    images = images * img_keep.astype(images.dtype)
    input_ids = input_ids * txt_keep.astype(input_ids.dtype)
    attention_mask = attention_mask * txt_keep.astype(attention_mask.dtype)
    return images, input_ids, attention_mask, img_keep, txt_keep


def _grad_gate(x, keep):
    """Identity forward; zero cotangent when keep is False (see
    drop_modalities). keep=None -> no gating."""
    if keep is None or x is None:
        return x
    return jax.tree_util.tree_map(
        lambda a: jnp.where(keep, a, jax.lax.stop_gradient(a)), x)


# ---------------------------------------------------------------------------
# strategy forwards
# ---------------------------------------------------------------------------


def _towers(cfg, params, state, images, input_ids, attention_mask, *,
            train, rng, need_stages=False, need_hiddens=False,
            keeps=(None, None)):
    img_keep, txt_keep = keeps
    drop = None
    if cfg.hf_internal_dropout and train and rng is not None:
        # fold_in (not split) keeps the image tower's rng stream — and
        # therefore all flag-off trajectories — byte-identical
        drop = nn.HFDropout(jax.random.fold_in(rng, 0x4F1D))
    text_cls, hiddens = _text_encode(cfg, params["text"], input_ids,
                                     attention_mask, need_hiddens,
                                     train=train, drop=drop)
    s3, s6, pooled, img_state = effv2.extractor_features(
        params["image"], state["image"], images, effv2.CONFIGS["eff_v2_medium"],
        train=train, rng=rng)
    text_cls = _grad_gate(text_cls, txt_keep)
    hiddens = _grad_gate(hiddens, txt_keep)
    s3, s6, pooled = (_grad_gate(x, img_keep) for x in (s3, s6, pooled))
    new_state = {"image": img_state}
    if need_stages:
        return text_cls, hiddens, s3, s6, pooled, new_state
    return text_cls, hiddens, pooled, new_state


def _drop(rng, x, rate, train):
    return nn.dropout(rng, x, rate, train) if train and rng is not None else x


def forward(cfg: FusionConfig, params, state, batch, *, train=False,
            rng=None, eval_mode=False, remove_image=False, remove_text=False):
    """batch = (input_ids, attention_mask, images_NHWC_normalized)."""
    input_ids, attention_mask, images = batch
    r_drop, r_model, r_head = (jax.random.split(rng, 3)
                               if rng is not None else (None, None, None))
    images, input_ids, attention_mask, img_keep, txt_keep = drop_modalities(
        cfg, images, input_ids, attention_mask, train=train, rng=r_drop,
        eval_mode=eval_mode, remove_image=remove_image, remove_text=remove_text)
    keeps = (img_keep, txt_keep)

    s = cfg.strategy
    if s == "gated":
        return _fwd_gated(cfg, params, state, images, input_ids,
                          attention_mask, train, r_model, r_head, keeps)
    if s in ("classic", "normalized"):
        return _fwd_concat(cfg, params, state, images, input_ids,
                           attention_mask, train, r_model, r_head, keeps,
                           normalized=(s == "normalized"))
    if s == "clip":
        return _fwd_clip(cfg, params, state, images, input_ids,
                         attention_mask, train, r_model, r_head, keeps)
    if s == "MM_RCA":
        return _fwd_mm_rca(cfg, params, state, images, input_ids,
                           attention_mask, train, r_model, r_head, keeps)
    if s == "hierarchical":
        return _fwd_hierarchical(cfg, params, state, images, input_ids,
                                 attention_mask, train, r_model, r_head, keeps)
    if s == "bimodal":
        return _fwd_bimodal(cfg, params, state, images, input_ids,
                            attention_mask, train, r_model, r_head, keeps)
    raise ValueError(f"unknown late-fusion strategy {s}")


def _fwd_gated(cfg, p, st, images, ids, mask, train, rng, r_head,
               keeps=(None, None)):
    # multimodal_model.py:331-395
    text, _, img, new_state = _towers(cfg, p, st, images, ids, mask,
                                      train=train, rng=rng, keeps=keeps)
    img_tanh = jnp.tanh(nn.linear(p["img_feats_hidden"], img))
    txt_tanh = jnp.tanh(nn.linear(p["txt_feats_hidden"], text))
    concat = jnp.concatenate([nn.linear(p["img_feats_hidden"], img),
                              nn.linear(p["txt_feats_hidden"], text)], axis=1)
    zl = jax.nn.softmax(nn.linear(p["z"], concat).astype(jnp.float32),
                        axis=1).astype(concat.dtype)
    gate = zl * img_tanh + (1 - zl) * txt_tanh
    out = nn.linear(p["fc_gated"], _drop(r_head, gate, cfg.drop_ratio, train))
    return out, new_state


def _fwd_concat(cfg, p, st, images, ids, mask, train, rng, r_head,
                keeps=(None, None), *, normalized):
    # classic :489-531, normalized :534-579
    text, _, img, new_state = _towers(cfg, p, st, images, ids, mask,
                                      train=train, rng=rng, keeps=keeps)
    ih = nn.linear(p["image_to_hidden"], img)
    th = nn.linear(p["text_to_hidden"], text)
    if normalized:
        ih = nn.l2_normalize(ih, axis=1, eps=1e-12)
        th = nn.l2_normalize(th, axis=1, eps=1e-12)
    h = nn.linear(p["concat"], jnp.concatenate([ih, th], axis=1))
    out = nn.linear(p["fc"], _drop(r_head, h, cfg.drop_ratio, train))
    return out, new_state


def _fwd_clip(cfg, p, st, images, ids, mask, train, rng, r_head,
              keeps=(None, None)):
    # :583-633 — cosine-similarity logits through a batch-sized FC; the
    # ConvTranspose1d pad hack fires when bs != cfg.batch_size
    text, _, img, new_state = _towers(cfg, p, st, images, ids, mask,
                                      train=train, rng=rng, keeps=keeps)
    img = nn.l2_normalize(nn.linear(p["image_to_hidden"], img), axis=1, eps=1e-12)
    txt = nn.l2_normalize(nn.linear(p["text_to_hidden"], text), axis=1, eps=1e-12)
    logits = jnp.exp(p["logit_scale"]) * img @ txt.T          # [bs, bs]
    if logits.shape[0] != cfg.batch_size:
        # reference defect preserved: torch feeds the UNBATCHED [b, b]
        # tensor to ConvTranspose1d(8, 8, k2, s2) (multimodal_model.py:
        # 625-627), which treats dim0 as channels — it only runs when the
        # tail batch is exactly 8, yielding [8, 2b] for the bs-sized FC.
        w = p["trans_conv"]["w"]                  # torch layout [in=8,out=8,k=2]
        if logits.shape[0] != w.shape[0]:
            raise ValueError(
                f"CLIP trans_conv pad hack needs batch {w.shape[0]}, got "
                f"{logits.shape[0]} (reference defect, multimodal_model.py:625)")
        y0 = jnp.einsum("ci,co->oi", logits, w[:, :, 0])
        y1 = jnp.einsum("ci,co->oi", logits, w[:, :, 1])
        y = jnp.stack([y0, y1], axis=-1).reshape(w.shape[1], -1)   # interleave
        logits = y + p["trans_conv"]["b"][:, None]
    return nn.linear(p["clip_fc"], logits), new_state


def mm_rca_block(cfg: FusionConfig, p, img_feat, txt_feat):
    """L2-norm -> patches -> self-attn x2 -> RCA x2 -> flatten.

    The north-star compute block (multimodal_model.py:662-692); the Pallas
    fused kernel implements exactly this graph (kernels/rca_fused.py).

    l2 norms carry eps=1e-12 (identical numerics for any nonzero vector;
    the reference's bare x/||x|| NaNs when modality dropout zeroes an
    input through an untrained tower — guarded here).
    """
    img_n = nn.l2_normalize(img_feat, axis=1, eps=1e-12)
    txt_n = nn.l2_normalize(txt_feat, axis=1, eps=1e-12)
    bs = txt_n.shape[0]
    t = txt_n.reshape(bs, NUM_PATCHES, cfg.txt_patch)
    i = img_n.reshape(bs, NUM_PATCHES, cfg.img_patch)
    if cfg.use_pallas_rca:
        # differentiable wrapper: Pallas forward, XLA-autodiff backward —
        # training with use_pallas_rca works too
        from ...kernels.rca_fused import rca_fused_trainable
        ti, it = rca_fused_trainable(p, t, i, cfg.reverse,
                                     jax.default_backend() != "tpu")
    else:
        t_sa = att.self_attention(p["sa_txt"], t)
        i_sa = att.self_attention(p["sa_img"], i)
        ti = att.reverse_cross_attention(p["rca_ti"], t_sa, i_sa, cfg.reverse)
        it = att.reverse_cross_attention(p["rca_it"], i_sa, t_sa, cfg.reverse)
    return (ti.reshape(bs, -1), it.reshape(bs, -1), img_n, txt_n)


def _fwd_mm_rca(cfg, p, st, images, ids, mask, train, rng, r_head,
                keeps=(None, None)):
    # :636-728
    if cfg.text_hidden != 768:
        raise ValueError("MM_RCA requires a 768-d text tower "
                         "(reference patch table multimodal_model.py:257-261)")
    text, _, img, new_state = _towers(cfg, p, st, images, ids, mask,
                                      train=train, rng=rng, keeps=keeps)
    ti, it, img_n, txt_n = mm_rca_block(cfg, p, img, text)
    if cfg.features_only:
        concat = jnp.concatenate([img_n, txt_n], axis=1)
        head = p["final_features_only"]
    elif cfg.cross_attention_only:
        concat = jnp.concatenate([ti, it], axis=1)
        head = p["final_cross_only"]
    else:
        concat = jnp.concatenate([ti, it, img_n, txt_n], axis=1)
        head = p["final_with_everything"]
    out = nn.linear(head, _drop(r_head, concat, cfg.drop_ratio, train))
    return out, new_state


def _fwd_hierarchical(cfg, p, st, images, ids, mask, train, rng,
                      r_head, keeps=(None, None)):
    # :729-818
    text, hiddens, s3, s6, img, new_state = _towers(
        cfg, p, st, images, ids, mask, train=train, rng=rng,
        need_stages=True, need_hiddens=True, keeps=keeps)
    l2 = nn.l2_normalize(hiddens[2][:, 0], axis=1, eps=1e-12)
    l4 = nn.l2_normalize(hiddens[4][:, 0], axis=1, eps=1e-12)
    text_n = nn.l2_normalize(text, axis=1, eps=1e-12)
    # AvgPool2d(k7,s7) on stage3 [B,30,30,160] -> [B,4,4,160] -> 2560
    s3p = nn.avg_pool(s3, 7, 7).reshape(s3.shape[0], -1)
    # AvgPool2d(k6,s6) on stage6 [B,15,15,512] -> [B,2,2,512] -> 2048
    s6p = nn.avg_pool(s6, 6, 6).reshape(s6.shape[0], -1)
    s3p = nn.l2_normalize(s3p, axis=1, eps=1e-12)
    s6p = nn.l2_normalize(s6p, axis=1, eps=1e-12)
    img_n = nn.l2_normalize(img, axis=1, eps=1e-12)
    cat_img = jnp.concatenate([img_n, s3p, s6p], axis=1)
    cat_txt = jnp.concatenate([text_n, l2, l4], axis=1)
    r1, r2 = (jax.random.split(r_head) if r_head is not None else (None, None))
    hi = nn.relu(nn.linear(p["hier_img"], _drop(r1, cat_img, cfg.drop_ratio, train)))
    ht = nn.relu(nn.linear(p["hier_txt"], _drop(r2, cat_txt, cfg.drop_ratio, train)))
    out = nn.linear(p["hier_all"], jnp.concatenate([hi, ht], axis=1))
    return out, new_state


def _fwd_bimodal(cfg, p, st, images, ids, mask, train, rng, r_head,
                 keeps=(None, None)):
    # :835-888 — GRUs scan ACROSS THE BATCH (2-D input to batch_first GRU
    # is unbatched in torch; defect preserved, see module docstring)
    text, _, img, new_state = _towers(cfg, p, st, images, ids, mask,
                                      train=train, rng=rng, keeps=keeps)
    img_n = nn.l2_normalize(img, axis=1, eps=1e-12)
    txt_n = nn.l2_normalize(text, axis=1, eps=1e-12)
    x_text = nn.linear(p["mod_txt_to_dim"], txt_n)          # [B, 400]
    x_img = nn.linear(p["mod_img_to_dim"], img_n)
    ctx_t, _ = nn.gru(p["gru_text"], x_text[None])          # time = batch
    ctx_i, _ = nn.gru(p["gru_audio"], x_img[None])
    fused = jnp.tanh(ctx_t[0] * p["hadamard"]["kernel1"]
                     + ctx_i[0] * p["hadamard"]["kernel2"]
                     + p["hadamard"]["bias"])
    ctx_f, _ = nn.gru(p["gru_bimodal"], fused[None])
    r1, r2 = (jax.random.split(r_head) if r_head is not None else (None, None))
    ctx_f = _drop(r1, ctx_f[0], 0.86, train)
    combined = jnp.concatenate([fused, ctx_f], axis=-1)
    proj = _drop(r2, nn.relu(nn.linear(p["concat_fc"], combined)), 0.86, train)
    return nn.linear(p["bimodal_classifier"], proj), new_state


# ---------------------------------------------------------------------------
# reference .pth conversion
# ---------------------------------------------------------------------------

def _image_sd_to_features(sd: dict) -> dict:
    """Rename EfficientNetV2MFullFeatureExtractor keys (image_model.stem/
    stage{i}/final_conv, multimodal_model.py:11-23) back to torchvision
    features.{i} so eff.convert_torch consumes them. Tracking-aware:
    returns a renamed view when sd is a TrackingDict."""
    keymap = {}
    for k in sd:
        if not k.startswith("image_model."):
            continue
        r = k[len("image_model."):]
        if r.startswith("stem.0."):
            keymap["features.0." + r[len("stem.0."):]] = k
        elif r.startswith("stem.1."):
            keymap["features.1." + r[len("stem.1."):]] = k
        elif r.startswith("stage"):
            i = int(r[len("stage")])
            keymap[f"features.{i + 1}." + r.split(".", 1)[1]] = k
        elif r.startswith("final_conv."):
            keymap["features.8." + r[len("final_conv."):]] = k
    if hasattr(sd, "view"):
        return sd.view(keymap)
    return {nk: sd[ok] for nk, ok in keymap.items()}


def _lin(sd, key):
    return {"w": jnp.asarray(sd[key + ".weight"]).T,
            "b": jnp.asarray(sd[key + ".bias"])}


def _att_block(sd, pre):
    return {"q": _lin(sd, pre + ".W_query"), "k": _lin(sd, pre + ".W_key"),
            "v": _lin(sd, pre + ".W_value"),
            "norm": {"scale": jnp.asarray(sd[pre + ".norm.weight"]),
                     "bias": jnp.asarray(sd[pre + ".norm.bias"])}}


def _gru(sd, pre):
    return {"w_ih": jnp.asarray(sd[pre + ".weight_ih_l0"]).T,
            "w_hh": jnp.asarray(sd[pre + ".weight_hh_l0"]).T,
            "b_ih": jnp.asarray(sd[pre + ".bias_ih_l0"]),
            "b_hh": jnp.asarray(sd[pre + ".bias_hh_l0"])}


def convert_torch(sd: dict, cfg: FusionConfig):
    """Full reference fusion checkpoint -> (params, state).

    Tolerates every extra head (checkpoints contain all of them) and the
    optional features_only / cross_attention_only heads.
    """
    from ...checkpoint.torch_convert import subdict

    text_mod = _TEXT_MODS[cfg.text_model_name]
    text_sd = subdict(sd, "text_model.")
    if cfg.text_model_name == "bart":
        text_params, _ = text_mod.convert_torch(text_sd,
                                                num_classes=cfg.num_classes)
        text_params.pop("head_dense", None)
        text_params.pop("head_out", None)
    else:
        text_params = text_mod.convert_encoder(text_sd)
    img_params, img_state = eff.convert_torch(
        _image_sd_to_features(sd), effv2.CONFIGS["eff_v2_medium"],
        cfg.num_classes, expect_head=False)
    img_params.pop("classifier", None)

    params = {
        "text": text_params,
        "image": img_params,
        "image_to_hidden": _lin(sd, "image_to_hidden_size"),
        "text_to_hidden": _lin(sd, "text_to_hidden_size"),
        "concat": _lin(sd, "concat_layer"),
        "fc": _lin(sd, "fc_layer"),
        "img_feats_hidden": _lin(sd, "image_features_hidden_layer"),
        "txt_feats_hidden": _lin(sd, "text_features_hidden_layer"),
        "z": _lin(sd, "z_layer"),
        "fc_gated": _lin(sd, "fc_layer_gated"),
        "clip_fc": _lin(sd, "clip_fc_layer"),
        "trans_conv": {"w": jnp.asarray(sd["trans_conv.weight"]),
                       "b": jnp.asarray(sd["trans_conv.bias"])},
        "logit_scale": jnp.asarray(sd["logit_scale"]),
        "output_all_features": _lin(sd, "output_all_features"),
        "sa_img": _att_block(sd, "self_attention_image"),
        "sa_txt": _att_block(sd, "self_attention_text"),
        "rca_ti": _att_block(sd, "cross_attention_1"),
        "rca_it": _att_block(sd, "cross_attention_2"),
        "final": _lin(sd, "final"),
        "final_with_everything": _lin(sd, "final_with_everything"),
        "hier_img": _lin(sd, "final_hierarchical_image"),
        "hier_txt": _lin(sd, "final_hierarchical_text"),
        "hier_all": _lin(sd, "final_hierarchical_all"),
        "gru_text": _gru(sd, "gru_text"),
        "gru_audio": _gru(sd, "gru_audio"),
        "hadamard": {"kernel1": jnp.asarray(sd["fusion.kernel1"]),
                     "kernel2": jnp.asarray(sd["fusion.kernel2"]),
                     "bias": jnp.asarray(sd["fusion.bias"])},
        "gru_bimodal": _gru(sd, "gru_bimodal"),
        "concat_fc": _lin(sd, "concat_fc"),
        "mod_img_to_dim": _lin(sd, "modality_image_to_dim"),
        "mod_txt_to_dim": _lin(sd, "modality_text_to_dim"),
        "bimodal_classifier": _lin(sd, "classifier"),
    }
    if "final_features_only_linear.weight" in sd:
        params["final_features_only"] = _lin(sd, "final_features_only_linear")
    if "cross_attention_only_linear.weight" in sd:
        params["final_cross_only"] = _lin(sd, "cross_attention_only_linear")
    return params, {"image": img_state}


def build_fusion(cfg: FusionConfig):
    """-> (init_fn, apply_fn, convert_fn) for the configured strategy.

    Validates the strategy EAGERLY (the reference errors at model
    construction, main_both.py:342-343 — deferring to forward() would let
    a typo'd --late_fusion train for 0 epochs 'successfully')."""
    if cfg.strategy not in FUSION_STRATEGIES:
        raise ValueError(f"unknown late-fusion strategy '{cfg.strategy}'; "
                         f"known: {list(FUSION_STRATEGIES)}")
    if cfg.strategy == "hierarchical" and cfg.text_model_name == "bart":
        # the hierarchical heads tap encoder hidden_states[2]/[4] CLS
        # vectors (reference multimodal_model.py:755-757); the BART tower
        # exposes only the decoder last hidden state — fail at build, not
        # with a mid-forward NoneType error
        raise ValueError(
            "hierarchical fusion needs per-layer hidden states; "
            "--text_model=bart does not expose them (use distilbert/bert; "
            "reference taps hidden layers 2/4, multimodal_model.py:755-757)")

    def _init(key, dtype=jnp.float32):
        return init(key, cfg, dtype)

    def _apply(params, state, batch, *, train=False, rng=None,
               eval_mode=False, remove_image=False, remove_text=False):
        return forward(cfg, params, state, batch, train=train, rng=rng,
                       eval_mode=eval_mode, remove_image=remove_image,
                       remove_text=remove_text)

    def _convert(sd):
        return convert_torch(sd, cfg)

    return _init, _apply, _convert
