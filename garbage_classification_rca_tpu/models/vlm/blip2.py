"""BLIP-2 assembly: vision -> Q-Former -> projection -> OPT, with LoRA.

Capability parity with reference blip_2_training.py / blip_2_test_set.py /
q_former_training.py / q_former_test_set.py:

  * ``forward_lm``: full conditional-generation forward (the training loss
    path, blip_2_training.py:280-293) — CE on label tokens appended to the
    knowledge prompt;
  * ``next_token_logits``: the reference's generate(max_new_tokens=1) eval
    (blip_2_training.py:296-297) collapses to one forward -> logits at the
    last prompt position (greedy argmax host-side; find_closest_string maps
    the decoded word to a bin);
  * ``qformer_cls_feature``: qformer_outputs.last_hidden_state[:, 0, :]
    into Linear(768, 4) — the Q-Former classifier (q_former_training.py:
    24-31, 289-291);
  * LoRA r=32, alpha=8 on the OPT q_proj/k_proj (blip_2_training.py:
    210-217; peft targets only module names 'q_proj'/'k_proj', which exist
    only in the OPT tower).

dtype policy (SURVEY §7 'BLIP-2 scale'): params bf16, fp32 softmax/LN
accumulations; 3.7B params ~ 7.4 GB bf16, fits a v5e chip for inference;
mesh axis 'model' sharding hooks are left to parallel/ (round 2).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ...nn import core as nn
from ..text.encoder_common import lin, strip_prefix
from . import blip2_vision as vision
from . import opt as opt_mod
from . import qformer as qf


@dataclass(frozen=True)
class Blip2Config:
    vision: vision.VisionConfig = field(default_factory=vision.VisionConfig)
    qformer: qf.QFormerConfig = field(default_factory=qf.QFormerConfig)
    opt: opt_mod.OPTConfig = field(default_factory=opt_mod.OPTConfig)
    lora_r: int = 32
    lora_alpha: int = 8
    lora_dropout: float = 0.05      # train-time only

    @property
    def lora_scale(self) -> float:
        return self.lora_alpha / self.lora_r


def init(key, cfg: Blip2Config, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "vision": vision.init(k1, cfg.vision, dtype),
        "qformer": qf.init(k2, cfg.qformer, dtype),
        "projection": nn.init_linear(k3, cfg.qformer.hidden, cfg.opt.hidden,
                                     dtype),
        "opt": opt_mod.init(k4, cfg.opt, dtype),
    }


def init_lora(key, cfg: Blip2Config, dtype=jnp.float32) -> Dict:
    """LoRA adapters for every OPT layer's q/k projections.
    A ~ N(0, 1/r) (peft kaiming-ish), B = 0.

    Layer keys are STRINGS ("0", "1", ...): orbax stringifies dict keys
    on checkpoint restore, so an int-keyed tree comes back with str keys
    and int lookups (opt._layer's lora.get) would silently skip the
    adapters — found as a 6e-4 resume drift whose restored train step
    compiled WITHOUT _apply_lora (round 3)."""
    adapters = {}
    d = cfg.opt.hidden
    for i in range(cfg.opt.layers):
        k = jax.random.fold_in(key, i)
        ka, kb = jax.random.split(k)
        adapters[str(i)] = {
            name: {"a": jax.random.normal(jax.random.fold_in(ka, j),
                                          (d, cfg.lora_r), dtype)
                   / jnp.sqrt(cfg.lora_r),
                   "b": jnp.zeros((cfg.lora_r, d), dtype)}
            for j, name in enumerate(("q", "k"))
        }
    return adapters


def init_classifier(key, cfg: Blip2Config, num_classes: int = 4,
                    dtype=jnp.float32):
    """MultimodalClassifier = Linear(768, 4) (q_former_training.py:24-31)."""
    return nn.init_linear(key, cfg.qformer.hidden, num_classes, dtype)


def query_features(params, pixel_values, cfg: Blip2Config, drop=None):
    """pixel_values NHWC (already BLIP-normalized fp) -> [B, 32, 768].

    `drop`: optional nn.HFDropout for the Q-Former's internal train-mode
    dropout (--hf_internal_dropout). The EVA vision tower has NO dropout
    sites (Blip2VisionConfig attention_dropout=0.0)."""
    img = vision.encode(params["vision"], pixel_values, cfg.vision)
    return qf.encode(params["qformer"], img, cfg.qformer, drop=drop)


def qformer_cls_feature(params, pixel_values, cfg: Blip2Config, drop=None):
    return query_features(params, pixel_values, cfg, drop=drop)[:, 0]


def _lm_hidden(params, pixel_values, input_ids, attention_mask,
               cfg: Blip2Config, lora=None, train=False, drop=None):
    """-> OPT final hidden [B, 32 + L, H] over the combined sequence."""
    q = query_features(params, pixel_values, cfg, drop=drop)
    q_emb = nn.linear(params["projection"], q)            # [B, 32, 2560]
    t_emb = opt_mod.embed_tokens(params["opt"], input_ids).astype(q_emb.dtype)
    embeds = jnp.concatenate([q_emb, t_emb], axis=1)
    q_mask = jnp.ones(q_emb.shape[:2], attention_mask.dtype)
    mask = jnp.concatenate([q_mask, attention_mask], axis=1)
    return opt_mod.decode_hidden(params["opt"], embeds, mask, cfg.opt,
                                 lora=lora, lora_scale=cfg.lora_scale,
                                 train=train, drop=drop,
                                 lora_p=cfg.lora_dropout)


def forward_lm(params, pixel_values, input_ids, attention_mask,
               cfg: Blip2Config, lora=None):
    """-> logits [B, 32 + L, vocab] over the combined sequence."""
    return opt_mod.lm_head(params["opt"], _lm_hidden(
        params, pixel_values, input_ids, attention_mask, cfg, lora))


def lm_loss(params, pixel_values, input_ids, attention_mask, labels,
            cfg: Blip2Config, lora=None, rng=None,
            hf_internal_dropout: bool = False):
    """HF Blip2ForConditionalGeneration loss: next-token CE over the text
    segment, ignoring -100 labels (blip_2_training.py collate builds
    labels = input_ids with pads masked).

    ``hf_internal_dropout`` + ``rng``: reproduce the reference trainer's
    stochastic internals — the peft-wrapped model runs in train() mode,
    so Q-Former p=0.1 hidden/attention dropout, OPT p=0.1
    hidden dropout and the peft lora_dropout=0.05 are all active there
    (blip_2_training.py:210-217, HF model internals). Default: off,
    deterministic (the documented divergence, PARITY.md)."""
    drop = None
    if hf_internal_dropout and rng is not None:
        drop = nn.HFDropout(rng)
    # train path: fused eval kernels off in the OPT tower (LoRA grads
    # flow through its attention; recompute-VJP backward is ~2x slower)
    logits = opt_mod.lm_head(params["opt"], _lm_hidden(
        params, pixel_values, input_ids, attention_mask, cfg, lora,
        train=True, drop=drop))
    n_query = cfg.qformer.n_query
    return opt_mod.shifted_ce(logits[:, n_query:, :], labels)


def _last_valid_index(mask):
    """Index of each row's LAST mask==1 position — pad-side agnostic.

    The production batcher LEFT-pads prompts to 100 (the reference uses
    padding_side='left', blip_2_training.py:66), so `n_valid - 1` would
    point into the pad region; argmax of position*mask is correct for
    either padding side."""
    m = mask.astype(jnp.int32)
    return jnp.argmax(m * jnp.arange(1, m.shape[1] + 1)[None, :], axis=1)


def next_token_logits(params, pixel_values, input_ids, attention_mask,
                      cfg: Blip2Config, lora=None):
    """Logits for the token following the prompt (1-token greedy decode).
    The next-token position is the last non-pad index per row, for left-
    OR right-padded prompts."""
    h = _lm_hidden(params, pixel_values, input_ids, attention_mask, cfg,
                   lora)
    n_query = cfg.qformer.n_query
    last = n_query + _last_valid_index(attention_mask)
    # gather the answer position BEFORE the 50k-vocab projection: the full
    # [B, 133, 50272] logits are 16x the needed FLOPs and ~100 MB of HBM
    h_last = h[jnp.arange(h.shape[0]), last]              # [B, H]
    return opt_mod.lm_head(params["opt"], h_last)


def prompt_embeds(params, pixel_values, input_ids, attention_mask,
                  cfg: Blip2Config):
    """BLIP-2 prompt construction for the OPT-level serving paths: 32
    projected query embeddings prepended to the text embeddings, with a
    matching always-valid query mask (HF Blip2ForConditionalGeneration
    .generate's inputs_embeds assembly). Returns (embeds [B, 32+L, H],
    mask [B, 32+L]) — feed to opt.generate or serving.GenerationServer."""
    q = query_features(params, pixel_values, cfg)
    q_emb = nn.linear(params["projection"], q)
    t_emb = opt_mod.embed_tokens(params["opt"], input_ids).astype(q_emb.dtype)
    embeds = jnp.concatenate([q_emb, t_emb], axis=1)
    q_mask = jnp.ones(q_emb.shape[:2], attention_mask.dtype)
    return embeds, jnp.concatenate([q_mask, attention_mask], axis=1)


def generate(params, pixel_values, input_ids, attention_mask,
             cfg: Blip2Config, lora=None, max_new_tokens: int = 8,
             eos_id: int = 2, sampler=None, rng=None, cache_dtype=None):
    """Multi-token generation with per-layer KV caches — the TPU-native
    serving path beyond the reference's 1-token eval
    (blip_2_training.py:296-297). Greedy by default; pass sampler + rng
    for temperature/top-k/top-p (see opt.generate). Static shapes
    throughout: prompt prefill fills caches once, then a ``lax.scan``
    appends one token per step (left- OR right-padded prompts — generated
    K/V always land in the tail slots; pad positions stay masked).

    Returns (tokens [B, max_new_tokens] int32, valid [B, max_new_tokens]
    bool) — each row's EOS token is its last valid entry; ``valid`` is
    False strictly AFTER the EOS.
    """
    embeds, mask = prompt_embeds(params, pixel_values, input_ids,
                                 attention_mask, cfg)
    return opt_mod.generate(params["opt"], embeds, mask, cfg.opt,
                            max_new_tokens, eos_id=eos_id, lora=lora,
                            lora_scale=cfg.lora_scale, sampler=sampler,
                            rng=rng, cache_dtype=cache_dtype)


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------


def convert_torch(sd, cfg: Blip2Config):
    """Full Blip2ForConditionalGeneration state dict -> params pytree.
    Accepts peft-wrapped checkpoints: 'base_model.model.' prefixes are
    stripped and 'lora_A/lora_B' tensors are returned separately.

    Tracking-aware: when sd is a checkpoint.TrackingDict, the prefix/
    base_layer renames go through sd.view() so an every-key-consumed
    audit sees through the peft rewrites (tests/test_blip2*.py)."""
    lora = _extract_lora(sd, cfg)
    keymap = {k.replace("base_model.model.", "")
               .replace(".base_layer", ""): k
              for k in sd if "lora_" not in k}
    sd = (sd.view(keymap) if hasattr(sd, "view")
          else {nk: sd[ok] for nk, ok in keymap.items()})
    vis = strip_prefix(sd, "vision_model.")
    qsd = strip_prefix(sd, "qformer.")
    osd = strip_prefix(sd, "language_model.model.decoder.")
    params = {
        "vision": vision.convert_torch(vis, cfg.vision),
        "qformer": qf.convert_torch(qsd, cfg.qformer, sd["query_tokens"]),
        "projection": lin(sd, "language_projection"),
        "opt": opt_mod.convert_torch(osd, cfg.opt),
    }
    # HF ties OPT's lm_head to embed_tokens; state_dict() may carry the
    # duplicate key — consume it (it has no independent content)
    if "language_model.lm_head.weight" in sd:
        sd["language_model.lm_head.weight"]
    return params, lora


def _extract_lora(sd, cfg: Blip2Config) -> Optional[Dict]:
    lora: Dict = {}
    for k in list(sd):
        if "lora_A" not in k and "lora_B" not in k:
            continue
        v = sd[k]       # subscript read: marks the key under a TrackingDict
        # ...decoder.layers.{i}.self_attn.{q,k}_proj.lora_{A,B}.default.weight
        parts = k.split(".")
        li = int(parts[parts.index("layers") + 1])
        proj = "q" if "q_proj" in k else "k"
        ab = "a" if "lora_A" in k else "b"
        # peft stores lora_A [r, in], lora_B [out, r] -> ours a [in, r], b [r, out]
        lora.setdefault(str(li), {}).setdefault(proj, {})[ab] = jnp.asarray(v).T
    return lora or None
