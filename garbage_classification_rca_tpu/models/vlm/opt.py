"""OPT decoder (facebook/opt-2.7b geometry) for the BLIP-2 language model.

HF parity: learned positional embeddings with the OPT +2 offset computed
from the attention mask, pre-LN decoder layers (do_layer_norm_before=True),
ReLU MLP, final_layer_norm, lm_head tied to embed_tokens. 1-token
"generation" in the reference (blip_2_training.py:296-297 generate(
max_new_tokens=1)) is a single forward -> next-token logits here; no KV
cache needed.

BLIP-2 prepends 32 projected query embeddings to the text embeds; `decode`
takes pre-built input embeddings + a combined attention mask.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...kernels import mha_fused
from ...nn import core as nn
from ..text.encoder_common import lin, ln_


@dataclass(frozen=True)
class OPTConfig:
    layers: int = 32
    hidden: int = 2560
    heads: int = 32
    ffn: int = 10240
    vocab: int = 50272
    max_pos: int = 2048
    ln_eps: float = 1e-5
    pos_offset: int = 2


def init(key, cfg: OPTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    params = {
        "embed_tokens": nn.init_embedding(ks[0], cfg.vocab, cfg.hidden, dtype),
        "embed_positions": nn.init_embedding(
            ks[1], cfg.max_pos + cfg.pos_offset, cfg.hidden, dtype),
        "final_ln": nn.init_layernorm(cfg.hidden, dtype),
        "layers": [],
    }
    for i in range(cfg.layers):
        k = jax.random.split(jax.random.fold_in(key, 10 + i), 6)
        params["layers"].append({
            "ln1": nn.init_layernorm(cfg.hidden, dtype),
            "q": nn.init_linear(k[0], cfg.hidden, cfg.hidden, dtype),
            "k": nn.init_linear(k[1], cfg.hidden, cfg.hidden, dtype),
            "v": nn.init_linear(k[2], cfg.hidden, cfg.hidden, dtype),
            "out": nn.init_linear(k[3], cfg.hidden, cfg.hidden, dtype),
            "ln2": nn.init_layernorm(cfg.hidden, dtype),
            "fc1": nn.init_linear(k[4], cfg.hidden, cfg.ffn, dtype),
            "fc2": nn.init_linear(k[5], cfg.ffn, cfg.hidden, dtype),
        })
    return params


def _apply_lora(p, name, x, base_out, lora=None, lora_scale=1.0):
    """Add the low-rank update for projection `name` when adapters exist."""
    if lora is None or name not in lora:
        return base_out
    a, b = lora[name]["a"], lora[name]["b"]
    return base_out + (x @ a.astype(x.dtype)) @ b.astype(x.dtype) * lora_scale


def _layer(p, x, bias, cfg: OPTConfig, lora=None, lora_scale=1.0,
           mask=None, train=False):
    b_, n, d = x.shape
    hd = d // cfg.heads
    h = nn.layernorm(p["ln1"], x, eps=cfg.ln_eps)
    q = _apply_lora(p, "q", h, nn.linear(p["q"], h), lora, lora_scale)
    k = _apply_lora(p, "k", h, nn.linear(p["k"], h), lora, lora_scale)
    v = nn.linear(p["v"], h)
    if mask is not None and not train \
            and mha_fused.fused_attention_enabled():
        att = mha_fused.mha_trainable(q, k, v, heads=cfg.heads, mask=mask,
                                      causal=True)
    else:
        q = q.reshape(b_, n, cfg.heads, hd)
        k = k.reshape(b_, n, cfg.heads, hd)
        v = v.reshape(b_, n, cfg.heads, hd)
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        w = jax.nn.softmax(scores + bias, axis=-1).astype(v.dtype)
        att = jnp.einsum("bhnm,bmhd->bnhd", w, v).reshape(b_, n, d)
    x = x + nn.linear(p["out"], att)
    h = nn.layernorm(p["ln2"], x, eps=cfg.ln_eps)
    return x + nn.linear(p["fc2"], jax.nn.relu(nn.linear(p["fc1"], h)))


def decode_hidden(params, inputs_embeds, attention_mask, cfg: OPTConfig,
                  lora=None, lora_scale=1.0, train=False):
    """inputs_embeds [B, L, H] + mask [B, L] -> final hidden [B, L, H]
    (post final_layer_norm; project with ``lm_head`` for logits)."""
    mask = attention_mask.astype(jnp.int32)
    positions = jnp.cumsum(mask, axis=1) * mask - 1 + cfg.pos_offset
    positions = jnp.clip(positions, 0, cfg.max_pos + cfg.pos_offset - 1)
    h = inputs_embeds + nn.embedding(params["embed_positions"], positions
                                     ).astype(inputs_embeds.dtype)
    l = h.shape[1]
    causal = jnp.tril(jnp.ones((l, l), jnp.float32))[None, None]
    pad = mask.astype(jnp.float32)[:, None, None, :]
    bias = (1.0 - causal * pad) * jnp.finfo(jnp.float32).min
    for i, lp in enumerate(params["layers"]):
        layer_lora = None if lora is None else lora.get(i)
        h = _layer(lp, h, bias, cfg, layer_lora, lora_scale, mask=mask,
                   train=train)
    return nn.layernorm(params["final_ln"], h, eps=cfg.ln_eps)


def lm_head(params, h):
    """Hidden -> vocab logits (tied input embeddings, HF OPT semantics).
    Accepts [B, L, H] or gathered [B, H]."""
    return h @ params["embed_tokens"]["w"].astype(h.dtype).T


def decode(params, inputs_embeds, attention_mask, cfg: OPTConfig,
           lora=None, lora_scale=1.0):
    """inputs_embeds [B, L, H] + mask [B, L] -> logits [B, L, vocab]."""
    return lm_head(params, decode_hidden(params, inputs_embeds,
                                         attention_mask, cfg, lora,
                                         lora_scale))


def embed_tokens(params, input_ids):
    return nn.embedding(params["embed_tokens"], input_ids)


# ---------------------------------------------------------------------------
# KV-cached incremental decoding (beyond the reference's 1-token eval:
# a TPU-native serving path — static cache shapes, lax.scan decode loop)
# ---------------------------------------------------------------------------


def _qkv(p, h, lora, lora_scale):
    q = _apply_lora(p, "q", h, nn.linear(p["q"], h), lora, lora_scale)
    k = _apply_lora(p, "k", h, nn.linear(p["k"], h), lora, lora_scale)
    return q, k, nn.linear(p["v"], h)


def layer_prefill(lp, h, bias, cfg: OPTConfig, lora=None, lora_scale=1.0,
                  mask=None):
    """One decoder layer over the full prompt, also returning its K/V
    rows for the cache. h [B, L, H], bias [B, 1, L, L] -> (h, k, v).
    When `mask` [B, L] is given the attention runs through the fused
    Pallas MHA kernel (same gating as _layer's eval path); k/v are the
    pre-kernel projections either way, so the cache is unaffected."""
    b, l, d = h.shape
    hd = d // cfg.heads
    hn = nn.layernorm(lp["ln1"], h, eps=cfg.ln_eps)
    q, k, v = _qkv(lp, hn, lora, lora_scale)
    if mask is not None and mha_fused.fused_attention_enabled():
        att = mha_fused.mha_trainable(q, k, v, heads=cfg.heads, mask=mask,
                                      causal=True)
    else:
        qh = q.reshape(b, l, cfg.heads, hd)
        kh = k.reshape(b, l, cfg.heads, hd)
        vh = v.reshape(b, l, cfg.heads, hd)
        scores = jnp.einsum("bnhd,bmhd->bhnm", qh, kh,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        w = jax.nn.softmax(scores + bias, axis=-1).astype(vh.dtype)
        att = jnp.einsum("bhnm,bmhd->bnhd", w, vh).reshape(b, l, d)
    h = h + nn.linear(lp["out"], att)
    hn = nn.layernorm(lp["ln2"], h, eps=cfg.ln_eps)
    h = h + nn.linear(lp["fc2"], jax.nn.relu(nn.linear(lp["fc1"], hn)))
    return h, k, v


_scatter_rows = jax.vmap(
    lambda c, row, i: jax.lax.dynamic_update_slice(c, row[None], (i, 0)))


def _decode_attend(lp, h, q, kd, vd, bias, cfg: OPTConfig):
    """Shared tail of one incremental-token layer: attention over the
    (dense) cache kd/vd [B, T, H] + residual MLP. h/q [B, H]."""
    b, d = h.shape
    hd = d // cfg.heads
    qh = q.reshape(b, cfg.heads, hd)
    kh = kd.reshape(b, -1, cfg.heads, hd)
    vh = vd.reshape(b, -1, cfg.heads, hd)
    scores = jnp.einsum("bhd,bmhd->bhm", qh, kh,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    w = jax.nn.softmax(scores + bias[:, 0], axis=-1).astype(vh.dtype)
    att = jnp.einsum("bhm,bmhd->bhd", w, vh).reshape(b, d)
    h = h + nn.linear(lp["out"], att)
    hn = nn.layernorm(lp["ln2"], h, eps=cfg.ln_eps)
    return h + nn.linear(lp["fc2"], jax.nn.relu(nn.linear(lp["fc1"], hn)))


def layer_decode(lp, h, ck, cv, write_index, bias, cfg: OPTConfig,
                 lora=None, lora_scale=1.0):
    """One decoder layer for one incremental token. h [B, H]; ck/cv
    [B, T, H] (this layer's cache); write_index [B] per-row K/V slot;
    bias [B, 1, 1, T] additive attention bias over the cache slots.
    Returns (h, ck, cv) with the new K/V scattered in."""
    hn = nn.layernorm(lp["ln1"], h, eps=cfg.ln_eps)
    q, k, v = _qkv(lp, hn, lora, lora_scale)
    ck = _scatter_rows(ck, k.astype(ck.dtype), write_index)
    cv = _scatter_rows(cv, v.astype(cv.dtype), write_index)
    return _decode_attend(lp, h, q, ck, cv, bias, cfg), ck, cv


def layer_decode_q(lp, h, ckq, cks, cvq, cvs, write_index, bias,
                   cfg: OPTConfig, lora=None, lora_scale=1.0):
    """layer_decode with an int8 cache (ops/quant.py): ckq/cvq int8
    [B, T, H] + per-slot scales cks/cvs f32 [B, T, 1]. The new token's
    K/V row is quantized before the scatter; attention dequantizes on
    read (XLA fuses the convert+scale into the matmul operand load — the
    HBM traffic is the int8 bytes)."""
    from ...ops import quant

    hn = nn.layernorm(lp["ln1"], h, eps=cfg.ln_eps)
    q, k, v = _qkv(lp, hn, lora, lora_scale)
    kq, ks = quant.quantize_rows(k)
    vq, vs = quant.quantize_rows(v)
    ckq = _scatter_rows(ckq, kq, write_index)
    cks = _scatter_rows(cks, ks, write_index)
    cvq = _scatter_rows(cvq, vq, write_index)
    cvs = _scatter_rows(cvs, vs, write_index)
    kd = quant.dequantize(ckq, cks, h.dtype)
    vd = quant.dequantize(cvq, cvs, h.dtype)
    return (_decode_attend(lp, h, q, kd, vd, bias, cfg),
            ckq, cks, cvq, cvs)


def prefill(params, inputs_embeds, attention_mask, cfg: OPTConfig,
            max_new_tokens: int, lora=None, lora_scale=1.0,
            cache_dtype=None):
    """Full-prompt forward that also fills per-layer K/V caches.

    Returns (hidden [B, L, H] post final-LN, caches). Caches are
    {"k": [n_layers, B, T, H], "v": ...} with T = L + max_new_tokens,
    prompt K/V written at [0, L) (padded rows included — attention masks
    them), generation slots zero-initialised. cache_dtype="int8" stores
    quantized caches instead: {"k"/"v": int8, "k_scale"/"v_scale": f32
    [n_layers, B, T, 1]} (ops/quant.py — 2-4x less decode HBM traffic).
    """
    mask = attention_mask.astype(jnp.int32)
    positions = jnp.cumsum(mask, axis=1) * mask - 1 + cfg.pos_offset
    positions = jnp.clip(positions, 0, cfg.max_pos + cfg.pos_offset - 1)
    h = inputs_embeds + nn.embedding(params["embed_positions"], positions
                                     ).astype(inputs_embeds.dtype)
    l = h.shape[1]
    causal = jnp.tril(jnp.ones((l, l), jnp.float32))[None, None]
    pad = mask.astype(jnp.float32)[:, None, None, :]
    bias = (1.0 - causal * pad) * jnp.finfo(jnp.float32).min
    ks, vs = [], []
    for i, lp in enumerate(params["layers"]):
        layer_lora = None if lora is None else lora.get(i)
        h, k, v = layer_prefill(lp, h, bias, cfg, layer_lora, lora_scale,
                                mask=mask)
        ks.append(jnp.pad(k, ((0, 0), (0, max_new_tokens), (0, 0))))
        vs.append(jnp.pad(v, ((0, 0), (0, max_new_tokens), (0, 0))))
    if cache_dtype == "int8":
        from ...ops import quant

        kq, ksc = quant.quantize_rows(jnp.stack(ks))
        vq, vsc = quant.quantize_rows(jnp.stack(vs))
        caches = {"k": kq, "k_scale": ksc, "v": vq, "v_scale": vsc}
    elif cache_dtype is not None:
        raise ValueError(f"unknown cache_dtype {cache_dtype!r} "
                         "(None or 'int8')")
    else:
        caches = {"k": jnp.stack(ks), "v": jnp.stack(vs)}
    return nn.layernorm(params["final_ln"], h, eps=cfg.ln_eps), caches


def decode_step(params, caches, tok_emb, write_index, positions, attn_mask,
                cfg: OPTConfig, lora=None, lora_scale=1.0):
    """One incremental token: tok_emb [B, H], write_index [B] (per-row slot
    for this token's K/V — rows are right-padded so slots are ragged),
    positions [B] (OPT learned-position index), attn_mask [B, T] marking
    every K/V slot this token may attend to (valid prompt + generated so
    far + itself). Returns (hidden [B, H] post final-LN, updated caches).
    """
    h = tok_emb + nn.embedding(params["embed_positions"], positions
                               ).astype(tok_emb.dtype)
    bias = ((1.0 - attn_mask.astype(jnp.float32))
            * jnp.finfo(jnp.float32).min)[:, None, None, :]   # [B,1,1,T]
    quantized = "k_scale" in caches
    new = {k: [] for k in caches}
    for i, lp in enumerate(params["layers"]):
        layer_lora = None if lora is None else lora.get(i)
        if quantized:
            h, ckq, cks, cvq, cvs = layer_decode_q(
                lp, h, caches["k"][i], caches["k_scale"][i],
                caches["v"][i], caches["v_scale"][i], write_index, bias,
                cfg, layer_lora, lora_scale)
            new["k_scale"].append(cks)
            new["v_scale"].append(cvs)
        else:
            h, ckq, cvq = layer_decode(lp, h, caches["k"][i],
                                       caches["v"][i], write_index, bias,
                                       cfg, layer_lora, lora_scale)
        new["k"].append(ckq)
        new["v"].append(cvq)
    caches = {k: jnp.stack(v) for k, v in new.items()}
    return nn.layernorm(params["final_ln"], h, eps=cfg.ln_eps), caches


def generate(params, inputs_embeds, attention_mask, cfg: OPTConfig,
             max_new_tokens: int, eos_id: int = 2, lora=None,
             lora_scale=1.0, sampler=None, rng=None, cache_dtype=None):
    """KV-cache generation over pre-built input embeddings — the
    single-device token loop shared by blip2.generate (which prepends the
    projected query embeddings) and parity-tested against pp_generate.

    Greedy by default (reference BLIP-2 eval parity,
    blip_2_training.py:296-297). Pass ``sampler``
    (ops.sampling.SamplerConfig with temperature set) + ``rng`` for HF
    do_sample semantics (temperature/top-k/top-p, the knobs the
    reference's host-side LLM paths use) — the draw happens inside the
    decode scan, one fold_in key per step, zero host round-trips.

    Static shapes: prefill fills the [L + max_new_tokens] caches once,
    then a ``lax.scan`` appends one token per step. Left- OR right-padded
    prompts (generated K/V always land in the tail slots; pad positions
    stay masked). cache_dtype="int8" stores quantized K/V (ops/quant.py):
    2x (bf16) / 4x (f32) less decode-attention HBM traffic and cache
    memory.

    Returns (tokens [B, max_new_tokens] int32, valid [B, max_new_tokens]
    bool) — each row's EOS token is its last valid entry; ``valid`` is
    False strictly AFTER the EOS.
    """
    from ...ops import sampling as smp

    sampler = smp.GREEDY if sampler is None else sampler
    if sampler.temperature is not None and rng is None:
        raise ValueError("sampling (temperature set) requires rng")
    if rng is None:
        rng = jax.random.PRNGKey(0)                # unused by greedy
    mask = attention_mask.astype(jnp.int32)
    b, l = mask.shape
    h, caches = prefill(params, inputs_embeds, mask, cfg, max_new_tokens,
                        lora=lora, lora_scale=lora_scale,
                        cache_dtype=cache_dtype)
    n_valid = jnp.sum(mask, axis=1)                            # [B]
    last_idx = jnp.argmax(mask * jnp.arange(1, l + 1)[None, :], axis=1)
    h_last = h[jnp.arange(b), last_idx]
    tok0 = smp.sample_tokens(jax.random.fold_in(rng, 0),
                             lm_head(params, h_last), sampler)

    # growing attention mask over the [L + max_new_tokens] cache slots:
    # valid prompt slots, then one generated slot per step (pad slots in
    # the middle stay masked)
    base_mask = jnp.pad(mask, ((0, 0), (0, max_new_tokens)))
    slot_ids = jnp.arange(l + max_new_tokens)[None, :]
    dtype = inputs_embeds.dtype

    def step(carry, t):
        caches, tok, done = carry
        write_vec = jnp.full((b,), l, jnp.int32) + t
        # decode_hidden's cumsum convention: token with k valid
        # predecessors sits at learned-position k + offset
        positions = n_valid + t + cfg.pos_offset
        attn = base_mask | ((slot_ids >= l) & (slot_ids <= l + t)
                            ).astype(jnp.int32)
        emb = embed_tokens(params, tok).astype(dtype)
        h, caches = decode_step(params, caches, emb, write_vec, positions,
                                attn, cfg, lora=lora, lora_scale=lora_scale)
        nxt = smp.sample_tokens(jax.random.fold_in(rng, t + 1),
                                lm_head(params, h), sampler)
        out_valid = ~done
        done = done | (tok == eos_id)
        return (caches, nxt, done), (tok, out_valid)

    (_, _, _), (toks, valid) = jax.lax.scan(
        step, (caches, tok0, jnp.zeros((b,), bool)),
        jnp.arange(max_new_tokens))
    return jnp.transpose(toks), jnp.transpose(valid)


def convert_torch(sd, cfg: OPTConfig):
    """HF keys under language_model.model.decoder.* (prefix-stripped)."""
    params = {
        "embed_tokens": {"w": jnp.asarray(sd["embed_tokens.weight"])},
        "embed_positions": {"w": jnp.asarray(sd["embed_positions.weight"])},
        "final_ln": ln_(sd, "final_layer_norm"),
        "layers": [],
    }
    for i in range(cfg.layers):
        pre = f"layers.{i}."
        params["layers"].append({
            "ln1": ln_(sd, pre + "self_attn_layer_norm"),
            "q": lin(sd, pre + "self_attn.q_proj"),
            "k": lin(sd, pre + "self_attn.k_proj"),
            "v": lin(sd, pre + "self_attn.v_proj"),
            "out": lin(sd, pre + "self_attn.out_proj"),
            "ln2": ln_(sd, pre + "final_layer_norm"),
            "fc1": lin(sd, pre + "fc1"),
            "fc2": lin(sd, pre + "fc2"),
        })
    return params
