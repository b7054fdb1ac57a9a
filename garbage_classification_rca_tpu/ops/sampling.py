"""Token sampling for the serving path: temperature / top-k / top-p.

The reference's generation surfaces sample on the host through HF
(generate_captions_llama.py and the synonymizer both run
do_sample=True, temperature=0.4, top_p=0.9); its BLIP-2 eval is greedy
(blip_2_training.py:296-297). This module brings the same knobs to the
TPU-native KV-cache loop (models/vlm/opt.py::generate): everything is
traced inside the decode ``lax.scan`` — static shapes, one sort over the
vocab per step on-device, zero host round-trips per token.

Semantics match HF's logits processors (transformers
logits_process.py: TemperatureLogitsWarper, TopKLogitsWarper,
TopPLogitsWarper, applied in that order), asserted token-set-for-token-
set against the torch implementations in tests/test_sampling.py:

* temperature: logits / T before any filtering.
* top_k: keep the k highest logits (k=0 disables).
* top_p: sort descending, keep the smallest prefix whose softmax mass
  is > p — HF keeps the FIRST token whose cumulative probability
  crosses p (min_tokens_to_keep=1), i.e. remove where
  ``cumsum(probs) - probs > p``.
* filtered positions get -inf; the draw is categorical over survivors
  via the Gumbel-max trick (jax.random.categorical).

Two measure-zero edge divergences from HF's TopPLogitsWarper, both
deliberate (filter_logits inline comments):
* exact boundary equality (cum-before == p bit-exactly) keeps the
  boundary token; HF's strict inequality drops it;
* logits EXACTLY tied at the cut are all kept (identical probabilities,
  so the kept distribution only gains equal-probability mass); HF keeps
  a sort-order-dependent subset of the tie — torch.sort is not stable,
  so HF's own tie behavior is arbitrary between runs/devices.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplerConfig:
    """Greedy when ``temperature is None`` (the default everywhere —
    reference BLIP-2 eval parity); otherwise HF do_sample semantics."""
    temperature: Optional[float] = None
    top_k: int = 0
    top_p: float = 1.0


GREEDY = SamplerConfig()


def filter_logits(logits, cfg: SamplerConfig):
    """Apply temperature, then top-k, then top-p (HF warper order).
    logits [..., V] float32 -> filtered logits with -inf at removed ids."""
    if cfg.temperature is not None:
        logits = logits / jnp.float32(max(cfg.temperature, 1e-6))
    neg = jnp.float32(-jnp.inf)
    # HF TopKLogitsWarper clamps k to the vocab size (top_k=60000 on a
    # 50272-wide vocab must degrade to "keep everything", not crash).
    top_k = min(int(cfg.top_k), logits.shape[-1]) if cfg.top_k else 0
    if top_k <= 0 and cfg.top_p >= 1.0:
        return logits
    # One descending sort serves both filters — this runs per generated
    # token inside the decode scan, so a second full-vocab sort for
    # top-p would double the per-step filtering cost.
    sorted_lg = jnp.sort(logits, axis=-1)[..., ::-1]              # desc
    if top_k > 0:
        kth = sorted_lg[..., top_k - 1][..., None]
        logits = jnp.where(logits < kth, neg, logits)
        # Mirror the filter onto the sorted copy: removed entries sort
        # to the tail in descending order, so masking the suffix equals
        # re-sorting the filtered logits.
        sorted_lg = jnp.where(sorted_lg < kth, neg, sorted_lg)
    if cfg.top_p < 1.0:
        probs = jax.nn.softmax(sorted_lg, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # HF: remove where cumulative prob EXCLUDING self exceeds p
        # (keeps the crossing token; min_tokens_to_keep=1 is implied
        # because the first entry always has cum - prob == 0 <= p)
        keep_sorted = (cum - probs) <= cfg.top_p
        # threshold = smallest kept logit; ties at the threshold are all
        # kept (same ids HF keeps — its mask is positional over the
        # stable sort, but equal logits have equal probs so any tie at
        # the cut has cum-probs <= p for at least one copy; keeping all
        # copies only ever ADDS identical-probability tokens)
        thresh = jnp.min(jnp.where(keep_sorted, sorted_lg, jnp.inf),
                         axis=-1, keepdims=True)
        logits = jnp.where(logits < thresh, neg, logits)
    return logits


def sample_tokens(key, logits, cfg: SamplerConfig):
    """One draw per row. logits [B, V] -> int32 [B]. Greedy (argmax)
    when cfg.temperature is None; otherwise categorical over
    filter_logits survivors."""
    logits = logits.astype(jnp.float32)
    if cfg.temperature is None:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(
        key, filter_logits(logits, cfg), axis=-1).astype(jnp.int32)
