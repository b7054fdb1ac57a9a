"""ops/sampling.py vs HF transformers' logits processors (the semantics
the reference's host-side LLM paths use: do_sample, temperature, top_p —
synonimous_words_generator.py / generate_captions_llama.py), plus the
sampled opt.generate path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from garbage_classification_rca_tpu.ops import sampling as smp


def _rand_logits(b=3, v=101, seed=0):
    # distinct values — HF's positional tie-breaking at the top-p/top-k
    # threshold is undefined for exact float ties (documented in
    # filter_logits); real-model logits never tie exactly.
    rng = np.random.default_rng(seed)
    x = rng.permutation(b * v).astype(np.float32).reshape(b, v)
    return x / 7.0 - 5.0


def _hf_filtered(logits, temperature=None, top_k=0, top_p=1.0):
    from transformers import (LogitsProcessorList, TemperatureLogitsWarper,
                              TopKLogitsWarper, TopPLogitsWarper)
    procs = LogitsProcessorList()
    if temperature is not None:
        procs.append(TemperatureLogitsWarper(temperature))
    if top_k:
        procs.append(TopKLogitsWarper(top_k))
    if top_p < 1.0:
        procs.append(TopPLogitsWarper(top_p))
    ids = torch.zeros((logits.shape[0], 1), dtype=torch.long)
    return procs(ids, torch.from_numpy(logits).clone()).numpy()


@pytest.mark.parametrize("temperature,top_k,top_p", [
    (0.4, 0, 0.9),        # the reference's LLM sampling knobs
    (1.0, 10, 1.0),
    (0.7, 25, 0.95),
    (2.5, 0, 0.5),
    (1.0, 0, 0.01),       # degenerate: keeps exactly the argmax
    (1.0, 500, 1.0),      # top_k > vocab: HF clamps to vocab (keep all)
    (0.4, 500, 0.9),      # ... and top-p still applies after the clamp
])
def test_filter_logits_matches_hf_warpers(temperature, top_k, top_p):
    logits = _rand_logits()
    want = _hf_filtered(logits, temperature, top_k, top_p)
    got = np.asarray(smp.filter_logits(
        jnp.asarray(logits),
        smp.SamplerConfig(temperature=temperature, top_k=top_k,
                          top_p=top_p)))
    # identical survivor sets and identical surviving values
    np.testing.assert_array_equal(np.isinf(got), np.isinf(want))
    np.testing.assert_allclose(got[~np.isinf(got)], want[~np.isinf(want)],
                               rtol=1e-6)


def test_greedy_is_argmax_and_key_independent():
    logits = jnp.asarray(_rand_logits())
    t1 = smp.sample_tokens(jax.random.PRNGKey(0), logits, smp.GREEDY)
    t2 = smp.sample_tokens(jax.random.PRNGKey(7), logits, smp.GREEDY)
    np.testing.assert_array_equal(np.asarray(t1),
                                  np.argmax(np.asarray(logits), axis=-1))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_sampling_deterministic_per_key_and_in_support():
    logits = jnp.asarray(_rand_logits(b=64, v=50, seed=3))
    cfg = smp.SamplerConfig(temperature=0.4, top_p=0.9)
    a = smp.sample_tokens(jax.random.PRNGKey(1), logits, cfg)
    b = smp.sample_tokens(jax.random.PRNGKey(1), logits, cfg)
    c = smp.sample_tokens(jax.random.PRNGKey(2), logits, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (np.asarray(a) != np.asarray(c)).any()
    # every draw lies in the HF-filtered support
    want = _hf_filtered(np.asarray(logits), 0.4, 0, 0.9)
    rows = np.arange(want.shape[0])
    assert not np.isinf(want[rows, np.asarray(a)]).any()
    assert not np.isinf(want[rows, np.asarray(c)]).any()


def test_top_k1_equals_greedy_any_key():
    logits = jnp.asarray(_rand_logits(b=8, v=40, seed=5))
    cfg = smp.SamplerConfig(temperature=1.3, top_k=1)
    toks = smp.sample_tokens(jax.random.PRNGKey(9), logits, cfg)
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.argmax(np.asarray(logits), axis=-1))


def test_opt_generate_sampled():
    """The sampled decode loop: deterministic per key, in-support draws,
    and an explicit error when rng is missing."""
    from garbage_classification_rca_tpu.models.vlm import opt

    cfg = opt.OPTConfig(layers=2, hidden=32, heads=4, ffn=64, vocab=120,
                        max_pos=32)
    params = opt.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.normal(size=(4, 6, cfg.hidden)).astype(np.float32))
    mask = np.ones((4, 6), np.int32)
    mask[1, -2:] = 0
    mask = jnp.asarray(mask)
    sampler = smp.SamplerConfig(temperature=0.8, top_p=0.9)

    with pytest.raises(ValueError):
        opt.generate(params, emb, mask, cfg, max_new_tokens=4,
                     sampler=sampler)

    t1, v1 = opt.generate(params, emb, mask, cfg, max_new_tokens=4,
                          sampler=sampler, rng=jax.random.PRNGKey(11))
    t2, _ = opt.generate(params, emb, mask, cfg, max_new_tokens=4,
                         sampler=sampler, rng=jax.random.PRNGKey(11))
    t3, _ = opt.generate(params, emb, mask, cfg, max_new_tokens=4,
                         sampler=sampler, rng=jax.random.PRNGKey(12))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert (np.asarray(t1) != np.asarray(t3)).any()
    assert v1.shape == (4, 4)

    # near-zero temperature with top_k=1 reproduces the greedy stream
    g, _ = opt.generate(params, emb, mask, cfg, max_new_tokens=4)
    s, _ = opt.generate(params, emb, mask, cfg, max_new_tokens=4,
                        sampler=smp.SamplerConfig(temperature=0.05,
                                                  top_k=1),
                        rng=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(s))
