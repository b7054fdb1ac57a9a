"""Speculative decoding (opt.decode_chunk + opt.speculative_generate):
the defining property is EXACT token identity with the plain greedy
stream — the draft only changes how fast tokens arrive, never which."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garbage_classification_rca_tpu.models.vlm import opt


def _cfgs():
    tgt = opt.OPTConfig(layers=4, hidden=64, heads=4, ffn=128, vocab=200,
                        max_pos=64)
    drf = opt.OPTConfig(layers=2, hidden=32, heads=2, ffn=64, vocab=200,
                        max_pos=64)
    return tgt, drf


def _inputs(cfg, dcfg, b=4, l=7, seed=1):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(4, cfg.vocab - 4, (b, l)).astype(np.int32))
    mask = np.ones((b, l), np.int32)
    mask[0, -3:] = 0                    # right-padded
    mask[2, :2] = 0                     # left-padded (production batcher)
    return ids, jnp.asarray(mask)


def test_decode_chunk_matches_sequential_steps():
    """A C-token chunk at ragged per-row offsets == C decode_steps."""
    cfg, _ = _cfgs()
    params = opt.init(jax.random.PRNGKey(0), cfg)
    ids, mask = _inputs(cfg, None)
    emb = opt.embed_tokens(params, ids)
    b, l = mask.shape
    c, n_new = 3, 5
    t = l + n_new
    _, cache0 = opt.prefill(params, emb, mask, cfg, n_new)

    rng = np.random.default_rng(7)
    toks = jnp.asarray(rng.integers(4, cfg.vocab - 4, (b, c)
                                    ).astype(np.int32))
    n_valid = jnp.sum(mask, axis=1)
    base = jnp.full((b,), l, jnp.int32)     # all rows start at slot l here
    slots = jnp.arange(t)
    base_mask = jnp.pad(mask, ((0, 0), (0, n_new)))

    # sequential oracle
    cache_s = cache0
    hs = []
    for j in range(c):
        attn = base_mask | ((slots[None] >= l) & (slots[None] <= l + j)
                            ).astype(jnp.int32)
        h, cache_s = opt.decode_step(
            params, cache_s, opt.embed_tokens(params, toks[:, j]),
            base + j, n_valid + j + cfg.pos_offset, attn, cfg)
        hs.append(h)
    want = jnp.stack(hs, axis=1)

    offs = jnp.arange(c)
    pos = n_valid[:, None] + offs[None] + cfg.pos_offset
    upto = (base[:, None] + offs[None])[:, :, None]
    attn = (base_mask[:, None, :]
            | ((slots[None, None] >= l) & (slots[None, None] <= upto)
               ).astype(jnp.int32))
    got, cache_c = opt.decode_chunk(
        params, cache0, opt.embed_tokens(params, toks), base, pos, attn,
        cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    for key in ("k", "v"):
        np.testing.assert_allclose(np.asarray(cache_c[key]),
                                   np.asarray(cache_s[key]),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("draft_kind,draft_k", [
    ("perfect", 4),     # draft == target: max acceptance every round
    ("random", 4),      # unrelated draft: mostly rejected, still exact
    ("random", 2),
    ("int8-self", 4),   # self-speculation: the weight-only-int8 twin
                        # drafts, the bf16 target verifies — bf16-exact
                        # stream at near-int8 decode cost (high
                        # acceptance: int8 flips only inside tiny
                        # logit margins, tests/test_quant.py)
])
def test_speculative_matches_greedy(draft_kind, draft_k):
    cfg, dcfg = _cfgs()
    params = opt.init(jax.random.PRNGKey(0), cfg)
    if draft_kind == "perfect":
        dcfg, draft = cfg, params
    elif draft_kind == "int8-self":
        from garbage_classification_rca_tpu.ops import quant

        dcfg, draft = cfg, quant.quantize_opt_weights(params)
    else:
        draft = opt.init(jax.random.PRNGKey(9), dcfg)
    ids, mask = _inputs(cfg, dcfg)
    emb = opt.embed_tokens(params, ids)
    demb = opt.embed_tokens(draft, ids)

    want_t, want_v = opt.generate(params, emb, mask, cfg, max_new_tokens=7)
    got_t, got_v = opt.speculative_generate(
        params, draft, emb, demb, mask, cfg, dcfg, max_new_tokens=7,
        draft_k=draft_k)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t),
                                  err_msg=f"speculative ({draft_kind}, "
                                  f"k={draft_k}) != greedy")
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_speculative_eos_semantics():
    cfg, dcfg = _cfgs()
    params = opt.init(jax.random.PRNGKey(0), cfg)
    draft = opt.init(jax.random.PRNGKey(9), dcfg)
    ids, mask = _inputs(cfg, dcfg)
    emb = opt.embed_tokens(params, ids)
    demb = opt.embed_tokens(draft, ids)
    toks, _ = opt.generate(params, emb, mask, cfg, max_new_tokens=6)
    eos = int(np.asarray(toks)[0, 2])   # fires mid-stream on row 0
    want_t, want_v = opt.generate(params, emb, mask, cfg,
                                  max_new_tokens=6, eos_id=eos)
    got_t, got_v = opt.speculative_generate(
        params, draft, emb, demb, mask, cfg, dcfg, max_new_tokens=6,
        draft_k=3, eos_id=eos)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_speculative_is_jittable():
    cfg, dcfg = _cfgs()
    params = opt.init(jax.random.PRNGKey(0), cfg)
    draft = opt.init(jax.random.PRNGKey(9), dcfg)
    ids, mask = _inputs(cfg, dcfg)
    emb = opt.embed_tokens(params, ids)
    demb = opt.embed_tokens(draft, ids)
    fn = jax.jit(lambda p, d, e, de, m: opt.speculative_generate(
        p, d, e, de, m, cfg, dcfg, max_new_tokens=5, draft_k=3))
    got_t, _ = fn(params, draft, emb, demb, mask)
    want_t, _ = opt.generate(params, emb, mask, cfg, max_new_tokens=5)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
