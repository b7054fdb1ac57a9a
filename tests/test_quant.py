"""int8 KV cache (ops/quant.py + opt.py layer_decode_q / prefill
cache_dtype): quantization error bounds and the end-to-end quantized
decode loop vs the fp cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garbage_classification_rca_tpu.models.vlm import opt
from garbage_classification_rca_tpu.ops import quant


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 7, 64)).astype(np.float32) * 3.0)
    q, s = quant.quantize_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (5, 7, 1)
    dq = quant.dequantize(q, s, jnp.float32)
    # symmetric rounding: |err| <= scale/2 = absmax/254 per row
    amax = np.max(np.abs(np.asarray(x)), axis=-1, keepdims=True)
    assert (np.abs(np.asarray(dq) - np.asarray(x))
            <= amax / 254.0 + 1e-7).all()


def test_quantize_zero_rows_exact():
    x = jnp.zeros((2, 3, 16), jnp.float32)
    q, s = quant.quantize_rows(x)
    np.testing.assert_array_equal(np.asarray(q), 0)
    np.testing.assert_array_equal(np.asarray(s), 1.0)
    np.testing.assert_array_equal(
        np.asarray(quant.dequantize(q, s, jnp.float32)), 0.0)


def _tiny():
    cfg = opt.OPTConfig(layers=3, hidden=64, heads=4, ffn=128, vocab=160,
                        max_pos=48)
    params = opt.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    emb = jnp.asarray(rng.normal(size=(4, 9, cfg.hidden)).astype(np.float32))
    mask = np.ones((4, 9), np.int32)
    mask[0, -3:] = 0
    mask[2, :2] = 0                      # a left-padded row too
    return cfg, params, emb, jnp.asarray(mask)


def test_int8_cache_layout_and_logit_closeness():
    """prefill(cache_dtype='int8') stores int8 + per-slot scales; one
    decode_step's output hidden stays close to the fp-cache step (the
    per-element quantization error is <= 1/254 relative to the row max,
    averaged down by head_dim in the attention contraction)."""
    cfg, params, emb, mask = _tiny()
    n_new = 4
    h_fp, c_fp = opt.prefill(params, emb, mask, cfg, n_new)
    h_q, c_q = opt.prefill(params, emb, mask, cfg, n_new,
                           cache_dtype="int8")
    np.testing.assert_array_equal(np.asarray(h_fp), np.asarray(h_q))
    assert c_q["k"].dtype == jnp.int8 and c_q["v"].dtype == jnp.int8
    assert c_q["k_scale"].shape == c_q["k"].shape[:-1] + (1,)

    b, l = mask.shape
    tok = jnp.asarray([1, 2, 3, 4], jnp.int32)
    wv = jnp.full((b,), l, jnp.int32)
    pos = jnp.sum(mask, axis=1) + cfg.pos_offset
    attn = jnp.pad(mask, ((0, 0), (0, n_new)))
    attn = attn.at[:, l].set(1)
    te = opt.embed_tokens(params, tok)
    hd_fp, _ = opt.decode_step(params, c_fp, te, wv, pos, attn, cfg)
    hd_q, _ = opt.decode_step(params, c_q, te, wv, pos, attn, cfg)
    err = np.max(np.abs(np.asarray(hd_fp) - np.asarray(hd_q)))
    scale = np.max(np.abs(np.asarray(hd_fp)))
    assert err < 0.02 * scale, (err, scale)


def test_int8_generate_matches_fp_greedy():
    """Greedy token streams with the int8 cache match the fp cache on the
    tiny model (margins dominate the ~0.4% quantization noise)."""
    cfg, params, emb, mask = _tiny()
    t_fp, v_fp = opt.generate(params, emb, mask, cfg, max_new_tokens=6)
    t_q, v_q = opt.generate(params, emb, mask, cfg, max_new_tokens=6,
                            cache_dtype="int8")
    np.testing.assert_array_equal(np.asarray(t_q), np.asarray(t_fp))
    np.testing.assert_array_equal(np.asarray(v_q), np.asarray(v_fp))


def test_unknown_cache_dtype_rejected():
    cfg, params, emb, mask = _tiny()
    with pytest.raises(ValueError):
        opt.prefill(params, emb, mask, cfg, 2, cache_dtype="fp4")
