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


# ---------------------------------------------------------------------------
# Weight-only int8 (ops/quant.py quantize_linear / quantize_opt_weights
# + nn.core.linear "w_scale" path). Decode re-reads every weight byte per
# token, so int8 weights halve the serving decode's HBM traffic; these
# tests pin the numerics contract and that every OPT entry point consumes
# the quantized tree unchanged.
# ---------------------------------------------------------------------------


def test_quantize_linear_error_bound():
    from garbage_classification_rca_tpu.nn import core as nn

    rng = np.random.default_rng(1)
    p = {"w": jnp.asarray(rng.normal(size=(48, 24)).astype(np.float32)),
         "b": jnp.asarray(rng.normal(size=(24,)).astype(np.float32))}
    q = quant.quantize_linear(p)
    assert q["w"].dtype == jnp.int8 and q["w_scale"].shape == (1, 24)
    # per-output-channel symmetric rounding: |err| <= col absmax / 254
    deq = np.asarray(q["w"], np.float32) * np.asarray(q["w_scale"])
    amax = np.max(np.abs(np.asarray(p["w"])), axis=0, keepdims=True)
    assert (np.abs(deq - np.asarray(p["w"])) <= amax / 254.0 + 1e-7).all()
    # nn.core.linear(quantized) == matmul against the dequantized weight
    x = jnp.asarray(rng.normal(size=(5, 48)).astype(np.float32))
    y_q = nn.linear(q, x)
    y_ref = x @ jnp.asarray(deq) + p["b"]
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_weights_logit_closeness():
    """next-token logits with int8 weights stay within ~2% of fp (the
    only error source is the <=1/254-relative weight rounding, averaged
    down by each fan-in contraction)."""
    cfg, params, emb, mask = _tiny()
    qparams = quant.quantize_opt_weights(params)
    assert qparams["layers"][0]["q"]["w"].dtype == jnp.int8
    assert qparams["embed_tokens"]["w"].dtype != jnp.int8  # tied lm_head fp
    lg_fp = opt.decode(params, emb, mask, cfg)
    lg_q = opt.decode(qparams, emb, mask, cfg)
    err = np.max(np.abs(np.asarray(lg_fp) - np.asarray(lg_q)))
    assert err < 0.02 * np.max(np.abs(np.asarray(lg_fp))), err


def test_int8_weights_generate_greedy_contract():
    """What weight-only int8 guarantees (and no more): the stream is the
    argmax of logits within the weight-rounding error band. On a random
    tiny model (near-uniform logits over the vocab) token-for-token
    equality with fp is NOT guaranteed — so assert (a) the stream is
    invariant to the KV-cache dtype under the same quantized tree, and
    (b) a greedy token flips vs fp ONLY at positions where fp's top-2
    margin is inside the measured quantization logit error (trained
    real-scale weights have far larger margins — same argument as the
    bf16 prediction-flip audit, PARITY.md)."""
    cfg, params, emb, mask = _tiny()
    qparams = quant.quantize_opt_weights(params)
    t_fp, v_fp = opt.generate(params, emb, mask, cfg, max_new_tokens=6)
    t_q, v_q = opt.generate(qparams, emb, mask, cfg, max_new_tokens=6)
    t_q8, v_q8 = opt.generate(qparams, emb, mask, cfg, max_new_tokens=6,
                              cache_dtype="int8")
    np.testing.assert_array_equal(np.asarray(t_q8), np.asarray(t_q))
    np.testing.assert_array_equal(np.asarray(v_q8), np.asarray(v_q))
    # first new token: compare against the prefill-logit margins directly
    lg_fp = np.asarray(opt.decode(params, emb, mask, cfg))
    lg_q = np.asarray(opt.decode(qparams, emb, mask, cfg))
    err = np.max(np.abs(lg_fp - lg_q))
    last = np.asarray(jnp.sum(mask, axis=1)) - 1
    for r in range(emb.shape[0]):
        row = lg_fp[r, last[r]]
        top2 = np.sort(row)[-2:]
        margin = top2[1] - top2[0]
        if margin > 2 * err:
            assert int(np.asarray(t_q)[r, 0]) == int(np.asarray(t_fp)[r, 0])


def test_int8_weights_server_matches_generate():
    """The continuous-batching server's exactness contract holds under
    quantized weights: same stream as opt.generate on the SAME quantized
    tree (bit-exact — both paths run identical math)."""
    from garbage_classification_rca_tpu.serving.engine import GenerationServer

    cfg, params, emb, mask = _tiny()
    qparams = quant.quantize_opt_weights(params)
    max_prompt, max_new = emb.shape[1], 5
    toks, valid = opt.generate(qparams, emb, mask, cfg, max_new)
    srv = GenerationServer(qparams, cfg, slots=2, max_prompt=max_prompt,
                           max_new=max_new, eos_id=-1)
    uids = [srv.submit(np.asarray(emb[i]), np.asarray(mask[i]))
            for i in range(emb.shape[0])]
    srv.drain()
    served = srv.requests
    for i, uid in enumerate(uids):
        want = list(np.asarray(toks[i])[np.asarray(valid[i])])
        assert served[uid].tokens == want, i


def test_tp_specs_cover_quantized_tree():
    """opt_param_specs builds a spec tree structurally identical to a
    weight-only-int8 params tree (w_scale follows its weight's output
    dim: model-sharded for column-parallel, replicated for row)."""
    from jax.sharding import PartitionSpec as P

    from garbage_classification_rca_tpu.parallel import tp
    from garbage_classification_rca_tpu.parallel.mesh import MODEL_AXIS

    cfg, params, _, _ = _tiny()
    qparams = quant.quantize_opt_weights(params)
    specs = tp.opt_param_specs(qparams)
    jax.tree_util.tree_map(lambda a, b: None, qparams, specs)  # same shape
    l0 = specs["layers"][0]
    assert l0["q"]["w_scale"] == P(None, MODEL_AXIS)
    assert l0["out"]["w_scale"] == P()
    # and the fp tree still gets the original specs
    specs_fp = tp.opt_param_specs(params)
    jax.tree_util.tree_map(lambda a, b: None, params, specs_fp)
