"""Pipeline parallelism (parallel/pp.py) on the 8-virtual-device CPU mesh:
GPipe-scheduled OPT decoder must reproduce the single-device forward."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garbage_classification_rca_tpu.models.vlm import opt
from garbage_classification_rca_tpu.parallel import pp
from garbage_classification_rca_tpu.parallel.mesh import make_mesh


def _tiny_opt():
    cfg = opt.OPTConfig(layers=4, hidden=64, heads=4, ffn=128, vocab=200,
                        max_pos=64)
    params = opt.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _inputs(cfg, b=4, l=7):
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(b, l, cfg.hidden)).astype(np.float32)
    mask = np.ones((b, l), np.int32)
    mask[0, -3:] = 0          # right-padded row
    mask[2, -1:] = 0
    return jnp.asarray(emb), jnp.asarray(mask)


def test_stack_pipeline_params_shapes():
    cfg, params = _tiny_opt()
    stacked = pp.stack_pipeline_params(params["layers"], 4)
    assert stacked["q"]["w"].shape == (4, 1, cfg.hidden, cfg.hidden)
    stacked2 = pp.stack_pipeline_params(params["layers"], 2)
    assert stacked2["fc1"]["w"].shape == (2, 2, cfg.hidden, cfg.ffn)
    with pytest.raises(ValueError):
        pp.stack_pipeline_params(params["layers"], 3)


@pytest.mark.parametrize("n_stages,n_micro", [(4, 2), (2, 4), (8, 1)])
def test_pp_decode_hidden_matches_single_device(n_stages, n_micro):
    cfg, params = _tiny_opt()
    if cfg.layers % n_stages:
        cfg = opt.OPTConfig(layers=n_stages, hidden=64, heads=4, ffn=128,
                            vocab=200, max_pos=64)
        params = opt.init(jax.random.PRNGKey(0), cfg)
    emb, mask = _inputs(cfg, b=4, l=7)

    want = opt.decode_hidden(params, emb, mask, cfg)

    mesh = make_mesh(f"pipe:{n_stages}")
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["layers"], n_stages))
    got = pp.pp_decode_hidden(params, stacked, emb, mask, cfg,
                              mesh, n_microbatches=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pp_logits_match_decode():
    cfg, params = _tiny_opt()
    emb, mask = _inputs(cfg)
    mesh = make_mesh("pipe:4")
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["layers"], 4))
    got = pp.pp_decode(params, stacked, emb, mask, cfg, mesh,
                       n_microbatches=2)
    want = opt.decode(params, emb, mask, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_pp_rejects_indivisible_batch():
    cfg, params = _tiny_opt()
    emb, mask = _inputs(cfg, b=4)
    mesh = make_mesh("pipe:4")
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["layers"], 4))
    with pytest.raises(ValueError):
        pp.pp_decode_hidden(params, stacked, emb, mask, cfg, mesh,
                            n_microbatches=3)


def test_pp_composes_with_dp():
    """dp x pp: on a data:2,pipe:4 mesh the microbatch sample dim is
    sharded over 'data' (each data shard pipelines its half of the batch
    independently) and the result still equals the single-device forward."""
    cfg, params = _tiny_opt()
    emb, mask = _inputs(cfg, b=4, l=7)
    want = opt.decode_hidden(params, emb, mask, cfg)

    mesh = make_mesh("data:2,pipe:4")
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["layers"], 4))
    got = pp.pp_decode_hidden(params, stacked, emb, mask, cfg, mesh,
                              n_microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5,
                               err_msg="dp x pp != single-device")
    # microbatch size 2 does not divide data:4 -> explicit error
    mesh4 = make_mesh("data:4,pipe:2")
    stacked2 = pp.shard_pipeline_params(
        mesh4, pp.stack_pipeline_params(params["layers"], 2))
    with pytest.raises(ValueError):
        pp.pp_decode_hidden(params, stacked2, emb, mask, cfg, mesh4,
                            n_microbatches=2)


def test_pp_backward_matches_single_device():
    """The pipeline is differentiable (scan + ppermute reverse cleanly),
    so pp supports GPipe TRAINING, not just serving: grads of a scalar
    loss wrt every stage's layer params must match the single-device
    backward (restacked for comparison)."""
    cfg, params = _tiny_opt()
    emb, mask = _inputs(cfg)
    mesh = make_mesh("pipe:4")
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["layers"], 4))

    def loss_pp(stage_layers):
        h = pp.pp_decode_hidden(params, stage_layers, emb, mask, cfg,
                                mesh, n_microbatches=2)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    def loss_1(layers):
        full = dict(params)
        full["layers"] = layers
        h = opt.decode_hidden(full, emb, mask, cfg)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(stacked)
    g_1 = pp.stack_pipeline_params(
        jax.grad(loss_1)(params["layers"]), 4)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg="pp grads != single-device")


@pytest.mark.parametrize("mesh_spec,n_stages", [
    ("pipe:4", 4), ("pipe:2", 2), ("data:2,pipe:4", 4)])
def test_pp_generate_matches_single_device(mesh_spec, n_stages):
    """Pipelined ring generation reproduces opt.generate token-for-token
    (incl. the valid mask), with and without a composed dp axis."""
    cfg, params = _tiny_opt()
    emb, mask = _inputs(cfg, b=8, l=7)
    want_t, want_v = jax.jit(partial(
        opt.generate, cfg=cfg, max_new_tokens=5))(params, emb, mask)

    mesh = make_mesh(mesh_spec)
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["layers"], n_stages))
    got_t, got_v = pp.pp_generate(params, stacked, emb, mask, cfg, mesh,
                                  max_new_tokens=5)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t),
                                  err_msg="pp tokens != single-device")
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_pp_generate_with_lora_matches_single_device():
    """stage_lora applies the per-layer q/k adapters inside the ring —
    tokens must equal opt.generate with the same adapters (and differ
    from the base model, so the adapters demonstrably fired)."""
    cfg, params = _tiny_opt()
    emb, mask = _inputs(cfg, b=8, l=7)
    rng = jax.random.PRNGKey(3)
    # adapters with non-zero B so they change the logits
    lora = {}
    for i in range(cfg.layers):
        k = jax.random.fold_in(rng, i)
        ka, kb = jax.random.split(k)
        lora[str(i)] = {
            name: {"a": jax.random.normal(jax.random.fold_in(ka, j),
                                          (cfg.hidden, 4)) * 0.3,
                   "b": jax.random.normal(jax.random.fold_in(kb, j),
                                          (4, cfg.hidden)) * 0.3}
            for j, name in enumerate(("q", "k"))}
    want_t, want_v = opt.generate(params, emb, mask, cfg,
                                  max_new_tokens=5, lora=lora,
                                  lora_scale=0.25)
    base_t, _ = opt.generate(params, emb, mask, cfg, max_new_tokens=5)
    assert not np.array_equal(np.asarray(want_t), np.asarray(base_t))

    mesh = make_mesh("data:2,pipe:4")
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["layers"], 4))
    slora = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_lora(lora, cfg.layers, 4))
    got_t, got_v = pp.pp_generate(params, stacked, emb, mask, cfg, mesh,
                                  max_new_tokens=5, stage_lora=slora,
                                  lora_scale=0.25)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t),
                                  err_msg="pp+lora tokens != single-device")
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_pp_generate_eos_semantics():
    """Pick an eos id that actually occurs mid-stream; both paths must
    mark it as the last valid entry and mask everything after it."""
    cfg, params = _tiny_opt()
    emb, mask = _inputs(cfg, b=4, l=7)
    toks, _ = opt.generate(params, emb, mask, cfg, max_new_tokens=5)
    eos = int(np.asarray(toks)[0, 1])          # generated at step 1, row 0
    want_t, want_v = opt.generate(params, emb, mask, cfg,
                                  max_new_tokens=5, eos_id=eos)
    w_v = np.asarray(want_v)
    assert w_v[0, 1] and not w_v[0, 2:].any()  # eos valid, then masked

    mesh = make_mesh("pipe:4")
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["layers"], 4))
    got_t, got_v = pp.pp_generate(params, stacked, emb, mask, cfg, mesh,
                                  max_new_tokens=5, eos_id=eos)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_array_equal(np.asarray(got_v), w_v)


def test_pp_generate_rejects_indivisible_batch():
    cfg, params = _tiny_opt()
    emb, mask = _inputs(cfg, b=6, l=7)         # 6 % 4 != 0
    mesh = make_mesh("pipe:4")
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["layers"], 4))
    with pytest.raises(ValueError):
        pp.pp_generate(params, stacked, emb, mask, cfg, mesh,
                       max_new_tokens=3)


def test_pp_generate_int8_cache_matches_single_device():
    """pp_generate(cache_dtype='int8') uses the same per-slot
    quantization as opt.generate, so the token streams must be identical
    to the single-device int8 path."""
    cfg, params = _tiny_opt()
    emb, mask = _inputs(cfg, b=8, l=7)
    want_t, want_v = opt.generate(params, emb, mask, cfg,
                                  max_new_tokens=5, cache_dtype="int8")
    mesh = make_mesh("pipe:4")
    stacked = pp.shard_pipeline_params(
        mesh, pp.stack_pipeline_params(params["layers"], 4))
    got_t, got_v = pp.pp_generate(params, stacked, emb, mask, cfg, mesh,
                                  max_new_tokens=5, cache_dtype="int8")
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t),
                                  err_msg="pp int8 tokens != single-device")
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    with pytest.raises(ValueError):
        pp.pp_generate(params, stacked, emb, mask, cfg, mesh,
                       max_new_tokens=5, cache_dtype="fp4")
