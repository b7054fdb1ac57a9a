"""Tensor-parallel sharding of the OPT tower: TP output == single-device."""

import jax
import jax.numpy as jnp
import numpy as np

from garbage_classification_rca_tpu.models.vlm import opt as jopt
from garbage_classification_rca_tpu.parallel import mesh as pm
from garbage_classification_rca_tpu.parallel.tp import (opt_param_specs,
                                                        shard_with_specs)


def test_opt_tp_matches_single_device():
    cfg = jopt.OPTConfig(layers=2, hidden=64, heads=4, ffn=128, vocab=97,
                         max_pos=32)
    params = jopt.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 97, (4, 10)).astype(np.int32)
    mask = np.ones((4, 10), np.int32)
    mask[0, -3:] = 0

    embeds = jopt.embed_tokens(params, jnp.asarray(ids))
    want = np.asarray(jopt.decode(params, embeds, jnp.asarray(mask), cfg))

    mesh = pm.make_mesh("data:2,model:4")
    specs = opt_param_specs(params)
    sharded = shard_with_specs(mesh, params, specs)
    bs = pm.batch_sharding(mesh)

    @jax.jit
    def fwd(params, embeds, mask):
        return jopt.decode(params, embeds, mask, cfg)

    got = np.asarray(fwd(sharded,
                         jax.device_put(embeds, bs),
                         jax.device_put(jnp.asarray(mask), bs)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # the sharding must actually split the MLP kernel over 'model'
    fc1 = sharded["layers"][0]["fc1"]["w"]
    assert fc1.sharding.spec == jax.sharding.PartitionSpec(None, "model")


def test_opt_tp_kv_cache_generate_matches_single_device():
    """The serving decode loop (prefill + KV-cache decode_step) under a
    data x model mesh reproduces the single-device token stream — the
    multi-chip serving story for blip2.generate's OPT stage."""
    cfg = jopt.OPTConfig(layers=2, hidden=64, heads=4, ffn=128, vocab=97,
                         max_pos=64)
    params = jopt.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    b, l, n_new = 4, 10, 4
    ids = rng.integers(0, 97, (b, l)).astype(np.int32)
    mask = np.ones((b, l), np.int32)
    mask[0, -3:] = 0

    def greedy(params, ids, mask):
        embeds = jopt.embed_tokens(params, ids)
        n_valid = jnp.sum(mask, axis=1)
        h, caches = jopt.prefill(params, embeds, mask, cfg, n_new)
        tok = jnp.argmax(jopt.lm_head(
            params, h[jnp.arange(b), n_valid - 1]).astype(jnp.float32),
            axis=-1).astype(jnp.int32)
        slot_ids = jnp.arange(l + n_new)[None, :]
        base = jnp.pad(mask, ((0, 0), (0, n_new)))

        def step(carry, t):
            caches, tok = carry
            attn = base | ((slot_ids >= l) & (slot_ids <= l + t)
                           ).astype(jnp.int32)
            h, caches = jopt.decode_step(
                params, caches, jopt.embed_tokens(params, tok),
                jnp.full((b,), l, jnp.int32) + t,
                n_valid + t + cfg.pos_offset, attn, cfg)
            nxt = jnp.argmax(jopt.lm_head(params, h).astype(jnp.float32),
                             axis=-1).astype(jnp.int32)
            return (caches, nxt), tok

        (_, _), toks = jax.lax.scan(step, (caches, tok), jnp.arange(n_new))
        return jnp.transpose(toks)

    want = np.asarray(greedy(params, jnp.asarray(ids), jnp.asarray(mask)))

    mesh = pm.make_mesh("data:2,model:4")
    sharded = shard_with_specs(mesh, params, opt_param_specs(params))
    bs = pm.batch_sharding(mesh)
    got = np.asarray(jax.jit(greedy)(
        sharded, jax.device_put(jnp.asarray(ids), bs),
        jax.device_put(jnp.asarray(mask), bs)))
    np.testing.assert_array_equal(got, want)
