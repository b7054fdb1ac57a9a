"""serving/engine.py exactness contract: for ANY arrival order, queue
depth and slot count, each request served through the continuous-batching
``GenerationServer`` produces the SAME (tokens, valid) stream as
``opt.generate`` run on that request alone — greedy, sampled (per-request
fold_in key) and int8-KV variants.

The reference has no serving layer (its only generation surface is the
1-token constrained eval, blip_2_training.py:296-297); this is the
beyond-reference serving stack's correctness anchor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garbage_classification_rca_tpu.models.vlm import opt
from garbage_classification_rca_tpu.ops import sampling as smp
from garbage_classification_rca_tpu.serving.engine import GenerationServer

CFG = opt.OPTConfig(layers=2, hidden=32, heads=4, ffn=64, vocab=120,
                    max_pos=32)
MAX_PROMPT, MAX_NEW = 8, 6


@pytest.fixture(scope="module")
def params():
    return opt.init(jax.random.PRNGKey(0), CFG)


def _requests(n, seed=3):
    """n prompts with varying lengths and padding sides (the server pads
    everything to MAX_PROMPT on the right; left-padded masks exercise the
    'any padding side' contract)."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        l = int(rng.integers(2, MAX_PROMPT + 1))
        e = rng.normal(size=(l, CFG.hidden)).astype(np.float32)
        m = np.ones((l,), np.int32)
        if i % 3 == 1 and l >= 4:  # left-pad: leading mask zeros
            e = np.concatenate([np.zeros((2, CFG.hidden), np.float32), e])
            m = np.concatenate([np.zeros((2,), np.int32), m])
            e, m = e[:MAX_PROMPT], m[:MAX_PROMPT]
        out.append((e, m))
    return out


def _standalone(params, e, m, *, eos_id, sampler=None, rng=None,
                cache_dtype=None):
    """opt.generate on one request, padded exactly as the server pads it
    (right-pad to MAX_PROMPT)."""
    pad = MAX_PROMPT - e.shape[0]
    e = np.pad(e, ((0, pad), (0, 0)))
    m = np.pad(m.astype(np.int32), (0, pad))
    toks, valid = opt.generate(params, jnp.asarray(e[None]),
                               jnp.asarray(m[None]), CFG, MAX_NEW,
                               eos_id=eos_id, sampler=sampler, rng=rng,
                               cache_dtype=cache_dtype)
    toks, valid = np.asarray(toks)[0], np.asarray(valid)[0]
    # the server feeds tokens up to and including the first EOS and then
    # retires the slot; generate keeps feeding garbage with valid=False
    return list(toks[valid]), [True] * int(valid.sum())


def _pick_eos(params, reqs):
    """An eos id that actually appears mid-stream in the greedy decode of
    at least one request, so early retirement + slot refill is exercised
    (with a never-generated eos every request would run all MAX_NEW
    steps and the scheduler would never interleave lengths)."""
    for e, m in reqs:
        toks, _ = _standalone(params, e, m, eos_id=-1)
        for t in toks[1:-1]:
            return int(t)
    raise AssertionError("unreachable: every stream has interior tokens")


def _assert_served_matches(served, want):
    assert len(served) == len(want)
    for uid, (wtoks, wvalid) in want.items():
        req = served[uid]
        assert req.finished, f"request {uid} never retired"
        assert req.tokens == wtoks, f"request {uid}: token stream differs"
        assert req.valid == wvalid
        assert len(req.tokens) <= MAX_NEW


@pytest.mark.parametrize("slots", [1, 3])
def test_greedy_matches_generate_per_request(params, slots):
    """Queue depth > slots: lanes retire/refill at different ticks; every
    request's stream must still equal its standalone greedy decode."""
    reqs = _requests(7)
    eos = _pick_eos(params, reqs)
    srv = GenerationServer(params, CFG, slots=slots, max_prompt=MAX_PROMPT,
                           max_new=MAX_NEW, eos_id=eos)
    served = srv.run(reqs)
    want = {uid: _standalone(params, e, m, eos_id=eos)
            for uid, (e, m) in enumerate(reqs)}
    _assert_served_matches(served, want)


def test_arrival_order_invariance(params):
    """Submitting the same requests in reverse order changes scheduling
    entirely (different slot assignments / neighbors) but not any
    request's stream."""
    reqs = _requests(5, seed=11)
    eos = _pick_eos(params, reqs)

    def serve(order):
        srv = GenerationServer(params, CFG, slots=2,
                               max_prompt=MAX_PROMPT, max_new=MAX_NEW,
                               eos_id=eos)
        uids = {srv.submit(e, m): i for i, (e, m) in
                ((i, order[i]) for i in range(len(order)))}
        srv.drain()
        return {uids[uid]: (r.tokens, r.valid)
                for uid, r in srv.requests.items()}

    fwd = serve(reqs)
    rev = serve(list(reversed(reqs)))
    # map reverse-order uids back to the original request index
    rev = {len(reqs) - 1 - i: v for i, v in rev.items()}
    assert fwd == rev
    want = {i: _standalone(params, e, m, eos_id=eos)
            for i, (e, m) in enumerate(reqs)}
    for i, (toks, valid) in fwd.items():
        assert (toks, valid) == want[i]


def test_sampled_matches_generate_with_folded_key(params):
    """Sampled serving: request #uid reproduces opt.generate run with
    fold_in(server_rng, uid) — the documented standalone key."""
    reqs = _requests(5, seed=7)
    sampler = smp.SamplerConfig(temperature=0.8, top_p=0.9)
    root = jax.random.PRNGKey(42)
    # eos from request 0's sampled stream so retirement still happens
    t0, _ = _standalone(params, *reqs[0], eos_id=-1, sampler=sampler,
                        rng=jax.random.fold_in(root, 0))
    eos = int(t0[1])
    srv = GenerationServer(params, CFG, slots=2, max_prompt=MAX_PROMPT,
                           max_new=MAX_NEW, eos_id=eos, sampler=sampler,
                           rng=root)
    served = srv.run(reqs)
    want = {uid: _standalone(params, e, m, eos_id=eos, sampler=sampler,
                             rng=jax.random.fold_in(root, uid))
            for uid, (e, m) in enumerate(reqs)}
    _assert_served_matches(served, want)


def test_sampling_requires_rng(params):
    with pytest.raises(ValueError):
        GenerationServer(params, CFG, slots=1, max_prompt=MAX_PROMPT,
                         max_new=MAX_NEW,
                         sampler=smp.SamplerConfig(temperature=0.5))


def test_int8_cache_matches_int8_generate(params):
    """int8 KV serving == int8 opt.generate (quantization changes the
    stream vs fp32, so the oracle uses the same cache_dtype)."""
    reqs = _requests(4, seed=5)
    eos = _pick_eos(params, reqs)
    srv = GenerationServer(params, CFG, slots=2, max_prompt=MAX_PROMPT,
                           max_new=MAX_NEW, eos_id=eos, cache_dtype="int8")
    served = srv.run(reqs)
    want = {uid: _standalone(params, e, m, eos_id=eos, cache_dtype="int8")
            for uid, (e, m) in enumerate(reqs)}
    _assert_served_matches(served, want)


def test_steps_per_sync_is_throughput_only(params):
    """steps_per_sync batches device ticks between host syncs; it must
    not change any stream (post-EOS tokens inside a window are dropped,
    refills land late but identically)."""
    reqs = _requests(6, seed=13)
    eos = _pick_eos(params, reqs)
    outs = []
    for sps in (1, 3, MAX_NEW):
        srv = GenerationServer(params, CFG, slots=2,
                               max_prompt=MAX_PROMPT, max_new=MAX_NEW,
                               eos_id=eos, steps_per_sync=sps)
        served = srv.run(reqs)
        outs.append({u: (r.tokens, r.valid) for u, r in served.items()})
    assert outs[0] == outs[1] == outs[2]
    want = {uid: _standalone(params, e, m, eos_id=eos)
            for uid, (e, m) in enumerate(reqs)}
    for uid, (toks, valid) in outs[0].items():
        assert (toks, valid) == want[uid]


def test_per_request_max_new(params):
    """submit(max_new=k) truncates THAT request's stream at k tokens (its
    slot retires early and is refilled); other requests are unaffected —
    each stream still equals the standalone decode truncated at its own
    budget."""
    reqs = _requests(5, seed=19)
    budgets = [2, MAX_NEW, 1, 4, MAX_NEW]
    srv = GenerationServer(params, CFG, slots=2, max_prompt=MAX_PROMPT,
                           max_new=MAX_NEW, eos_id=-1)
    for (e, m), k in zip(reqs, budgets):
        srv.submit(e, m, max_new=k)
    srv.drain()
    for uid, ((e, m), k) in enumerate(zip(reqs, budgets)):
        toks, _ = _standalone(params, e, m, eos_id=-1)
        req = srv.requests[uid]
        assert req.finished
        assert req.tokens == toks[:k]
        assert req.valid == [True] * k

    with pytest.raises(ValueError):
        srv.submit(*reqs[0], max_new=MAX_NEW + 1)
    with pytest.raises(ValueError):
        srv.submit(*reqs[0], max_new=0)


def test_device_resident_submission(params):
    """Submitting jax.Array embeddings (the vision-tower-on-device case —
    no host round-trip) yields the same streams as numpy submission."""
    reqs = _requests(3, seed=23)
    eos = _pick_eos(params, reqs)

    def serve(as_device):
        srv = GenerationServer(params, CFG, slots=2,
                               max_prompt=MAX_PROMPT, max_new=MAX_NEW,
                               eos_id=eos)
        for e, m in reqs:
            srv.submit(jnp.asarray(e) if as_device else e, m)
        srv.drain()
        return {u: (r.tokens, r.valid) for u, r in srv.requests.items()}

    assert serve(True) == serve(False)


def test_bad_submissions_fail_at_the_api_boundary(params):
    """Length/width errors must raise in submit(), not mid-trace inside a
    later batched refill (which would strand already-dequeued
    neighbors)."""
    srv = GenerationServer(params, CFG, slots=1, max_prompt=MAX_PROMPT,
                           max_new=MAX_NEW)
    with pytest.raises(ValueError):
        srv.submit(np.zeros((MAX_PROMPT + 1, CFG.hidden), np.float32),
                   np.ones((MAX_PROMPT + 1,), np.int32))
    with pytest.raises(ValueError):
        srv.submit(np.zeros((4, CFG.hidden + 1), np.float32),
                   np.ones((4,), np.int32))


def test_blip2_prompts_through_server_match_blip2_generate():
    """The flagship VLM served end-to-end: blip2.prompt_embeds (projected
    query tokens + text embeddings, built on device) submitted to the
    server with the LoRA adapters active must reproduce blip2.generate
    request-for-request — the server's LoRA path (prefill arg + decode
    closure) is only exercised here."""
    from garbage_classification_rca_tpu.cli.blip2_common import (
        tiny_blip2_config)
    from garbage_classification_rca_tpu.models.vlm import blip2

    cfg = tiny_blip2_config()
    bparams = blip2.init(jax.random.PRNGKey(0), cfg)
    # randomize the (conventionally zero-init) LoRA B so the adapters
    # actually perturb the logits
    lora = jax.tree_util.tree_map(
        lambda x: jax.random.normal(jax.random.PRNGKey(7), x.shape,
                                    x.dtype) * 0.1,
        blip2.init_lora(jax.random.PRNGKey(1), cfg))

    rng = np.random.default_rng(31)
    n, text_len, max_new = 4, 6, 5
    pix = rng.integers(0, 255, (n, 1, 224, 224, 3)).astype(np.uint8)
    pix = jnp.asarray(pix, jnp.float32) / 255.0
    ids = jnp.asarray(rng.integers(4, 50000, (n, 1, text_len)
                                   ).astype(np.int32))
    masks = np.ones((n, 1, text_len), np.int32)
    masks[1, 0, -2:] = 0
    masks[3, 0, -1:] = 0
    masks = jnp.asarray(masks)

    embed = jax.jit(lambda p, i, m: blip2.prompt_embeds(
        bparams, p, i, m, cfg))
    max_prompt = cfg.qformer.n_query + text_len
    srv = GenerationServer(bparams["opt"], cfg.opt, slots=2,
                           max_prompt=max_prompt, max_new=max_new,
                           eos_id=-1, lora=lora,
                           lora_scale=cfg.lora_scale)
    for i in range(n):
        srv.submit(*embed(pix[i], ids[i], masks[i]))
    srv.drain()
    want, _ = blip2.generate(bparams, pix[:, 0], ids[:, 0], masks[:, 0],
                             cfg, lora=lora, max_new_tokens=max_new,
                             eos_id=-1)
    want = np.asarray(want)
    for i in range(n):
        assert srv.requests[i].tokens == list(want[i]), i

    # LoRA must have mattered, or this test proves nothing
    base, _ = blip2.generate(bparams, pix[:, 0], ids[:, 0], masks[:, 0],
                             cfg, max_new_tokens=max_new, eos_id=-1)
    assert (np.asarray(base) != want).any()


def test_tp_sharded_params_same_streams(params):
    """The docstring's 'parallelism composes by operand placement' claim:
    a server given Megatron-TP-sharded params (model:2 mesh) must emit
    the same streams as the unsharded server — GSPMD propagates the
    layout into the jitted prefill/decode programs."""
    from garbage_classification_rca_tpu.parallel.mesh import make_mesh
    from garbage_classification_rca_tpu.parallel.tp import (
        opt_param_specs, shard_with_specs)

    mesh = make_mesh("model:2", devices=jax.devices()[:2])
    sharded = shard_with_specs(mesh, params, opt_param_specs(params))
    reqs = _requests(4, seed=29)
    eos = _pick_eos(params, reqs)

    def serve(p):
        srv = GenerationServer(p, CFG, slots=2, max_prompt=MAX_PROMPT,
                               max_new=MAX_NEW, eos_id=eos)
        srv.run(reqs)
        return {u: (r.tokens, r.valid) for u, r in srv.requests.items()}

    assert serve(sharded) == serve(params)


def test_stale_kv_never_attended(params):
    """A slot's second occupant must not see its first occupant's K/V:
    serve a long-running request after a max-length one through ONE slot
    and compare to standalone (if stale tail K/V leaked into attention,
    the short request's stream would differ)."""
    rng = np.random.default_rng(17)
    long_e = rng.normal(size=(MAX_PROMPT, CFG.hidden)).astype(np.float32)
    long_m = np.ones((MAX_PROMPT,), np.int32)
    short_e = rng.normal(size=(2, CFG.hidden)).astype(np.float32)
    short_m = np.ones((2,), np.int32)
    srv = GenerationServer(params, CFG, slots=1, max_prompt=MAX_PROMPT,
                           max_new=MAX_NEW, eos_id=-1)  # run full length
    served = srv.run([(long_e, long_m), (short_e, short_m)])
    want = _standalone(params, short_e, short_m, eos_id=-1)
    assert served[1].tokens == want[0]
