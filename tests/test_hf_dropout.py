"""--hf_internal_dropout parity: the reference keeps its frozen HF towers
in train() mode (CVPR_code/text_models.py:23-34, blip_2_training.py), so
the HF-internal p=0.1 hidden/attention dropout is ACTIVE during training.
These tests prove our opt-in reproduction places every dropout site at
the exact torch position, in the exact call order, with the exact p:

torch.nn.functional.dropout is monkeypatched to consume masks from a
deterministic host-side stream (nn.Dropout modules route through it too);
the JAX side consumes an identically-seeded stream via a StreamDrop stub
(the models only require a callable drop(x, p)). If any site is missing,
extra, re-ordered, differently-shaped, or has the wrong p, the mask
streams desynchronize and the outputs diverge.
"""

import contextlib

import numpy as np
import pytest
import torch

from garbage_classification_rca_tpu.checkpoint.torch_convert import numpy_state_dict


class MaskStream:
    """Deterministic Bernoulli mask sequence; logs (size, p) per call."""

    def __init__(self, seed=0):
        self.rng = np.random.default_rng(seed)
        self.log = []

    def mask(self, size, p):
        self.log.append((int(size), round(float(p), 4)))
        return (self.rng.random(int(size)) >= p).astype(np.float32)


class StreamDrop:
    """nn.HFDropout-compatible stub consuming a MaskStream (same inverted
    scaling as torch F.dropout: kept elements divided by 1-p)."""

    def __init__(self, stream):
        self.stream = stream

    def __call__(self, x, p):
        import jax.numpy as jnp
        if p <= 0.0:
            return x
        m = self.stream.mask(int(np.prod(x.shape)), p).reshape(x.shape)
        return (x * jnp.asarray(m, x.dtype)) / (1.0 - p)


@contextlib.contextmanager
def torch_mask_dropout(stream):
    """Route every torch dropout through the mask stream. HF applies some
    dropouts via nn.Dropout modules and some via nn.functional.dropout —
    both resolve torch.nn.functional.dropout at call time."""
    import torch.nn.functional as F
    orig = F.dropout

    def fake(input, p=0.5, training=True, inplace=False):
        if not training or p <= 0.0:
            return input
        m = stream.mask(input.numel(), p).reshape(tuple(input.shape))
        return input * torch.tensor(m, dtype=input.dtype) / (1.0 - p)

    F.dropout = fake
    try:
        yield
    finally:
        F.dropout = orig


def _ids_mask(vocab, b=2, l=10, pad_tail=2, pad_id=0):
    rng = np.random.default_rng(7)
    ids = rng.integers(4, vocab, (b, l)).astype(np.int32)
    mask = np.ones((b, l), np.int32)
    if pad_tail:
        mask[0, -pad_tail:] = 0
        ids[0, -pad_tail:] = pad_id
    return ids, mask


def _assert_streams_match(t_stream, j_stream):
    """Same number of dropout sites, same call order, shapes (as element
    counts) and probabilities on both sides."""
    assert t_stream.log == j_stream.log, (
        f"dropout site sequences differ:\n torch={t_stream.log}\n "
        f"jax={j_stream.log}")
    assert len(t_stream.log) > 0          # the test actually exercised sites


def test_distilbert_internal_dropout_exact_torch_parity():
    import jax.numpy as jnp
    from transformers import DistilBertConfig, DistilBertModel
    from garbage_classification_rca_tpu.models.text import distilbert as jd

    torch.manual_seed(1)
    cfg = DistilBertConfig(n_layers=2, attn_implementation="eager")
    tm = DistilBertModel(cfg).train()
    saved = (jd.LAYERS,)
    jd.LAYERS = 2
    try:
        params = jd.convert_encoder(numpy_state_dict(tm))
        ids, mask = _ids_mask(cfg.vocab_size)
        ts, js = MaskStream(11), MaskStream(11)
        with torch_mask_dropout(ts), torch.no_grad():
            want = tm(torch.tensor(ids, dtype=torch.long),
                      torch.tensor(mask, dtype=torch.long))[0].numpy()
        got = np.asarray(jd.encode(params, jnp.asarray(ids),
                                   jnp.asarray(mask), train=True,
                                   drop=StreamDrop(js)))
        _assert_streams_match(ts, js)
        # emb + 2 sites/layer (probs + ffn-out; NO attn-out in DistilBERT)
        assert len(ts.log) == 1 + 2 * 2
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
    finally:
        (jd.LAYERS,) = saved


def test_bert_internal_dropout_exact_torch_parity():
    import jax.numpy as jnp
    from transformers import BertConfig, BertModel
    from garbage_classification_rca_tpu.models.text import bert as jb

    torch.manual_seed(2)
    cfg = BertConfig(num_hidden_layers=2, attn_implementation="eager")
    tm = BertModel(cfg, add_pooling_layer=False).train()
    saved = (jb.LAYERS,)
    jb.LAYERS = 2
    try:
        params = jb.convert_encoder(numpy_state_dict(tm))
        ids, mask = _ids_mask(cfg.vocab_size)
        ts, js = MaskStream(12), MaskStream(12)
        with torch_mask_dropout(ts), torch.no_grad():
            want = tm(torch.tensor(ids, dtype=torch.long),
                      torch.tensor(mask, dtype=torch.long))[0].numpy()
        got = np.asarray(jb.encode(params, jnp.asarray(ids),
                                   jnp.asarray(mask), train=True,
                                   drop=StreamDrop(js)))
        _assert_streams_match(ts, js)
        # emb + 3 sites/layer (probs + attn-out + ffn-out)
        assert len(ts.log) == 1 + 3 * 2
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
    finally:
        (jb.LAYERS,) = saved


def test_gpt2_internal_dropout_exact_torch_parity():
    import jax.numpy as jnp
    from transformers import GPT2Config, GPT2Model
    from garbage_classification_rca_tpu.models.text import gpt2 as jg

    torch.manual_seed(3)
    cfg = GPT2Config(n_layer=2, n_embd=64, n_head=4, n_positions=64,
                     vocab_size=200, attn_implementation="eager")
    tm = GPT2Model(cfg).train()
    saved = (jg.LAYERS, jg.HEADS)
    jg.LAYERS, jg.HEADS = 2, 4
    try:
        params, _ = jg.convert_torch(numpy_state_dict(tm))
        ids, mask = _ids_mask(200, pad_tail=0)
        ts, js = MaskStream(13), MaskStream(13)
        with torch_mask_dropout(ts), torch.no_grad():
            want = tm(torch.tensor(ids, dtype=torch.long),
                      attention_mask=torch.tensor(mask, dtype=torch.long)
                      )[0].numpy()
        got = np.asarray(jg.encode(params, jnp.asarray(ids),
                                   jnp.asarray(mask),
                                   drop=StreamDrop(js)))
        _assert_streams_match(ts, js)
        # emb + 3 sites/layer (probs + attn-resid + mlp-resid)
        assert len(ts.log) == 1 + 3 * 2
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
    finally:
        jg.LAYERS, jg.HEADS = saved


def test_bart_internal_dropout_exact_torch_parity():
    import jax.numpy as jnp
    from transformers import BartConfig, BartModel
    from garbage_classification_rca_tpu.models.text import bart as jbart

    torch.manual_seed(4)
    # the facebook/bart-large hub config values (dropout/attention_dropout/
    # activation_dropout all 0.1 — BartConfig defaults differ)
    cfg = BartConfig(encoder_layers=2, decoder_layers=2, d_model=64,
                     encoder_attention_heads=4, decoder_attention_heads=4,
                     encoder_ffn_dim=128, decoder_ffn_dim=128,
                     max_position_embeddings=64, dropout=0.1,
                     attention_dropout=0.1, activation_dropout=0.1,
                     attn_implementation="eager")
    tm = BartModel(cfg).train()
    saved = (jbart.HIDDEN, jbart.LAYERS, jbart.HEADS, jbart.FFN,
             jbart.MAX_POS)
    jbart.HIDDEN, jbart.LAYERS, jbart.HEADS, jbart.FFN, jbart.MAX_POS = \
        64, 2, 4, 128, 64
    try:
        params, _ = jbart.convert_torch(numpy_state_dict(tm), num_classes=4)
        rng = np.random.default_rng(5)
        ids = rng.integers(3, cfg.vocab_size, (2, 8)).astype(np.int32)
        ids[:, -1] = 2
        mask = np.ones((2, 8), np.int32)
        ts, js = MaskStream(14), MaskStream(14)
        with torch_mask_dropout(ts), torch.no_grad():
            want = tm(input_ids=torch.tensor(ids, dtype=torch.long),
                      attention_mask=torch.tensor(mask, dtype=torch.long)
                      ).last_hidden_state.numpy()
        got = np.asarray(jbart.encode_decoder(params, jnp.asarray(ids),
                                              jnp.asarray(mask),
                                              drop=StreamDrop(js)))
        _assert_streams_match(ts, js)
        # enc: emb + 4/layer (probs, attn-out, act, ffn-out);
        # dec: emb + 6/layer (self probs, self out, cross probs, cross out,
        # act, ffn-out)
        assert len(ts.log) == (1 + 4 * 2) + (1 + 6 * 2)
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
    finally:
        jbart.HIDDEN, jbart.LAYERS, jbart.HEADS, jbart.FFN, jbart.MAX_POS \
            = saved


def test_mobilebert_internal_dropout_exact_torch_parity():
    import jax.numpy as jnp
    from transformers import MobileBertConfig, MobileBertModel
    from garbage_classification_rca_tpu.models.text import mobilebert as jm

    torch.manual_seed(5)
    cfg = MobileBertConfig(num_hidden_layers=2,
                           attn_implementation="eager")
    tm = MobileBertModel(cfg, add_pooling_layer=False).train()
    params, _ = jm.convert_torch(numpy_state_dict(tm), n_layers=2)
    ids, mask = _ids_mask(cfg.vocab_size)
    ts, js = MaskStream(15), MaskStream(15)
    with torch_mask_dropout(ts), torch.no_grad():
        want = tm(torch.tensor(ids, dtype=torch.long),
                  torch.tensor(mask, dtype=torch.long))[0].numpy()
    got = np.asarray(jm.encode(params, jnp.asarray(ids), jnp.asarray(mask),
                               drop=StreamDrop(js)))
    _assert_streams_match(ts, js)
    # hidden_dropout_prob=0.0 for mobilebert — only attn probs, 1/layer
    assert len(ts.log) == 2
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_qformer_and_opt_internal_dropout_exact_torch_parity():
    """The BLIP-2 stochastic towers: Q-Former (hidden/attn p=0.1) and the
    OPT decoder (hidden p=0.1, attn p=0.0). The EVA vision tower has no
    dropout sites (attention_dropout=0.0), so it runs deterministically
    on both sides."""
    import jax.numpy as jnp
    from transformers import Blip2ForConditionalGeneration
    from tests.test_blip2 import _tiny_cfgs
    from garbage_classification_rca_tpu.models.vlm import blip2
    from garbage_classification_rca_tpu.models.vlm import opt as jopt
    from garbage_classification_rca_tpu.models.vlm import qformer as jqf

    hf_cfg, our_cfg = _tiny_cfgs()
    torch.manual_seed(6)
    tm = Blip2ForConditionalGeneration(hf_cfg).train()
    params, lora = blip2.convert_torch(numpy_state_dict(tm), our_cfg)
    assert lora is None

    rng = np.random.default_rng(8)
    pix = rng.normal(size=(2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        img = tm.vision_model.eval()(torch.tensor(pix)).last_hidden_state

    # Q-Former: emb + per layer self probs/out (+ cross probs/out on
    # cross layers) + ffn-out
    ts, js = MaskStream(16), MaskStream(16)
    with torch_mask_dropout(ts), torch.no_grad():
        want_q = tm.qformer(
            query_embeds=tm.query_tokens.expand(img.shape[0], -1, -1),
            encoder_hidden_states=img).last_hidden_state.numpy()
    got_q = np.asarray(jqf.encode(params["qformer"],
                                  jnp.asarray(img.numpy()),
                                  our_cfg.qformer,
                                  drop=StreamDrop(js)))
    _assert_streams_match(ts, js)
    # 2 layers, cross on layer 0 only (cross_frequency=2):
    # emb + L0(self 2 + cross 2 + ffn 1) + L1(self 2 + ffn 1)
    assert len(ts.log) == 1 + 5 + 3
    np.testing.assert_allclose(got_q, want_q, rtol=3e-4, atol=3e-4)

    # OPT decoder on raw input embeds
    ids = rng.integers(4, 200, (2, 6)).astype(np.int32)
    mask = np.ones((2, 6), np.int32)
    dec = tm.language_model.model.decoder
    ts, js = MaskStream(17), MaskStream(17)
    with torch_mask_dropout(ts), torch.no_grad():
        want_o = dec(input_ids=torch.tensor(ids, dtype=torch.long),
                     attention_mask=torch.tensor(mask, dtype=torch.long)
                     ).last_hidden_state.numpy()
    emb = jopt.embed_tokens(params["opt"], jnp.asarray(ids))
    got_o = np.asarray(jopt.decode_hidden(params["opt"], emb,
                                          jnp.asarray(mask), our_cfg.opt,
                                          train=True,
                                          drop=StreamDrop(js)))
    _assert_streams_match(ts, js)
    # 2 sites/layer (attn-out + ffn-out; attention_dropout=0.0, no emb site)
    assert len(ts.log) == 2 * 2
    np.testing.assert_allclose(got_o, want_o, rtol=3e-4, atol=3e-4)


def test_apply_flag_semantics_all_text_towers():
    """--hf_internal_dropout behavior contract per tower: eval unchanged,
    train stochastic across rngs, deterministic per rng, and OFF-flag
    train identical to before the feature existed (drop=None paths)."""
    import jax
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models import get_text_model

    from garbage_classification_rca_tpu.models.text import bert as _bert

    geom = {"distilbert": dict(LAYERS=2, VOCAB=200),
            "bert": dict(LAYERS=2, VOCAB=200),
            "roberta": dict(LAYERS=2, VOCAB=200),
            "gpt2": dict(LAYERS=2, VOCAB=200),
            "mobilebert": dict(LAYERS=2, VOCAB=200),
            "bart": dict(LAYERS=1, VOCAB=200, MAX_POS=64)}
    import importlib

    for name, patch in geom.items():
        mod = importlib.import_module(
            f"garbage_classification_rca_tpu.models.text.{name}")
        saved = {k: getattr(mod, k) for k in patch}
        # roberta.init delegates to bert.init_encoder — shrink bert too
        bert_saved = (_bert.LAYERS, _bert.VOCAB)
        if name == "roberta":
            _bert.LAYERS, _bert.VOCAB = 2, 200
        for k, v in patch.items():
            setattr(mod, k, v)
        try:
            mdef = get_text_model(name)
            params, state = mdef.init(jax.random.PRNGKey(0), num_classes=4)
            ids = np.array([[5, 6, 7, 2], [8, 9, 2, 1]], np.int32)
            mask = np.ones((2, 4), np.int32)
            batch = (jnp.asarray(ids), jnp.asarray(mask))
            r = jax.random.PRNGKey(3)

            ev_off, _ = mdef.apply(params, state, batch, train=False)
            ev_on, _ = mdef.apply(params, state, batch, train=False,
                                  rng=r, hf_internal_dropout=True)
            np.testing.assert_array_equal(np.asarray(ev_off),
                                          np.asarray(ev_on))

            tr_off, _ = mdef.apply(params, state, batch, train=True, rng=r)
            tr_on, _ = mdef.apply(params, state, batch, train=True, rng=r,
                                  hf_internal_dropout=True)
            tr_on2, _ = mdef.apply(params, state, batch, train=True, rng=r,
                                   hf_internal_dropout=True)
            tr_on3, _ = mdef.apply(params, state, batch, train=True,
                                   rng=jax.random.PRNGKey(4),
                                   hf_internal_dropout=True)
            assert not np.allclose(np.asarray(tr_off), np.asarray(tr_on)), name
            np.testing.assert_array_equal(np.asarray(tr_on),
                                          np.asarray(tr_on2))
            assert not np.array_equal(np.asarray(tr_on),
                                      np.asarray(tr_on3)), name
        finally:
            for k, v in saved.items():
                setattr(mod, k, v)
            _bert.LAYERS, _bert.VOCAB = bert_saved


def test_fusion_hf_internal_dropout_flag():
    """FusionConfig.hf_internal_dropout: train forward stochasticizes the
    text tower; eval_mode forward is byte-identical to the off-flag one.
    Modality dropout is disabled so the text tower always contributes."""
    import jax
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models.fusion import (FusionConfig,
                                                              build_fusion)
    from garbage_classification_rca_tpu.models.text import distilbert as jd

    saved = (jd.LAYERS, jd.VOCAB)
    jd.LAYERS, jd.VOCAB = 1, 200       # shrink the text tower only
    try:
        kw = dict(strategy="classic", image_or_text_dropout_chance=0.0)
        cfg_off = FusionConfig(**kw)
        cfg_on = FusionConfig(hf_internal_dropout=True, **kw)
        init_fn, apply_off, _ = build_fusion(cfg_off)
        _, apply_on, _ = build_fusion(cfg_on)
        params, state = init_fn(jax.random.PRNGKey(0))
        rng = np.random.default_rng(2)
        ids = jnp.asarray(rng.integers(4, 100, (2, 6)).astype(np.int32))
        mask = jnp.ones((2, 6), jnp.int32)
        img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        batch = (ids, mask, img)

        e_off, _ = apply_off(params, state, batch, train=False,
                             eval_mode=True)
        e_on, _ = apply_on(params, state, batch, train=False, eval_mode=True)
        np.testing.assert_array_equal(np.asarray(e_off), np.asarray(e_on))

        key = jax.random.PRNGKey(5)
        t_off, _ = apply_off(params, state, batch, train=True, rng=key)
        t_on, _ = apply_on(params, state, batch, train=True, rng=key)
        t_on2, _ = apply_on(params, state, batch, train=True, rng=key)
        assert not np.allclose(np.asarray(t_off), np.asarray(t_on))
        np.testing.assert_array_equal(np.asarray(t_on), np.asarray(t_on2))
    finally:
        jd.LAYERS, jd.VOCAB = saved
