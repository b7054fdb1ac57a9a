"""BERT / RoBERTa / GPT-2 parity vs HF transformers (random-init configs)."""

import numpy as np
import pytest
import torch

from garbage_classification_rca_tpu.checkpoint.torch_convert import numpy_state_dict

RNG = np.random.default_rng(3)


def _ids_mask(vocab, b=2, l=12, pad_tail=3):
    ids = RNG.integers(0, vocab, (b, l)).astype(np.int32)
    mask = np.ones((b, l), np.int32)
    if pad_tail:
        mask[0, -pad_tail:] = 0
    return ids, mask


def test_bert_encoder_parity():
    import jax.numpy as jnp
    from transformers import BertConfig, BertModel
    from garbage_classification_rca_tpu.models.text import bert as jb

    torch.manual_seed(1)
    # reduced depth for speed; layout identical to bert-base
    cfg = BertConfig(num_hidden_layers=4)
    tm = BertModel(cfg).eval()
    jb_layers_orig = jb.LAYERS
    jb.LAYERS = 4
    try:
        params = jb.convert_encoder(numpy_state_dict(tm))
        ids, mask = _ids_mask(cfg.vocab_size)
        with torch.no_grad():
            want = tm(torch.tensor(ids, dtype=torch.long),
                      torch.tensor(mask, dtype=torch.long))[0].numpy()
        got = np.asarray(jb.encode(params, jnp.asarray(ids), jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
        # hidden-states tap for hierarchical fusion
        _, hiddens = jb.encode(params, jnp.asarray(ids), jnp.asarray(mask),
                               output_hidden_states=True)
        with torch.no_grad():
            twant = tm(torch.tensor(ids, dtype=torch.long),
                       torch.tensor(mask, dtype=torch.long),
                       output_hidden_states=True).hidden_states
        assert len(hiddens) == len(twant)
        np.testing.assert_allclose(np.asarray(hiddens[2]), twant[2].numpy(),
                                   rtol=2e-4, atol=2e-4)
    finally:
        jb.LAYERS = jb_layers_orig


def test_roberta_encoder_parity():
    import jax.numpy as jnp
    from transformers import RobertaConfig, RobertaModel
    from garbage_classification_rca_tpu.models.text import roberta as jr
    from garbage_classification_rca_tpu.models.text import bert as jb

    torch.manual_seed(2)
    cfg = RobertaConfig(num_hidden_layers=4)
    tm = RobertaModel(cfg).eval()
    jb_layers_orig = jb.LAYERS
    jb.LAYERS = 4
    try:
        params = jr.convert_encoder(numpy_state_dict(tm))
        ids, mask = _ids_mask(cfg.vocab_size, pad_tail=4)
        ids[0, -4:] = 1  # pad token id
        with torch.no_grad():
            want = tm(torch.tensor(ids, dtype=torch.long),
                      torch.tensor(mask, dtype=torch.long))[0].numpy()
        got = np.asarray(jr.encode(params, jnp.asarray(ids), jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    finally:
        jb.LAYERS = jb_layers_orig


def test_gpt2_classifier_parity():
    import jax.numpy as jnp
    from transformers import GPT2Config, GPT2ForSequenceClassification
    from garbage_classification_rca_tpu.models.text import gpt2 as jg

    torch.manual_seed(3)
    cfg = GPT2Config(n_layer=4, num_labels=4, pad_token_id=50256)
    tm = GPT2ForSequenceClassification(cfg).eval()
    layers_orig = jg.LAYERS
    jg.LAYERS = 4
    try:
        # reference layout: model.* wrapper (text_models.py GPT2 module)
        sd = {("model." + k): v for k, v in numpy_state_dict(tm).items()}
        params, _ = jg.convert_torch(sd, num_classes=4)
        ids, mask = _ids_mask(cfg.vocab_size, l=10, pad_tail=0)
        # pad sample 0's tail with eos and mask it (reference tokenizer pads
        # with eos)
        ids[0, -3:] = 50256
        mask[0, -3:] = 0
        with torch.no_grad():
            want = tm(input_ids=torch.tensor(ids, dtype=torch.long),
                      attention_mask=torch.tensor(mask, dtype=torch.long)
                      ).logits.numpy()
        got, _ = jg.apply(params, {}, (jnp.asarray(ids), jnp.asarray(mask)))
        np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)
    finally:
        jg.LAYERS = layers_orig
