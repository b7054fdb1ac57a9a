"""BART sequence-classification parity vs HF transformers (random init)."""

import numpy as np
import torch

from garbage_classification_rca_tpu.checkpoint.torch_convert import numpy_state_dict


def test_bart_classifier_parity():
    import jax.numpy as jnp
    from transformers import BartConfig, BartForSequenceClassification
    from garbage_classification_rca_tpu.models.text import bart as jbart

    torch.manual_seed(4)
    cfg = BartConfig(encoder_layers=2, decoder_layers=2, d_model=64,
                     encoder_attention_heads=4, decoder_attention_heads=4,
                     encoder_ffn_dim=128, decoder_ffn_dim=128,
                     num_labels=4, max_position_embeddings=64)
    tm = BartForSequenceClassification(cfg).eval()

    # shrink module constants to the test geometry
    saved = (jbart.HIDDEN, jbart.LAYERS, jbart.HEADS, jbart.FFN, jbart.MAX_POS)
    jbart.HIDDEN, jbart.LAYERS, jbart.HEADS, jbart.FFN, jbart.MAX_POS = \
        64, 2, 4, 128, 64
    try:
        params, _ = jbart.convert_torch(numpy_state_dict(tm), num_classes=4)
        rng = np.random.default_rng(5)
        ids = rng.integers(3, cfg.vocab_size, (2, 10)).astype(np.int32)
        ids[:, -1] = 2                      # eos-terminated (tokenizer does this)
        mask = np.ones((2, 10), np.int32)
        with torch.no_grad():
            want = tm(input_ids=torch.tensor(ids, dtype=torch.long),
                      attention_mask=torch.tensor(mask, dtype=torch.long)
                      ).logits.numpy()
        got, _ = jbart.apply(params, {}, (jnp.asarray(ids), jnp.asarray(mask)))
        np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)
    finally:
        jbart.HIDDEN, jbart.LAYERS, jbart.HEADS, jbart.FFN, jbart.MAX_POS = saved
