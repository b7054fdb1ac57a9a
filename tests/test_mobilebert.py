"""MobileBERT parity vs HF transformers (random-init reduced config)."""

import numpy as np
import torch

from garbage_classification_rca_tpu.checkpoint.torch_convert import numpy_state_dict


def test_mobilebert_classifier_parity():
    import jax.numpy as jnp
    from transformers import MobileBertConfig, MobileBertForSequenceClassification
    from garbage_classification_rca_tpu.models.text import mobilebert as jm

    torch.manual_seed(6)
    cfg = MobileBertConfig(num_hidden_layers=3, num_labels=4)
    assert cfg.classifier_activation is False or True  # pooler path checked below
    tm = MobileBertForSequenceClassification(cfg).eval()

    saved = jm.LAYERS
    jm.LAYERS = 3
    try:
        sd = {("model." + k): v for k, v in numpy_state_dict(tm).items()}
        params, _ = jm.convert_torch(sd, num_classes=4)
        rng = np.random.default_rng(7)
        ids = rng.integers(0, cfg.vocab_size, (2, 12)).astype(np.int32)
        mask = np.ones((2, 12), np.int32)
        mask[0, -4:] = 0
        with torch.no_grad():
            want = tm(input_ids=torch.tensor(ids, dtype=torch.long),
                      attention_mask=torch.tensor(mask, dtype=torch.long)
                      ).logits.numpy()
        got, _ = jm.apply(params, {}, (jnp.asarray(ids), jnp.asarray(mask)))
        np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)
    finally:
        jm.LAYERS = saved
