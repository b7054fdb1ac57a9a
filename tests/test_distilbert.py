"""DistilBERT parity vs HF transformers (random-init config, no downloads)."""

import numpy as np
import pytest
import torch

from garbage_classification_rca_tpu.checkpoint.torch_convert import numpy_state_dict


@pytest.fixture(scope="module")
def hf_distilbert():
    from transformers import DistilBertConfig, DistilBertModel
    torch.manual_seed(0)
    cfg = DistilBertConfig()  # full-size: 6 layers, 768 hidden
    return DistilBertModel(cfg).eval()


def test_distilbert_encoder_parity(hf_distilbert):
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models.text import distilbert as db

    sd = numpy_state_dict(hf_distilbert)
    params = db.convert_encoder(sd)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 30522, (2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.int32)
    mask[0, 10:] = 0  # padding on sample 0

    with torch.no_grad():
        want = hf_distilbert(torch.tensor(ids, dtype=torch.long),
                             torch.tensor(mask, dtype=torch.long))[0].numpy()
    got = np.asarray(db.encode(params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_distilbert_classifier_reference_layout(hf_distilbert):
    """Reference DistilBert module layout: model.* + out.* (text_models.py:9-41)."""
    import jax.numpy as jnp
    from garbage_classification_rca_tpu.models.text import distilbert as db

    head = torch.nn.Linear(768, 4)
    sd = {("model." + k): v for k, v in numpy_state_dict(hf_distilbert).items()}
    sd.update({("out." + k): v.detach().numpy()
               for k, v in head.state_dict().items()})

    params, state = db.convert_torch(sd, num_classes=4)
    ids = np.random.default_rng(1).integers(0, 30522, (3, 12)).astype(np.int32)
    mask = np.ones((3, 12), np.int32)

    with torch.no_grad():
        cls = hf_distilbert(torch.tensor(ids, dtype=torch.long),
                            torch.tensor(mask, dtype=torch.long))[0][:, 0]
        want = head(cls).numpy()
    got, _ = db.apply(params, state, (jnp.asarray(ids), jnp.asarray(mask)),
                      train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
