"""Legacy fusion module (CVPR_code/models.py parity — structure/shape level;
the reference's own forward is broken, see legacy.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_legacy_roberta_mbnet_forwards():
    from garbage_classification_rca_tpu.models.fusion import legacy

    params, state = legacy.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50265, (2, 10)).astype(np.int32))
    mask = jnp.ones((2, 10), jnp.int32)
    imgs = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))

    out_c, st1 = legacy.forward_concat(params, state, (ids, mask, imgs))
    out_g, st2 = legacy.forward_gated(params, state, (ids, mask, imgs))
    assert out_c.shape == (2, 4) and out_g.shape == (2, 4)
    assert np.isfinite(np.asarray(out_c)).all()
    assert not np.allclose(np.asarray(out_c), np.asarray(out_g))


def test_legacy_logit_parity_vs_torch_oracle():
    """RobertaAndMBNet concat + gated forwards vs a torch replica with the
    reference attribute names (CVPR_code/models.py:93-330) and the INTENDED
    image path (1280-d hidden after classifier[0]+hardswish — the
    reference's own forward feeds 4-class logits into Linear(1280,256) and
    cannot run; documented divergence in legacy.py)."""
    import torch
    from transformers import RobertaConfig, RobertaModel
    from tests.torch_refs.misc_backbones_ref import MobileNetV3Ref
    from garbage_classification_rca_tpu.checkpoint.torch_convert import (
        TrackingDict, numpy_state_dict)
    from garbage_classification_rca_tpu.models.fusion import legacy

    class LegacyRef(torch.nn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(0)
            self.text_model = RobertaModel(RobertaConfig())
            self.image_model = MobileNetV3Ref()
            fc = 256
            self.image_to_hidden_size = torch.nn.Linear(1280, fc)
            self.text_to_hidden_size = torch.nn.Linear(768, fc)
            self.concat_layer = torch.nn.Linear(fc * 2, fc)
            self.fc_layer = torch.nn.Linear(fc, 4)
            self.image_features_hidden_layer = torch.nn.Linear(1280, fc)
            self.text_features_hidden_layer = torch.nn.Linear(768, fc)
            self.z_layer = torch.nn.Linear(fc * 2, fc)
            self.fc_layer_gated = torch.nn.Linear(fc, 4)

        def towers(self, ids, mask, images):
            text = self.text_model(input_ids=ids,
                                   attention_mask=mask)[0][:, 0]
            im = self.image_model
            h = torch.flatten(im.avgpool(im.features(images)), 1)
            img = im.classifier[1](im.classifier[0](h))   # 1280-d hidden
            return text, img

        def forward(self, ids, mask, images):
            text, img = self.towers(ids, mask, images)
            h = torch.cat([self.image_to_hidden_size(img),
                           self.text_to_hidden_size(text)], dim=1)
            return self.fc_layer(self.concat_layer(h))

        def forward_gated(self, ids, mask, images):
            text, img = self.towers(ids, mask, images)
            it = torch.tanh(self.image_features_hidden_layer(img))
            tt = torch.tanh(self.text_features_hidden_layer(text))
            cat = torch.cat([self.image_features_hidden_layer(img),
                             self.text_features_hidden_layer(text)], dim=1)
            z = torch.softmax(self.z_layer(cat), dim=1)
            return self.fc_layer_gated(z * it + (1 - z) * tt)

    ref = LegacyRef().eval()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)

    sd = TrackingDict(numpy_state_dict(ref))
    params, state = legacy.convert_torch(sd)
    sd.audit(allow_unconsumed=("text_model.pooler.",
                               "text_model.embeddings.token_type",))

    rng = np.random.default_rng(3)
    ids = rng.integers(5, 50000, (2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want_c = ref(torch.tensor(ids), torch.tensor(mask),
                     torch.tensor(x)).numpy()
        want_g = ref.forward_gated(torch.tensor(ids), torch.tensor(mask),
                                   torch.tensor(x)).numpy()
    batch = (jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
             jnp.asarray(x.transpose(0, 2, 3, 1)))
    got_c, _ = legacy.forward_concat(params, state, batch)
    got_g, _ = legacy.forward_gated(params, state, batch)
    np.testing.assert_allclose(np.asarray(got_c), want_c, rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_g), want_g, rtol=2e-3,
                               atol=2e-3)


def test_legacy_trainer_path():
    """Legacy model trains through the shared engine step (the reference's
    legacy trainer is CVPR_code/spam.py:200-321)."""
    from garbage_classification_rca_tpu.models.fusion import legacy
    from garbage_classification_rca_tpu.train.loop import make_train_step
    from garbage_classification_rca_tpu.train.optim import make_optimizer

    params, state = legacy.init(jax.random.PRNGKey(0))
    opt = make_optimizer("sgd", lr=1e-2, reg=0.0)
    rng = np.random.default_rng(0)

    def adapter(p, s, b, *, train=False, rng=None):
        return legacy.forward_gated(p, s, b, train=train, rng=rng)

    step = make_train_step(
        adapter, opt, compute_dtype=jnp.float32,
        batch_to_inputs=lambda mb: (mb["input_ids"], mb["attention_mask"],
                                    mb["image"].astype(jnp.float32)))
    batch = {
        "input_ids": jnp.asarray(rng.integers(5, 50000, (1, 2, 8)), jnp.int32),
        "attention_mask": jnp.ones((1, 2, 8), jnp.int32),
        "image": jnp.asarray(rng.normal(size=(1, 2, 64, 64, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 4, (1, 2)), jnp.int32),
    }
    p2, s2, _, loss, _ = step(params, state, opt.init(params), batch,
                              jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # the head actually moved
    assert not np.allclose(np.asarray(p2["fc_gated"]["w"]),
                           np.asarray(params["fc_gated"]["w"]))
