"""nn.core layers vs torch (CPU) numerics — the parity bedrock for loading
reference .pth checkpoints (SURVEY.md §7 'Backbone parity')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from garbage_classification_rca_tpu.nn import core as nn

RNG = np.random.default_rng(7)


def t2j_linear(tl):
    return {"w": jnp.asarray(tl.weight.detach().numpy().T),
            "b": jnp.asarray(tl.bias.detach().numpy())}


def test_linear_matches_torch():
    tl = torch.nn.Linear(13, 7)
    x = RNG.normal(size=(4, 13)).astype(np.float32)
    want = tl(torch.tensor(x)).detach().numpy()
    got = np.asarray(nn.linear(t2j_linear(tl), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride,padding,groups", [(1, 1, 1), (2, 3, 1), (1, 0, 4)])
def test_conv2d_matches_torch(stride, padding, groups):
    tc = torch.nn.Conv2d(8, 16, 3, stride=stride, padding=padding,
                         groups=groups, bias=True)
    x = RNG.normal(size=(2, 8, 17, 19)).astype(np.float32)
    want = tc(torch.tensor(x)).detach().numpy()          # NCHW
    p = {"w": jnp.asarray(tc.weight.detach().numpy().transpose(2, 3, 1, 0)),
         "b": jnp.asarray(tc.bias.detach().numpy())}
    got = nn.conv2d(p, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    stride=stride, padding=padding, groups=groups)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)


def test_batchnorm_eval_and_train_match_torch():
    tb = torch.nn.BatchNorm2d(6)
    tb.weight.data.normal_(); tb.bias.data.normal_()
    tb.running_mean.normal_(); tb.running_var.uniform_(0.5, 2.0)
    x = RNG.normal(size=(3, 6, 5, 5)).astype(np.float32)
    p = {"scale": jnp.asarray(tb.weight.detach().numpy()),
         "bias": jnp.asarray(tb.bias.detach().numpy())}
    s = {"mean": jnp.asarray(tb.running_mean.numpy().copy()),
         "var": jnp.asarray(tb.running_var.numpy().copy())}
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))

    tb.eval()
    want = tb(torch.tensor(x)).detach().numpy()
    got, s2 = nn.batchnorm(p, s, xj, train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)

    tb.train()
    want_t = tb(torch.tensor(x)).detach().numpy()
    got_t, s3 = nn.batchnorm(p, s, xj, train=True)
    np.testing.assert_allclose(np.asarray(got_t).transpose(0, 3, 1, 2), want_t,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s3["mean"]),
                               tb.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s3["var"]),
                               tb.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_layernorm_matches_torch():
    tl = torch.nn.LayerNorm(12)
    tl.weight.data.normal_(); tl.bias.data.normal_()
    x = RNG.normal(size=(4, 9, 12)).astype(np.float32)
    want = tl(torch.tensor(x)).detach().numpy()
    p = {"scale": jnp.asarray(tl.weight.detach().numpy()),
         "bias": jnp.asarray(tl.bias.detach().numpy())}
    got = nn.layernorm(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("act,tact", [
    (nn.hardswish, F.hardswish), (nn.hardsigmoid, F.hardsigmoid),
    (nn.silu, F.silu), (nn.relu6, lambda t: F.relu6(t)),
])
def test_activations_match_torch(act, tact):
    x = RNG.normal(size=(64,)).astype(np.float32) * 4
    np.testing.assert_allclose(np.asarray(act(jnp.asarray(x))),
                               tact(torch.tensor(x)).numpy(),
                               rtol=1e-5, atol=1e-6)


def test_gelu_matches_torch():
    x = RNG.normal(size=(64,)).astype(np.float32) * 3
    np.testing.assert_allclose(np.asarray(nn.gelu(jnp.asarray(x))),
                               F.gelu(torch.tensor(x)).numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("window,stride,padding", [(3, 2, 1), (2, 2, 0), ((7, 7), (7, 7), 0)])
def test_pools_match_torch(window, stride, padding):
    x = RNG.normal(size=(2, 5, 14, 14)).astype(np.float32)
    want_avg = torch.nn.AvgPool2d(window, stride, padding)(torch.tensor(x)).numpy()
    want_max = torch.nn.MaxPool2d(window, stride, padding)(torch.tensor(x)).numpy()
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    got_avg = np.asarray(nn.avg_pool(xj, window, stride, padding)).transpose(0, 3, 1, 2)
    got_max = np.asarray(nn.max_pool(xj, window, stride, padding)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_avg, want_avg, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_max, want_max, rtol=1e-5, atol=1e-5)


def test_gru_matches_torch():
    tg = torch.nn.GRU(10, 20, batch_first=True)
    x = RNG.normal(size=(3, 5, 10)).astype(np.float32)
    want_seq, want_h = tg(torch.tensor(x))
    p = {"w_ih": jnp.asarray(tg.weight_ih_l0.detach().numpy().T),
         "w_hh": jnp.asarray(tg.weight_hh_l0.detach().numpy().T),
         "b_ih": jnp.asarray(tg.bias_ih_l0.detach().numpy()),
         "b_hh": jnp.asarray(tg.bias_hh_l0.detach().numpy())}
    got_seq, got_h = nn.gru(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_seq), want_seq.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h), want_h.detach().numpy()[0],
                               rtol=1e-4, atol=1e-5)


def test_l2_normalize_matches_torch_norm_division():
    x = RNG.normal(size=(4, 17)).astype(np.float32)
    t = torch.tensor(x)
    want = (t / t.norm(dim=1, keepdim=True)).numpy()
    got = np.asarray(nn.l2_normalize(jnp.asarray(x), axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
