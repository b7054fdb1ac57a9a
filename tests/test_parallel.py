"""Mesh / sharding utilities on the 8-virtual-device CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np

from garbage_classification_rca_tpu.parallel import mesh as pm


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_parse_mesh_shape():
    assert pm.parse_mesh_shape("data:-1", 8) == {"data": 8}
    assert pm.parse_mesh_shape("data:4,model:2", 8) == {"data": 4, "model": 2}
    assert pm.parse_mesh_shape("data:-1,model:2", 8) == {"model": 2, "data": 4}


def test_sharded_forward_matches_single_device():
    mesh = pm.make_mesh("data:8")
    w = jnp.asarray(np.random.default_rng(0).normal(size=(16, 4)).astype(np.float32))
    x = np.random.default_rng(1).normal(size=(32, 16)).astype(np.float32)

    @jax.jit
    def fwd(w, xb):
        return xb @ w

    want = np.asarray(fwd(w, jnp.asarray(x)))
    xs = jax.device_put(jnp.asarray(x), pm.batch_sharding(mesh))
    ws = pm.shard_params(mesh, w)
    got = np.asarray(fwd(ws, xs))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pad_batch_to_multiple():
    batch = {"a": np.ones((13, 3)), "b": np.zeros((13,))}
    padded, n = pm.pad_batch_to_multiple(batch, 8)
    assert n == 13
    assert padded["a"].shape == (16, 3)
    assert padded["b"].shape == (16,)


def test_clamp_eval_batch():
    """Eval batch clamps to the dataset size (mesh-divisible, >=1) so tiny
    runs don't compile/execute table-sized programs full of padding."""
    from garbage_classification_rca_tpu.parallel.mesh import (
        clamp_eval_batch, make_mesh)

    mesh = make_mesh("data:8")
    assert clamp_eval_batch(256, 16, mesh) == 16
    assert clamp_eval_batch(256, 17, mesh) == 24   # rounded up to /8
    assert clamp_eval_batch(256, 5000, mesh) == 256
    assert clamp_eval_batch(256, 3, mesh) == 8
    assert clamp_eval_batch(256, 16, None) == 16
    assert clamp_eval_batch(256, 0, None) == 1


def test_train_mesh_divides_phase_batches():
    """Regression: a fixed --batch_size that doesn't divide the device
    count must shrink the data axis (engine.run_phase device_puts train
    microbatches unpadded), considering BOTH phase batch sizes."""
    from garbage_classification_rca_tpu.cli import train_mesh

    def data_axis(mesh):
        return dict(zip(mesh.axis_names, mesh.devices.shape))["data"]

    assert data_axis(train_mesh("data:-1", 4, 4, 1)) == 4
    assert data_axis(train_mesh("data:-1", 4, 6, 1)) == 2   # gcd(4, 6)
    assert data_axis(train_mesh("data:-1", 4, 6, 0)) == 4   # no FT phase
    assert data_axis(train_mesh("data:-1", 16, 8, 1)) == 8
    # non-divisor sizes (6 of 8 devices) are deliberately NOT used: eval
    # and table batches downstream are only guaranteed divisible by
    # divisors of the chip count
    assert data_axis(train_mesh("data:-1", 6, 6, 1)) == 2
    assert data_axis(train_mesh("data:-1", 7, 7, 1)) == 1
