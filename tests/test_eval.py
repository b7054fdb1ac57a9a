"""Eval engine end-to-end on the tiny dataset fixture + report artifacts."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from garbage_classification_rca_tpu.data.manifest import build_manifest
from garbage_classification_rca_tpu.data.pipeline import ImageTextBatcher
from garbage_classification_rca_tpu.eval.harness import run_image_eval
from garbage_classification_rca_tpu.eval.report import (
    confusion_matrix, classification_report_dict, generate_report_and_image)
from garbage_classification_rca_tpu.parallel.mesh import make_mesh, shard_params


def test_confusion_matrix_against_sklearn():
    from sklearn.metrics import confusion_matrix as sk_cm
    rng = np.random.default_rng(0)
    y, p = rng.integers(0, 4, 100), rng.integers(0, 4, 100)
    np.testing.assert_array_equal(confusion_matrix(y, p),
                                  sk_cm(y, p, labels=range(4)))


def test_report_artifacts(tmp_path):
    rng = np.random.default_rng(1)
    y, p = rng.integers(0, 4, 50), rng.integers(0, 4, 50)
    rep = generate_report_and_image(y, p, 42.0, str(tmp_path), "dummy", "image")
    files = os.listdir(tmp_path)
    assert any(f.endswith(".png") for f in files)
    csvs = [f for f in files if f.endswith(".csv")]
    assert csvs == ["image_model_dummy_report_test_set_acc_42.00.csv"]
    assert "Black" in rep and "macro avg" in rep
    # CSV round-trips with sklearn's column layout
    import pandas as pd
    df = pd.read_csv(tmp_path / csvs[0], index_col=0)
    assert list(df.columns)[:4] == ["Black", "Blue", "Green", "TTR"]


def _tiny_linear_model():
    """A minimal image 'model' obeying the ModelDef apply contract."""
    def apply(params, state, x, *, train=False, rng=None):
        feats = jnp.mean(x, axis=(1, 2))              # [B, 3]
        return feats @ params["w"], state
    return apply


def test_run_image_eval_sharded(tiny_dataset):
    m = build_manifest(str(tiny_dataset))
    mesh = make_mesh("data:8")
    apply = _tiny_linear_model()
    params = shard_params(mesh, {"w": jnp.asarray(
        np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32))})
    b = ImageTextBatcher(m, (64, 64), workers=2)
    acc, labels, preds, stats = run_image_eval(
        apply, params, {}, b, batch_size=8, mesh=mesh,
        compute_dtype=jnp.float32, progress=False)
    b.close()
    assert labels.shape == (12,) and preds.shape == (12,)
    assert 0.0 <= acc <= 100.0
    assert stats["n"] == 12

    # single-device path must agree with the sharded path
    b2 = ImageTextBatcher(m, (64, 64), workers=2)
    acc1, labels1, preds1, _ = run_image_eval(
        apply, jax.device_get(params), {}, b2, batch_size=8, mesh=None,
        compute_dtype=jnp.float32, progress=False)
    b2.close()
    np.testing.assert_array_equal(preds, preds1)
    assert acc == acc1
