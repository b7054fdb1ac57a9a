"""CLIP-strategy eval batch contract.

The CLIP head's FC is sized [cfg.batch_size, n] (reference
multimodal_model.py:620-623), so eval must run at exactly
cfg.batch_size; the pipeline's full-batch tail padding (valid mask)
keeps the reference's trans_conv pad hack from firing. Regression for
the review finding that the default MULTIMODAL_EVAL_BATCH (128)
crashed `test_both --late_fusion=clip` out of the box.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garbage_classification_rca_tpu.cli.test_both import make_both_eval_step
from garbage_classification_rca_tpu.models.fusion import (FusionConfig,
                                                          build_fusion)
from garbage_classification_rca_tpu.parallel.mesh import make_mesh


def truncated_clip(bs):
    cfg = FusionConfig(strategy="clip", batch_size=bs)
    init_fn, apply_fn, _ = build_fusion(cfg)
    params, state = init_fn(jax.random.PRNGKey(0))
    params["text"]["layers"] = params["text"]["layers"][:1]
    params["image"]["stages"] = [s[:1] for s in params["image"]["stages"]]
    state["image"]["stages"] = [s[:1] for s in state["image"]["stages"]]
    return cfg, apply_fn, params, state


def batch(rng, n, bs, l=8, px=64):
    valid = np.zeros(bs, np.int32)
    valid[:n] = 1
    return {
        "image": rng.integers(0, 255, (bs, px, px, 3)).astype(np.uint8),
        "input_ids": rng.integers(10, 200, (bs, l)).astype(np.int32),
        "attention_mask": np.ones((bs, l), np.int32),
        "label": rng.integers(0, 4, bs).astype(np.int32),
        "valid": valid,
    }


def test_clip_eval_at_model_batch_with_padded_tail():
    """A 10-sample dataset at cfg.batch_size=16: padded batch evaluates
    without the pad hack (logits [16, 16] match clip_fc), preds finite."""
    cfg, apply_fn, params, state = truncated_clip(16)
    step = make_both_eval_step(apply_fn, make_mesh("data:2"), jnp.float32)
    rng = np.random.default_rng(0)
    preds, correct = step(params, state, batch(rng, 10, 16))
    assert preds.shape == (16,)
    assert 0 <= int(correct) <= 10


def test_clip_eval_wrong_batch_raises():
    """batch != cfg.batch_size (and != 8) trips the guarded reference
    defect with a descriptive error, not a raw shape crash."""
    cfg, apply_fn, params, state = truncated_clip(16)

    def fwd(b):
        x = b["image"].astype(jnp.float32) / 255.0
        return apply_fn(params, state,
                        (b["input_ids"], b["attention_mask"], x),
                        train=False, eval_mode=True)

    rng = np.random.default_rng(1)
    with pytest.raises(ValueError, match="pad hack"):
        fwd(batch(rng, 32, 32))


def test_clip_cli_batch_selection():
    """test_both's batch selection must pick cfg.batch_size for clip
    regardless of --eval_batch_size / dataset size."""
    import inspect

    from garbage_classification_rca_tpu.cli import test_both as tb

    src = inspect.getsource(tb.main)
    assert 'strategy == "clip"' in src and "cfg.batch_size" in src
