"""Checkpoint-converter completeness audit: every tensor in a reference
state dict must be READ by the converter (VERDICT r1 item 2).

A silently-ignored key is the classic symptom of a misremembered layout
(wrong branch names, missed SE block, ...). ``TrackingDict`` records
every ``sd[k]`` access during conversion; ``audit()`` fails on leftovers
(only ``num_batches_tracked`` counters are excused — no numerical
content).

Sources audited:
  * replica state dicts for all 13 image archs + 6 text towers
    (tests/torch_refs + HF transformers modules);
  * the REAL reference checkpoints under /tmp/fixture when mounted —
    vit_b16 / shufflenet / mm_rca / distilbert, exactly as the reference
    saved them (DataParallel prefixes already stripped by the loader).
"""

import os

import numpy as np
import pytest
import torch

from garbage_classification_rca_tpu.checkpoint.torch_convert import (
    TrackingDict, numpy_state_dict)
from garbage_classification_rca_tpu.models import get_image_model

FIXTURE = "/tmp/fixture"


def _audit_convert(mdef, sd):
    td = TrackingDict(sd)
    params, state = mdef.convert_torch(td)
    td.audit()
    return params, state


# ---------------------------------------------------------------------------
# image zoo — replicas
# ---------------------------------------------------------------------------


def _effnet_replica(name):
    from garbage_classification_rca_tpu.models.image import (
        efficientnet as v1, efficientnet_v2 as v2)
    from tests.torch_refs.efficientnet_ref import (
        EfficientNetRef, V1_NORM, V2_NORM)
    from functools import partial

    if name in v2.CONFIGS:
        cfg = v2.CONFIGS[name]
        norm = V2_NORM
    else:
        cfg = v1.CONFIGS[name]
        norm = (partial(torch.nn.BatchNorm2d, eps=cfg.bn_eps)
                if cfg.bn_eps != 1e-5 else V1_NORM)
    return EfficientNetRef(list(cfg.stages), cfg.stem_out, cfg.head_out,
                           norm)


def _replica(name):
    from tests.torch_refs.misc_backbones_ref import (
        BasicBlock, Bottleneck, ResNetRef, MobileNetV3Ref, ShuffleNetV2Ref,
        ConvNeXtRef)
    from tests.torch_refs.vit_ref import VisionTransformerRef

    if name in ("b0", "b4", "b5", "eff_v2_small", "eff_v2_medium",
                "eff_v2_large"):
        return _effnet_replica(name)
    return {
        "res18": lambda: ResNetRef(BasicBlock, (2, 2, 2, 2)),
        "res50": lambda: ResNetRef(Bottleneck, (3, 4, 6, 3)),
        "res152": lambda: ResNetRef(Bottleneck, (3, 8, 36, 3)),
        "mb": MobileNetV3Ref,
        "shuffle_net": ShuffleNetV2Ref,
        "convnext": ConvNeXtRef,
        "transformer_B16": VisionTransformerRef,
        "transformer_L16": lambda: VisionTransformerRef(
            d=1024, heads=16, mlp=4096, layers=24),
    }[name]()


ALL_IMAGE = ["b0", "b4", "b5", "eff_v2_small", "eff_v2_medium",
             "eff_v2_large", "res18", "res50", "res152", "mb",
             "shuffle_net", "convnext", "transformer_B16",
             "transformer_L16"]


@pytest.mark.parametrize("name", ALL_IMAGE)
def test_image_converter_consumes_all_keys(name):
    torch.manual_seed(0)
    tm = _replica(name)
    mdef = get_image_model(name)
    _audit_convert(mdef, numpy_state_dict(tm))


# ---------------------------------------------------------------------------
# text zoo — HF modules (the reference wraps these exact classes)
# ---------------------------------------------------------------------------


def _tiny_text_sd(name):
    import transformers as tf

    torch.manual_seed(0)
    if name == "distilbert":
        m = tf.DistilBertModel(tf.DistilBertConfig(
            n_layers=2, dim=32, n_heads=2, hidden_dim=64, vocab_size=200))
    elif name == "bert":
        m = tf.BertModel(tf.BertConfig(
            num_hidden_layers=2, hidden_size=32, num_attention_heads=2,
            intermediate_size=64, vocab_size=200))
    elif name == "roberta":
        m = tf.RobertaModel(tf.RobertaConfig(
            num_hidden_layers=2, hidden_size=32, num_attention_heads=2,
            intermediate_size=64, vocab_size=200))
    elif name == "bart":
        m = tf.BartForSequenceClassification(tf.BartConfig(
            encoder_layers=2, decoder_layers=2, d_model=32,
            encoder_attention_heads=2, decoder_attention_heads=2,
            encoder_ffn_dim=64, decoder_ffn_dim=64, vocab_size=200,
            num_labels=4))
    elif name == "gpt2":
        m = tf.GPT2ForSequenceClassification(tf.GPT2Config(
            n_layer=2, n_embd=32, n_head=2, vocab_size=200, num_labels=4))
    elif name == "mobile_bert":
        m = tf.MobileBertModel(tf.MobileBertConfig(
            num_hidden_layers=2, vocab_size=200))
    sd = numpy_state_dict(m)
    # the reference wraps encoders as self.model / adds self.out head
    if name in ("distilbert", "bert", "roberta", "mobile_bert"):
        sd = {f"model.{k}": v for k, v in sd.items()}
        hidden = {"distilbert": 32, "bert": 32, "roberta": 32,
                  "mobile_bert": 512}[name]
        sd["out.weight"] = np.zeros((4, hidden), np.float32)
        sd["out.bias"] = np.zeros((4,), np.float32)
    return sd


TEXT_TINY_SUPPORTED = ["distilbert", "bert", "roberta"]


@pytest.mark.parametrize("name", TEXT_TINY_SUPPORTED)
def test_text_converter_consumes_all_keys_tiny(name):
    """Tiny-config HF state dicts (full-size covered by the real-fixture
    audits below + the existing full-parity tests)."""
    from garbage_classification_rca_tpu.models import get_text_model

    pytest.importorskip("transformers")
    sd = _tiny_text_sd(name)
    mdef = get_text_model(name)
    td = TrackingDict(sd)
    try:
        mdef.convert_torch(td)
    except Exception as e:  # converters may hard-code full-size layer count
        pytest.skip(f"tiny config unsupported by converter: {e}")
    # position-embedding tails beyond max-len buckets are still real keys —
    # no allowance: every key must be read
    td.audit()


def _full_text_sd(name):
    """Reference-layout state dict at the REAL pretrained geometry (the
    layout our converters hard-code)."""
    import transformers as tf

    torch.manual_seed(0)
    if name == "distilbert":
        m = tf.DistilBertModel(tf.DistilBertConfig())
    elif name == "bert":
        m = tf.BertModel(tf.BertConfig())
    elif name == "roberta":
        m = tf.RobertaModel(tf.RobertaConfig())
    elif name == "bart":
        m = tf.BartForSequenceClassification(tf.BartConfig(num_labels=4))
    elif name == "gpt2":
        m = tf.GPT2ForSequenceClassification(tf.GPT2Config(num_labels=4))
    elif name == "mobile_bert":
        # the reference wraps MobileBertForSequenceClassification (its own
        # classifier replaced), NOT a bare encoder + out head
        # (text_models.py:162-173)
        m = tf.MobileBertForSequenceClassification(
            tf.MobileBertConfig(num_labels=4))
    sd = numpy_state_dict(m)
    if name == "mobile_bert":
        return {f"model.{k}": v for k, v in sd.items()}
    if name in ("distilbert", "bert", "roberta"):
        sd = {f"model.{k}": v for k, v in sd.items()}
        sd["out.weight"] = np.zeros((4, 768), np.float32)
        sd["out.bias"] = np.zeros((4,), np.float32)
    return sd


ALL_TEXT = ["distilbert", "bert", "roberta", "bart", "gpt2", "mobile_bert"]


@pytest.mark.parametrize("name", ALL_TEXT)
def test_text_converter_consumes_all_keys_full(name):
    """Every tensor of a FULL-geometry reference-layout text checkpoint is
    read by the converter (the tiny variants above skip for converters that
    hard-code the pretrained layer count, which left bart/gpt2/mobile_bert
    and the full-size layouts unaudited without the /tmp/fixture mount)."""
    from garbage_classification_rca_tpu.models import get_text_model

    pytest.importorskip("transformers")
    sd = _full_text_sd(name)
    td = TrackingDict(sd)
    get_text_model(name).convert_torch(td)
    td.audit()


def test_fusion_converter_consumes_all_keys_full():
    """The all-heads fusion checkpoint (EffV2MediumAndDistilbertGated
    builds EVERY head regardless of strategy, multimodal_model.py:156-328,
    so the .pth carries ~1306 keys): the converter must read every one —
    hermetic twin of the fixture-gated real-mm_rca audit below."""
    from transformers import DistilBertConfig, DistilBertModel
    from garbage_classification_rca_tpu.models.fusion import (
        FusionConfig, build_fusion)
    from torch_refs.fusion_ref import FusionRef

    pytest.importorskip("transformers")
    torch.manual_seed(0)
    text = DistilBertModel(DistilBertConfig())
    ref = FusionRef(text, batch_size=16, reverse=True, features_only=True,
                    cross_attention_only=True)
    _, _, convert_fn = build_fusion(FusionConfig(strategy="MM_RCA",
                                                 reverse=True))
    td = TrackingDict(numpy_state_dict(ref))
    convert_fn(td)
    td.audit()


# ---------------------------------------------------------------------------
# REAL reference checkpoints (strongest evidence; skipped if not mounted)
# ---------------------------------------------------------------------------

real = pytest.mark.skipif(not os.path.isdir(FIXTURE),
                          reason="/tmp/fixture not mounted")


@real
def test_real_vit_checkpoint_fully_consumed():
    from garbage_classification_rca_tpu.checkpoint.torch_convert import (
        load_torch_state_dict)

    sd = load_torch_state_dict(os.path.join(FIXTURE, "vit_b16.pth"))
    _audit_convert(get_image_model("transformer_B16"), sd)


@real
def test_real_shufflenet_checkpoint_fully_consumed():
    from garbage_classification_rca_tpu.checkpoint.torch_convert import (
        load_torch_state_dict)

    sd = load_torch_state_dict(os.path.join(FIXTURE, "shufflenet.pth"))
    _audit_convert(get_image_model("shuffle_net"), sd)


@real
def test_real_distilbert_checkpoint_fully_consumed():
    from garbage_classification_rca_tpu.checkpoint.torch_convert import (
        load_torch_state_dict)
    from garbage_classification_rca_tpu.models import get_text_model

    sd = load_torch_state_dict(os.path.join(FIXTURE, "distilbert_cls.pth"))
    td = TrackingDict(sd)
    get_text_model("distilbert").convert_torch(td)
    td.audit()


@real
def test_real_mm_rca_checkpoint_fully_consumed():
    from garbage_classification_rca_tpu.checkpoint.torch_convert import (
        load_torch_state_dict)
    from garbage_classification_rca_tpu.models.fusion import (
        FusionConfig, build_fusion)

    sd = load_torch_state_dict(os.path.join(FIXTURE, "mm_rca.pth"))
    _, _, convert_fn = build_fusion(FusionConfig(strategy="MM_RCA",
                                                 reverse=True))
    td = TrackingDict(sd)
    convert_fn(td)
    td.audit()
