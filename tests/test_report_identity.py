"""End-to-end REPORT-level prediction identity: full CLI vs torch replica
(VERDICT r2 item 3).

Each case runs a BASELINE config through the COMPLETE CLI stack
(manifest walk -> host preprocess -> tokenize -> sharded jit forward ->
argmax -> report CSV, the calculate_test_accuracy_* equivalent) and a
torch-replica forward of the SAME checkpoint on the same inputs, then
asserts the emitted report CSVs are byte-identical — report-level, not
logit-level.

Scope note: both sides consume the same host image preprocessing
(pad-to-AR + bilinear resize); its parity against the reference
cv2/albumentations pipeline is pinned separately (tests/test_native.py,
tests/test_data.py). What this file adds over the logit-parity tests is
the CLI stack itself — batching/padding, valid-masking, BN folding, mesh
sharding, accuracy bookkeeping and the CSV writer — proven
prediction-identical end to end.

Hermetic cases synthesize reference-layout checkpoints (random weights);
the fixture-gated case runs the real reference checkpoints under
/tmp/fixture when mounted (recorded in PARITY.md).
"""

import glob
import os

import numpy as np
import pytest
import torch

FIXTURE = "/tmp/fixture"
VOCAB = os.path.join(os.path.dirname(__file__), "fixtures", "vocab",
                     "wordpiece")


def _normalize_torch(u8):
    from garbage_classification_rca_tpu.data.images import (
        IMAGENET_MEAN, IMAGENET_STD)

    x = u8.astype(np.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return torch.tensor(x.transpose(0, 3, 1, 2))


def _torch_preds(model_fwd, manifest, image_size, tokenizer=None,
                 seq_len=64, batch_size=8):
    """Replica eval loop over the same host batcher the CLI uses."""
    from garbage_classification_rca_tpu.data.pipeline import ImageTextBatcher

    b = ImageTextBatcher(manifest, image_size, tokenizer=tokenizer,
                        seq_len=seq_len, workers=2,
                        with_images=image_size != (0, 0))
    preds, labels = [], []
    for batch in b.iter_batches(batch_size):
        with torch.no_grad():
            logits = model_fwd(batch)
        valid = batch["valid"].astype(bool)
        preds.append(logits.numpy().argmax(-1)[valid])
        labels.append(batch["label"][valid])
    b.close()
    return np.concatenate(labels), np.concatenate(preds)


def _csv_bytes(root):
    csvs = glob.glob(os.path.join(root, "**", "*.csv"), recursive=True)
    assert len(csvs) == 1, csvs
    with open(csvs[0], "rb") as f:
        return os.path.basename(csvs[0]), f.read()


def _torch_report_csv(labels, preds, out_dir, tag, kind):
    from garbage_classification_rca_tpu.eval.report import (
        generate_report_and_image)

    acc = 100.0 * float((labels == preds).mean())
    generate_report_and_image(labels, preds, acc, os.path.join(out_dir, tag),
                              tag, kind=kind)
    return _csv_bytes(out_dir)


def _run_cli(main, argv, tmp_path, monkeypatch, sub):
    d = tmp_path / sub
    d.mkdir(exist_ok=True)
    monkeypatch.chdir(d)
    main(argv)
    monkeypatch.chdir(tmp_path)
    return _csv_bytes(str(d / "test_set_reports"))


def test_shuffle_net_cli_report_identity(tiny_dataset, tmp_path, monkeypatch):
    """BASELINE config #1 (shuffle_net image eval) — CLI CSV == torch CSV."""
    from garbage_classification_rca_tpu.cli import test_image
    from garbage_classification_rca_tpu.data.manifest import build_manifest
    from tests.torch_refs.misc_backbones_ref import ShuffleNetV2Ref

    torch.manual_seed(0)
    ref = ShuffleNetV2Ref().eval()
    ckpt = tmp_path / "shufflenet.pth"
    torch.save(ref.state_dict(), ckpt)

    name, got = _run_cli(
        test_image.main,
        ["--image_model=shuffle_net", f"--model_path={ckpt}",
         f"--dataset_folder_name={tiny_dataset}",
         "--compute_dtype=float32", "--eval_batch_size=8"],
        tmp_path, monkeypatch, "cli")

    m = build_manifest(str(tiny_dataset))
    labels, preds = _torch_preds(
        lambda b: ref(_normalize_torch(b["image"])), m, (224, 224))
    tname, want = _torch_report_csv(labels, preds, str(tmp_path / "torch"),
                                    "shuffle_net", "image")
    assert name == tname
    assert got == want


def test_distilbert_cli_report_identity(tiny_dataset, tmp_path, monkeypatch):
    """BASELINE config #2 (distilbert text eval) — CLI CSV == torch CSV,
    real-WordPiece tokenization on both sides."""
    from transformers import DistilBertConfig, DistilBertModel
    from garbage_classification_rca_tpu.cli import test_text
    from garbage_classification_rca_tpu.data.manifest import build_manifest
    from garbage_classification_rca_tpu.data.tokenizer import get_tokenizer

    torch.manual_seed(0)
    enc = DistilBertModel(DistilBertConfig()).eval()
    out = torch.nn.Linear(768, 4)
    sd = {("model." + k): v for k, v in enc.state_dict().items()}
    sd["out.weight"] = out.weight.detach()
    sd["out.bias"] = out.bias.detach()
    ckpt = tmp_path / "distilbert_cls.pth"
    torch.save(sd, ckpt)

    name, got = _run_cli(
        test_text.main,
        ["--text_model=distilbert", f"--model_path={ckpt}",
         f"--dataset_folder_name={tiny_dataset}", f"--vocab_dir={VOCAB}",
         "--compute_dtype=float32", "--eval_batch_size=8"],
        tmp_path, monkeypatch, "cli")

    m = build_manifest(str(tiny_dataset))
    tok = get_tokenizer("distilbert", vocab_dir=VOCAB)

    def fwd(b):
        ids = torch.tensor(b["input_ids"].astype(np.int64))
        mask = torch.tensor(b["attention_mask"].astype(np.int64))
        h = enc(ids, attention_mask=mask)[0][:, 0]
        return out(h)

    labels, preds = _torch_preds(fwd, m, (0, 0), tokenizer=tok)
    tname, want = _torch_report_csv(labels, preds, str(tmp_path / "torch"),
                                    "distilbert", "text")
    assert name == tname
    assert got == want


def test_mm_rca_cli_report_identity(tiny_dataset, tmp_path, monkeypatch):
    """BASELINE config #4 (MM-RCA multimodal eval) — CLI CSV == torch CSV
    through the all-heads reference checkpoint layout."""
    from transformers import DistilBertConfig, DistilBertModel
    from garbage_classification_rca_tpu.cli import test_both
    from garbage_classification_rca_tpu.data.manifest import build_manifest
    from garbage_classification_rca_tpu.data.tokenizer import get_tokenizer
    from tests.torch_refs.fusion_ref import FusionRef

    torch.manual_seed(0)
    text = DistilBertModel(DistilBertConfig())
    ref = FusionRef(text, batch_size=16, reverse=True, features_only=True,
                    cross_attention_only=True).eval()
    ref.features_only = ref.cross_attention_only = False
    ckpt = tmp_path / "mm_rca.pth"
    torch.save(ref.state_dict(), ckpt)

    name, got = _run_cli(
        test_both.main,
        ["--late_fusion=MM_RCA", "--reverse", "--text_model=distilbert",
         f"--model_path={ckpt}", f"--dataset_folder_name={tiny_dataset}",
         f"--vocab_dir={VOCAB}", "--compute_dtype=float32",
         "--eval_batch_size=8"],
        tmp_path, monkeypatch, "cli")

    m = build_manifest(str(tiny_dataset))
    tok = get_tokenizer("distilbert", vocab_dir=VOCAB)

    def fwd(b):
        ids = torch.tensor(b["input_ids"].astype(np.int64))
        mask = torch.tensor(b["attention_mask"].astype(np.int64))
        return ref(ids, mask, _normalize_torch(b["image"]),
                   strategy="MM_RCA")

    labels, preds = _torch_preds(fwd, m, (480, 480), tokenizer=tok)
    tname, want = _torch_report_csv(labels, preds, str(tmp_path / "torch"),
                                    "MM_RCA", "both")
    assert name == tname
    assert got == want


def test_vit_b16_cli_report_identity(tiny_dataset, tmp_path, monkeypatch):
    """BASELINE config #3 (transformer_B16 image eval @224) — CLI CSV ==
    torch CSV. Hermetic twin of the fixture-gated real-checkpoint case."""
    from garbage_classification_rca_tpu.cli import test_image
    from garbage_classification_rca_tpu.data.manifest import build_manifest
    from tests.torch_refs.vit_ref import VisionTransformerRef

    torch.manual_seed(0)
    ref = VisionTransformerRef().eval()
    ckpt = tmp_path / "vit_b16.pth"
    torch.save(ref.state_dict(), ckpt)

    name, got = _run_cli(
        test_image.main,
        ["--image_model=transformer_B16", f"--model_path={ckpt}",
         f"--dataset_folder_name={tiny_dataset}",
         "--compute_dtype=float32", "--eval_batch_size=8"],
        tmp_path, monkeypatch, "cli")

    m = build_manifest(str(tiny_dataset))
    labels, preds = _torch_preds(
        lambda b: ref(_normalize_torch(b["image"])), m, (224, 224))
    tname, want = _torch_report_csv(labels, preds, str(tmp_path / "torch"),
                                    "transformer_B16", "image")
    assert name == tname
    assert got == want


# ---------------------------------------------------------------------------
# BASELINE config #5: BLIP-2 / Q-Former (blip_2_test_set.py,
# q_former_test_set.py). Hermetic at the tiny geometry
# (GC_RCA_TINY_BLIP2=1) with an HF-layout checkpoint run through the real
# converter on the CLI side and Blip2ForConditionalGeneration on the torch
# side — both consuming the SAME Blip2Batcher host batches (CLIP bicubic
# resize, left-padded prompts, answer-word label table).
# ---------------------------------------------------------------------------

BPE_VOCAB = os.path.join(os.path.dirname(__file__), "fixtures", "vocab",
                         "bpe")


def _tiny_hf_blip2():
    """HF twin of cli.blip2_common.tiny_blip2_config() geometry."""
    from transformers import (Blip2Config, Blip2ForConditionalGeneration,
                              Blip2QFormerConfig, Blip2VisionConfig,
                              OPTConfig)

    cfg = Blip2Config(
        vision_config=Blip2VisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, image_size=224, patch_size=14).to_dict(),
        qformer_config=Blip2QFormerConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, encoder_hidden_size=64,
            cross_attention_frequency=2).to_dict(),
        text_config=OPTConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            ffn_dim=128, vocab_size=50272, max_position_embeddings=256,
            word_embed_proj_dim=64).to_dict(),
        num_query_tokens=8)
    torch.manual_seed(0)
    return Blip2ForConditionalGeneration(cfg).eval()


def _clip_normalize_torch(u8):
    """EXACT twin of cli.blip2_common.normalize_clip's scale/shift math
    (same rounding, not just the same formula)."""
    from garbage_classification_rca_tpu.data.images import CLIP_MEAN, CLIP_STD

    scale = (1.0 / (255.0 * CLIP_STD)).astype(np.float32)
    shift = (-CLIP_MEAN / CLIP_STD).astype(np.float32)
    x = u8.astype(np.float32) * scale + shift
    return x.transpose(0, 3, 1, 2)


def test_blip2_cli_report_identity(tiny_dataset, tmp_path, monkeypatch):
    """BASELINE config #5a (BLIP-2 1-token eval) — CLI CSV == torch CSV.

    Torch side replicates blip_2_test_set.py's decision rule at the
    constrained-decode equivalence point: next-token logits (query embeds
    prepended, left-padded prompt) restricted to the 4 answer words' first
    tokens, argmax."""
    from garbage_classification_rca_tpu.cli import blip2_test
    from garbage_classification_rca_tpu.cli.blip2_common import Blip2Batcher
    from garbage_classification_rca_tpu.cli.blip2_train import (
        answer_first_token_table)
    from garbage_classification_rca_tpu.data.manifest import build_manifest
    from garbage_classification_rca_tpu.data.tokenizer import get_tokenizer
    from tests.test_blip2 import _hf_with_placeholders

    monkeypatch.setenv("GC_RCA_TINY_BLIP2", "1")
    tm = _tiny_hf_blip2()
    ckpt = tmp_path / "blip2.pth"
    torch.save(tm.state_dict(), ckpt)

    name, got = _run_cli(
        blip2_test.main,
        [f"--model_path={ckpt}", f"--dataset_folder_name={tiny_dataset}",
         f"--vocab_dir={BPE_VOCAB}", "--compute_dtype=float32",
         "--eval_batch_size=4"],
        tmp_path, monkeypatch, "cli")

    m = build_manifest(str(tiny_dataset))
    tok = get_tokenizer("opt", vocab_dir=BPE_VOCAB)
    b = Blip2Batcher(m, tok, workers=2)
    aft = answer_first_token_table(b, m.classes)
    all_p, all_l = [], []
    for batch in b.iter_batches(4):
        pix = _clip_normalize_torch(batch["image"])
        out = _hf_with_placeholders(tm, pix, batch["input_ids"],
                                    batch["attention_mask"], n_query=8)
        cls = out.logits[:, -1].numpy()[:, aft].argmax(-1)
        valid = batch["valid"].astype(bool)
        all_p.append(cls[valid])
        all_l.append(batch["label"][valid])
    b.close()
    labels, preds = np.concatenate(all_l), np.concatenate(all_p)
    tname, want = _torch_report_csv(labels, preds, str(tmp_path / "torch"),
                                    "blip2", "blip2")
    assert name == tname
    assert got == want


def test_qformer_cli_report_identity(tiny_dataset, tmp_path, monkeypatch):
    """BASELINE config #5b (Q-Former classifier eval) — CLI CSV == torch
    CSV through the reference two-file layout (backbone .pth +
    MultimodalClassifier .pth, q_former_training.py:33-47)."""
    from garbage_classification_rca_tpu.cli import qformer_test
    from garbage_classification_rca_tpu.cli.blip2_common import Blip2Batcher
    from garbage_classification_rca_tpu.data.manifest import build_manifest
    from garbage_classification_rca_tpu.data.tokenizer import get_tokenizer

    monkeypatch.setenv("GC_RCA_TINY_BLIP2", "1")
    tm = _tiny_hf_blip2()
    ckpt = tmp_path / "blip2.pth"
    torch.save(tm.state_dict(), ckpt)
    clf = torch.nn.Linear(32, 4)
    cpath = tmp_path / "classifier.pth"
    torch.save({"classifier.weight": clf.weight.detach(),
                "classifier.bias": clf.bias.detach()}, cpath)

    name, got = _run_cli(
        qformer_test.main,
        [f"--model_path={ckpt}", f"--classifier_weights={cpath}",
         f"--dataset_folder_name={tiny_dataset}",
         f"--vocab_dir={BPE_VOCAB}", "--compute_dtype=float32",
         "--eval_batch_size=4"],
        tmp_path, monkeypatch, "cli")

    m = build_manifest(str(tiny_dataset))
    tok = get_tokenizer("opt", vocab_dir=BPE_VOCAB)
    b = Blip2Batcher(m, tok, workers=2)
    all_p, all_l = [], []
    for batch in b.iter_batches(4):
        pix = torch.tensor(_clip_normalize_torch(batch["image"]))
        with torch.no_grad():
            img = tm.vision_model(pix).last_hidden_state
            q = tm.qformer(
                query_embeds=tm.query_tokens.expand(img.shape[0], -1, -1),
                encoder_hidden_states=img).last_hidden_state[:, 0]
            cls = clf(q).numpy().argmax(-1)
        valid = batch["valid"].astype(bool)
        all_p.append(cls[valid])
        all_l.append(batch["label"][valid])
    b.close()
    labels, preds = np.concatenate(all_l), np.concatenate(all_p)
    tname, want = _torch_report_csv(labels, preds, str(tmp_path / "torch"),
                                    "qformer", "qformer")
    assert name == tname
    assert got == want


# ---------------------------------------------------------------------------
# fixture-gated: the REAL reference checkpoints (PARITY.md records results)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.isdir(FIXTURE),
                    reason="/tmp/fixture not mounted")
def test_real_checkpoint_cli_report_identity(tmp_path, monkeypatch):
    """shuffle_net + vit_b16 real .pth: CLI report == torch-replica report
    on the fixture test set (extends the logit parity of
    test_real_checkpoints.py to the report artifact)."""
    from garbage_classification_rca_tpu.checkpoint.torch_convert import (
        load_torch_state_dict)
    from garbage_classification_rca_tpu.cli import test_image
    from garbage_classification_rca_tpu.data.manifest import build_manifest
    from tests.torch_refs.misc_backbones_ref import ShuffleNetV2Ref
    from tests.torch_refs.vit_ref import VisionTransformerRef

    cases = [("shuffle_net", "shufflenet.pth", ShuffleNetV2Ref),
             ("transformer_B16", "vit_b16.pth", VisionTransformerRef)]
    m = build_manifest(os.path.join(FIXTURE, "testset"))
    for arch, fname, ref_cls in cases:
        sd = load_torch_state_dict(os.path.join(FIXTURE, fname))
        ref = ref_cls()
        missing, unexpected = ref.load_state_dict(
            {k: torch.tensor(v) for k, v in sd.items()}, strict=False)
        assert not missing and not unexpected
        ref.eval()

        name, got = _run_cli(
            test_image.main,
            [f"--image_model={arch}",
             f"--model_path={os.path.join(FIXTURE, fname)}",
             f"--dataset_folder_name={os.path.join(FIXTURE, 'testset')}",
             "--compute_dtype=float32", "--eval_batch_size=8"],
            tmp_path, monkeypatch, f"cli_{arch}")

        labels, preds = _torch_preds(
            lambda b: ref(_normalize_torch(b["image"])), m, (224, 224))
        tname, want = _torch_report_csv(
            labels, preds, str(tmp_path / f"torch_{arch}"), arch, "image")
        assert name == tname, (name, tname)
        assert got == want, f"{arch}: CLI report != torch report"


@pytest.mark.skipif(not os.path.isdir(FIXTURE),
                    reason="/tmp/fixture not mounted")
def test_real_checkpoint_text_cli_report_identity(tmp_path, monkeypatch):
    """distilbert_cls real .pth through cli.test_text vs HF-replica —
    WordPiece fixture vocab tokenizes the fixture filenames identically on
    both sides (real pretrained vocab is not available offline)."""
    from transformers import DistilBertConfig, DistilBertModel
    from garbage_classification_rca_tpu.checkpoint.torch_convert import (
        load_torch_state_dict)
    from garbage_classification_rca_tpu.cli import test_text
    from garbage_classification_rca_tpu.data.manifest import build_manifest
    from garbage_classification_rca_tpu.data.tokenizer import get_tokenizer

    ckpt = os.path.join(FIXTURE, "distilbert_cls.pth")
    sd = load_torch_state_dict(ckpt)
    enc = DistilBertModel(DistilBertConfig())
    missing, unexpected = enc.load_state_dict(
        {k[len("model."):]: torch.tensor(v) for k, v in sd.items()
         if k.startswith("model.")}, strict=False)
    assert not missing and not unexpected
    enc.eval()
    w_out = torch.tensor(sd["out.weight"])
    b_out = torch.tensor(sd["out.bias"])

    name, got = _run_cli(
        test_text.main,
        ["--text_model=distilbert", f"--model_path={ckpt}",
         f"--dataset_folder_name={os.path.join(FIXTURE, 'testset')}",
         f"--vocab_dir={VOCAB}", "--compute_dtype=float32",
         "--eval_batch_size=8"],
        tmp_path, monkeypatch, "cli_text")

    m = build_manifest(os.path.join(FIXTURE, "testset"))
    tok = get_tokenizer("distilbert", vocab_dir=VOCAB)

    def fwd(b):
        ids = torch.tensor(b["input_ids"].astype(np.int64))
        mask = torch.tensor(b["attention_mask"].astype(np.int64))
        h = enc(ids, attention_mask=mask)[0][:, 0]
        return h @ w_out.T + b_out

    labels, preds = _torch_preds(fwd, m, (0, 0), tokenizer=tok)
    tname, want = _torch_report_csv(labels, preds, str(tmp_path / "torch_t"),
                                    "distilbert", "text")
    assert name == tname
    assert got == want


@pytest.mark.skipif(not os.path.isdir(FIXTURE),
                    reason="/tmp/fixture not mounted")
def test_real_checkpoint_mm_rca_cli_report_identity(tmp_path, monkeypatch):
    """mm_rca real .pth (all-heads 1306-key layout) through cli.test_both
    vs the torch FusionRef replica — report CSVs byte-identical."""
    from transformers import DistilBertConfig, DistilBertModel
    from garbage_classification_rca_tpu.checkpoint.torch_convert import (
        load_torch_state_dict)
    from garbage_classification_rca_tpu.cli import test_both
    from garbage_classification_rca_tpu.data.manifest import build_manifest
    from garbage_classification_rca_tpu.data.tokenizer import get_tokenizer
    from tests.torch_refs.fusion_ref import FusionRef

    ckpt = os.path.join(FIXTURE, "mm_rca.pth")
    sd = load_torch_state_dict(ckpt)
    text = DistilBertModel(DistilBertConfig())
    ref = FusionRef(text, batch_size=16, reverse=True, features_only=True,
                    cross_attention_only=True)
    missing, unexpected = ref.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False)
    assert not missing and not unexpected
    ref.eval()
    ref.features_only = ref.cross_attention_only = False

    name, got = _run_cli(
        test_both.main,
        ["--late_fusion=MM_RCA", "--reverse", "--text_model=distilbert",
         f"--model_path={ckpt}",
         f"--dataset_folder_name={os.path.join(FIXTURE, 'testset')}",
         f"--vocab_dir={VOCAB}", "--compute_dtype=float32",
         "--eval_batch_size=8"],
        tmp_path, monkeypatch, "cli_mm")

    m = build_manifest(os.path.join(FIXTURE, "testset"))
    tok = get_tokenizer("distilbert", vocab_dir=VOCAB)

    def fwd(b):
        ids = torch.tensor(b["input_ids"].astype(np.int64))
        mask = torch.tensor(b["attention_mask"].astype(np.int64))
        return ref(ids, mask, _normalize_torch(b["image"]),
                   strategy="MM_RCA")

    labels, preds = _torch_preds(fwd, m, (480, 480), tokenizer=tok)
    tname, want = _torch_report_csv(labels, preds, str(tmp_path / "torch_mm"),
                                    "MM_RCA", "both")
    assert name == tname
    assert got == want
