"""Hermetic CLI-level drives of the BLIP-2 / Q-Former test entry points.

The library paths (generate, constrained decode, converters) are
parity-tested elsewhere (test_blip2*.py); what this file pins is the CLI
branch wiring itself — blip_2_test_set.py:222-266 equivalent — on the
tiny hermetic geometry (GC_RCA_TINY_BLIP2=1, random init):

  * default path: 1-token constrained decode over the 4 answer words;
  * --max_new_tokens>1: KV-cache greedy generate + find_closest_string
    (the branch where round 3's left-pad gather bug lived);
  * qformer_test --classifier_weights .pth layout diagnostics
    (MultimodalClassifier state_dict required, q_former_training.py:33-47).
"""

import glob
import os

import numpy as np
import pytest
import torch

BPE_VOCAB = os.path.join(os.path.dirname(__file__), "fixtures", "vocab",
                         "bpe")


def _run(main, argv, tmp_path, monkeypatch, sub):
    d = tmp_path / sub
    d.mkdir(exist_ok=True)
    monkeypatch.chdir(d)
    acc = main(argv)
    monkeypatch.chdir(tmp_path)
    csvs = glob.glob(str(d / "test_set_reports" / "**" / "*.csv"),
                     recursive=True)
    assert len(csvs) == 1, csvs
    return acc, csvs[0]


@pytest.fixture(autouse=True)
def _tiny(monkeypatch):
    monkeypatch.setenv("GC_RCA_TINY_BLIP2", "1")


def test_blip2_cli_one_token_path(tiny_dataset, tmp_path, monkeypatch):
    from garbage_classification_rca_tpu.cli import blip2_test

    acc, csv = _run(
        blip2_test.main,
        [f"--dataset_folder_name={tiny_dataset}",
         f"--vocab_dir={BPE_VOCAB}", "--eval_batch_size=4"],
        tmp_path, monkeypatch, "one_token")
    assert 0.0 <= acc <= 100.0
    assert os.path.getsize(csv) > 0


def test_blip2_cli_generate_path(tiny_dataset, tmp_path, monkeypatch):
    """--max_new_tokens=3 takes the KV-cache generate branch end to end
    (decode -> find_closest_string -> report)."""
    from garbage_classification_rca_tpu.cli import blip2_test

    acc, csv = _run(
        blip2_test.main,
        [f"--dataset_folder_name={tiny_dataset}",
         f"--vocab_dir={BPE_VOCAB}", "--eval_batch_size=4",
         "--max_new_tokens=3"],
        tmp_path, monkeypatch, "generate")
    assert 0.0 <= acc <= 100.0
    assert os.path.getsize(csv) > 0


def test_blip2_cli_sampled_generate(tiny_dataset, tmp_path, monkeypatch):
    """--gen_temperature opts the generate branch into on-device
    sampling (ops/sampling.py); same seed -> same accuracy."""
    from garbage_classification_rca_tpu.cli import blip2_test

    flags = [f"--dataset_folder_name={tiny_dataset}",
             f"--vocab_dir={BPE_VOCAB}", "--eval_batch_size=4",
             "--max_new_tokens=3", "--gen_temperature=0.4",
             "--gen_top_p=0.9", "--gen_seed=3"]
    acc, csv = _run(blip2_test.main, flags, tmp_path, monkeypatch,
                    "sampled")
    acc2, _ = _run(blip2_test.main, flags, tmp_path, monkeypatch,
                   "sampled2")
    assert 0.0 <= acc <= 100.0
    assert acc == acc2
    assert os.path.getsize(csv) > 0


def test_blip2_cli_tp_mesh_same_report(tiny_dataset, tmp_path, monkeypatch):
    """--mesh_shape=data:1,model:2 Megatron-TP-shards the OPT tower
    (place_blip2_params) and must reproduce the replicated run's report
    byte-for-byte."""
    from garbage_classification_rca_tpu.cli import blip2_test

    flags = [f"--dataset_folder_name={tiny_dataset}",
             f"--vocab_dir={BPE_VOCAB}", "--eval_batch_size=4"]
    acc1, csv1 = _run(blip2_test.main, flags, tmp_path, monkeypatch, "rep")
    acc2, csv2 = _run(blip2_test.main,
                      flags + ["--mesh_shape=data:1,model:2"],
                      tmp_path, monkeypatch, "tp")
    assert acc1 == acc2
    with open(csv1) as a, open(csv2) as b:
        assert a.read() == b.read()


def test_blip2_cli_int8_kv_cache(tiny_dataset, tmp_path, monkeypatch):
    """--kv_cache_dtype=int8 runs the quantized serving cache through
    the full CLI (library parity is pinned in test_quant.py)."""
    from garbage_classification_rca_tpu.cli import blip2_test

    acc, csv = _run(
        blip2_test.main,
        [f"--dataset_folder_name={tiny_dataset}",
         f"--vocab_dir={BPE_VOCAB}", "--eval_batch_size=4",
         "--max_new_tokens=3", "--kv_cache_dtype=int8"],
        tmp_path, monkeypatch, "int8kv")
    assert 0.0 <= acc <= 100.0
    assert os.path.getsize(csv) > 0


def test_qformer_cli_rejects_bare_linear_pth(tiny_dataset, tmp_path,
                                             monkeypatch):
    """A .pth saved as Linear.state_dict() (keys weight/bias) is not the
    reference MultimodalClassifier layout -> readable SystemExit, not a
    KeyError."""
    from garbage_classification_rca_tpu.cli import qformer_test

    bad = tmp_path / "bare_linear.pth"
    torch.save(torch.nn.Linear(32, 4).state_dict(), bad)
    with pytest.raises(SystemExit, match="classifier.weight"):
        qformer_test.main(
            [f"--dataset_folder_name={tiny_dataset}",
             f"--vocab_dir={BPE_VOCAB}",
             f"--classifier_weights={bad}"])


def test_qformer_cli_rejects_wrong_width_pth(tiny_dataset, tmp_path,
                                             monkeypatch):
    """Right key layout but a head trained against a different Q-Former
    width -> readable SystemExit naming both shapes."""
    from garbage_classification_rca_tpu.cli import qformer_test

    class MultimodalClassifier(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.classifier = torch.nn.Linear(99, 4)

    bad = tmp_path / "wrong_width.pth"
    torch.save(MultimodalClassifier().state_dict(), bad)
    with pytest.raises(SystemExit, match="99"):
        qformer_test.main(
            [f"--dataset_folder_name={tiny_dataset}",
             f"--vocab_dir={BPE_VOCAB}",
             f"--classifier_weights={bad}"])


def test_qformer_cli_accepts_reference_layout_pth(tiny_dataset, tmp_path,
                                                  monkeypatch):
    """The reference two-file layout loads and evaluates end to end: a
    MultimodalClassifier .pth at the tiny Q-Former width."""
    from garbage_classification_rca_tpu.cli import qformer_test
    from garbage_classification_rca_tpu.cli.blip2_common import (
        tiny_blip2_config)

    hidden = tiny_blip2_config().qformer.hidden

    class MultimodalClassifier(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.classifier = torch.nn.Linear(hidden, 4)

    torch.manual_seed(0)
    ckpt = tmp_path / "Classifier_epoch_1_acc_0.5.pth"
    torch.save(MultimodalClassifier().state_dict(), ckpt)
    acc, csv = _run(
        qformer_test.main,
        [f"--dataset_folder_name={tiny_dataset}",
         f"--vocab_dir={BPE_VOCAB}", "--eval_batch_size=4",
         f"--classifier_weights={ckpt}"],
        tmp_path, monkeypatch, "qf_ref_layout")
    assert 0.0 <= acc <= 100.0
    assert os.path.getsize(csv) > 0


def test_qformer_cli_tp_mesh_same_report(tiny_dataset, tmp_path,
                                         monkeypatch):
    """The Q-Former path shares place_blip2_params / the accum-step
    shardings with blip2_test but routes through qformer_cls_feature —
    pin its TP run to the replicated report too."""
    from garbage_classification_rca_tpu.cli import qformer_test
    from garbage_classification_rca_tpu.cli.blip2_common import (
        tiny_blip2_config)

    hidden = tiny_blip2_config().qformer.hidden

    class MultimodalClassifier(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.classifier = torch.nn.Linear(hidden, 4)

    torch.manual_seed(0)
    ckpt = tmp_path / "Classifier_epoch_1_acc_0.5.pth"
    torch.save(MultimodalClassifier().state_dict(), ckpt)
    flags = [f"--dataset_folder_name={tiny_dataset}",
             f"--vocab_dir={BPE_VOCAB}", "--eval_batch_size=4",
             f"--classifier_weights={ckpt}"]
    acc1, csv1 = _run(qformer_test.main, flags, tmp_path, monkeypatch,
                      "qf_rep")
    acc2, csv2 = _run(qformer_test.main,
                      flags + ["--mesh_shape=data:1,model:2"],
                      tmp_path, monkeypatch, "qf_tp")
    assert acc1 == acc2
    with open(csv1) as a, open(csv2) as b:
        assert a.read() == b.read()


def test_blip2_cli_int8_weights(tiny_dataset, tmp_path, monkeypatch):
    """--int8_weights quantizes the OPT tower (ops/quant.py weight-only
    int8) through the full generate CLI, stacked with the int8 KV cache
    (numerics contract pinned in test_quant.py)."""
    from garbage_classification_rca_tpu.cli import blip2_test

    acc, csv = _run(
        blip2_test.main,
        [f"--dataset_folder_name={tiny_dataset}",
         f"--vocab_dir={BPE_VOCAB}", "--eval_batch_size=4",
         "--max_new_tokens=3", "--int8_weights",
         "--kv_cache_dtype=int8"],
        tmp_path, monkeypatch, "int8w")
    assert 0.0 <= acc <= 100.0
    assert os.path.getsize(csv) > 0
