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


def test_blip2_cli_pipe_mesh_same_report(tiny_dataset, tmp_path,
                                         monkeypatch):
    """--mesh_shape=data:2,pipe:2 evals through the GPipe-stage-sharded
    decoder on BOTH eval paths (1-token constrained decode and
    --max_new_tokens>1 via pp_generate with stage-stacked adapters) and
    must reproduce the dp run's report byte-for-byte."""
    from garbage_classification_rca_tpu.cli import blip2_test

    flags = [f"--dataset_folder_name={tiny_dataset}",
             f"--vocab_dir={BPE_VOCAB}", "--eval_batch_size=4"]
    for name, extra in (("1tok", []), ("gen", ["--max_new_tokens=3"])):
        acc1, csv1 = _run(blip2_test.main, flags + extra, tmp_path,
                          monkeypatch, f"pp_dp_{name}")
        acc2, csv2 = _run(blip2_test.main,
                          flags + extra + ["--mesh_shape=data:2,pipe:2"],
                          tmp_path, monkeypatch, f"pp_pipe_{name}")
        assert acc1 == acc2, name
        with open(csv1) as a, open(csv2) as b:
            assert a.read() == b.read(), name


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


def _train_tree(tiny_dataset, tmp_path):
    base = tmp_path / "ds"
    os.symlink(tiny_dataset, f"{base}_Train")
    os.symlink(tiny_dataset, f"{base}_Val")
    return str(base)


def _assert_resume_bit_identical(main, model_name, base_flags, tmp_path,
                                 monkeypatch):
    """epochs=2 straight vs epochs=1 + --resume_from continuation: the
    RESUME payloads (trainable params + meta) must match bit-for-bit."""
    import jax

    from garbage_classification_rca_tpu.train.engine import load_train_state

    def run(sub, flags):
        d = tmp_path / sub
        d.mkdir(exist_ok=True)
        monkeypatch.chdir(d)
        main(flags)
        monkeypatch.chdir(tmp_path)
        return d / "model_weights" / model_name / "RESUME"

    straight = load_train_state(run("straight", base_flags + ["--epochs=2"]))
    run("resumed", base_flags + ["--epochs=1"])
    resume_dir = tmp_path / "resumed" / "model_weights" / model_name / "RESUME"
    resumed = load_train_state(run(
        "resumed", base_flags + ["--epochs=2",
                                 f"--resume_from={resume_dir}"]))
    assert straight["meta"]["epoch"] == resumed["meta"]["epoch"] == 1
    a = jax.tree_util.tree_leaves(straight["params"])
    b = jax.tree_util.tree_leaves(resumed["params"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert (straight["meta"]["best_val_acc"]
            == resumed["meta"]["best_val_acc"])


def test_blip2_train_pp_matches_dp(tiny_dataset, tmp_path, monkeypatch):
    """--mesh_shape=data:2,pipe:2 GPipe-trains the adapters over a
    stage-sharded decoder: per-epoch losses and val accuracy must equal
    the dp run (GPipe accumulation is exact), and the BEST checkpoint
    must be the portable per-layer form the dp/tp eval CLIs load."""
    import json

    from garbage_classification_rca_tpu.cli import blip2_train
    from garbage_classification_rca_tpu.train.engine import load_orbax

    tree = _train_tree(tiny_dataset, tmp_path)
    flags = [f"--dataset_folder_name={tree}", f"--vocab_dir={BPE_VOCAB}",
             "--batch_size=4", "--epochs=2"]

    def run(sub, extra):
        d = tmp_path / sub
        d.mkdir(exist_ok=True)
        monkeypatch.chdir(d)
        best = blip2_train.main(flags + extra)
        monkeypatch.chdir(tmp_path)
        losses = [json.loads(l)["avg_loss"]
                  for p in glob.glob(str(d / "runs" / "*.jsonl"))
                  for l in open(p) if "avg_loss" in l]
        return best, losses, d

    b_dp, l_dp, _ = run("dp_run", [])
    b_pp, l_pp, d_pp = run("pp_run", ["--mesh_shape=data:2,pipe:2"])
    # a data-less mesh must work too (batch replicated, decoder pipelined)
    b_po, l_po, _ = run("pipe_only_run", ["--mesh_shape=pipe:2"])

    assert b_dp.best_val_acc == b_pp.best_val_acc == b_po.best_val_acc
    assert len(l_dp) == len(l_pp) == len(l_po) == 2
    np.testing.assert_allclose(l_pp, l_dp, rtol=1e-4,
                               err_msg="pp losses != dp losses")
    np.testing.assert_allclose(l_po, l_dp, rtol=1e-4,
                               err_msg="pipe-only losses != dp losses")
    # BEST adapters: per-layer string-keyed dict, loadable like any
    # dp-trained checkpoint (blip2_test --model_path path)
    best_dirs = glob.glob(str(d_pp / "model_weights" / "blip2_lora" /
                              "BEST_*"))
    assert best_dirs
    restored, _ = load_orbax(best_dirs[0])
    assert set(restored["lora"].keys()) == {"0", "1"}
    assert set(restored["lora"]["0"].keys()) == {"q", "k"}


def test_vlm_train_hf_internal_dropout_reaches_loss(tiny_dataset, tmp_path,
                                                    monkeypatch):
    """--hf_internal_dropout on the VLM trainers: runs end-to-end and the
    per-epoch loss DIFFERS from the deterministic default at the same
    seed (the stochastic internals really reach the loss); the flag-off
    run is unchanged (same CLI, same loss twice)."""
    import json

    from garbage_classification_rca_tpu.cli import blip2_train, qformer_train

    tree = _train_tree(tiny_dataset, tmp_path)

    def run(main, sub, extra):
        d = tmp_path / sub
        d.mkdir(exist_ok=True)
        monkeypatch.chdir(d)
        main([f"--dataset_folder_name={tree}", f"--vocab_dir={BPE_VOCAB}",
              "--batch_size=4", "--epochs=1"] + extra)
        monkeypatch.chdir(tmp_path)
        losses = [json.loads(l)["avg_loss"]
                  for p in glob.glob(str(d / "runs" / "*.jsonl"))
                  for l in open(p) if "avg_loss" in l]
        assert len(losses) == 1 and np.isfinite(losses[0])
        return losses[0]

    for main, name in ((blip2_train.main, "blip2"),
                       (qformer_train.main, "qf")):
        off1 = run(main, f"{name}_off1", [])
        off2 = run(main, f"{name}_off2", [])
        on = run(main, f"{name}_on", ["--hf_internal_dropout"])
        assert off1 == off2, name                   # determinism baseline
        assert on != off1, (name, on, off1)         # flag reaches the loss


def test_blip2_train_step_level_resume_bit_identical(tiny_dataset, tmp_path,
                                                     monkeypatch):
    """--resume_every_steps on the VLM trainer: kill MID-epoch after k
    optimizer windows + --resume_from == the uninterrupted run exactly
    (adapters, opt state, rng stream, logged epoch losses). 12 samples /
    bs1 / acc8 -> 2 windows per epoch."""
    import json

    import jax

    from garbage_classification_rca_tpu.cli import blip2_train
    from garbage_classification_rca_tpu.train.engine import load_train_state

    tree = _train_tree(tiny_dataset, tmp_path)
    flags = [f"--dataset_folder_name={tree}", f"--vocab_dir={BPE_VOCAB}",
             "--batch_size=1", "--epochs=2", "--resume_every_steps=1"]

    calls = {"n": 0, "die_at": None}
    orig_make = blip2_train.make_lora_train_step

    def make_wrapped(*a, **kw):
        opt, step = orig_make(*a, **kw)

        def wrapped(lora, opt_state, batch, rng):
            calls["n"] += 1
            if calls["die_at"] is not None and calls["n"] == calls["die_at"]:
                raise KeyboardInterrupt
            return step(lora, opt_state, batch, rng)

        wrapped.raw = step.raw
        return opt, wrapped

    monkeypatch.setattr(blip2_train, "make_lora_train_step", make_wrapped)

    def run(sub, extra, expect_die=False):
        d = tmp_path / sub
        d.mkdir(exist_ok=True)
        monkeypatch.chdir(d)
        if expect_die:
            with pytest.raises(KeyboardInterrupt):
                blip2_train.main(flags + extra)
        else:
            blip2_train.main(flags + extra)
        monkeypatch.chdir(tmp_path)
        return d

    d_straight = run("straight", [])
    n_total = calls["n"]
    assert n_total == 4, n_total          # 2 windows x 2 epochs

    calls["n"], calls["die_at"] = 0, 4    # die on epoch 1's 2nd window
    d_killed = run("killed", [], expect_die=True)
    resume_dir = d_killed / "model_weights" / "blip2_lora" / "RESUME"
    payload = load_train_state(str(resume_dir))
    assert payload["meta"]["epoch"] == 1
    assert payload["meta"]["step"] == 1
    assert len(payload["meta"]["losses"]) == 1

    calls["n"], calls["die_at"] = 0, None
    run("killed", [f"--resume_from={resume_dir}"])
    assert calls["n"] == 1                # only the remaining window ran

    ps = load_train_state(str(d_straight / "model_weights" / "blip2_lora"
                              / "RESUME"))
    pr = load_train_state(str(resume_dir))
    assert pr["meta"]["epoch"] == 1 and pr["meta"]["step"] == 0
    a = jax.tree_util.tree_leaves(ps["params"])
    b = jax.tree_util.tree_leaves(pr["params"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def epoch_rows(d):
        rows = [json.loads(l)
                for p in glob.glob(str(d / "runs" / "*.jsonl"))
                for l in open(p) if l.strip()]
        return {r["epoch"]: r["avg_loss"] for r in rows if "avg_loss" in r}

    rs, rk = epoch_rows(d_straight), epoch_rows(d_killed)
    assert rs[1] == pytest.approx(rk[1], rel=1e-6)


def test_blip2_train_full_resume_bit_identical(tiny_dataset, tmp_path,
                                               monkeypatch):
    """Interrupt-after-epoch-0 + --resume_from == uninterrupted 2-epoch
    run, including the LoRA-dropout RNG stream (saved/restored key)."""
    from garbage_classification_rca_tpu.cli import blip2_train

    tree = _train_tree(tiny_dataset, tmp_path)
    _assert_resume_bit_identical(
        blip2_train.main, "blip2_lora",
        [f"--dataset_folder_name={tree}", f"--vocab_dir={BPE_VOCAB}",
         "--batch_size=4"],
        tmp_path, monkeypatch)


def test_blip2_train_pp_full_resume_bit_identical(tiny_dataset, tmp_path,
                                                  monkeypatch):
    """Resume under GPipe: the stage-stacked RESUME payload (adapters +
    AdamW state re-placed on the pipe shardings) continues bit-identically,
    like the dp path."""
    from garbage_classification_rca_tpu.cli import blip2_train

    tree = _train_tree(tiny_dataset, tmp_path)
    _assert_resume_bit_identical(
        blip2_train.main, "blip2_lora",
        [f"--dataset_folder_name={tree}", f"--vocab_dir={BPE_VOCAB}",
         "--batch_size=4", "--mesh_shape=data:2,pipe:2"],
        tmp_path, monkeypatch)


def test_blip2_train_resume_mesh_mismatch_guarded(tiny_dataset, tmp_path,
                                                  monkeypatch):
    """A RESUME payload saved under one mesh must be rejected loudly on
    the other: dp-resume of a pipe payload would otherwise silently train
    with NO adapters (per-layer .get lookups all miss on the
    stage-stacked tree), and vice versa."""
    from garbage_classification_rca_tpu.cli import blip2_train

    tree = _train_tree(tiny_dataset, tmp_path)
    flags = [f"--dataset_folder_name={tree}", f"--vocab_dir={BPE_VOCAB}",
             "--batch_size=4", "--epochs=1"]
    monkeypatch.chdir(tmp_path)
    blip2_train.main(flags + ["--mesh_shape=data:2,pipe:2"])
    resume = ["--resume_from=model_weights/blip2_lora/RESUME",
              "--epochs=2"]
    with pytest.raises(SystemExit, match="stage-stacked"):
        blip2_train.main(flags + resume)           # pipe payload, dp mesh
    d2 = tmp_path / "dp2"
    d2.mkdir()
    monkeypatch.chdir(d2)
    blip2_train.main(flags)
    with pytest.raises(SystemExit, match="per-layer"):
        blip2_train.main(flags + resume +
                         ["--mesh_shape=data:2,pipe:2"])  # dp payload, pp


def test_qformer_train_full_resume_bit_identical(tiny_dataset, tmp_path,
                                                 monkeypatch):
    from garbage_classification_rca_tpu.cli import qformer_train

    tree = _train_tree(tiny_dataset, tmp_path)
    _assert_resume_bit_identical(
        qformer_train.main, "qformer_classifier",
        [f"--dataset_folder_name={tree}", f"--vocab_dir={BPE_VOCAB}",
         "--batch_size=4"],
        tmp_path, monkeypatch)


def test_orbax_restored_lora_is_applied(tmp_path, monkeypatch):
    """REGRESSION (round-3 resume drift): orbax stringifies dict keys on
    restore, and the int-layer-keyed LoRA tree then failed every
    opt-layer lookup — the train/eval steps silently compiled WITHOUT
    _apply_lora (hash-identical inputs, 6e-4 trajectory drift; the
    blip2_test --model_path=<best dir> eval path had the same hole).
    Layer keys are now canonically strings; a restored tree must produce
    the exact logits of the live one, and both must differ from no-LoRA."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from garbage_classification_rca_tpu.cli.blip2_common import (
        tiny_blip2_config)
    from garbage_classification_rca_tpu.config import args_parser
    from garbage_classification_rca_tpu.models.vlm import blip2
    from garbage_classification_rca_tpu.train.engine import (load_orbax,
                                                             save_best)

    cfg = tiny_blip2_config()
    params = blip2.init(jax.random.PRNGKey(0), cfg)
    lora = blip2.init_lora(jax.random.PRNGKey(1), cfg)
    # init_lora's B==0 makes adapters a no-op; randomize so they bite
    lora = jax.tree_util.tree_map(
        lambda a: jax.random.normal(jax.random.PRNGKey(2), a.shape,
                                    a.dtype) * 0.1, lora)
    rng = np.random.default_rng(3)
    pix = jnp.asarray(rng.standard_normal(
        (2, cfg.vision.image_size, cfg.vision.image_size, 3)),
        jnp.float32)
    ids = jnp.asarray(rng.integers(5, 100, (2, 6)), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)

    def logits(lo):
        return np.asarray(blip2.next_token_logits(params, pix, ids, mask,
                                                  cfg, lo))

    live = logits(lora)
    assert not np.allclose(live, logits(None)), "adapters must bite"

    monkeypatch.chdir(tmp_path)
    args = args_parser([])
    path = save_best({"lora": lora}, {}, model_name="blip2_lora", epoch=0,
                     val_acc=50.0, args=args, fine_tuning=False)
    restored, _ = load_orbax(path)
    np.testing.assert_array_equal(logits(restored["lora"]), live)


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
