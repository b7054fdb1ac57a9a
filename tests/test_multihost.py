"""Multi-host layer (parallel/multihost.py).

Quick tests pin the single-process identities (opt-in no-op, row
ownership, put_global == shard_batch, and the multiprocess eval driver
reproducing run_image_eval's exact output stream). The slow test is REAL
multi-process execution: two OS processes x 4 virtual CPU devices,
jax.distributed over localhost, gloo collectives — eval outputs and a
dp train-step update must match the single-process oracle computed in
the parent.
"""

import dataclasses
import os
import socket
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garbage_classification_rca_tpu.data.manifest import build_manifest
from garbage_classification_rca_tpu.data.pipeline import ImageTextBatcher
from garbage_classification_rca_tpu.eval.harness import (make_eval_step,
                                                         run_image_eval)
from garbage_classification_rca_tpu.models.image import vit
from garbage_classification_rca_tpu.parallel import multihost as mh
from garbage_classification_rca_tpu.parallel.mesh import (make_mesh,
                                                          shard_batch,
                                                          shard_params)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_vit():
    cfg = dataclasses.replace(vit.CONFIGS["transformer_B16"],
                              image_size=32, layers=1)
    params, state = vit.init(jax.random.PRNGKey(0), cfg, num_classes=4)

    def apply(p, s, x, *, train=False, rng=None):
        return vit.apply(p, s, x, cfg=cfg, train=train, rng=rng)

    return apply, params, state


def test_initialize_from_env_is_noop_without_opt_in(monkeypatch):
    monkeypatch.delenv("GC_RCA_MULTIHOST", raising=False)
    assert mh.initialize_from_env() == (0, 1)


def test_process_local_rows_single_process_owns_everything():
    mesh = make_mesh("data:-1")
    rows = mh.process_local_rows(mh.rows_sharding(mesh), 16)
    np.testing.assert_array_equal(rows, np.arange(16))


def test_put_global_equals_shard_batch_single_process():
    mesh = make_mesh("data:-1")
    rng = np.random.default_rng(0)
    tree = {"image": rng.integers(0, 255, (8, 6, 6, 3)).astype(np.uint8),
            "label": rng.integers(0, 4, (8,)).astype(np.int32)}
    got = mh.put_global(mh.rows_sharding(mesh), tree)
    want = shard_batch(mesh, tree)
    for k in tree:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]))
        assert got[k].sharding == want[k].sharding


def test_eval_driver_matches_single_process_stream(tiny_dataset):
    """run_eval_multiprocess with process_count==1 must reproduce
    run_image_eval's (acc, labels, preds) exactly — the chunked global
    batch stream is the single-process stream by construction."""
    apply, params, state = tiny_vit()
    mesh = make_mesh("data:-1")
    params = shard_params(mesh, params)
    state = shard_params(mesh, state)
    manifest = build_manifest(str(tiny_dataset))
    batcher = ImageTextBatcher(manifest, (32, 32), workers=2)
    try:
        want = run_image_eval(apply, params, state, batcher, 8, mesh,
                              jnp.float32, progress=False)
        step = make_eval_step(apply, mesh, jnp.float32)
        got = mh.run_eval_multiprocess(step, params, state, batcher, 8,
                                       mesh, progress=False)
    finally:
        batcher.close()
    assert got[0] == want[0]
    np.testing.assert_array_equal(got[1], want[1])
    np.testing.assert_array_equal(got[2], want[2])
    assert got[3]["n"] == want[3]["n"]


WORKER = textwrap.dedent("""
    import sys

    pid, nproc, port, out, data_root = (int(sys.argv[1]), int(sys.argv[2]),
                                        int(sys.argv[3]), sys.argv[4],
                                        sys.argv[5])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from garbage_classification_rca_tpu.data.manifest import build_manifest
    from garbage_classification_rca_tpu.data.pipeline import ImageTextBatcher
    from garbage_classification_rca_tpu.eval.harness import run_image_eval
    from garbage_classification_rca_tpu.models.image import vit
    from garbage_classification_rca_tpu.parallel import multihost as mh
    from garbage_classification_rca_tpu.parallel.mesh import (make_mesh,
                                                              shard_params)
    from garbage_classification_rca_tpu.train.loop import (
        make_train_step, microbatch_sharding)
    from garbage_classification_rca_tpu.train.optim import make_optimizer

    cfg = dataclasses.replace(vit.CONFIGS["transformer_B16"],
                              image_size=32, layers=1)
    params, state = vit.init(jax.random.PRNGKey(0), cfg, num_classes=4)

    def apply(p, s, x, *, train=False, rng=None):
        return vit.apply(p, s, x, cfg=cfg, train=train, rng=rng)

    mesh = make_mesh("data:-1")
    params = shard_params(mesh, params)
    state = shard_params(mesh, state)
    manifest = build_manifest(data_root)
    batcher = ImageTextBatcher(manifest, (32, 32), workers=2)
    # run_image_eval branches to the multiprocess driver itself
    acc, labels, preds, stats = run_image_eval(
        apply, params, state, batcher, 8, mesh, jnp.float32, progress=False)
    batcher.close()

    # one dp train step on a global [acc=2, B=8] microbatch stack; every
    # process generates the identical full batch, supplies only its rows
    opt = make_optimizer("sgd", lr=1e-3, reg=1e-2)
    p2, s2 = vit.init(jax.random.PRNGKey(1), cfg, num_classes=4)
    o2 = shard_params(mesh, opt.init(p2))
    p2 = shard_params(mesh, p2)
    s2 = shard_params(mesh, s2)
    step = make_train_step(apply, opt, compute_dtype=jnp.float32, mesh=mesh)
    rng0 = np.random.default_rng(7)
    full = {"image": rng0.integers(0, 255, (2, 8, 32, 32, 3)
                                   ).astype(np.uint8),
            "label": rng0.integers(0, 4, (2, 8)).astype(np.int32)}
    rows = mh.process_local_rows(mh.rows_sharding(mesh), 8)
    local = {k: v[:, rows] for k, v in full.items()}
    batch = mh.put_global(microbatch_sharding(mesh), local)
    p2, s2, o2, loss, _ = step(p2, s2, o2, batch, jax.random.PRNGKey(3))
    loss_f = float(loss)   # EVERY process blocks on the step's collectives
    # before any process may exit (an exiting peer kills in-flight gloo ops)

    # full engine phase: run_phase must route its input through
    # stacked_train_stream and gate checkpoint writes on process 0
    import glob
    import os
    import tempfile

    from garbage_classification_rca_tpu.config import RunConfig
    from garbage_classification_rca_tpu.eval.harness import run_image_eval as rie
    from garbage_classification_rca_tpu.train.engine import (MetricsLogger,
                                                             run_phase)
    from garbage_classification_rca_tpu.train.loop import all_trainable_mask

    args = RunConfig(seed=42, lr=1e-3, reg=1e-2, opt="sgd")
    p3, s3 = vit.init(jax.random.PRNGKey(2), cfg, num_classes=4)
    opt3 = make_optimizer("sgd", 1e-3, 1e-2, all_trainable_mask(p3))
    o3 = shard_params(mesh, opt3.init(p3))
    p3 = shard_params(mesh, p3)
    s3 = shard_params(mesh, s3)
    step3 = make_train_step(apply, opt3, compute_dtype=jnp.float32, mesh=mesh)
    vb = ImageTextBatcher(manifest, (32, 32), workers=2)

    def eval_fn(p, s):
        a, _, _, _ = rie(apply, p, s, vb, 8, mesh, jnp.float32,
                         progress=False)
        return a, None
    scratch = tempfile.mkdtemp(prefix=f"mh_phase_p{pid}_")
    logger = MetricsLogger("mh_test", out_dir=os.path.join(scratch, "runs"))
    p3, s3, o3, best = run_phase(
        phase_name="train", epochs=1, params=p3, state=s3, opt=opt3,
        opt_state=o3, train_step=step3, eval_fn=eval_fn, batcher=vb,
        batch_size=8, acc_steps=1, args=args, mesh=mesh,
        model_name="tiny_vit", logger=logger, keys=("image", "label",
                                                    "valid"),
        out_root=scratch)
    vb.close()
    n_ckpts = len(glob.glob(os.path.join(scratch, "model_weights",
                                         "tiny_vit", "BEST_*")))
    phase_head = np.concatenate([
        np.asarray(l, np.float32).ravel() for l in
        jax.tree_util.tree_leaves(jax.device_get(p3["head"]))])

    if jax.process_index() == 0:
        assert n_ckpts == 1, n_ckpts   # primary writes the best checkpoint
        head = jax.device_get(p2["head"])
        flat = np.concatenate([np.asarray(l, np.float32).ravel()
                               for l in jax.tree_util.tree_leaves(head)])
        np.savez(out, acc=acc, labels=labels, preds=preds,
                 loss=loss_f, head=flat,
                 phase_val_acc=best.best_val_acc, phase_head=phase_head)
    else:
        assert n_ckpts == 0, n_ckpts   # secondaries must not write
    jax.distributed.shutdown()   # rendezvous: no process exits early
""")


@pytest.mark.slow
def test_two_process_eval_and_train_match_single_process(tiny_dataset,
                                                         tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "mh_worker.py"
    script.write_text(WORKER)
    out = tmp_path / "result.npz"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # workers pick their own device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", str(port), str(out),
         str(tiny_dataset)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for pid in (0, 1)]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    got = np.load(out)

    # single-process oracle (this process's 8 virtual devices)
    apply, params, state = tiny_vit()
    mesh = make_mesh("data:-1")
    params = shard_params(mesh, params)
    state = shard_params(mesh, state)
    manifest = build_manifest(str(tiny_dataset))
    batcher = ImageTextBatcher(manifest, (32, 32), workers=2)
    try:
        acc, labels, preds, _ = run_image_eval(
            apply, params, state, batcher, 8, mesh, jnp.float32,
            progress=False)
    finally:
        batcher.close()
    assert float(got["acc"]) == acc
    np.testing.assert_array_equal(got["labels"], labels)
    np.testing.assert_array_equal(got["preds"], preds)

    from garbage_classification_rca_tpu.train.loop import (
        make_train_step, microbatch_sharding)
    from garbage_classification_rca_tpu.train.optim import make_optimizer

    opt = make_optimizer("sgd", lr=1e-3, reg=1e-2)
    cfg = dataclasses.replace(vit.CONFIGS["transformer_B16"],
                              image_size=32, layers=1)
    p2, s2 = vit.init(jax.random.PRNGKey(1), cfg, num_classes=4)
    o2 = shard_params(mesh, opt.init(p2))
    p2 = shard_params(mesh, p2)
    s2 = shard_params(mesh, s2)
    step = make_train_step(apply, opt, compute_dtype=jnp.float32, mesh=mesh)
    rng0 = np.random.default_rng(7)
    full = {"image": rng0.integers(0, 255, (2, 8, 32, 32, 3)
                                   ).astype(np.uint8),
            "label": rng0.integers(0, 4, (2, 8)).astype(np.int32)}
    batch = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, microbatch_sharding(mesh)), full)
    p2, s2, o2, loss, _ = step(p2, s2, o2, batch, jax.random.PRNGKey(3))
    head = jax.device_get(p2["head"])
    flat = np.concatenate([np.asarray(l, np.float32).ravel()
                           for l in jax.tree_util.tree_leaves(head)])
    np.testing.assert_allclose(float(got["loss"]), float(loss),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got["head"], flat, rtol=1e-4, atol=2e-5)

    # run_phase oracle (same seeds/keys as the WORKER's engine phase)
    from garbage_classification_rca_tpu.config import RunConfig
    from garbage_classification_rca_tpu.train.engine import (MetricsLogger,
                                                             run_phase)
    from garbage_classification_rca_tpu.train.loop import all_trainable_mask

    args = RunConfig(seed=42, lr=1e-3, reg=1e-2, opt="sgd")
    p3, s3 = vit.init(jax.random.PRNGKey(2), cfg, num_classes=4)
    opt3 = make_optimizer("sgd", 1e-3, 1e-2, all_trainable_mask(p3))
    o3 = shard_params(mesh, opt3.init(p3))
    p3 = shard_params(mesh, p3)
    s3 = shard_params(mesh, s3)
    step3 = make_train_step(apply, opt3, compute_dtype=jnp.float32, mesh=mesh)
    vb = ImageTextBatcher(manifest, (32, 32), workers=2)

    def eval_fn(p, s):
        a, _, _, _ = run_image_eval(apply, p, s, vb, 8, mesh, jnp.float32,
                                    progress=False)
        return a, None
    logger = MetricsLogger("mh_test", out_dir=str(tmp_path / "runs"))
    try:
        p3, s3, o3, best = run_phase(
            phase_name="train", epochs=1, params=p3, state=s3, opt=opt3,
            opt_state=o3, train_step=step3, eval_fn=eval_fn, batcher=vb,
            batch_size=8, acc_steps=1, args=args, mesh=mesh,
            model_name="tiny_vit", logger=logger,
            keys=("image", "label", "valid"), out_root=str(tmp_path))
    finally:
        vb.close()
    phase_head = np.concatenate([
        np.asarray(l, np.float32).ravel() for l in
        jax.tree_util.tree_leaves(jax.device_get(p3["head"]))])
    np.testing.assert_allclose(float(got["phase_val_acc"]),
                               best.best_val_acc, atol=1e-6)
    np.testing.assert_allclose(got["phase_head"], phase_head,
                               rtol=1e-4, atol=2e-5)


RESUME_WORKER = textwrap.dedent("""
    import os
    import sys

    pid, nproc, port, scratch = (int(sys.argv[1]), int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)

    from garbage_classification_rca_tpu.train.engine import (
        PhaseResult, maybe_load_resume, save_train_state)

    # PER-PROCESS scratch dirs simulate hosts without a shared
    # filesystem: only process 0 has a RESUME on disk
    mine = os.path.join(scratch, f"p{pid}")
    os.makedirs(mine, exist_ok=True)
    if pid == 0:
        import numpy as np
        save_train_state(out_root=mine, model_name="m",
                         params={"w": np.zeros(2, np.float32)}, state={},
                         opt_state={"o": np.zeros(2, np.float32)},
                         rng=jax.random.PRNGKey(0), epoch=3,
                         phase_name="train", scheduler=None,
                         best=PhaseResult(0.0, 0, None))
    code = 1
    try:
        maybe_load_resume(os.path.join(mine, "model_weights", "m",
                                       "RESUME"))
    except SystemExit as e:
        code = 0 if "resume mismatch" in str(e) else 2
    jax.distributed.shutdown()
    sys.exit(code)
""")


@pytest.mark.slow
def test_two_process_resume_mismatch_fails_fast(tmp_path):
    """Process 0 resumes at epoch 3, process 1 finds no RESUME (no shared
    filesystem): both must exit with the loud mismatch error instead of
    silently training on divergent shuffle plans and hanging."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "mh_resume_worker.py"
    script.write_text(RESUME_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", str(port),
         str(tmp_path)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for pid in (0, 1)]
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        assert p.returncode == 0, \
            f"worker did not fail fast:\n{stdout.decode(errors='replace')[-4000:]}"


def test_rows_sharding_tolerates_dataless_mesh():
    """A mesh without a 'data' axis replicates rows (every host supplies
    all of them) instead of crashing NamedSharding."""
    mesh = make_mesh("model:2")
    rows = mh.process_local_rows(mh.rows_sharding(mesh), 8)
    np.testing.assert_array_equal(rows, np.arange(8))


def test_fsdp_rejected_under_multihost(monkeypatch):
    from garbage_classification_rca_tpu.parallel.fsdp import param_placer

    mesh = make_mesh("data:-1")
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(SystemExit, match="fsdp"):
        param_placer(mesh, True)


def test_stacked_train_stream_matches_single_process(tiny_dataset):
    """stacked_train_stream at process_count==1 must assemble the exact
    [acc, B] stacks engine.stacked_batches + device_put produces — same
    shuffle, same tail padding, same trailing-stack repeat."""
    from garbage_classification_rca_tpu.train.engine import stacked_batches
    from garbage_classification_rca_tpu.train.loop import microbatch_sharding

    # batch 4 on a data:4 mesh: 12 samples -> 3 microbatches -> the second
    # [acc=2] stack exercises the trailing repeat-with-valid=0 padding
    mesh = make_mesh("data:4")
    manifest = build_manifest(str(tiny_dataset))
    batcher = ImageTextBatcher(manifest, (32, 32), workers=2)
    try:
        keys = ("image", "label", "valid")
        want = list(stacked_batches(batcher, 4, 2, seed=123, keys=keys))
        got = list(mh.stacked_train_stream(batcher, 4, 2, mesh, seed=123,
                                           keys=keys))
    finally:
        batcher.close()
    assert len(got) == len(want)
    sb = microbatch_sharding(mesh)
    for g, w in zip(got, want):
        assert set(g) == set(w)
        for k in w:
            np.testing.assert_array_equal(np.asarray(g[k]), w[k])
            assert g[k].sharding == sb


# ---------------------------------------------------------------------------
# VLM (BLIP-2 / Q-Former) multi-host wiring — cli/blip2_common.py
# ---------------------------------------------------------------------------

BPE_VOCAB = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "fixtures", "vocab", "bpe")


def _tiny_blip2(mesh, compute_dtype):
    from garbage_classification_rca_tpu.cli.blip2_common import (
        place_blip2_params, tiny_blip2_config)
    from garbage_classification_rca_tpu.models.vlm import blip2

    cfg = tiny_blip2_config()
    params = blip2.init(jax.random.PRNGKey(0), cfg, dtype=compute_dtype)
    lora = blip2.init_lora(jax.random.PRNGKey(1), cfg)
    return cfg, place_blip2_params(mesh, params), shard_params(mesh, lora)


@pytest.mark.slow
def test_vlm_eval_multiprocess_single_process_identity(tiny_dataset):
    """vlm_eval_multiprocess at process_count==1 must reproduce the
    blip2_test single-process loop's (acc, labels, preds) exactly."""
    from garbage_classification_rca_tpu.cli.blip2_common import (
        Blip2Batcher, vlm_eval_multiprocess)
    from garbage_classification_rca_tpu.cli.blip2_train import (
        answer_first_token_table, make_eval_step)
    from garbage_classification_rca_tpu.data.tokenizer import get_tokenizer

    mesh = make_mesh("data:-1")
    cfg, params, lora = _tiny_blip2(mesh, jnp.float32)
    manifest = build_manifest(str(tiny_dataset))
    b = Blip2Batcher(manifest, get_tokenizer("opt", vocab_dir=BPE_VOCAB),
                     workers=2)
    try:
        step = make_eval_step(cfg, params, answer_first_token_table(
            b, manifest.classes), mesh=mesh, compute_dtype=jnp.float32)
        correct, all_p, all_l = 0, [], []
        for batch in b.iter_batches(8):
            preds, c = step(lora, batch)
            correct += int(c)
            valid = np.asarray(batch["valid"]).astype(bool)
            all_p.append(np.asarray(preds)[valid])
            all_l.append(np.asarray(batch["label"])[valid])
        want_acc = 100.0 * correct / len(manifest)
        got = vlm_eval_multiprocess(step, lora, b, 8, mesh)
    finally:
        b.close()
    assert got[0] == want_acc
    np.testing.assert_array_equal(got[1], np.concatenate(all_l))
    np.testing.assert_array_equal(got[2], np.concatenate(all_p))


VLM_WORKER = textwrap.dedent("""
    import sys

    pid, nproc, port, out, data_root, vocab = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5], sys.argv[6])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)

    import jax.numpy as jnp
    import numpy as np

    from garbage_classification_rca_tpu.cli.blip2_common import (
        Blip2Batcher, place_blip2_params, tiny_blip2_config,
        vlm_eval_multiprocess, vlm_train_stream)
    from garbage_classification_rca_tpu.cli.blip2_train import (
        answer_first_token_table, make_eval_step, make_lora_train_step)
    from garbage_classification_rca_tpu.data.manifest import build_manifest
    from garbage_classification_rca_tpu.data.tokenizer import get_tokenizer
    from garbage_classification_rca_tpu.models.vlm import blip2
    from garbage_classification_rca_tpu.parallel.mesh import (make_mesh,
                                                              shard_params)

    cfg = tiny_blip2_config()
    params = blip2.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lora = blip2.init_lora(jax.random.PRNGKey(1), cfg)
    mesh = make_mesh("data:-1")
    params = place_blip2_params(mesh, params)
    lora_r = shard_params(mesh, lora)
    manifest = build_manifest(data_root)
    b = Blip2Batcher(manifest, get_tokenizer("opt", vocab_dir=vocab),
                     workers=2)
    aft = answer_first_token_table(b, manifest.classes)
    step = make_eval_step(cfg, params, aft, mesh=mesh,
                          compute_dtype=jnp.float32)
    acc, labels, preds, _ = vlm_eval_multiprocess(step, lora_r, b, 8, mesh)

    # one epoch of accum windows: 12 samples / micro 8 -> 2 microbatches,
    # acc_steps=4 -> ONE padded window (the valid=0 padding microbatches
    # must contribute exactly zero gradient)
    opt, tstep = make_lora_train_step(cfg, params, acc_steps=4, mesh=mesh,
                                      compute_dtype=jnp.float32)
    opt_state = shard_params(mesh, opt.init(jax.device_get(lora_r)))
    l2 = lora_r
    losses = []
    for stacked in vlm_train_stream(b, 8, 4, mesh, seed=5):
        l2, opt_state, loss = tstep(l2, opt_state, stacked, None)
        losses.append(float(loss))
    b.close()
    flat = np.concatenate([np.asarray(l, np.float32).ravel() for l in
                           jax.tree_util.tree_leaves(jax.device_get(l2))])
    if pid == 0:
        np.savez(out, acc=acc, labels=labels, preds=preds, lora=flat,
                 n_windows=len(losses))
    jax.distributed.shutdown()
""")


@pytest.mark.slow
def test_two_process_vlm_eval_and_train_match_single_process(tiny_dataset,
                                                             tmp_path):
    """The lifted BLIP-2/Q-Former multi-host guard, proven: 2 OS processes
    x 4 CPU devices run the 1-token eval and a padded accum window through
    the VLM wiring; acc/label/pred streams and the trained adapters match
    the single-process oracle."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "mh_vlm_worker.py"
    script.write_text(VLM_WORKER)
    out = tmp_path / "vlm_result.npz"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", str(port), str(out),
         str(tiny_dataset), BPE_VOCAB],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for pid in (0, 1)]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"vlm worker failed:\n{log[-4000:]}"
    got = np.load(out)

    # single-process oracle on this process's 8 virtual devices
    from garbage_classification_rca_tpu.cli.blip2_common import (
        Blip2Batcher, vlm_train_stream)
    from garbage_classification_rca_tpu.cli.blip2_train import (
        answer_first_token_table, make_eval_step, make_lora_train_step)
    from garbage_classification_rca_tpu.data.tokenizer import get_tokenizer
    from garbage_classification_rca_tpu.models.vlm import blip2

    mesh = make_mesh("data:-1")
    cfg, params, lora = _tiny_blip2(mesh, jnp.float32)
    manifest = build_manifest(str(tiny_dataset))
    b = Blip2Batcher(manifest, get_tokenizer("opt", vocab_dir=BPE_VOCAB),
                     workers=2)
    try:
        step = make_eval_step(cfg, params, answer_first_token_table(
            b, manifest.classes), mesh=mesh, compute_dtype=jnp.float32)
        correct, all_p, all_l = 0, [], []
        for batch in b.iter_batches(8):
            preds, c = step(lora, batch)
            correct += int(c)
            valid = np.asarray(batch["valid"]).astype(bool)
            all_p.append(np.asarray(preds)[valid])
            all_l.append(np.asarray(batch["label"])[valid])
        acc = 100.0 * correct / len(manifest)
        assert float(got["acc"]) == acc
        np.testing.assert_array_equal(got["labels"], np.concatenate(all_l))
        np.testing.assert_array_equal(got["preds"], np.concatenate(all_p))

        # train oracle: the single-process stream yields a trailing
        # PARTIAL window where the worker's was padded — gradients (and so
        # the updated adapters) must agree anyway
        opt, tstep = make_lora_train_step(cfg, params, acc_steps=4,
                                          mesh=mesh,
                                          compute_dtype=jnp.float32)
        opt_state = shard_params(mesh, opt.init(jax.device_get(lora)))
        l2 = lora
        n = 0
        for stacked in vlm_train_stream(b, 8, 4, mesh, seed=5):
            l2, opt_state, _ = tstep(l2, opt_state, stacked, None)
            n += 1
    finally:
        b.close()
    assert int(got["n_windows"]) == n == 1
    flat = np.concatenate([np.asarray(l, np.float32).ravel() for l in
                           jax.tree_util.tree_leaves(jax.device_get(l2))])
    np.testing.assert_allclose(got["lora"], flat, rtol=1e-4, atol=2e-5)
