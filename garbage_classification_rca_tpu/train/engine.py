"""Two-phase training engine (shared by the image/text/multimodal CLIs).

Reference shape (main_image.py:547-709, main_text.py, main_both.py):
phase 1 trains the replaced head on a frozen backbone for ``--epochs``;
phase 2 unfreezes everything at lr/``--fraction_lr`` for ``--ft_epochs``
with ReduceLROnPlateau(max, 0.2) stepped on val accuracy; best-val
checkpoints carry metadata-rich filenames.

TPU-native: one jitted grad-accum step per phase (microbatch stack +
lax.scan), batch sharded over the mesh, eval via the shared jitted eval
step; wandb is optional (JSONL metrics log always written — SURVEY §5
observability gap-fill).
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass
from datetime import datetime
from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RunConfig
from ..data.pipeline import ImageTextBatcher
from ..data.sampler import imbalanced_sample_order
from .loop import microbatch_sharding
from .optim import (PlateauScheduler, get_learning_rate, make_optimizer,
                    set_learning_rate)


class MetricsLogger:
    """JSONL metrics sink + optional wandb (reference main_image.py:600-609)."""

    def __init__(self, run_name: str, out_dir: str = "runs",
                 use_wandb: bool = False, config: Optional[dict] = None):
        from ..parallel.multihost import is_primary

        # multi-host: metrics are identical on every process (val acc is
        # psum'd, losses are replicated) — only process 0 writes/streams
        self._primary = is_primary()
        self.path = os.devnull
        if self._primary:
            os.makedirs(out_dir, exist_ok=True)
            ts = datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
            self.path = os.path.join(out_dir, f"{run_name}_{ts}.jsonl")
        self._wandb = None
        if use_wandb and self._primary:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=run_name, config=config or {})
            except Exception as e:  # wandb not installed / offline
                print(f"wandb unavailable ({e}); logging to {self.path} only")

    def log(self, metrics: Dict):
        with open(self.path, "a") as f:
            f.write(json.dumps(metrics) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics)

    def log_histograms(self, params, max_elems: int = 65536):
        """Per-leaf parameter histograms — the histogram half of the
        reference's ``wandb.watch(model)`` (main_image.py:397). Only runs
        when wandb is live (the device->host transfer of every param is
        exactly what wandb.watch costs there); scalar norm summaries go
        through ``log`` unconditionally. Leaves are subsampled to
        ``max_elems`` per tensor."""
        if self._wandb is None:
            return
        import jax

        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        hists = {}
        for path, leaf in flat:
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in path)
            a = np.asarray(jax.device_get(leaf)).ravel()
            if not np.issubdtype(a.dtype, np.floating):
                continue
            hists[f"parameters/{name}"] = self._wandb.Histogram(
                a[:max_elems].astype(np.float32))
        if hists:
            self._wandb.log(hists)


def stacked_batches(batcher: ImageTextBatcher, batch_size: int,
                    acc_steps: int, *, seed: int, order=None,
                    keys=("image", "input_ids", "attention_mask", "label",
                          "valid")) -> Iterable[Dict[str, np.ndarray]]:
    """Group the host stream into [acc, B, ...] stacks for the scan step."""
    acc = max(acc_steps, 1)
    buf: List[Dict] = []
    for b in batcher.iter_batches(batch_size, shuffle=order is None,
                                  seed=seed, order=order):
        buf.append({k: v for k, v in b.items() if k in keys})
        if len(buf) == acc:
            yield {k: np.stack([x[k] for x in buf]) for k in buf[0]}
            buf = []
    if buf:
        # pad the trailing stack by repeating the last microbatch with
        # valid=0 so gradients are exact
        pad = dict(buf[-1])
        pad["valid"] = np.zeros_like(pad["valid"])
        while len(buf) < acc:
            buf.append(pad)
        yield {k: np.stack([x[k] for x in buf]) for k in buf[0]}


def _checkpointer():
    """PyTreeCheckpointer whose write barriers involve only process 0.

    orbax saves are COLLECTIVE under multiprocess JAX (internal
    sync_global_devices) — but our multi-host story writes checkpoints
    from the primary alone (params are replicated, so process 0 holds
    everything). An unscoped save called only on process 0 deadlocks
    waiting for the others; MultiprocessingOptions(active_processes={0})
    scopes the barrier to the single writer."""
    import jax
    import orbax.checkpoint as ocp

    if jax.process_count() == 1:
        return ocp.PyTreeCheckpointer()
    return ocp.Checkpointer(
        ocp.PyTreeCheckpointHandler(),
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            active_processes={0}))


def save_best(params, state, *, model_name: str, epoch: int, val_acc: float,
              args: RunConfig, fine_tuning: bool, out_root: str = ".",
              keep_top_k: int = 0) -> str:
    """orbax checkpoint under a reference-style filename
    (main_image.py:185-209)."""
    base = os.path.join(out_root, "model_weights", model_name)
    os.makedirs(base, exist_ok=True)
    if fine_tuning:
        name = (f"BEST_model_{model_name}_FT_EPOCH_{epoch + 1}_LR_{args.lr}"
                f"_Reg_{args.reg}_Opt_{args.opt}_FractionLR_{args.fraction_lr}"
                f"_VAL_ACC_{val_acc:.5f}_")
    else:
        name = (f"BEST_model_{model_name}_epoch_{epoch + 1}_LR_{args.lr}"
                f"_Reg_{args.reg}_Opt_{args.opt}_VAL_ACC_{val_acc:.5f}_")
    name += datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    path = os.path.abspath(os.path.join(base, name))
    _checkpointer().save(path, {"params": jax.device_get(params),
                                "state": jax.device_get(state)})
    print(f"Saving weights to {path}")
    if keep_top_k:
        _prune_best(base, keep_top_k, protect=name)
    return path


def load_orbax(path: str):
    import orbax.checkpoint as ocp

    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    return restored["params"], restored["state"]


def check_loaded_tree(loaded_params, init_fn, flag_desc: str) -> None:
    """Readable error when an orbax checkpoint doesn't match the model the
    CLI flags select (e.g. --image_model=res18 pointed at a shuffle_net
    run dir) — otherwise the mismatch surfaces mid-forward as a raw
    KeyError. init_fn() must return (params, state); it runs under
    jax.eval_shape, so no arrays are materialized."""
    import jax

    expected, _ = jax.eval_shape(init_fn)
    want = {jax.tree_util.keystr(kp): tuple(leaf.shape) for kp, leaf in
            jax.tree_util.tree_flatten_with_path(expected)[0]}
    got = {jax.tree_util.keystr(kp): tuple(getattr(leaf, "shape", ()))
           for kp, leaf in
           jax.tree_util.tree_flatten_with_path(loaded_params)[0]}
    if want == got:
        return
    missing = sorted(set(want) - set(got))[:5]
    unexpected = sorted(set(got) - set(want))[:5]
    # same keys, different leaf shapes (e.g. a head trained with another
    # num_classes, or a config variant) — would otherwise fail mid-forward
    # as a raw XLA shape error (ADVICE r2)
    mismatched = sorted(f"{k}: checkpoint{got[k]} != model{want[k]}"
                        for k in set(want) & set(got)
                        if want[k] != got[k])[:5]
    raise SystemExit(
        f"checkpoint does not match {flag_desc}: "
        + (f"missing {missing}"
           f"{'...' if len(set(want) - set(got)) > 5 else ''} "
           if missing else "")
        + (f"unexpected {unexpected}"
           f"{'...' if len(set(got) - set(want)) > 5 else ''} "
           if unexpected else "")
        + (f"shape mismatch {mismatched} " if mismatched else "")
        + "— was this run dir trained with a different model flag?")


def _prune_best(base: str, keep_top_k: int, protect: str = "") -> None:
    """Top-k retention: keep only the k best BEST_* checkpoints per model
    dir (long runs otherwise accumulate a full param copy per best epoch).

    `protect` (the checkpoint just saved) is never deleted: the model dir
    is shared across runs, so a rerun whose accuracy trails an earlier
    run's top-k would otherwise have its fresh best removed right after
    saving, leaving best_path (recorded in RESUME meta) dangling."""
    import re
    import shutil

    if keep_top_k <= 0:
        return
    entries = []
    for name in os.listdir(base):
        m = re.search(r"VAL_ACC_([0-9.]+)_", name)
        if name.startswith("BEST_") and m and name != protect:
            entries.append((float(m.group(1)), name))
    entries.sort(reverse=True)
    keep = keep_top_k - (1 if protect else 0)
    for _, name in entries[max(keep, 0):]:
        shutil.rmtree(os.path.join(base, name), ignore_errors=True)


def save_train_state(*, out_root: str, model_name: str, params, state,
                     opt_state, rng, epoch: int, phase_name: str,
                     scheduler: Optional[PlateauScheduler],
                     best: "PhaseResult", step: int = 0,
                     losses=None, grad_norms=None,
                     param_norm=None) -> str:
    """FULL resumable training state (params + optimizer + plateau
    scheduler + epoch/phase + RNG key) — the reference has no mid-train
    resume at all (SURVEY §5 gap-fill); round 1's save_best stored only
    params/state, making 'resume' a lossy warm start (VERDICT item 9).

    One RESUME dir per model, overwritten each epoch.

    ``step > 0`` marks a MID-epoch checkpoint (--resume_every_steps,
    VERDICT r3 next #10): ``step`` optimizer windows of ``epoch`` are
    done, and the epoch-so-far loss/grad-norm streams ride along so the
    resumed epoch's logged metrics are identical too. step=0 (default)
    means the epoch completed — the pre-existing payload shape."""
    base = os.path.join(out_root, "model_weights", model_name)
    os.makedirs(base, exist_ok=True)
    path = os.path.abspath(os.path.join(base, "RESUME"))
    tmp = path + ".tmp"
    payload = {
        "params": jax.device_get(params),
        "state": jax.device_get(state),
        "opt_state": jax.device_get(opt_state),
        "rng": jax.device_get(rng),
        "meta": {
            "epoch": epoch, "phase_name": phase_name,
            "scheduler": (scheduler.state_dict() if scheduler else None),
            "best_val_acc": best.best_val_acc,
            "best_epoch": best.best_epoch,
            "best_path": best.best_path or "",
            "step": int(step),
        },
    }
    # mid-epoch extras only when present (orbax dislikes empty containers)
    if losses:
        payload["meta"]["losses"] = [float(l) for l in losses]
    if grad_norms:
        payload["meta"]["grad_norms"] = [float(g) for g in grad_norms]
    if param_norm is not None:
        payload["meta"]["param_norm"] = float(param_norm)
    import shutil

    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    _checkpointer().save(tmp, payload)
    # crash-safe swap: keep the previous RESUME until the new one is in
    # place (a kill between delete and rename must not lose all resume
    # state — the whole point of this checkpoint)
    prev = path + ".prev"
    if os.path.exists(prev):
        shutil.rmtree(prev)
    if os.path.exists(path):
        os.replace(path, prev)
    os.replace(tmp, path)
    if os.path.exists(prev):
        shutil.rmtree(prev)
    return path


def load_train_state(path: str) -> Dict:
    """Restore a save_train_state checkpoint (opt_state is returned as a
    raw pytree; pass it through ``restore_opt_state`` to rebuild the
    optax structure)."""
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))


def _check_resume_agreement(value: int, what: str) -> None:
    """Multi-host runs must agree on the resume point: RESUME is written
    by process 0 only, so on hosts without a shared filesystem the other
    processes would silently start at epoch 0 with a different shuffle
    plan (divergent global batches) and then hang when the resumed host
    finishes its fewer remaining epochs. Fail fast instead. MUST run
    before any one-sided orbax restore — restores are collective under
    multiprocess JAX, so a host loading while another skips dies with a
    cryptic gloo size-mismatch inside the load."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    every = np.asarray(multihost_utils.process_allgather(
        np.array([value], np.int32))).ravel()
    if not (every == every[0]).all():
        raise SystemExit(
            f"multi-host resume mismatch: per-process {what} = "
            f"{every.tolist()} — every host must see the same RESUME dir "
            "(put model_weights/ on a shared filesystem, or copy process "
            "0's RESUME to every host) or none.")


def maybe_load_resume(model_path: str) -> Optional[Dict]:
    """Full-resume payload when --model_path points at a RESUME dir
    (written by save_train_state); None otherwise. Falls back to the
    RESUME.prev kept during the crash-safe swap.

    Collective under multi-process JAX (every process passes the same
    flag value, so all of them reach the agreement checks together, and
    the orbax restore runs on all processes or none)."""
    if not model_path or \
            os.path.basename(os.path.normpath(model_path)) != "RESUME":
        return None
    prev = os.path.normpath(model_path) + ".prev"
    found = 2 if os.path.isdir(model_path) else (
        1 if os.path.isdir(prev) else 0)
    _check_resume_agreement(found, "RESUME-found state")
    if found == 0:
        return None
    if found == 1:
        print(f"RESUME missing but {prev} exists (interrupted checkpoint "
              "swap) — resuming from it")
    payload = load_train_state(model_path if found == 2 else prev)
    _check_resume_agreement(int(payload["meta"]["epoch"]), "RESUME epoch")
    _check_resume_agreement(int(payload["meta"].get("step", 0) or 0),
                            "RESUME step")
    return payload


class ResumePlan:
    """Shared two-phase resume plumbing for the train CLIs."""

    def __init__(self, resume: Optional[Dict]):
        self.resume = resume

    @property
    def skip_phase1(self) -> bool:
        return (self.resume is not None
                and self.resume["meta"]["phase_name"] == "fine_tune")

    def initial_best(self) -> "PhaseResult":
        m = self.resume["meta"]
        return PhaseResult(float(m["best_val_acc"]), int(m["best_epoch"]),
                           m["best_path"] or None)

    def for_phase(self, phase_name: str) -> Optional[Dict]:
        if self.resume is not None and \
                self.resume["meta"]["phase_name"] == phase_name:
            return self.resume
        return None

    def opt_state(self, phase_name: str, opt, params):
        """Restored opt state for a matching resume, else a fresh init
        (built lazily — a resumed run never pays for the discarded init)."""
        host = jax.device_get(params)
        r = self.for_phase(phase_name)
        if r is None:
            return opt.init(host)
        return restore_opt_state(opt, host, r["opt_state"])


def restore_opt_state(opt, params, raw):
    """Rebuild the optax opt-state STRUCTURE from the flat orbax pytree
    (orbax restores namedtuples as plain containers)."""
    template = opt.init(params)
    leaves = jax.tree_util.tree_leaves(raw)
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, [
        jnp.asarray(l) for l in leaves])


@dataclass
class PhaseResult:
    best_val_acc: float
    best_epoch: int
    best_path: Optional[str]


def run_phase(*, phase_name: str, epochs: int, params, state, opt, opt_state,
              train_step, eval_fn, batcher, batch_size: int, acc_steps: int,
              args: RunConfig, mesh, model_name: str, logger: MetricsLogger,
              scheduler: Optional[PlateauScheduler] = None,
              best: Optional[PhaseResult] = None, rng=None,
              balanced_sampler: bool = False, extra_evals=None,
              fine_tuning: bool = False,
              keys=("image", "input_ids", "attention_mask", "label", "valid"),
              out_root: str = ".", save_resume: bool = False,
              resume: Optional[Dict] = None, keep_top_k: int = 0):
    """One training phase; returns (params, state, opt_state, PhaseResult).

    save_resume writes a full RESUME checkpoint (opt_state + scheduler +
    epoch + RNG) after every epoch; pass its restored payload back as
    ``resume`` to continue a killed run bit-identically (the per-epoch RNG
    streams are derived from args.seed + epoch, so the data order and
    dropout draws replay exactly)."""
    best = best or PhaseResult(0.0, 0, None)
    rng = rng if rng is not None else jax.random.PRNGKey(args.seed)
    start_epoch = 0
    start_step = 0                 # optimizer windows already done in the
    resume_meta = None             # re-entered epoch (--resume_every_steps)
    if resume is not None and resume["meta"]["phase_name"] == phase_name:
        resume_meta = resume["meta"]
        start_step = int(resume_meta.get("step", 0) or 0)
        if start_step > 0:
            # mid-epoch checkpoint: re-enter the SAME epoch and skip the
            # completed windows of its deterministic stream
            start_epoch = int(resume_meta["epoch"])
        else:
            start_epoch = int(resume_meta["epoch"]) + 1
        rng = jnp.asarray(resume["rng"])
        best = PhaseResult(float(resume_meta["best_val_acc"]),
                           int(resume_meta["best_epoch"]),
                           resume_meta["best_path"] or None)
        if scheduler is not None and resume_meta["scheduler"]:
            scheduler.load_state_dict(resume_meta["scheduler"])
            opt_state = set_learning_rate(opt_state, scheduler.lr)
        print(f"[{phase_name}] resuming at epoch {start_epoch}"
              + (f" step {start_step}" if start_step else "")
              + f" (best={best.best_val_acc:.3f})")
    sb = microbatch_sharding(mesh) if mesh is not None else None
    n_batches = math.ceil(len(batcher.m) / batch_size)
    from ..parallel.multihost import is_primary, stacked_train_stream
    multiproc = mesh is not None and jax.process_count() > 1
    primary = is_primary()
    resume_every = max(int(args.resume_every_steps or 0), 0)

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        order = None
        if balanced_sampler:
            order = imbalanced_sample_order(batcher.m,
                                            seed=args.seed * 1000 + epoch)
        losses = []
        if multiproc:
            # each host decodes only its rows of the (deterministic)
            # global plan; the assembled global stacks are bit-identical
            # to the single-process stream — parallel/multihost.py
            host = stacked_train_stream(
                batcher, batch_size, acc_steps, mesh,
                seed=args.seed * 77 + epoch, order=order, keys=keys,
                prefetch_depth=args.prefetch_depth)
        else:
            host = stacked_batches(batcher, batch_size, acc_steps,
                                   seed=args.seed * 77 + epoch, order=order,
                                   keys=keys)
            if sb is not None:
                # lookahead device_put (--prefetch_depth): decode/stack the
                # next window(s) while the current train step runs
                from ..data.pipeline import device_prefetch
                host = device_prefetch(host, sharding=sb,
                                       depth=args.prefetch_depth)
        grad_norms = []
        param_norm = None
        skip = 0
        if epoch == start_epoch and start_step > 0:
            # mid-epoch resume: the stream is deterministic given
            # (seed, epoch, order), so discard the completed windows and
            # restore the epoch-so-far metric streams — the resumed
            # epoch's logged avg/max/min loss and grad norms match the
            # uninterrupted run exactly (bit-identity test in
            # tests/test_engine.py)
            skip = start_step
            # guard against a stale RESUME (or a changed --batch_size /
            # dataset): skipping >= the epoch's window count would make
            # islice exhaust silently and log the restored partial loss
            # list as the full epoch (ADVICE r4)
            # skip == n_windows is LEGITIMATE: the in-loop save fires at
            # the final window; resuming it skips the whole stream and
            # logs the complete restored loss list (bit-identity test)
            n_windows = math.ceil(n_batches / max(acc_steps, 1))
            if skip > n_windows:
                raise SystemExit(
                    f"RESUME step {skip} > {n_windows} optimizer windows "
                    f"in epoch {epoch} ({n_batches} batches / "
                    f"acc_steps={max(acc_steps, 1)}) — stale RESUME dir or "
                    "changed --batch_size/--gradient_acc_steps/dataset? "
                    "Delete the RESUME directory to start the epoch over.")
            losses = list(resume_meta.get("losses") or [])
            grad_norms = list(resume_meta.get("grad_norms") or [])
            param_norm = resume_meta.get("param_norm")
            import itertools
            host = itertools.islice(host, skip, None)
        for bi, batch in enumerate(host):
            rng, step_rng = jax.random.split(rng)
            out = train_step(params, state, opt_state, batch, step_rng)
            params, state, opt_state, loss = out[:4]
            if len(out) > 5:      # log_norms steps (wandb.watch parity)
                grad_norms.append(out[5]["grad_norm"])
                param_norm = out[5]["param_norm"]
            losses.append(loss)
            done = skip + bi + 1
            if resume_every and save_resume and primary \
                    and done % resume_every == 0:
                save_train_state(
                    out_root=out_root, model_name=model_name,
                    params=params, state=state, opt_state=opt_state,
                    rng=rng, epoch=epoch, phase_name=phase_name,
                    scheduler=scheduler, best=best, step=done,
                    losses=losses, grad_norms=grad_norms,
                    param_norm=param_norm)
            if primary:
                print(f"Batches {bi * max(acc_steps, 1)}/{n_batches} "
                      f"on epoch {epoch}", end="\r")
        losses = [float(l) for l in losses]
        train_time = time.time() - t0

        metrics = {"phase": phase_name, "epoch": epoch,
                   "epoch_time_seconds": train_time,
                   "avg_loss": float(np.mean(losses)) if losses else 0.0,
                   "max_loss": float(np.max(losses)) if losses else 0.0,
                   "min_loss": float(np.min(losses)) if losses else 0.0,
                   "lr": get_learning_rate(opt_state)}
        if grad_norms:
            # scalar summary of the reference's wandb.watch(model)
            # telemetry (main_image.py:397): per-epoch gradient-norm
            # stats + the global param norm after the last update
            gns = [float(g) for g in grad_norms]
            metrics["grad_norm_mean"] = float(np.mean(gns))
            metrics["grad_norm_last"] = gns[-1]
            metrics["param_global_norm"] = float(param_norm)
            logger.log_histograms(params)   # no-op unless wandb is live
        val_acc, val_report = eval_fn(params, state)
        metrics["val_acc"] = val_acc
        for cls, rep in (val_report or {}).items():
            if isinstance(rep, dict) and "precision" in rep:
                metrics[f"precision_{cls}"] = rep["precision"]
        if extra_evals:
            for name, fn in extra_evals.items():
                metrics[name] = fn(params, state)
        logger.log(metrics)
        if primary:
            print(f"\n[{phase_name}] epoch {epoch}: val_acc={val_acc:.3f} "
                  f"avg_loss={metrics['avg_loss']:.4f} "
                  f"({train_time:.1f}s, lr={metrics['lr']:.2e})")

        if val_acc > best.best_val_acc:
            # checkpoints are written by process 0 only (params are
            # replicated so device_get is complete there; timestamped
            # filenames would otherwise race on a shared filesystem)
            best = PhaseResult(val_acc, epoch, save_best(
                params, state, model_name=model_name, epoch=epoch,
                val_acc=val_acc, args=args, fine_tuning=fine_tuning,
                out_root=out_root, keep_top_k=keep_top_k)
                if primary else None)
        if scheduler is not None:
            new_lr = scheduler.step(val_acc)
            opt_state = set_learning_rate(opt_state, new_lr)
        if save_resume and primary:
            save_train_state(out_root=out_root, model_name=model_name,
                             params=params, state=state,
                             opt_state=opt_state, rng=rng, epoch=epoch,
                             phase_name=phase_name, scheduler=scheduler,
                             best=best)
    return params, state, opt_state, best
