"""Multi-host (multi-process) scaling: the DCN level of the 2-level mesh.

The reference is strictly single-process — its only parallelism is
``nn.DataParallel`` inside one Python process (main_image.py:404-406);
nothing in it can span hosts. This module is beyond-reference capability
completing the mesh story in ``parallel/mesh.py`` ("2-level (ICI x DCN)
ready"): on a multi-host slice (v5e-16 = 2 hosts x 8 chips, or any
v4/v5p pod slice) every host runs the SAME program,
``jax.distributed.initialize()`` connects them, ``jax.devices()``
becomes the GLOBAL device list, and the meshes built by
``mesh.make_mesh`` span hosts transparently — jit'd collectives ride ICI
within a slice and DCN across slices exactly as GSPMD lays them out.

Only the INPUT and REPORT sides are per-host, and both are handled here:

  * ``initialize_from_env()``  — connect the processes (no-op when not
    opted in), returns (process_index, process_count).
  * ``process_local_rows()``   — which rows of a globally data-sharded
    batch THIS host must supply (from the sharding's device->index map,
    so it is correct for any mesh axis layout, not just data-only).
  * ``put_global()``           — assemble the global jax.Array from the
    host-local numpy rows (``jax.make_array_from_process_local_data``).
  * ``run_eval_multiprocess()``— the eval loop over a sharded dataset:
    each host decodes ONLY its rows of each global batch, steps the
    jitted eval fn, and allgathers predictions, reproducing the
    single-process iteration order EXACTLY — accuracy, label stream and
    prediction stream (and therefore the report CSV) are identical to a
    one-host run of the same global batch size.

Training: ``stacked_train_stream`` is the train-side twin (used by
train/engine.run_phase when process_count > 1) — each host decodes only
its rows of the deterministic global batch plan, so the global [acc, B]
stacks are bit-identical to the single-process stream. Checkpoint /
metrics / report writes happen on process 0 only (every host must hold
the same dataset copy; params must be replicated for saving — FSDP
param sharding over a multi-process axis would need a collective gather
before save and is not supported multi-host yet).

Hermetic testing: this is real multi-PROCESS execution, not a mock —
XLA:CPU supports cross-process collectives (gloo), so
tests/test_multihost.py launches two OS processes with 4 virtual CPU
devices each and asserts eval outputs and train-step updates match the
single-process oracle. Real multi-HOST hardware (where DCN replaces
localhost gRPC) is not available in this environment; the code paths are
identical by JAX's design (the runtime hides the transport).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np


def initialize_from_env() -> Tuple[int, int]:
    """Connect this process to the other hosts when configured; return
    (process_index, process_count).

    Opt-in via GC_RCA_MULTIHOST=1 with either the standard JAX cluster
    auto-detection environment or explicit GC_RCA_COORDINATOR /
    GC_RCA_PROCESS_ID / GC_RCA_NUM_PROCESSES. Calling it single-process
    is free: without the opt-in it touches nothing and reports (0, 1),
    so the CLI package calls it unconditionally before first backend use
    (jax.distributed.initialize must precede backend init).
    """
    import jax

    if os.environ.get("GC_RCA_MULTIHOST", "") not in ("1", "true"):
        return 0, 1
    kwargs = {}
    if os.environ.get("GC_RCA_COORDINATOR"):
        kwargs["coordinator_address"] = os.environ["GC_RCA_COORDINATOR"]
    if os.environ.get("GC_RCA_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["GC_RCA_NUM_PROCESSES"])
    if os.environ.get("GC_RCA_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["GC_RCA_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)  # cluster env fills the gaps
    return jax.process_index(), jax.process_count()


def process_local_rows(sharding, n_rows: int) -> np.ndarray:
    """Global row indices (dim 0, ascending) this process must supply for
    an array of ``n_rows`` rows under ``sharding``.

    Derived from the sharding's device->index map so any mesh layout
    works (data-only, data x model, [acc, B] microbatch stacks via a
    P(None, 'data') sharding — pass the row count of the SHARDED dim and
    a 1-D projection of the sharding, see ``rows_sharding``).
    """
    import jax

    rows: set = set()
    index_map = sharding.devices_indices_map((n_rows,))
    for dev, idx in index_map.items():
        if dev.process_index == jax.process_index():
            sl = idx[0]
            rows.update(range(*sl.indices(n_rows)))
    return np.asarray(sorted(rows), dtype=np.int64)


def rows_sharding(mesh, axis: str = "data"):
    """1-D projection of a batch sharding: how dim 0 of size-[B] arrays
    is laid out over ``axis`` (for process_local_rows on batches whose
    keys differ in rank). Data-less meshes replicate, matching
    mesh.batch_sharding — every host then supplies all rows."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if axis not in mesh.axis_names:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(axis))


def put_global(sharding, local_tree):
    """Assemble globally-sharded jax.Arrays from THIS host's local rows.

    Single-process this equals ``jax.device_put(x, sharding)`` leaf for
    leaf (asserted in tests); multi-process each host passes only its
    ``process_local_rows`` worth of rows and JAX stitches the global
    array without gathering the data anywhere.
    """
    import jax

    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(sharding, a),
        local_tree)


def allgather_to_host(x):
    """Every host gets the full value of a (possibly non-addressable)
    global array as host numpy — identity (minus transfer) when
    single-process."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def stacked_train_stream(batcher, batch_size: int, acc_steps: int, mesh, *,
                         seed: int, order=None,
                         keys=("image", "input_ids", "attention_mask",
                               "label", "valid"), prefetch_depth: int = 2):
    """Multi-process twin of train/engine.stacked_batches + the
    device_put(microbatch_sharding) wrap: yields globally-sharded
    [acc, B, ...] microbatch stacks with each host decoding ONLY its rows.

    The global batch plan (shuffle permutation or the imbalanced-sampler
    ``order``) is recomputed identically on every process from the seed —
    both are plain numpy RNG draws — so the assembled global arrays are
    bit-identical to a single-process run of the same seed: same sample
    order, same tail padding (sample 0 + valid=0, data/pipeline.py
    make_batch), same trailing-stack repeat-with-valid=0 (engine
    stacked_batches). Every process must drain the stream fully (the
    train step's psums are collective).
    """
    from ..data.pipeline import batch_indices, lookahead
    from ..train.loop import microbatch_sharding

    acc = max(acc_steps, 1)
    plans = batch_indices(len(batcher.m), batch_size,
                          shuffle=order is None, seed=seed, order=order)
    sb = microbatch_sharding(mesh)
    my_rows = process_local_rows(rows_sharding(mesh), batch_size)
    n_local = len(my_rows)

    def local_mb(plan):
        # rows >= len(plan) are the global tail padding; make_batch's own
        # local padding (sample 0, valid=0) reproduces them exactly, and
        # my_rows is ascending so real rows stay a prefix as in the
        # single-process batch
        local_idx = np.asarray([plan[r] for r in my_rows if r < len(plan)],
                               dtype=np.int64)
        mb = batcher.make_batch(local_idx, n_local)
        return {k: v for k, v in mb.items() if k in keys}

    def windows():
        buf = []
        for plan in plans:
            buf.append(local_mb(plan))
            if len(buf) == acc:
                yield put_global(sb, {k: np.stack([x[k] for x in buf])
                                      for k in buf[0]})
                buf = []
        if buf:
            pad = dict(buf[-1])
            pad["valid"] = np.zeros_like(pad["valid"])
            while len(buf) < acc:
                buf.append(pad)
            yield put_global(sb, {k: np.stack([x[k] for x in buf])
                                  for k in buf[0]})

    # decode the next window(s) while the current train step runs
    # (--prefetch_depth); identical pull order on every process keeps the
    # collective schedule aligned
    return lookahead(windows(), prefetch_depth)


def is_primary() -> bool:
    """True on the process that owns side effects (checkpoints, reports,
    wandb, prints). Always true single-process."""
    import jax

    return jax.process_index() == 0


def run_eval_multiprocess(step, params, state, batcher, batch_size: int,
                          mesh, keys=("image", "label", "valid"),
                          progress: bool = True, prefetch_depth: int = 2
                          ) -> Tuple[float, np.ndarray, np.ndarray, Dict]:
    """Multi-process twin of the single-host eval loops (eval/harness.py
    run_image_eval, cli/test_text.py, cli/test_both.py): same jitted
    ``step(params, state, batch) -> (preds, correct)``, same global batch
    stream, each host decoding only its shard.

    Global batch ``s`` holds samples [s*B, min((s+1)*B, n)) in manifest
    order with the tail padded+masked — exactly the single-process
    stream — so accuracy, label order, prediction order and the report
    CSV built from them are IDENTICAL to a one-host run. Every process
    must enter for every step (collectives); the returned labels/preds
    are full-dataset on every host, so only report WRITING needs a
    process-0 gate in the CLIs.
    """
    import time

    import jax

    n_total = len(batcher.m)
    rs = rows_sharding(mesh)
    my_rows = process_local_rows(rs, batch_size)
    n_steps = (n_total + batch_size - 1) // batch_size
    all_preds, all_labels = [], []
    correct = 0

    def global_batches():
        # decode + put_global of batch s+1.. overlaps the in-flight step
        # via the lookahead wrap (--prefetch_depth); per-process placement
        # is deterministic and identical across hosts, so pulling ahead
        # keeps every process on the same collective schedule
        for s in range(n_steps):
            base = s * batch_size
            n_valid = min(batch_size, n_total - base)
            local_idx = np.asarray(
                [base + r for r in my_rows if r < n_valid], dtype=np.int64)
            local = batcher.make_batch(local_idx, len(my_rows))
            local = {k: v for k, v in local.items() if k in keys}
            yield base, n_valid, put_global(rs, local)

    from ..data.pipeline import lookahead
    t0 = time.perf_counter()
    for s, (base, n_valid, batch) in enumerate(
            lookahead(global_batches(), prefetch_depth)):
        preds, c = step(params, state, batch)
        correct += int(jax.device_get(c))  # replicated => addressable
        preds_np = allgather_to_host(preds)[:n_valid]
        all_preds.append(preds_np)
        all_labels.append(np.asarray(
            [batcher.m.samples[base + i].label for i in range(n_valid)],
            dtype=np.int32))
        if progress and jax.process_index() == 0:
            print(f"Test batches {s}/{n_steps} ", end="\r")
    wall = time.perf_counter() - t0
    acc = 100.0 * correct / n_total
    stats = {"wall_s": wall,
             "pipeline_samples_per_s": n_total / wall if wall > 0 else 0.0,
             "samples_per_s": n_total / wall if wall > 0 else 0.0,
             "p50_step_s": 0.0, "p50_includes_host_readback": True,
             "n": n_total}
    return acc, np.concatenate(all_labels), np.concatenate(all_preds), stats
