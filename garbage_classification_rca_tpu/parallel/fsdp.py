"""FSDP / ZeRO-3-style parameter + optimizer-state sharding.

The reference replicates the full model and optimizer on every GPU
(``nn.DataParallel``, main_image.py:404-406) — per-device memory never
shrinks with the fleet. The TPU-native upgrade: store every large tensor
(params, Adam moments, BatchNorm stats) SHARDED over the 'data' mesh axis
and let GSPMD materialize it on use — XLA inserts an all-gather in front
of each consuming op and a reduce-scatter behind each gradient, riding
ICI. Per-chip memory for weights + optimizer drops by ~n_devices while
the train-step math matches the replicated layout to float-accumulation
order — reduce-scatter sums grads in a different order than all-reduce,
so trajectories agree to ~1e-4 relative (measured max 7e-5), not
bit-for-bit; tests/test_fsdp.py asserts the tolerance that holds.

This is pure PLACEMENT policy: garbage_classification_rca_tpu train steps
infer shardings from operand placement (train/loop.py:119-126), so FSDP
needs no step changes — device_put the trees with these specs instead of
replicating. Enabled per-run with ``--fsdp`` on the train CLIs.

Sharding rule per leaf: the largest dim divisible by the data-axis size
is sharded (ties -> last such dim, keeping matmul-reduction dims intact
more often); leaves under ``min_size`` elements (biases, LayerNorm/BN
vectors) stay replicated — gather latency would dominate their bytes.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

# below this many elements a leaf is replicated (64 KiB of fp32): the
# per-op all-gather setup cost outweighs sharded storage of tiny vectors
MIN_SHARD_ELEMENTS = 16384


def _axis_size(mesh: Mesh, axis: str) -> int:
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)


def leaf_spec(leaf, axis_size: int, axis: str = DATA_AXIS,
              min_size: int = MIN_SHARD_ELEMENTS) -> P:
    """PartitionSpec for one array: shard its largest axis_size-divisible
    dim, or replicate when too small / nothing divides."""
    shape = getattr(leaf, "shape", ())
    if axis_size <= 1 or int(np.prod(shape, initial=1)) < min_size:
        return P()
    best = -1
    for d, n in enumerate(shape):
        if n % axis_size == 0 and n >= (shape[best] if best >= 0 else 0):
            best = d
    if best < 0:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_specs(tree, mesh: Mesh, axis: str = DATA_AXIS,
               min_size: int = MIN_SHARD_ELEMENTS):
    """PartitionSpec pytree for params / optimizer state / BN state.

    Works on any pytree whose leaves are arrays or ShapeDtypeStructs —
    optax states (NamedTuples mirroring the param tree plus scalar
    counts) fall out of the same leaf rule: moments shard like their
    params, scalars replicate.
    """
    n = _axis_size(mesh, axis)
    return jax.tree_util.tree_map(
        lambda l: leaf_spec(l, n, axis, min_size), tree)


def shard_params_fsdp(mesh: Mesh, tree, axis: str = DATA_AXIS,
                      min_size: int = MIN_SHARD_ELEMENTS):
    """device_put a pytree with FSDP placement (drop-in for
    parallel.mesh.shard_params)."""
    specs = fsdp_specs(tree, mesh, axis, min_size)
    return jax.tree_util.tree_map(
        lambda l, s: jax.device_put(l, NamedSharding(mesh, s)), tree, specs)


def param_placer(mesh: Optional[Mesh], use_fsdp: bool):
    """The placement function a train CLI applies to params / BN state /
    optimizer state: FSDP-sharded when requested, replicated otherwise."""
    import jax

    from .mesh import shard_params

    if mesh is not None and use_fsdp:
        if jax.process_count() > 1:
            # checkpointing device_gets params every epoch, which cannot
            # read an array spanning non-addressable devices — without
            # this guard the run burns a full epoch and THEN crashes at
            # the first save (multihost.py documents the limitation)
            raise SystemExit(
                "--fsdp is not supported under multi-host "
                "(GC_RCA_MULTIHOST) runs: checkpoint saves gather params "
                "to the host. Run FSDP single-process or drop --fsdp.")
        return lambda tree: shard_params_fsdp(mesh, tree)
    if mesh is not None:
        return lambda tree: shard_params(mesh, tree)
    return lambda tree: tree
