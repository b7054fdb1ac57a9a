"""Device mesh + sharding utilities.

The reference scales with single-process ``nn.DataParallel``
(main_image.py:404-406, main_text.py:349-351, main_both.py:386-388) —
replicate module, scatter batch, NCCL under the hood.  The TPU-native
equivalent: a ``jax.sharding.Mesh`` with axis ``data`` for batch
parallelism (params replicated, batch sharded, metric reduction via
``psum``/sharded reductions handled by XLA), with a second axis ``model``
reserved for tensor-parallel sharding of the BLIP-2 towers.  Collectives
ride ICI; the design stays 2-level (ICI x DCN) ready via the mesh
abstraction, though a v5e-8 slice never touches DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def parse_mesh_shape(spec: str, n_devices: int) -> dict[str, int]:
    """Parse "data:-1" / "data:4,model:2" into an axis->size dict.

    A single -1 axis absorbs all remaining devices.
    """
    axes: dict[str, int] = {}
    for part in spec.split(","):
        name, _, size = part.strip().partition(":")
        axes[name] = int(size) if size else -1
    fixed = int(np.prod([s for s in axes.values() if s > 0])) if axes else 1
    for name, size in axes.items():
        if size == -1:
            axes[name] = max(n_devices // max(fixed, 1), 1)
    return axes


def make_mesh(spec: str = "data:-1",
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    axes = parse_mesh_shape(spec, len(devices))
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axes.keys()))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard leading (batch) dim over `axis`, replicate the rest.

    A mesh without `axis` (e.g. --mesh_shape=pipe:2 with no data axis)
    replicates the batch — NamedSharding would otherwise raise a cryptic
    "resource axis not found" at step-construction time."""
    if axis not in mesh.axis_names:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(axis))


def mesh_for_batch(spec: str, batch_size: int,
                   devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """make_mesh, but the data axis shrinks to the largest divisor of
    ``batch_size`` — a fixed user batch (e.g. the reference launcher's
    --batch_size=4 on an 8-chip mesh) must not crash NamedSharding's
    even-split requirement. Prints a note when it shrinks."""
    devices = list(devices if devices is not None else jax.devices())
    axes = parse_mesh_shape(spec, len(devices))
    data = axes.get(DATA_AXIS, 1)
    if batch_size > 0 and data > 1 and batch_size % data != 0:
        # shrink only to DIVISORS of the axis: a non-divisor size (e.g.
        # batch 6 on 8 chips -> data:6) would also have to divide every
        # downstream eval/table batch, which nothing guarantees; divisors
        # of the (power-of-two) chip count keep the standard even batch
        # tables shardable
        new = max(d for d in range(1, data + 1)
                  if data % d == 0 and batch_size % d == 0)
        print(f"mesh data axis {data} does not divide batch_size "
              f"{batch_size}; using data:{new}")
        axes[DATA_AXIS] = new
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    return Mesh(np.asarray(devices[:n]).reshape(shape), tuple(axes.keys()))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params):
    """Replicate a param pytree onto every device of the mesh."""
    s = replicated_sharding(mesh)
    return jax.device_put(params, s)


def pad_batch_to_multiple(arrays, multiple: int):
    """Pad the leading dim of every array in a pytree to a multiple.

    Returns (padded_pytree, valid_count). Static shapes keep XLA from
    recompiling on the dataset-tail batch; downstream metrics mask by
    valid_count.
    """
    leaves = jax.tree_util.tree_leaves(arrays)
    if not leaves:
        return arrays, 0
    n = leaves[0].shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    pad = target - n

    def _pad(a):
        if pad == 0:
            return a
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(np.asarray(a), widths)

    return jax.tree_util.tree_map(_pad, arrays), n


def round_up_batch(batch_size: int, mesh: Optional[Mesh],
                   axis: str = DATA_AXIS) -> int:
    """Smallest batch >= batch_size divisible by the data-axis size (an
    indivisible batch cannot be sharded over the mesh)."""
    if mesh is None:
        return batch_size
    n = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)
    return ((batch_size + n - 1) // n) * n


def clamp_eval_batch(batch_size: int, n_samples: int,
                     mesh: Optional[Mesh], axis: str = DATA_AXIS) -> int:
    """Eval batch for a dataset of n_samples: no bigger than the dataset
    (a table-sized 256-batch program for a 16-image run wastes the whole
    compile + forward on padding), mesh-divisible, at least 1 sample.
    Numerics are unchanged either way — tail padding is masked by `valid`."""
    return round_up_batch(max(1, min(batch_size, n_samples)), mesh, axis)


def shard_batch(mesh: Mesh, batch, axis: str = DATA_AXIS):
    """Device-put a host batch with its leading dim sharded over the mesh."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), batch)
