"""CLI entry points.

GC_RCA_PLATFORM=cpu[:N] pins the JAX backend before first use — needed
because this image's sitecustomize imports jax's config at interpreter
startup with the TPU platform already selected, so JAX_PLATFORMS set by a
caller arrives too late (hermetic CI drives / machines without the chip).

GC_RCA_COMPILE_CACHE=<dir|0> controls the persistent XLA compilation
cache (default: ~/.cache/gc_rca_tpu/xla). Repeat CLI invocations of the
same (model, batch) program skip the XLA compile (measured 10.9 s ->
0.8 s cross-process for a matmul chain; test_image CLI 7m14s -> 2m53s on
the tunneled v5e, where the residual is input upload, not compile).
"""

import os as _os

_plat = _os.environ.get("GC_RCA_PLATFORM")
if _plat:
    import jax as _jax

    name, _, n = _plat.partition(":")
    _jax.config.update("jax_platforms", name)
    if name == "cpu":
        _jax.config.update("jax_num_cpu_devices", int(n) if n else 8)

# multi-host opt-in (GC_RCA_MULTIHOST=1): jax.distributed.initialize must
# run before first backend use; a plain single-process CLI run is a no-op
from ..parallel.multihost import initialize_from_env as _mh_init

_mh_init()

from ..utils.xla_cache import enable_compile_cache as _enable_cache

# XLA:CPU cache entries are host-AOT machine code; key the dir by the
# host CPU when the CPU backend is selected (GC_RCA_PLATFORM or an
# already-pinned jax_platforms, e.g. the test conftest) — a different
# session's host could SIGILL loading another machine's entries
_is_cpu = (_plat or "").startswith("cpu")
if not _is_cpu:
    try:
        import jax as _jax2

        _is_cpu = str(_jax2.config.jax_platforms or "").startswith("cpu")
    except Exception:
        pass
_enable_cache(5.0, host_keyed=_is_cpu)


def train_mesh(mesh_shape: str, batch_size: int, ft_batch: int,
               ft_epochs: int):
    """Device mesh for a train CLI: the data axis must divide every
    TRAIN microbatch (engine.run_phase device_puts [acc, B, ...] stacks
    unpadded — found by an end-to-end drive with the reference
    launcher's small fixed --batch_size on an 8-device mesh). Shrinks
    via mesh_for_batch to the gcd of the phase batch sizes; eval
    batches are rounded up / masked separately (clamp_eval_batch)."""
    import math

    from ..parallel.mesh import mesh_for_batch

    div = math.gcd(batch_size, ft_batch) if ft_epochs > 0 else batch_size
    return mesh_for_batch(mesh_shape, div)


def resolve_model(getter, name: str):
    """Reference-style clean exit on an unknown model name (the reference
    prints 'Invalid Model: ...' and sys.exit(1)s — main_image.py:358-359 —
    instead of a traceback)."""
    try:
        return getter(name)
    except KeyError as e:
        print(f"Invalid Model: {name}")
        print(e.args[0])
        raise SystemExit(1)
