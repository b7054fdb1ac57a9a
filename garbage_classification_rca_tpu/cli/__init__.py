"""CLI entry points.

GC_RCA_PLATFORM=cpu[:N] pins the JAX backend before first use — needed
because this image's sitecustomize imports jax's config at interpreter
startup with the TPU platform already selected, so JAX_PLATFORMS set by a
caller arrives too late (hermetic CI drives / machines without the chip).
"""

import os as _os

_plat = _os.environ.get("GC_RCA_PLATFORM")
if _plat:
    import jax as _jax

    name, _, n = _plat.partition(":")
    _jax.config.update("jax_platforms", name)
    if name == "cpu":
        _jax.config.update("jax_num_cpu_devices", int(n) if n else 8)
