"""Honor ``JAX_PLATFORMS`` in environments whose sitecustomize pins a
platform.

Some host images register a TPU PJRT plugin from ``sitecustomize`` and
hard-set ``jax_platforms`` via ``jax.config.update`` at interpreter start,
which silently overrides the ``JAX_PLATFORMS`` environment variable — a CLI
run with ``JAX_PLATFORMS=cpu`` then lands on (and contends for) the TPU.
Every CLI in this package calls :func:`respect_jax_platforms` first thing;
it re-applies the env var over the pinned config value. Must run before
anything touches the JAX backend (config switches are ignored afterwards).
"""

from __future__ import annotations

import os


def respect_jax_platforms(num_cpu_devices: int | None = None) -> None:
    """Re-apply the JAX_PLATFORMS env var over a sitecustomize-pinned value.

    No-op when the env var is unset. ``num_cpu_devices`` additionally sets
    the virtual CPU device count (for mesh work without hardware).
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax
    jax.config.update("jax_platforms", plat)
    if num_cpu_devices is not None and "cpu" in plat:
        jax.config.update("jax_num_cpu_devices", num_cpu_devices)
