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


def early_platform_setup(argv: "list[str] | None" = None) -> None:
    """Module-import-time platform setup for CLIs.

    `jax_num_cpu_devices` can only be set BEFORE the backend initializes,
    and several package modules build jnp constants at import time — so a
    CLI that supports `--local-devices` must apply it before its own
    imports run. Call this at the very top of the CLI module (before jax /
    package imports); it scans sys.argv for `--local-devices N` and applies
    it together with the JAX_PLATFORMS re-pin.
    """
    import sys
    argv = sys.argv if argv is None else argv

    def flag(name, cast):
        return parse_flag(argv, name, cast)

    respect_jax_platforms(num_cpu_devices=flag("--local-devices", int))
    # jax.distributed.initialize must ALSO run before the backend first
    # initializes (jax._src.distributed guards it), which module-level jnp
    # constants elsewhere in the package would otherwise trigger first.
    nproc = flag("--num-processes", int)
    if nproc and nproc > 1:
        from active_tracking_rl_tpu.parallel.mesh import host_init
        host_init(flag("--coordinator", str), nproc,
                  flag("--process-id", int) or 0)


def parse_flag(argv, name: str, cast):
    """Scan raw argv for `name`, accepting both argparse spellings:
    '--flag value' and '--flag=value'. Returns cast(value) or None."""
    for i, tok in enumerate(argv):
        raw = None
        if tok == name and i + 1 < len(argv):
            raw = argv[i + 1]
        elif tok.startswith(name + "="):
            raw = tok[len(name) + 1:]
        if raw is not None:
            try:
                return cast(raw)
            except ValueError:
                return None
    return None


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
