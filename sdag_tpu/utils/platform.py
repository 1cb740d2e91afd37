"""Backend selection for CLI entry points.

``SDAG_FORCE_PLATFORM=cpu`` runs a CLI on CPU even where a sitecustomize
pins a TPU plugin (the plain ``JAX_PLATFORMS`` env var is not honored
there); the config update must land before any jax backend use, so every
CLI ``main()`` calls this first.
"""

from __future__ import annotations

import os


def maybe_force_platform() -> None:
    plat = os.environ.get("SDAG_FORCE_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    # Persistent compile cache (works through the axon relay): re-runs of
    # the same jitted shapes load in seconds instead of minutes under
    # compile-service contention.  Honors an explicit JAX_COMPILATION_CACHE_DIR.
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        import jax
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
