"""CLI entry point: ``python -m sdag_tpu.pipeline.cli [config.json]``.

Same invocation shape as the reference
(``python -m src.pipeline.main [config.json]``, ``README.md:88-95``).
"""

from __future__ import annotations

import os
import sys


def _maybe_force_platform() -> None:
    """SDAG_FORCE_PLATFORM=cpu runs the pipeline on CPU even where a
    sitecustomize pins a TPU plugin (the env var JAX_PLATFORMS alone is
    not honored there); must run before any jax backend use."""
    plat = os.environ.get("SDAG_FORCE_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)


_maybe_force_platform()

from sdag_tpu.config import make_config                       # noqa: E402
from sdag_tpu.pipeline.orchestrator import run_experiment     # noqa: E402


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    config_path = argv[0] if argv else None
    cfg = make_config(config_path)
    run_experiment(cfg)


if __name__ == "__main__":
    main()
