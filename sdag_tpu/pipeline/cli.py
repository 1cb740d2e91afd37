"""CLI entry point: ``python -m sdag_tpu.pipeline.cli [config.json]``.

Same invocation shape as the reference
(``python -m src.pipeline.main [config.json]``, ``README.md:88-95``).
"""

from __future__ import annotations

import sys


from sdag_tpu.utils.platform import maybe_force_platform

maybe_force_platform()

from sdag_tpu.config import make_config                       # noqa: E402
from sdag_tpu.pipeline.orchestrator import run_experiment     # noqa: E402


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    config_path = argv[0] if argv else None
    cfg = make_config(config_path)
    run_experiment(cfg)


if __name__ == "__main__":
    main()
