"""Chip-job registration: a cooperative "who holds the TPU" registry.

Round-4's official bench capture ran while leftover training/grid jobs
were still using the single real chip; the contended compiles blew the
driver's wall-clock window (VERDICT r4 weak #3).  Long-running experiment
drivers call :func:`register_chip_job` at startup; ``bench.py`` waits
(bounded, ``BENCH_QUIESCE_S``) for every registered pid to exit before it
starts timing, and prunes stale files for dead pids on its own.

The registry is just ``<repo>/.chip_jobs/<name>-<pid>.pid`` containing the
pid — no daemon, no locking; liveness is checked with ``kill(pid, 0)``.
"""

from __future__ import annotations

import atexit
import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
LOCKDIR = os.path.join(_REPO, ".chip_jobs")


def register_chip_job(name: str) -> str:
    """Register this process as holding the chip; auto-unregisters at
    interpreter exit (a SIGKILL leaves a stale file, which readers prune
    by pid liveness)."""
    os.makedirs(LOCKDIR, exist_ok=True)
    path = os.path.join(LOCKDIR, f"{name}-{os.getpid()}.pid")
    with open(path, "w") as f:
        f.write(str(os.getpid()))

    def _cleanup() -> None:
        try:
            os.unlink(path)
        except OSError:
            pass

    atexit.register(_cleanup)
    return path
