"""Wall-clock heartbeat for TPU jobs (docs/TPU_NOTES.md rule 9).

Round-4 lesson (run 921, commit 70c3d56): a cold compile through the axon
tunnel can wedge SILENTLY — 24 minutes with zero log output, indistinguishable
from a long-but-healthy compile, so the operator can neither wait with
confidence nor reclaim the chip.  The fix is a daemon thread that stamps the
log every ``interval`` seconds with the elapsed time and the current phase
(set via :func:`phase` around compile-heavy dispatches).  Interpretation
contract (TPU_NOTES rule 9):

  * heartbeat lines advancing, phase=compile within its budget -> WAIT;
  * heartbeat lines advancing, phase=compile PAST 2x budget     -> wedge:
    kill the exact PID (never a pattern), free the claim, retry once warm;
  * heartbeat lines STOPPED                                     -> the python
    process itself is gone/stuck, not the compile; investigate the log tail.

The thread is a no-op unless started; run.py starts it automatically for
non-CPU backends.
"""

from __future__ import annotations

import sys
import threading
import time

_state = {"phase": "startup", "since": time.time(), "t0": time.time()}
_started = False


def phase(name: str):
    """Mark the current phase (e.g. 'compile:train_gen', 'run')."""
    _state["phase"] = name
    _state["since"] = time.time()


def start(interval: float = 60.0, stream=None):
    """Start the daemon heartbeat thread (idempotent)."""
    global _started
    if _started:
        return
    _started = True
    out = stream or sys.stderr
    _state["t0"] = time.time()

    def beat():
        while True:
            time.sleep(interval)
            now = time.time()
            print(f"[heartbeat] alive {now - _state['t0']:.0f}s "
                  f"phase={_state['phase']} "
                  f"(for {now - _state['since']:.0f}s)", file=out, flush=True)

    threading.Thread(target=beat, daemon=True, name="marlpde-heartbeat").start()
