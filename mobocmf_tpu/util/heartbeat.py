"""In-process stall watchdog for long campaigns (TPU-tunnel outage defense).

The failure mode this defends against is specific to remote-device execution
(the axon TPU tunnel): a device RPC that never returns. The round-3 outage
froze a campaign mid-iteration on an in-flight Pareto-phase dispatch; the
process hung forever and had to be killed externally, wasting its queue
slot's whole external timeout (hours). The reference has no analogue — it is
single-process CPU-only (SURVEY §5 "failure detection"); this is part of the
rebuild's failure-detection subsystem alongside feasibility retries and
file-based resume.

Design: host-side loops call `beat(tag)` at natural boundaries (training
chunk ends, acquisition picks, BO phase transitions). Every device program in
this framework is chunked to bounded runtime (~2 min axon worker limit), and
a fresh jit compile is 1-5 min, so consecutive beats are minutes apart on a
healthy system; a gap of `timeout_s` (default 900 s) means a hung RPC, and
the watchdog prints the last beat tag (which phase hung) and `os._exit`s
with code 86. Campaign log dirs are append-per-iteration, so the exit is
resume-safe: the queue runner retries and the loop replays evaluated points.

Opt-in: nothing starts unless `start(timeout_s)` is called (run_bo_loop
starts it when `BOConfig.stall_timeout_s` or `MOBOCMF_STALL_TIMEOUT_S` is
set). `beat()` is a plain assignment when inactive — safe to sprinkle in hot
host loops.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from typing import Optional

EXIT_CODE = 86

_lock = threading.Lock()
_last_beat: float = 0.0
_last_tag: str = "start"
_thread: Optional[threading.Thread] = None
_stop = threading.Event()


def beat(tag: str = "") -> None:
    """Record liveness. GIL-atomic assignments; cheap enough for host loops."""
    global _last_beat, _last_tag
    _last_beat = time.monotonic()
    if tag:
        _last_tag = tag


def stop() -> None:
    """Disarm the watchdog (mainly for tests)."""
    global _thread
    _stop.set()
    t = _thread
    if t is not None:
        t.join(timeout=5.0)
    _thread = None


def start(timeout_s: float, poll_s: Optional[float] = None) -> None:
    """Arm the watchdog: no beat for `timeout_s` seconds => os._exit(86).

    Idempotent per process (restarting replaces the timeout). The monitor is
    a daemon thread, so a normally-exiting process never waits on it.
    """
    global _thread
    with _lock:
        stop()
        _stop.clear()
        beat("armed")
        poll = poll_s if poll_s is not None else max(timeout_s / 4.0, 0.05)

        def _monitor() -> None:
            while not _stop.wait(poll):
                gap = time.monotonic() - _last_beat
                if gap > timeout_s:
                    print(
                        f"[watchdog] no progress for {gap:.0f}s "
                        f"(timeout {timeout_s:.0f}s); last beat: '{_last_tag}'. "
                        f"Device RPC presumed hung (tunnel outage?) — exiting "
                        f"{EXIT_CODE} (campaign log dirs are resume-safe).",
                        file=sys.stderr,
                        flush=True,
                    )
                    os._exit(EXIT_CODE)

        _thread = threading.Thread(
            target=_monitor, name="mobocmf-stall-watchdog", daemon=True
        )
        _thread.start()
