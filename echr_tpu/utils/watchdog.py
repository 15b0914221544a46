"""Hang watchdog: surface silent device/transport stalls in long loops.

The reference has no notion of this (its failure story is "the process
dies and you restart with --start_from", reference: train.py:133-148).
On TPU pods — and doubly so through this environment's relay tunnel,
whose outages present as a dispatch or fetch that never returns while
every thread sits in a futex/socket wait — a training or eval loop can
wedge with zero log output.  BENCH_r04 lost an entire round's perf
record to exactly that failure mode; bench.py grew per-section
watchdogs in round 5, and this module gives the production loops
(`engine.train.train`, the eval CLI) the same observability:

    with HangWatchdog("train", deadline_s=600) as wd:
        while ...:
            wd.beat()
            step(...)

A daemon thread checks progress every `deadline_s / 4`; if no `beat()`
lands within `deadline_s` it logs a WARNING naming the guarded loop and
the stall age, and dumps every thread's Python stack via
`faulthandler.dump_traceback` (stderr) so a post-mortem shows exactly
which call never returned.  It re-arms and warns again every deadline —
a wedged relay recovers after minutes-long phases (docs/BENCH_NOTES.md
"Relay contention phases are MINUTES long"), so the watchdog never
kills the process; it only makes the wait visible and attributable.

Deliberately NOT a deadline-killer: training owns checkpoints and
preemption semantics (SIGTERM boundary checkpoint, engine/train.py);
turning a slow phase into a crash would trade a stall for lost work.
bench.py keeps its own harder os._exit watchdog because its contract is
"always emit the JSON line".
"""
from __future__ import annotations

import faulthandler
import logging
import sys
import threading
import time

log = logging.getLogger("echr_tpu.watchdog")


class HangWatchdog:
    """Warn + dump all-thread stacks when a loop stops making progress.

    deadline_s <= 0 disables the watchdog entirely (`beat()` and the
    context manager become no-ops) so callers can wire it unconditionally
    behind a config knob.
    """

    def __init__(self, name: str, deadline_s: float,
                 dump_stacks: bool = True):
        self.name = name
        self.deadline_s = float(deadline_s)
        self.dump_stacks = dump_stacks
        self.trips = 0  # observability / tests
        self._last = time.monotonic()
        self._suspended = False
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "HangWatchdog":
        if self.deadline_s > 0 and self._thread is None:
            self._stop.clear()  # restartable: stop() left the event set
            self._last = time.monotonic()
            self._thread = threading.Thread(
                target=self._run, name=f"hang-watchdog-{self.name}",
                daemon=True)
            self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None

    def __enter__(self) -> "HangWatchdog":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- heartbeat ---------------------------------------------------------

    def beat(self) -> None:
        """Mark progress.  Cheap (one clock read + one store); call once
        per iteration of the guarded loop."""
        self._last = time.monotonic()

    def suspend(self) -> None:
        """Pause stall detection across a long legitimate section (e.g.
        train's in-loop gating eval, which runs minutes and has its OWN
        eval watchdog) without tearing the thread down."""
        self._suspended = True

    def resume(self) -> None:
        self._last = time.monotonic()
        self._suspended = False

    # -- internals ---------------------------------------------------------

    def _run(self) -> None:
        poll = max(self.deadline_s / 4.0, 0.05)
        while not self._stop.wait(poll):
            if self._suspended:
                continue
            stalled = time.monotonic() - self._last
            if stalled < self.deadline_s:
                continue
            self.trips += 1
            log.warning(
                "%s loop has made no progress for %.0fs (deadline %.0fs) — "
                "likely a wedged device dispatch/fetch (relay outage phases "
                "are minutes long and recover; this watchdog only reports). "
                "Dumping all thread stacks to stderr.",
                self.name, stalled, self.deadline_s)
            if self.dump_stacks:
                try:
                    faulthandler.dump_traceback(file=sys.stderr,
                                                all_threads=True)
                except Exception:  # never let observability kill the loop
                    log.exception("stack dump failed")
            self._last = time.monotonic()  # re-arm: warn once per deadline
