"""HangWatchdog: silent-stall observability for the long-running loops.

The reference has no hang story (its failure mode is a dead process and a
manual --start_from restart, reference: train.py:133-148); through the
axon relay a wedged dispatch presents as a futex wait with zero log
output — BENCH_r04 was lost to exactly that.  These tests pin the
watchdog's contract: fires on a stall, stays quiet under heartbeats,
re-arms, and is a no-op when disabled.
"""
import logging
import time

from echr_tpu.utils.watchdog import HangWatchdog


def _wait_for(pred, timeout=5.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.02)
    return pred()


def test_fires_on_stall_and_rearms(caplog):
    with caplog.at_level(logging.WARNING, logger="echr_tpu.watchdog"):
        with HangWatchdog("t-stall", deadline_s=0.25,
                          dump_stacks=False) as wd:
            assert _wait_for(lambda: wd.trips >= 2, timeout=5.0), (
                "watchdog did not fire twice (re-arm) within 5s")
    msgs = [r.getMessage() for r in caplog.records]
    assert any("t-stall" in m and "no progress" in m for m in msgs)


def test_quiet_under_heartbeats():
    with HangWatchdog("t-beat", deadline_s=0.4, dump_stacks=False) as wd:
        for _ in range(20):
            wd.beat()
            time.sleep(0.05)  # 1s total, every beat well inside deadline
        assert wd.trips == 0


def test_disabled_is_noop():
    wd = HangWatchdog("t-off", deadline_s=0.0)
    wd.start()
    assert wd._thread is None  # no thread spawned at deadline <= 0
    wd.beat()
    wd.stop()
    assert wd.trips == 0


def test_suspend_pauses_detection_and_resume_rearms():
    """suspend() covers long legitimate sections (train's gating eval runs
    minutes with its own eval watchdog) without false stall warnings."""
    with HangWatchdog("t-susp", deadline_s=0.2, dump_stacks=False) as wd:
        wd.suspend()
        time.sleep(1.0)  # 5x the deadline while suspended
        assert wd.trips == 0
        wd.resume()
        assert _wait_for(lambda: wd.trips >= 1, timeout=5.0)


def test_restart_after_stop_monitors_again():
    """stop() then start() must yield a LIVE watchdog (the stop event is
    cleared on start), not a thread that exits immediately."""
    wd = HangWatchdog("t-restart", deadline_s=0.2, dump_stacks=False)
    wd.start()
    assert _wait_for(lambda: wd.trips >= 1, timeout=5.0)
    wd.stop()
    trips_before = wd.trips
    wd.start()
    assert _wait_for(lambda: wd.trips > trips_before, timeout=5.0), (
        "restarted watchdog never fired")
    wd.stop()


def test_stack_dump_path_does_not_raise():
    # dump_stacks=True exercises faulthandler.dump_traceback(all_threads)
    with HangWatchdog("t-dump", deadline_s=0.2) as wd:
        assert _wait_for(lambda: wd.trips >= 1, timeout=5.0)
