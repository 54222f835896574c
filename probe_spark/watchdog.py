"""Query timeout watchdog (reference: src/search/timeout.rs:1-43, CLI
default --timeout 30 at src/cli.rs:88-90).

The reference spawns a thread that hard-exits the PROCESS when a search
exceeds the deadline.  A Spark driver must stay alive for the session, so
the faithful-but-Spark-native translation is job-group cancellation: the
query's jobs run under a unique job group with ``interruptOnCancel=True``;
a daemon timer cancels the whole group at the deadline and the caller gets
``QueryTimeoutError`` while the SparkSession remains fully usable for the
next query.  Cancellation propagates to every concurrently running stage of
the query (including multi-action plans like rescue queries), not just the
job currently collecting.
"""

from __future__ import annotations

import threading
import uuid
from contextlib import contextmanager

DEFAULT_TIMEOUT_S = 30.0  # reference default, cli.rs:88-90


class QueryTimeoutError(RuntimeError):
    """The search exceeded its deadline and its Spark jobs were cancelled."""


@contextmanager
def query_deadline(spark, seconds: float | None, label: str = "probe-query"):
    """Run the enclosed collect/show under a deadline.  ``seconds=None``
    disables the watchdog entirely (library callers composing their own
    lifecycle)."""
    if seconds is None:
        yield
        return
    sc = spark.sparkContext
    group = f"{label}-{uuid.uuid4().hex[:8]}"
    done = threading.Event()
    expired = threading.Event()

    def reaper() -> None:
        if done.wait(seconds):
            return
        expired.set()
        # keep cancelling until the caller unwinds: a single shot can fire
        # BEFORE the job is submitted (first-query analysis takes seconds)
        # and would silently let the late-submitted job run to completion
        # (the reference's watchdog also re-checks on a 1 s interval,
        # timeout.rs:26-36)
        while not done.is_set():
            try:
                sc.cancelJobGroup(group)
            except Exception:
                return  # session stopped; nothing left to cancel
            done.wait(0.5)

    sc.setJobGroup(group, f"{label} (timeout {seconds:g}s)", True)
    t = threading.Thread(target=reaper, name=f"watchdog-{group}", daemon=True)
    t.start()
    try:
        # If the enclosed collect completes normally, the results are whole
        # even when the deadline fired in the race window just afterwards --
        # return them rather than discarding successful work (the cancel was
        # a no-op in that case).  Timeout is only raised when the collect
        # itself was aborted by our reaper.
        yield
    except QueryTimeoutError:
        raise
    except Exception as e:
        if expired.is_set():
            # Spark surfaces the cancellation as a generic job-aborted
            # error; translate when it was OUR reaper that fired
            raise QueryTimeoutError(
                f"search timed out after {seconds:g}s (job group {group} cancelled)"
            ) from e
        raise
    finally:
        done.set()
        # drop the job-group tag so later queries on this thread aren't
        # cancellable by a stale group id
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.interruptOnCancel", None)
