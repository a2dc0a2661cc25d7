"""Continuous-application driver — the reference's entry point
(``/root/reference/run.py:35-121``) re-expressed on Spark's runtime:

- CLI surface (``run.py:35-57``): agency key, rest interval (seconds
  between sweeps), IANA timezone for the daily-refresh rollover.
- Bootstrap (``run.py:92``): agency upsert runs once at startup.
- Continuous ingest (``run.py:98-121``): in the reference, an
  infinite ``sleep(resttime)`` loop; here, the Structured Streaming
  query from ``streaming/ingest.py`` with
  ``trigger(processingTime=resttime)`` — scheduling, offset
  durability (checkpoint), and retry move from hand-written Python
  into the streaming runtime.
- Daily dimension refresh at local-midnight rollover
  (``run.py:101-113``): detection is a pure function of
  (last-refresh local date, current UTC time, tz) so it is unit-
  testable; the check runs from the streaming listener thread between
  micro-batches, refresh failures retry ``n_tries`` times
  (``run.py:69-77``) and then surface instead of being silently
  swallowed (the reference's bare-except bug, SURVEY.md §3).

The loop body itself stays thin glue — everything it calls is the
independently tested refresh/ingest machinery.
"""

from __future__ import annotations

import argparse
import datetime as dt
from collections.abc import Callable
from zoneinfo import ZoneInfo


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    """CLI surface of the reference driver (``run.py:35-57``)."""
    p = argparse.ArgumentParser(
        description="Continuous vehicle-location ingest with daily "
        "dimension refresh."
    )
    p.add_argument("-a", "--agency", required=True, help="agency key")
    p.add_argument(
        "-r",
        "--resttime",
        type=float,
        default=10.0,
        help="seconds between ingest sweeps (micro-batch trigger period)",
    )
    p.add_argument(
        "-z",
        "--timezone",
        default="UTC",
        help="IANA timezone for the local-midnight refresh rollover",
    )
    p.add_argument(
        "--checkpoint", required=True, help="streaming checkpoint directory"
    )
    p.add_argument(
        "--store", required=True, help="dimension-store root directory"
    )
    return p.parse_args(argv)


def local_date(now_utc: dt.datetime, tz: str) -> dt.date:
    """UTC instant → local calendar date (``run.py:60,103-104``).

    Uses the stdlib zone database (the reference uses pytz; semantics
    are identical for date extraction).
    """
    aware = now_utc.replace(tzinfo=dt.timezone.utc)
    return aware.astimezone(ZoneInfo(tz)).date()


def needs_refresh(
    last_refresh_local: dt.date | None, now_utc: dt.datetime, tz: str
) -> bool:
    """True when the local calendar day has rolled over since the last
    refresh (``run.py:103-111``) — or when no refresh ever ran (the
    reference refreshes dimensions on startup via its first loop pass).
    """
    if last_refresh_local is None:
        return True
    return local_date(now_utc, tz) > last_refresh_local


class RefreshScheduler:
    """Tracks the rollover state and runs the refresh under the retry
    policy. ``tick()`` is called between micro-batches (cheap: a date
    compare unless a refresh is due)."""

    def __init__(
        self,
        refresh_fn: Callable[[], None],
        tz: str = "UTC",
        n_tries: int = 10,
        clock: Callable[[], dt.datetime] = dt.datetime.utcnow,
    ) -> None:
        self.refresh_fn = refresh_fn
        self.tz = tz
        self.n_tries = n_tries
        self.clock = clock
        self.last_refresh_local: dt.date | None = None
        self.refresh_count = 0

    def tick(self) -> bool:
        """Run the refresh iff the local day rolled over. Returns
        whether a refresh ran. Retries ``n_tries`` times then raises
        (run.py:69-77, minus the swallowed-failure bug)."""
        now = self.clock()
        if not needs_refresh(self.last_refresh_local, now, self.tz):
            return False
        from nextbus2pg_spark.pipelines.dimension_refresh import with_retries

        with_retries(self.refresh_fn, n_tries=self.n_tries)
        # Commit the rollover marker only after success, so a failed
        # refresh is retried on the next tick (reference behavior:
        # update_date only advances after the refresh block, run.py:113).
        self.last_refresh_local = local_date(now, self.tz)
        self.refresh_count += 1
        return True


def run_app(
    raw_stream,
    dims_provider,
    sink,
    scheduler: RefreshScheduler,
    checkpoint_dir: str,
    resttime_seconds: float = 10.0,
    await_seconds: float | None = None,
):
    """Wire bootstrap + continuous ingest + scheduled refresh.

    The refresh check piggybacks on the micro-batch cadence: the sink
    wrapper calls ``scheduler.tick()`` before delegating, which mirrors
    the reference's "check the date once per sweep" placement
    (``run.py:101-113``) and keeps all driver-side work on one thread.
    """
    from nextbus2pg_spark.streaming.ingest import start_ingest

    scheduler.tick()  # bootstrap refresh (first loop pass)

    def refreshing_sink(batch_df, batch_id):
        scheduler.tick()
        sink(batch_df, batch_id)

    query = start_ingest(
        raw_stream,
        dims_provider,
        refreshing_sink,
        checkpoint_dir,
        trigger_seconds=int(resttime_seconds) or None,
    )
    if await_seconds is not None:
        query.awaitTermination(await_seconds)
    return query
