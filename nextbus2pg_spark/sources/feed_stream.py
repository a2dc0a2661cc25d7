"""First-class streaming feed source: a Python Data Source V2
``MicroBatchStream`` with the reference's per-route incremental-offset
semantics (closes round-2 "What's missing" #5).

The reference polls ``vehicleLocations&...&t=<last_time_ms>`` per route
and threads the returned ``<lastTime time=...>`` into the next request
(``/root/reference/route.py:151-170``), keeping the offsets in an
in-memory dict (``agency.py:281-301``) that a crash wipes. This source
expresses exactly that contract as a Spark structured-streaming
DataSource:

- **Offset** = ``{route_tag: last_time_ms}`` — the reference's
  ``request_times`` dict, but JSON in the streaming checkpoint, so a
  restart resumes from the committed offset instead of refetching from
  the epoch ('0' sentinel, ``route.py:169``).
- **Micro-batch planning** (driver): ``latestOffset`` lists the spool
  directory; ``partitions(start, end)`` yields ONE InputPartition per
  route holding the files in ``(start_ms, end_ms]`` — per-route
  parallelism, the unit the reference loops over sequentially
  (``agency.py:286-301``).
- **Read** (executors): each partition parses only its own documents
  (ElementTree, same fields as ``route.py:197-204``) and emits raw
  feed rows; no driver-side row materialization ever happens.

Transport: documents arrive as files ``<route>__<time_ms>.xml`` in the
``path`` directory (a fetcher daemon owns HTTP, matching the engine's
"the driver owns fetching" stance — ``sources/feed.py`` module doc).
Swapping the file listing/read for an HTTP fetch turns this into a
direct polling source without touching the offset or partition logic.
On a cluster, ``path`` must be shared storage (the same requirement as
Spark's built-in file source).

**Fetcher contract** (the same rules every file-based Spark source
imposes):

- *Atomic publish*: write each document to a temp name (anything the
  ``<route>__<ms>.xml`` pattern does not match, e.g. ``.xml.tmp``) and
  ``rename()`` into place. A file matching the pattern is assumed
  complete; a non-atomic writer can expose a half-written file inside
  a micro-batch, which ``mode=failfast`` (default) surfaces as a task
  error and ``mode=permissive`` skips permanently (offsets advance
  past it — use permissive only for documents that are corrupt at the
  SOURCE, not as a mid-write race workaround).
- *Monotone times per route*: ``<time_ms>`` must be the server's
  ``lastTime`` for that fetch, which NextBus guarantees is monotone
  per route (``route.py:162-169``). A file landing with ``ms`` at or
  below the route's committed offset is behind the stream and is
  never read — exactly the reference's semantics, where a request at
  offset ``t`` can never return older data.

Usage::

    spark.dataSource.register(VehicleFeedDataSource)
    stream = spark.readStream.format("nextbus_feed").option("path", d).load()
    # stream has RAW_FEED_SCHEMA; feed it to streaming/ingest.transform_feed

Options: ``path`` (required), ``mode`` (failfast|permissive),
``max_docs_per_batch`` (admission control), ``purge_committed``
(delete spool files once their offsets commit — keeps the
``latestOffset`` directory listing bounded on long-running streams),
``archive_dir`` (move instead of delete; implies purge).
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

#: File name convention: <route_tag>__<time_ms>.xml (double underscore
#: so route tags containing '_' stay unambiguous).
_FILE_RE = re.compile(r"^(?P<route>.+)__(?P<ms>\d+)\.xml$")


def _scan_spool(path: str) -> dict[str, list[tuple[int, str]]]:
    """Directory listing → {route: sorted [(time_ms, abspath)]}.

    Driver-side metadata only (names, not contents) — the same cost
    class as the built-in file source's listing."""
    out: dict[str, list[tuple[int, str]]] = {}
    if not os.path.isdir(path):
        return out
    for name in os.listdir(path):
        m = _FILE_RE.match(name)
        if m:
            out.setdefault(m.group("route"), []).append(
                (int(m.group("ms")), os.path.join(path, name))
            )
    for files in out.values():
        files.sort()
    return out


class RouteBatchPartition(InputPartition):
    """One route's documents for one micro-batch."""

    def __init__(self, route: str, files: list[str]):
        self.route = route
        self.files = files


def _parse_files(
    route: str, files: Sequence[str], mode: str = "failfast"
) -> Iterator[tuple]:
    """Executor-side parse: XML documents → raw feed tuples
    (RAW_FEED_SCHEMA order). Mirrors route.py:156-204; one row per
    <vehicle>, document lastTime stamped onto every row.

    ``mode="permissive"`` skips documents that fail to parse (the
    fetcher may capture a truncated response mid-write) instead of
    failing the task; the skip is logged executor-side. Default
    ``failfast`` surfaces the error — silent data loss must be opted
    into, per the engine's quarantine stance (``sources/files.py``)."""
    import logging

    from nextbus2pg_spark.sources.feed import rows_from_xml

    for f in files:
        try:
            with open(f, encoding="utf-8") as fh:
                rows, _last = rows_from_xml(fh.read(), route)
        except Exception:
            if mode != "permissive":
                raise
            logging.getLogger(__name__).warning(
                "nextbus_feed: skipping unparseable document %s", f
            )
            continue
        yield from rows


class VehicleFeedStreamReader(DataSourceStreamReader):
    """MicroBatchStream with {route: last_time_ms} offsets.

    ``max_docs_per_batch`` is the admission-control knob (the
    maxFilesPerTrigger analogue): each micro-batch advances every
    route's offset by at most N documents, so a backfilled spool
    drains in bounded batches instead of one giant first batch.

    **The throttle must never emit an end offset behind the stream** —
    a throttled ``latestOffset`` computed against an empty in-memory
    baseline after a restart would land BELOW the checkpointed offset,
    rewinding the offset log and re-reading committed documents
    (duplicates in the append-only store). The measured PySpark call
    contract (probed against this build, both orders asserted in
    ``tests/test_feed_stream_source.py``) is:

    - restart: ``partitions(start, end)`` replaying the last planned
      batch is ALWAYS called before the first ``latestOffset`` — so
      ``partitions`` seeds the baseline from its ``start`` dict (the
      true checkpointed position) and the throttle can never regress;
    - cold start: ``latestOffset`` is called first, with nothing
      seeded — position 0 everywhere, where throttling from 0 is
      exactly right (the bounded-backfill case).

    ``commit`` additionally max-merges each batch's committed end, and
    every baseline update is monotone (max per route), so no call
    order can move an emitted offset backward.

    Pair the knob with a continuous trigger (``processingTime``):
    ``availableNow`` snapshots ``latestOffset`` ONCE as the run's end
    boundary, so a throttled offset bounds that whole run to one step
    (re-invoking the query resumes from the checkpoint — fine for
    scripted catch-up, surprising if unexpected).
    """

    def __init__(
        self,
        path: str,
        mode: str = "failfast",
        max_docs_per_batch: int | None = None,
        purge_committed: bool = False,
        archive_dir: str | None = None,
    ):
        self.path = path
        self.mode = mode
        self.max_docs_per_batch = max_docs_per_batch
        self.purge_committed = purge_committed or archive_dir is not None
        self.archive_dir = archive_dir
        self._baseline: dict[str, int] = {}
        # Positions PROVEN committed: seeded only from partitions()'s
        # start dict (a batch is planned only after its predecessor
        # fully committed) and commit()'s end. The purge floor — never
        # from latestOffset's merely-planned ends, whose files a
        # crash-replay may still need.
        self._committed: dict[str, int] = {}

    def initialOffset(self) -> dict:
        # The reference's '0' sentinel (route.py:169) generalized: an
        # empty dict means "every route starts at 0". Restarts never
        # come through here — Spark replays the checkpointed offset.
        return {}

    def _seed_baseline(self, offsets: dict) -> None:
        for route, ms in offsets.items():
            if int(ms) > self._baseline.get(route, 0):
                self._baseline[route] = int(ms)

    def _seed_committed(self, offsets: dict) -> None:
        for route, ms in offsets.items():
            if int(ms) > self._committed.get(route, 0):
                self._committed[route] = int(ms)

    def latestOffset(self) -> dict:
        # Purge here too: latestOffset ticks every trigger interval
        # even when the stream is idle, while commit() only fires when
        # the NEXT batch is planned (measured contract of this build's
        # Python source runner) — without this, an idle stream never
        # reclaims its last batches' files.
        self._purge_upto(self._committed)
        spool = _scan_spool(self.path)
        throttle = self.max_docs_per_batch
        out = dict(self._baseline)  # routes with no new files keep place
        for route, files in spool.items():
            lo = self._baseline.get(route, 0)
            newer = [ms for ms, _ in files if ms > lo]
            if newer:
                take = min(len(newer), throttle) if throttle else len(newer)
                out[route] = newer[take - 1]
        self._seed_baseline(out)
        return out

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # A restart replaying a planned-but-uncommitted batch reaches
        # here before any commit: the start dict IS the stream
        # position — seed the throttle baseline from it.
        self._seed_baseline(start)
        # Everything at-or-below start is committed (a micro-batch is
        # only planned after its predecessor fully committed), so it
        # joins the purge floor — the only committed-position signal
        # that fires under Trigger.AvailableNow, where Spark's Python
        # source fallback never calls commit() on the reader.
        self._seed_committed(start)
        self._purge_upto(self._committed)
        spool = _scan_spool(self.path)
        parts = []
        for route, end_ms in end.items():
            lo = int(start.get(route, 0))
            files = [
                p for ms, p in spool.get(route, []) if lo < ms <= int(end_ms)
            ]
            if files:
                parts.append(RouteBatchPartition(route, files))
        return parts

    def read(self, partition: RouteBatchPartition) -> Iterator[tuple]:
        return _parse_files(partition.route, partition.files, self.mode)

    def commit(self, end: dict) -> None:
        # The committed offsets re-baseline the admission-control
        # throttle. By default spool retention is the fetcher's
        # concern (files may serve replay/debugging; offsets in the
        # checkpoint already prevent reprocessing) — but an unpurged
        # spool makes every latestOffset() listing grow without bound
        # on a long-running stream, the classic file-source cliff.
        # ``purge_committed`` deletes (or ``archive_dir`` moves) files
        # at-or-below each route's committed offset: safe because a
        # committed batch can never be replayed (replays only cover
        # planned-but-uncommitted batches, whose files are above the
        # committed offset by definition).
        self._seed_baseline(end)
        self._seed_committed(end)
        self._purge_upto(self._committed)

    def _purge_upto(self, committed: dict) -> None:
        if not self.purge_committed or not committed:
            return
        if self.archive_dir:
            os.makedirs(self.archive_dir, exist_ok=True)
        spool = _scan_spool(self.path)
        for route, ms in committed.items():
            for file_ms, fpath in spool.get(route, []):
                if file_ms > int(ms):
                    break  # sorted ascending — rest are uncommitted
                try:
                    if self.archive_dir:
                        # shutil.move, not os.replace: archive storage
                        # commonly sits on a different filesystem,
                        # where a raw rename raises EXDEV.
                        import shutil

                        shutil.move(
                            fpath,
                            os.path.join(
                                self.archive_dir, os.path.basename(fpath)
                            ),
                        )
                    else:
                        os.remove(fpath)
                except FileNotFoundError:
                    pass  # already purged by a prior commit


class VehicleFeedBatchReader(DataSourceReader):
    """Batch mode: the full spool as one relation (bootstrap reads)."""

    def __init__(self, path: str, mode: str = "failfast"):
        self.path = path
        self.mode = mode

    def partitions(self) -> Sequence[InputPartition]:
        spool = _scan_spool(self.path)
        return [
            RouteBatchPartition(route, [p for _, p in files])
            for route, files in sorted(spool.items())
        ]

    def read(self, partition: RouteBatchPartition) -> Iterator[tuple]:
        return _parse_files(partition.route, partition.files, self.mode)


class VehicleFeedDataSource(DataSource):
    """``spark.read[Stream].format("nextbus_feed").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "nextbus_feed"

    def schema(self) -> str:
        # RAW_FEED_SCHEMA (sources/feed.py) as DDL — duplicated as a
        # literal because this method must not depend on a live session.
        return (
            "route_tag string, dir_tag string, vehicle_id string, "
            "lon string, lat string, secs_since_report string, "
            "predictable string, request_time_ms bigint"
        )

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("nextbus_feed requires .option('path', <dir>)")
        return path

    def _mode(self) -> str:
        mode = self.options.get("mode", "failfast").lower()
        if mode not in ("failfast", "permissive"):
            raise ValueError(f"nextbus_feed: unknown mode {mode!r}")
        return mode

    def reader(self, schema) -> VehicleFeedBatchReader:
        return VehicleFeedBatchReader(self._path(), self._mode())

    def streamReader(self, schema) -> VehicleFeedStreamReader:
        max_docs = self.options.get("max_docs_per_batch")
        purge = str(
            self.options.get("purge_committed", "false")
        ).lower() in ("true", "1", "yes")
        return VehicleFeedStreamReader(
            self._path(), self._mode(),
            int(max_docs) if max_docs else None,
            purge_committed=purge,
            archive_dir=self.options.get("archive_dir"),
        )
