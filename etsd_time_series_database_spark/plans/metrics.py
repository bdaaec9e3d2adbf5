"""Per-query metrics + error accounting (reference O29).

The reference keeps a bitmask-coded error log and per-channel validity
words (code/errorlog.c:51-183); its operational questions are "what did
this query touch, did it spill, did it fail". Spark already measures
all of that in SQLMetrics on every physical operator — this module
walks the executed plan (through AQE and query-stage wrappers), folds
the operator metrics into one flat row per query, and appends it to a
small log table. Failures are recorded too (error class + message),
so the log doubles as the error subsystem.

Driver-side by design: the walk happens once per query over the plan
tree (tens of nodes), not over data — zero cost at 100 TB.
"""

from __future__ import annotations

import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryMetrics:
    query: str
    status: str  # ok | error
    wall_ms: float
    output_rows: int = 0
    scan_rows: int = 0
    scan_files: int = 0
    scan_bytes: int = 0
    shuffle_bytes: int = 0
    shuffle_records: int = 0
    spill_bytes: int = 0
    peak_memory: int = 0
    # streaming only: state rows dropped as too-late (the O28
    # short-block count, reference code/etsdSave.c:58-66) — see
    # fold_streaming_progress for the exact unit (post-aggregation
    # groups, not raw input rows)
    late_rows: int = 0
    error: str | None = None
    logged_at_us: int = field(default_factory=lambda: int(time.time() * 1_000_000))


def _walk(jvm, node, visit) -> None:
    visit(node)
    cls = node.getClass().getName()
    # AQE wrappers hide the materialized plan behind accessors
    if "AdaptiveSparkPlanExec" in cls:
        _walk(jvm, node.executedPlan(), visit)
        return
    if "QueryStageExec" in cls:
        _walk(jvm, node.plan(), visit)
        return
    for child in jvm.scala.collection.JavaConverters.seqAsJavaList(node.children()):
        _walk(jvm, child, visit)


def collect_plan_metrics(df: DataFrame) -> dict[str, int]:
    """Fold the executed plan's SQLMetrics into flat totals. Call AFTER
    an action has run (metrics are task-populated)."""
    spark = df.sparkSession
    jvm = spark._jvm
    plan = df._jdf.queryExecution().executedPlan()
    totals = {
        "output_rows": 0,
        "scan_rows": 0,
        "scan_files": 0,
        "scan_bytes": 0,
        "shuffle_bytes": 0,
        "shuffle_records": 0,
        "spill_bytes": 0,
        "peak_memory": 0,
    }
    seen_top_rows = [False]

    def visit(node):
        name = str(node.nodeName())
        jmap = jvm.scala.collection.JavaConverters.mapAsJavaMap(node.metrics())
        mets = {}
        for k in jmap.keySet().toArray():
            try:
                mets[str(k)] = int(jmap.get(k).value())
            except Exception:
                pass
        if not seen_top_rows[0] and "numOutputRows" in mets:
            totals["output_rows"] = mets["numOutputRows"]
            seen_top_rows[0] = True
        if name.startswith("Scan"):
            totals["scan_rows"] += mets.get("numOutputRows", 0)
            totals["scan_files"] += mets.get("numFiles", 0)
            totals["scan_bytes"] += mets.get("filesSize", 0)
        totals["shuffle_bytes"] += mets.get("shuffleBytesWritten", 0)
        totals["shuffle_records"] += mets.get("shuffleRecordsWritten", 0)
        totals["spill_bytes"] += mets.get("spillSize", 0)
        totals["peak_memory"] = max(totals["peak_memory"], mets.get("peakMemory", 0))

    _walk(jvm, plan, visit)
    return totals


LOG_SCHEMA = (
    "query string, status string, wall_ms double, output_rows bigint, "
    "scan_rows bigint, scan_files bigint, scan_bytes bigint, "
    "shuffle_bytes bigint, shuffle_records bigint, spill_bytes bigint, "
    "peak_memory bigint, late_rows bigint, error string, logged_at_us bigint"
)


def fold_streaming_progress(query) -> dict[str, int]:
    """Fold a StreamingQuery's ``recentProgress`` into flat totals —
    the streaming counterpart of :func:`collect_plan_metrics`, and the
    operational surface for the reference's per-block validity
    accounting (O28, code/etsdSave.c:58-66): ``late_rows`` is the sum
    of every state operator's ``numRowsDroppedByWatermark``.

    UNIT CAVEAT (empirically pinned by the s17 catalog entry + its
    DuckDB oracle): the drop counter sits at the STATE operator, which
    for windowed aggregation runs after partial aggregation — so for
    aggregations it counts dropped **(key, window) groups per
    micro-batch**, not raw late input rows. Deterministic for a fixed
    file→micro-batch assignment (a group dropped in two batches counts
    twice), zero for stateful ops that never evict by watermark.

    Driver-side over the retained progress list (default last 100
    micro-batches — spark.sql.streaming.numRecentProgressUpdates); for
    availableNow catch-up runs that is the complete history. Long-lived
    --follow monitors should fold incrementally per progress instead.
    """
    import json as _json

    totals = _empty_stream_totals()
    for p in query.recentProgress:
        d = _json.loads(p.json) if hasattr(p, "json") else p
        _fold_progress_dict(d, totals)
    return totals


def _empty_stream_totals() -> dict[str, int]:
    return {
        "input_rows": 0,
        "output_rows": 0,
        "late_rows": 0,
        "state_rows": 0,
        "n_batches": 0,
    }


def _fold_progress_dict(d: dict, totals: dict[str, int]) -> None:
    totals["n_batches"] += 1
    totals["input_rows"] += int(d.get("numInputRows") or 0)
    sink = d.get("sink") or {}
    out = sink.get("numOutputRows")
    if out is not None and int(out) >= 0:
        totals["output_rows"] += int(out)
    state = d.get("stateOperators") or []
    for so in state:
        totals["late_rows"] += int(so.get("numRowsDroppedByWatermark") or 0)
    if state:
        totals["state_rows"] = sum(
            int(so.get("numRowsTotal") or 0) for so in state
        )


class ProgressAccumulator:
    """EXACT streaming totals, immune to the ``recentProgress``
    retention cap: a :class:`StreamingQueryListener` that folds every
    progress event as it arrives, so a catch-up run of >100
    micro-batches (or a --follow daemon running for days) reports the
    true ``input_rows``/``late_rows``, where
    :func:`fold_streaming_progress` silently undercounts once the
    retained list (spark.sql.streaming.numRecentProgressUpdates,
    default 100) rolls over.

    Per-run accounting keyed by ``runId``; each ``batchId`` is folded
    once (first event wins — idle re-emissions and batch retries do
    not double-count). Events arrive on the listener bus thread, so
    folds take a lock; totals are read AFTER the query terminates —
    :meth:`wait_terminated` blocks until the run's terminate event has
    been delivered, which orders it after every progress event of that
    run. Register with ``spark.streams.addListener(acc.listener)`` and
    remove with ``removeListener`` when done (listeners are
    session-global)."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._runs: dict[str, dict[str, int]] = {}
        self._seen: dict[str, set] = {}
        self._terminated: dict[str, object] = {}
        self._cv = threading.Condition(self._lock)

        from pyspark.sql.streaming import StreamingQueryListener

        acc = self

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                import json as _json

                try:
                    d = _json.loads(event.progress.json)
                except Exception:
                    return
                run = str(d.get("runId"))
                batch = d.get("batchId")
                with acc._cv:
                    seen = acc._seen.setdefault(run, set())
                    if batch in seen:
                        return
                    seen.add(batch)
                    totals = acc._runs.setdefault(
                        run, _empty_stream_totals()
                    )
                    _fold_progress_dict(d, totals)

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                run = str(event.runId)
                with acc._cv:
                    acc._terminated[run] = event
                    acc._cv.notify_all()

        self.listener = _Listener()

    def totals(self, query) -> dict[str, int]:
        """The folded totals for ``query``'s current run (empty totals
        if no progress was seen)."""
        run = str(query.runId)
        with self._cv:
            return dict(self._runs.get(run) or _empty_stream_totals())

    def wait_terminated(self, query, timeout_s: float = 30.0) -> bool:
        """Block until the terminate event for ``query``'s run arrives
        (ordering the listener behind all of that run's progress
        events). True if it arrived within ``timeout_s``."""
        run = str(query.runId)
        import time as _time

        deadline = _time.monotonic() + timeout_s
        with self._cv:
            while run not in self._terminated:
                left = deadline - _time.monotonic()
                if left <= 0:
                    return False
                self._cv.wait(left)
            return True


class MetricsLog:
    """Accumulates one QueryMetrics row per recorded query; materialize
    with :meth:`to_df`, persist with :meth:`flush` (appends parquet —
    at scale this is the tiny ops table, one row per query, that the
    reference's error log file plays)."""

    def __init__(self, spark: SparkSession, path: str | None = None):
        self.spark = spark
        self.path = path
        self.rows: list[QueryMetrics] = []

    def record(self, name: str, df: DataFrame) -> QueryMetrics:
        """Run ``df`` and fold its plan metrics into one log row. A
        failing query logs status='error' with the exception class +
        message (the error-bitmask analog) and re-raises.

        The action is ``df.collect()`` on df's OWN QueryExecution —
        a derived action like ``df.count()`` builds a different plan
        whose metrics would not attach here. Record aggregate/limited
        queries (the catalog shape); don't point this at an unbounded
        raw scan.
        """
        t0 = time.monotonic()
        try:
            df.collect()
        except Exception as exc:  # noqa: BLE001 — log-and-rethrow
            row = QueryMetrics(
                query=name,
                status="error",
                wall_ms=(time.monotonic() - t0) * 1000.0,
                error=f"{type(exc).__name__}: {str(exc)[:500]}",
            )
            self.rows.append(row)
            raise
        totals = collect_plan_metrics(df)
        row = QueryMetrics(
            query=name,
            status="ok",
            wall_ms=(time.monotonic() - t0) * 1000.0,
            **totals,
        )
        self.rows.append(row)
        return row

    def record_streaming(
        self, name: str, query, wall_ms: float = 0.0,
        totals: dict[str, int] | None = None,
    ) -> QueryMetrics:
        """Fold a finished (or caught-up) StreamingQuery's progress into
        one log row — the streaming counterpart of :meth:`record`.
        ``late_rows`` carries the watermark-drop count (see
        :func:`fold_streaming_progress` for the unit), making data loss
        under lateness VISIBLE in the same ops table batch queries log
        to — the reference logs the equivalent short-block validity per
        committed block (code/etsdSave.c:58-66). Pass ``totals`` from a
        :class:`ProgressAccumulator` to log exact counts past the
        recentProgress retention cap; the default refold undercounts a
        run of >100 micro-batches."""
        if totals is None:
            totals = fold_streaming_progress(query)
        row = QueryMetrics(
            query=name,
            status="ok",
            wall_ms=wall_ms,
            output_rows=totals["output_rows"],
            scan_rows=totals["input_rows"],
            late_rows=totals["late_rows"],
        )
        self.rows.append(row)
        return row

    def to_df(self) -> DataFrame:
        if not self.rows:
            return self.spark.createDataFrame([], LOG_SCHEMA)
        return self.spark.createDataFrame(
            [tuple(asdict(r).values()) for r in self.rows], schema=LOG_SCHEMA
        )

    def flush(self) -> None:
        if self.path is None:
            raise ValueError("MetricsLog created without a path")
        if self.rows:
            self.to_df().write.mode("append").parquet(self.path)
            self.rows = []

    @staticmethod
    def read(spark: SparkSession, path: str) -> DataFrame:
        """Read an ops-log directory under the PINNED current schema.
        The log appends over rounds, so a directory can mix files
        written before a column existed (late_rows landed in round 11);
        a plain ``spark.read.parquet`` would pick one file's footer and
        silently drop or fail on the difference. The explicit schema
        makes old files surface the missing columns as NULL — always
        consume the ops table through here."""
        return spark.read.schema(LOG_SCHEMA).parquet(path)
