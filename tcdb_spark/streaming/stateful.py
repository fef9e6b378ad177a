"""Custom stateful streaming operator (SURVEY.md §2.10): the
invest/named-storm lifecycle as a keyed state machine.

The reference tracks storm state across cron ticks implicitly — via DB
reads (status Active/Archive sweeps, tcdb/pipeline/routines.py:14-31) and
the invest->named transition (tcdb/etl/process_storms.py:63-168). The
Structured-Streaming-native form is ``applyInPandasWithState`` keyed by
the storm natural key: per micro-batch the handler folds new observations
into (last_seen, peak_intensity, status, was_invest) state, emits a
transition row whenever the lifecycle changes, and a GroupStateTimeout
archives storms that stop reporting.

This is the documented Pandas-UDF slow path — used precisely where
built-in operators cannot express cross-batch keyed state.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

OUTPUT_SCHEMA = (
    "nhc_id string, event string, at timestamp, intensity_kts double, "
    "was_invest boolean"
)
STATE_SCHEMA = (
    "last_seen long, peak double, status string, was_invest boolean"
)

INVEST_MIN = 90
ARCHIVE_AFTER_H = 24


def lifecycle_fn(
    key: tuple[str], pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """Fold observation micro-batches into per-storm lifecycle state and
    emit transition events: genesis, invest_upgraded, intensified (new
    peak in a >=10 kt step), archived (timeout)."""
    (nhc_id,) = key

    if state.hasTimedOut:
        last_seen, peak, status, was_invest = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "nhc_id": [nhc_id],
                "event": ["archived"],
                "at": [pd.Timestamp(last_seen, unit="s")],
                "intensity_kts": [peak],
                "was_invest": [was_invest],
            }
        )
        return

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values("datetime_utc")
    if state.exists:
        last_seen, peak, status, was_invest = state.get
    else:
        last_seen, peak, status, was_invest = 0, 0.0, "new", None

    events: list[tuple[str, pd.Timestamp, float]] = []
    for _, r in rows.iterrows():
        ts = r["datetime_utc"]
        nhc_number = int(r["nhc_number"])
        wind = float(r["intensity_kts"]) if pd.notna(r["intensity_kts"]) else 0.0
        is_invest = nhc_number >= INVEST_MIN
        if status == "new":
            events.append(("genesis", ts, wind))
            status = "active"
            was_invest = is_invest
        elif was_invest and not is_invest:
            events.append(("invest_upgraded", ts, wind))
            was_invest = False
        if wind >= peak + 10.0 and peak > 0:
            events.append(("intensified", ts, wind))
        peak = max(peak, wind)
        last_seen = max(last_seen, int(ts.timestamp()))

    state.update((last_seen, peak, status, bool(was_invest)))
    state.setTimeoutDuration(ARCHIVE_AFTER_H * 3600 * 1000)

    if events:
        yield pd.DataFrame(
            {
                "nhc_id": [nhc_id] * len(events),
                "event": [n for n, _, _ in events],
                "at": [t for _, t, _ in events],
                "intensity_kts": [w for _, _, w in events],
                "was_invest": [bool(was_invest)] * len(events),
            }
        )


def storm_lifecycle_stream(observations, timeout: str = "ProcessingTimeTimeout"):
    """Wire the state machine over a (streaming or batch-test) frame with
    columns (nhc_id, nhc_number, datetime_utc, intensity_kts)."""
    return observations.groupBy("nhc_id").applyInPandasWithState(
        lifecycle_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 successor API to
# applyInPandasWithState): same keyed-state concept, but state is typed
# and composable (ValueState/ListState/MapState + TTL + timers) and the
# processor is an object with a lifecycle instead of a closure. Kept
# alongside the lifecycle machine above so both §2.10 stateful surfaces
# are covered; requires the RocksDB state store provider (bundled).
# ---------------------------------------------------------------------------

RUNNING_OUTPUT_SCHEMA = "nhc_id string, n_obs long, peak double"


def _make_running_peak_processor():
    """Processor built lazily: the stateful_processor module exists only
    on Spark 4+, and building it at import time would couple module
    import to the streaming runtime."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    class RunningPeakProcessor(StatefulProcessor):
        """Per-storm running (observation count, peak intensity) across
        micro-batches — the transformWithState twin of the reference's
        cumulative peak scan (tcdb/etl/process_obs.py intensity drift
        checks), emitting the refreshed aggregate for every key a batch
        touches (Update mode)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = StructType(
                [
                    StructField("n", LongType()),
                    StructField("peak", DoubleType()),
                ]
            )
            self._agg = handle.getValueState("agg", schema)

        def handleInputRows(self, key, rows, timerValues):
            n, peak = (0, float("-inf"))
            if self._agg.exists():
                n, peak = self._agg.get()
            for pdf in rows:
                n += len(pdf)
                peak = max(peak, float(pdf["intensity_kts"].max()))
            self._agg.update((n, peak))
            yield pd.DataFrame({"nhc_id": [key[0]], "n_obs": [n], "peak": [peak]})

        def close(self) -> None:
            pass

    return RunningPeakProcessor()


def transform_with_state_available() -> bool:
    """transformWithState's Python<->JVM state server speaks protobuf;
    the API exists in pyspark 4.1 but running it needs the
    ``google.protobuf`` runtime.  Since round 8 that runtime is
    satisfied even without the protobuf package: a minimal pure-stdlib
    wire-format shim is vendored under tcdb_spark/_vendor/protobuf_shim
    (JVM-conformance-pinned in tests/test_proto_shim.py) and activated
    by proto_compat.ensure_protobuf() — get_spark() does this before
    the JVM launches so worker processes inherit it via PYTHONPATH."""
    from tcdb_spark.streaming.proto_compat import ensure_protobuf

    return ensure_protobuf() != "absent"


def running_peak_stream(observations):
    """transformWithStateInPandas running aggregate keyed by storm id.

    ``observations``: streaming frame with (nhc_id, intensity_kts, ...).
    Output: one (nhc_id, n_obs, peak) row per touched key per batch.
    The caller's session must use the RocksDB state store provider
    (transformWithState's backing store):

        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    The state-server wire format is protobuf; without the real package
    the vendored shim runtime satisfies it (proto_compat, r8 — JVM
    conformance-pinned in tests/test_proto_shim.py).  Only when BOTH
    are unavailable (vendor tree stripped from the install) does this
    raise — the applyInPandasWithState lifecycle machine above runs
    everywhere and remains the default §2.10 path.
    """
    if not transform_with_state_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs a google.protobuf runtime "
            "for its state-server protocol: neither the real package nor "
            "the vendored shim (tcdb_spark/_vendor/protobuf_shim) is "
            "available. Use storm_lifecycle_stream "
            "(applyInPandasWithState) or install protobuf."
        )
    return observations.groupBy("nhc_id").transformWithStateInPandas(
        statefulProcessor=_make_running_peak_processor(),
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Timer-based silence monitor: the transformWithState capability the
# applyInPandasWithState machine above approximates with
# GroupStateTimeout but cannot express precisely — PER-KEY EVENT-TIME
# timers that fire off the watermark, independently of new input for
# the key, with explicit re-arm / disarm.  Exercises the full timer
# protocol family of the state server (RegisterTimer / DeleteTimer /
# ListTimers / ExpiryTimerRequest) end-to-end through the vendored
# protobuf shim.  Event time, not processing time: a feed gap is a gap
# in OBSERVATION timestamps (a replayed/backfilled stream must alarm
# identically), and processing-time timers are untestable besides —
# Trigger.AvailableNow appends a drain batch after the data batches, so
# any wall-clock deadline short enough to test fires during the
# drain (measured r8: both keys alarmed inside tick 1).
# ---------------------------------------------------------------------------

SILENCE_OUTPUT_SCHEMA = "nhc_id string, event string, last_seen timestamp, peak double"


def _make_silence_monitor_processor(silence_ms: int):
    """Built lazily, like _make_running_peak_processor (Spark 4-only
    imports stay out of module import)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    class SilenceMonitorProcessor(StatefulProcessor):
        """Emit one ``went_silent`` row for a storm whose observation
        stream has a gap longer than ``silence_ms`` of EVENT time — the
        operational "has this feed died" alarm (reference analogue: the
        Active/Archive status sweep, tcdb/pipeline/routines.py:14-31,
        which detects silence only when the next cron tick happens to
        scan; a timer fires without any scan).  One live timer per key,
        armed at last_seen + silence: every batch that touches the key
        disarms the stale deadline and re-arms from the new last_seen,
        so a storm that keeps reporting never fires — ordering is safe
        because transformWithState processes a batch's input rows
        BEFORE its expired timers, so the re-arm wins.  The timer fires
        once the WATERMARK passes the deadline; alarmed state is
        cleared, so a later observation reads as a fresh feed."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            schema = StructType(
                [
                    StructField("last_seen_ms", LongType()),
                    StructField("peak", DoubleType()),
                ]
            )
            self._seen = handle.getValueState("seen", schema)

        def handleInputRows(self, key, rows, timerValues):
            last_ms, peak = (0, float("-inf"))
            if self._seen.exists():
                last_ms, peak = self._seen.get()
            for pdf in rows:
                peak = max(peak, float(pdf["intensity_kts"].max()))
                batch_max = pd.to_datetime(pdf["datetime_utc"].max())
                last_ms = max(last_ms, int(batch_max.timestamp() * 1000))
            self._seen.update((last_ms, peak))
            for stale in self._handle.listTimers():
                self._handle.deleteTimer(stale)
            self._handle.registerTimer(last_ms + silence_ms)
            return iter(())  # silence-only operator: no per-batch rows

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._seen.exists():
                last_ms, peak = self._seen.get()
                self._seen.clear()
                yield pd.DataFrame(
                    {
                        "nhc_id": [key[0]],
                        "event": ["went_silent"],
                        "last_seen": [pd.Timestamp(last_ms, unit="ms")],
                        "peak": [peak],
                    }
                )

        def close(self) -> None:
            pass

    return SilenceMonitorProcessor()


def storm_silence_stream(
    observations,
    silence_ms: int = 6 * 3600 * 1000,
    ts_col: str = "datetime_utc",
    watermark_delay: str = "0 seconds",
):
    """transformWithStateInPandas silence alarm keyed by storm id: one
    ``went_silent`` row when the stream's watermark passes a key's
    last observation time + ``silence_ms`` with no new data for it.
    Same session requirements as running_peak_stream (RocksDB state
    store + a protobuf runtime); event-time timers additionally need
    the watermark this function applies on ``ts_col``."""
    if not transform_with_state_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs a google.protobuf runtime "
            "for its state-server protocol: neither the real package nor "
            "the vendored shim (tcdb_spark/_vendor/protobuf_shim) is "
            "available. Use storm_lifecycle_stream "
            "(applyInPandasWithState, GroupStateTimeout) instead."
        )
    return (
        observations.withWatermark(ts_col, watermark_delay)
        .groupBy("nhc_id")
        .transformWithStateInPandas(
            statefulProcessor=_make_silence_monitor_processor(silence_ms),
            outputStructType=SILENCE_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
