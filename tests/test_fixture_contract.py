"""Fixture-contract tripwires.

The driver regenerates /root/testdata between rounds and has already changed
the physical type of ``events.ts`` once (int64 nanoseconds → timestamp[us]),
silently breaking the streaming reader while the batch path's LongType guard
kept batch queries green. These tests pin the contract from the ENGINE side:
both ts encodings must flow through the full streaming path and land in the
correct decade, and the live fixtures must be one of the two known encodings.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ds_ga1004_bigdata_project_spark.streaming import events as SE

from .conftest import SF_SMOKE

# Ten events across three hours of 2024-03-15, two event types.
_BASE = dt.datetime(2024, 3, 15, 10, 0, 0)
_ROWS = [
    (i, _BASE + dt.timedelta(minutes=17 * i), i % 3,
     "click" if i % 2 == 0 else "view", float(i) + 0.25, "{}")
    for i in range(10)
]


def _write_events(path: str, ts_unit: str) -> None:
    ids, tss, users, types, vals, props = zip(*_ROWS)
    if ts_unit == "us":
        ts_arr = pa.array(list(tss), type=pa.timestamp("us"))
    elif ts_unit == "ns-int64":
        ts_arr = pa.array(
            [int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) * 1000
             for t in tss],
            type=pa.int64())
    else:
        raise ValueError(ts_unit)
    table = pa.table({
        "event_id": pa.array(ids, type=pa.int64()),
        "ts": ts_arr,
        "user_id": pa.array(users, type=pa.int64()),
        "event_type": pa.array(types, type=pa.string()),
        "value": pa.array(vals, type=pa.float64()),
        "props": pa.array(props, type=pa.string()),
    })
    pq.write_table(table, path)


@pytest.mark.parametrize("ts_unit", ["us", "ns-int64"])
def test_stream_reader_handles_both_ts_encodings(spark, tmp_path, ts_unit):
    """End-to-end: readStream → hourly windows → memory sink on a synthetic
    events file in each historical ts encoding. A unit mix-up lands every
    window in 1970 (µs read as ns) or ~2262+ (ns read as µs); the window
    year must be 2024."""
    path = str(tmp_path / f"events_{ts_unit}.parquet")
    _write_events(path, ts_unit)

    stream = SE.read_event_stream_auto(spark, path)
    name = f"tripwire_{ts_unit.replace('-', '_')}"
    SE.run_available_now(SE.hourly_counts(stream), name)
    rows = spark.table(name).collect()

    assert len(rows) > 0
    years = {r["window_start"].year for r in rows}
    assert years == {2024}, f"ts-unit regression: window years {years}"
    # totals survive the trip intact
    assert sum(r["n_events"] for r in rows) == len(_ROWS)


def test_live_fixture_ts_encoding_is_known(spark):
    """The live events fixture must load as either timestamp or int64 under
    the legacy conf — anything else (e.g. a future string or ms encoding) is
    a new contract the reader hasn't been taught. Fails loudly at the first
    pytest run of a round instead of as a silent driver FAIL."""
    from pyspark.sql.types import LongType, TimestampType, TimestampNTZType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_type = (spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
               .schema["ts"].dataType)
    assert isinstance(ts_type, (LongType, TimestampType, TimestampNTZType)), (
        f"events.ts loads as {ts_type}; read_event_stream_auto and "
        f"sources/catalog.py only handle int64-nanos and timestamp")

    # And the stream reader agrees with the batch reader on the live file.
    stream = SE.read_event_stream_auto(
        spark, os.path.join(SF_SMOKE, "events.parquet"))
    assert stream.isStreaming
    assert stream.schema["ts"].dataType.typeName().startswith("timestamp")
