import datetime as dt

from parallel_betweenness_centrality_using_bsp_spark.streaming.events import (
    EVENTS_SCHEMA,
    run_windowed_counts_once,
    windowed_event_counts,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def _rows():
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    out = []
    for i in range(20):
        out.append(
            (i, t0 + dt.timedelta(minutes=10 * i), i % 5, "click" if i % 2 else "view", float(i), "{}")
        )
    return out


def test_batch_window_counts(spark):
    df = _events(spark, _rows())
    got = {
        (r["window_start"].hour, r["event_type"]): r["n_events"]
        for r in windowed_event_counts(df, "1 hour").collect()
    }
    # minutes 0..50 land in hour 0: events 0..5 → 3 view (0,2,4), 3 click (1,3,5)
    assert got[(0, "view")] == 3 and got[(0, "click")] == 3


def test_stream_available_now_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    df = _events(spark, _rows())
    df.write.parquet(src)

    run_windowed_counts_once(spark, src, sink, ckpt, "1 hour")
    got = spark.read.parquet(sink)
    want = windowed_event_counts(df, "1 hour")
    key = lambda r: (r["window_start"], r["event_type"])
    gw = {key(r): (r["n_events"], r["sum_value"]) for r in got.collect()}
    ww = {key(r): (r["n_events"], r["sum_value"]) for r in want.collect()}
    # append mode emits only watermark-closed windows: a strict, correct subset
    assert 0 < len(gw) < len(ww)
    assert all(ww[k] == v for k, v in gw.items())

    # exactly-once: a second availableNow pass with no new files adds nothing
    run_windowed_counts_once(spark, src, sink, ckpt, "1 hour")
    assert spark.read.parquet(sink).count() == len(gw)

    # incremental: append later events -> watermark advances, more windows close
    df2 = _events(
        spark,
        [(100, dt.datetime(2026, 1, 1, 9, 0, 0), 1, "view", 1.0, "{}")],
    )
    df2.write.mode("append").parquet(src)
    run_windowed_counts_once(spark, src, sink, ckpt, "1 hour")
    gw2 = {key(r): (r["n_events"], r["sum_value"]) for r in spark.read.parquet(sink).collect()}
    assert len(gw2) == len(ww)  # all original windows now closed and emitted
    assert all(gw2[k] == v for k, v in ww.items())
