from __future__ import annotations

import datetime as dt

from mms_rdf_spark.operators.temporal import ohlc_bars, time_weighted_avg


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")


def test_twap_weights_by_holding_time(spark):
    ev = _ev(spark, [
        (1, 1, _ts(0), 10.0),   # held 60s
        (2, 1, _ts(1), 20.0),   # held 180s
        (3, 1, _ts(4), 99.0),   # last: dropped
    ])
    row = time_weighted_avg(ev).collect()[0]
    # (10*60 + 20*180) / 240 = 17.5
    assert row["twap"] == 17.5 and row["total_s"] == 240


def test_twap_single_event_key_absent(spark):
    ev = _ev(spark, [(1, 1, _ts(0), 10.0)])
    assert time_weighted_avg(ev).count() == 0


def test_ohlc_open_close_by_time_and_tiebreak(spark):
    ev = _ev(spark, [
        (2, 1, _ts(0), 5.0),    # same ts as #1: event_id breaks tie
        (1, 1, _ts(0), 3.0),    # open (smaller event_id)
        (3, 1, _ts(5), 9.0),    # high
        (4, 1, _ts(9), 1.0),    # low + close
    ])
    row = ohlc_bars(ev).collect()[0]
    assert (row["open"], row["high"], row["low"], row["close"],
            row["n"]) == (3.0, 9.0, 1.0, 1.0, 4)


def test_ohlc_buckets_split_days(spark):
    ev = _ev(spark, [(1, 1, dt.datetime(2024, 1, 1, 23), 1.0),
                     (2, 1, dt.datetime(2024, 1, 2, 1), 2.0)])
    got = {r["bucket_s"]: r["n"] for r in ohlc_bars(ev).collect()}
    assert len(got) == 2 and all(v == 1 for v in got.values())
