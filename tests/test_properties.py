"""Property-based tests (hypothesis): invariants the oracle gate can't
express — cross-engine hash portability on arbitrary inputs, and
sessionization structure on generated event sets."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from big_data_training_spark.functions.hashing import sql_hash60

# printable-ish strings incl. unicode, excluding the empty string
_strings = st.text(min_size=1, max_size=40).filter(lambda s: "\x00" not in s)


@settings(max_examples=20, deadline=None)
@given(st.lists(_strings, min_size=1, max_size=8, unique=True))
def test_hash60_portable_across_engines(spark, strings):
    """hash60 (md5-hex→int) must agree bit-for-bit between Spark and
    DuckDB for arbitrary unicode strings — the foundation every sketch
    oracle (MinHash/SimHash/f6) stands on."""
    sdf = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {
        r.s: r.h
        for r in sdf.select(
            "s",
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("bigint").alias("h"),
        ).collect()
    }
    con = duckdb.connect()
    for s in strings:
        (want,) = con.execute(f"SELECT {sql_hash60('?')}", [s]).fetchone()
        assert got[s] == want, (s, got[s], want)
    con.close()


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100_000)),
        min_size=1,
        max_size=60,
    )
)
def test_sessionization_invariants(spark, events):
    """For any event set: sessions partition the events per key; within a
    session consecutive gaps < threshold; between consecutive sessions of
    one key the gap >= threshold."""
    from big_data_training_spark.operators.analytics import SESSION_GAP_S

    pdf = pd.DataFrame(events, columns=["user_id", "off_s"])
    pdf["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(pdf["off_s"], unit="s")
    pdf["event_id"] = range(len(pdf))
    sdf = spark.createDataFrame(pdf[["user_id", "ts", "event_id"]])
    sdf = sdf.withColumn("value", F.lit(1.0))

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_s = F.when(gap.isNull() | (gap >= SESSION_GAP_S), 1).otherwise(0)
    sess = (
        sdf.withColumn("new_s", new_s)
        .withColumn(
            "session_id",
            F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("start"),
            F.max("ts").alias("end"),
            F.count("*").alias("n"),
        )
        .toPandas()
    )
    # partition: session sizes sum to event count
    assert sess["n"].sum() == len(pdf)
    for uid, g in sess.groupby("user_id"):
        g = g.sort_values("start")
        # sessions don't overlap and consecutive sessions are >= gap apart
        prev_end = None
        for _, row in g.iterrows():
            assert row["start"] <= row["end"]
            if prev_end is not None:
                assert (row["start"] - prev_end).total_seconds() >= SESSION_GAP_S
            prev_end = row["end"]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),
            # 2-decimal values like the fixtures — the class that lands
            # on exact x.xxxx5 half boundaries after sum/count
            st.integers(1, 50_000).map(lambda c: c / 100.0),
        ),
        min_size=1,
        max_size=64,
    )
)
def test_decimal_rounding_helpers_match_oracle(spark, groups):
    """dsum/davg must match their DuckDB twins bit-for-bit on arbitrary
    2-decimal inputs — including sums/averages landing exactly on round()
    half boundaries, where naive double rounding diverges by engine."""
    import pandas as pd

    from big_data_training_spark.functions.numeric import (
        davg,
        dsum,
        sql_davg,
        sql_dsum,
    )

    pdf = pd.DataFrame(groups, columns=["k", "v"])
    sdf = spark.createDataFrame(pdf)
    got = {
        (r.k, r.s, r.a)
        for r in sdf.groupBy("k").agg(dsum("v", "s"), davg("v", "a")).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        tuple(r)
        for r in con.execute(
            f"SELECT k, {sql_dsum('v', 's')}, {sql_davg('v', 'a')} FROM t GROUP BY k"
        ).fetchall()
    }
    con.close()
    assert got == want
