"""CDC net-effect coalescing and storage-encoding estimation.

**Net-effect coalescing** (Delta CDF's "net changes", Debezium's
tombstone folding): a changelog window may contain insert→update→
delete chains per key; a downstream MERGE only needs the NET effect of
the window — one of inserted / updated / deleted / cancelled per key —
computed from the key's state at the window edges, not from replaying
every row. Conventions match the compaction family (operators/
compaction.py): 'error' is the tombstone marker, latest-wins order is
(ts, event_id). One window pass per key; the output is bounded by
|keys in window|, which is what makes per-window MERGE cheap even
when the raw changelog is huge.

**Delta-encoding estimate**: for each candidate column, compare the
bit width of raw values against the bit width of successive deltas in
ingest order — the decision parquet's DELTA_BINARY_PACKED encoder
makes, surfaced as a query over data the way an encoding advisor
would. Uses the binary-digit-count idiom (length(bin(x))), windows in
file order, all integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

NET_LO = "2024-01-10"
NET_HI = "2024-01-20"  # half-open changelog window [LO, HI)
TOMBSTONE = "error"


@register(
    "cdc_net_effect",
    f"""
    WITH before AS (
        SELECT user_id,
               CASE WHEN event_type <> '{TOMBSTONE}' THEN 1 ELSE 0 END
                   AS existed
        FROM (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC)
                       AS rn
            FROM events WHERE ts < TIMESTAMP '{NET_LO}'
        ) WHERE rn = 1
    ), win AS (
        SELECT user_id, event_type AS last_type, cnt AS n_changes
        FROM (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC)
                       AS rn,
                   count(*) OVER (PARTITION BY user_id) AS cnt
            FROM events
            WHERE ts >= TIMESTAMP '{NET_LO}'
              AND ts < TIMESTAMP '{NET_HI}'
        ) WHERE rn = 1
    ), classified AS (
        SELECT w.user_id, w.n_changes,
               CASE
                   WHEN coalesce(b.existed, 0) = 0
                        AND w.last_type <> '{TOMBSTONE}' THEN 'inserted'
                   WHEN coalesce(b.existed, 0) = 0 THEN 'cancelled'
                   WHEN w.last_type = '{TOMBSTONE}' THEN 'deleted'
                   ELSE 'updated'
               END AS net_op
        FROM win w LEFT JOIN before b ON b.user_id = w.user_id
    )
    SELECT net_op,
           count(*) AS n_keys,
           CAST(sum(n_changes) AS BIGINT) AS n_raw_changes,
           CAST(sum(n_changes) AS BIGINT) // count(*)
               AS coalesce_factor_floor
    FROM classified
    GROUP BY 1
    ORDER BY 1
    """,
    doc=f"CDC net-effect coalescing over [{NET_LO}, {NET_HI}): per-key"
    " insert/update/delete/cancel classification from window-edge"
    " states, with the raw-changes-per-key coalescing factor",
)
def cdc_net_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What a MERGE actually needs from a changelog window: per key,
    did the window NET to an insert (absent before, live after), an
    update (live→live), a delete (live→tombstone), or a cancel
    (absent→tombstone — the insert+delete chain a naive consumer
    would replay as two operations)? State at the edges is
    latest-wins via one rank window per edge (the compaction family's
    (ts, event_id) order) — no per-row replay — and the coalescing factor (raw
    change rows per net operation) is the write amplification the
    coalescing saves downstream. Tombstone and ordering conventions
    are the compaction family's (c1/c2)."""
    events = load_table(spark, sf_dir, "events")
    wlatest = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    before = (
        events.filter(F.col("ts") < NET_LO)
        .withColumn("rn", F.row_number().over(wlatest))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            (F.col("event_type") != TOMBSTONE).cast("int").alias("existed"),
        )
    )
    win = (
        events.filter((F.col("ts") >= NET_LO) & (F.col("ts") < NET_HI))
        .withColumn("rn", F.row_number().over(wlatest))
        .withColumn(
            "cnt", F.count("*").over(Window.partitionBy("user_id"))
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.col("cnt").alias("n_changes"),
        )
    )
    classified = win.join(before, "user_id", "left").selectExpr(
        "n_changes",
        f"""CASE
            WHEN coalesce(existed, 0) = 0
                 AND last_type <> '{TOMBSTONE}' THEN 'inserted'
            WHEN coalesce(existed, 0) = 0 THEN 'cancelled'
            WHEN last_type = '{TOMBSTONE}' THEN 'deleted'
            ELSE 'updated'
        END AS net_op""",
    )
    return (
        classified.groupBy("net_op")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("n_changes").cast("bigint").alias("n_raw_changes"),
        )
        .selectExpr(
            "net_op",
            "n_keys",
            "n_raw_changes",
            "n_raw_changes div n_keys AS coalesce_factor_floor",
        )
        .orderBy("net_op")
    )


_DELTA_COLS = ("l_orderkey", "l_partkey", "l_suppkey")


def _delta_oracle() -> str:
    legs = []
    for c in _DELTA_COLS:
        legs.append(f"""
        SELECT '{c}' AS column_name,
               CAST(sum(length(bin(greatest(v, 1)))) AS BIGINT)
                   AS raw_bits,
               CAST(sum(length(bin(greatest(abs(d), 1))) + 1) AS BIGINT)
                   AS delta_bits,
               CAST(sum(length(bin(greatest(abs(d), 1))) + 1) * 1000
                    // sum(length(bin(greatest(v, 1)))) AS BIGINT)
                   AS delta_ratio_permille
        FROM (
            SELECT {c} AS v,
                   {c} - lag({c}, 1, {c})
                       OVER (ORDER BY l_orderkey, l_linenumber) AS d
            FROM lineitem
        )""")
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(legs)
        + ") ORDER BY column_name"
    )


@register(
    "s8_delta_encoding_estimate",
    _delta_oracle(),
    doc="encoding advisor: total binary digits of raw values vs"
    " sign+magnitude digits of ingest-order deltas per column — the"
    " DELTA_BINARY_PACKED decision as a query",
)
def s8_delta_encoding_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Should this column be delta-encoded on disk? Compare the total
    significant binary digits of raw values against those of
    successive deltas in ingest order (plus one sign bit each) — the
    quantity parquet's DELTA_BINARY_PACKED bit-packs. A ratio far
    below 1000 permille (l_orderkey: ingest-sorted, deltas ≈ 0) says
    delta-encode; near or above it (l_partkey: random in ingest
    order) says leave plain/dictionary. Bit widths via the
    binary-digit-count idiom shared with the log kernel; the lag
    window runs in file order once per audited column. This is the
    measured-on-data half of the advisor pair — s8_parquet_footer_
    stats reads what the writer actually chose."""
    li = load_table(spark, sf_dir, "lineitem")
    out = None
    w = Window.orderBy("l_orderkey", "l_linenumber")
    for c in _DELTA_COLS:
        d = li.select(
            F.col(c).alias("v"),
            (F.col(c) - F.lag(c, 1).over(w)).alias("d0"),
        ).selectExpr("v", "coalesce(d0, 0) AS d")
        leg = d.selectExpr(
            f"'{c}' AS column_name",
            "CAST(sum(length(bin(greatest(v, 1)))) AS BIGINT)"
            " AS raw_bits",
            "CAST(sum(length(bin(greatest(abs(d), 1))) + 1) AS BIGINT)"
            " AS delta_bits",
            "CAST(sum(length(bin(greatest(abs(d), 1))) + 1) * 1000"
            " div sum(length(bin(greatest(v, 1)))) AS BIGINT)"
            " AS delta_ratio_permille",
        )
        out = leg if out is None else out.unionByName(leg)
    assert out is not None
    return out.orderBy("column_name")


@register(
    "f_nested_struct_roundtrip",
    """
    WITH nested AS (
        SELECT l_orderkey,
               count(*) AS n_items,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS cents,
               CAST(max(l_linenumber) AS BIGINT) AS max_line
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(n_items AS BIGINT) AS n_items_per_order,
           count(*) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(max(max_line) AS BIGINT) AS max_linenumber
    FROM nested
    GROUP BY 1
    ORDER BY 1
    """,
    doc="nested-record engineering: lineitems folded into per-order"
    " array<struct> documents, aggregates recomputed FROM the nested"
    " shape — document-model round trip equals the flat answer",
)
def f_nested_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The document-model detour, proven lossless: fold each order's
    lineitems into an array<struct<line, cents>> column (sorted by
    line number inside the array so the nested value is canonical),
    then compute every reported number FROM the nested shape with
    higher-order functions — size() for the item count,
    aggregate(transform(...)) for the revenue — never by re-reading
    the flat rows. The oracle aggregates the flat table directly, so
    a hash match proves fold → HOF-compute loses nothing. This is
    the shape event payloads take after from_json (SURVEY §1.3
    nested StructType); one groupBy builds the documents, and the
    per-document HOF work is embarrassingly parallel at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = (
        li.selectExpr(
            "l_orderkey",
            "named_struct('line', l_linenumber, 'cents',"
            " CAST(round(l_extendedprice * 100) AS BIGINT)) AS item",
        )
        .groupBy("l_orderkey")
        .agg(
            F.expr(
                "array_sort(collect_list(item), (a, b) ->"
                " CASE WHEN a.line < b.line THEN -1"
                " WHEN a.line > b.line THEN 1 ELSE 0 END) AS items"
            )
        )
    )
    from_nested = nested.selectExpr(
        "CAST(size(items) AS BIGINT) AS n_items",
        "aggregate(items, CAST(0 AS BIGINT),"
        " (acc, x) -> acc + x.cents) AS cents",
        "aggregate(items, CAST(0 AS BIGINT),"
        " (acc, x) -> greatest(acc, CAST(x.line AS BIGINT)))"
        " AS max_line",
    )
    return (
        from_nested.groupBy(F.col("n_items").alias("n_items_per_order"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
            F.max("max_line").cast("bigint").alias("max_linenumber"),
        )
        .orderBy("n_items_per_order")
    )
