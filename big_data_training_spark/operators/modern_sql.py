"""Modern Spark-4 SQL surface: recursive CTEs, LATERAL subqueries,
VARIANT semi-structured extraction, and Python UDTFs.

The reference's type system names semi-structured JSON events and
schema evolution as first-class (kafka/README.md:294-296, 312) and its
UDF surface includes table-generating user functions (the Flink
flatMap/process family, flink/README.md:20-28). These queries exercise
the corresponding *engine* surfaces Spark 4 added natively — recursive
CTE (date-spine generation), LATERAL correlated subqueries (per-row
top-k without a window), VARIANT (binary semi-structured values with
typed path extraction), and registered Python UDTFs (1→n row user
functions callable from SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register


@register(
    "cal_date_spine_gap_fill",
    """
    WITH RECURSIVE b AS (
        SELECT min(date_trunc('day', ts)) AS d0,
               max(date_trunc('day', ts)) AS d1
        FROM events
    ), spine AS (
        SELECT d0 AS day FROM b
        UNION ALL
        SELECT day + INTERVAL 1 DAY FROM spine, b WHERE day < d1
    ), daily AS (
        SELECT date_trunc('day', ts) AS day, count(*) AS n
        FROM events GROUP BY 1
    )
    SELECT s.day, CAST(coalesce(d.n, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN daily d USING (day)
    """,
    doc="recursive CTE date spine: every calendar day gap-filled with 0",
    bench=True,
)
def cal_date_spine_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse date-spine pattern: every calendar day between the
    dataset's bounds, daily counts left-joined on, gap days surfaced as
    explicit zeros — the shape every reporting layer needs and GROUP BY
    alone cannot produce.

    Production plan: ``explode(sequence(d0, d1, interval 1 day))`` over
    the 1-row bounds aggregate — ONE job whatever the calendar span.
    The equivalent recursive CTE (kept as the DuckDB oracle above, and
    exercised Spark-side in tests/test_modern_sql.py) plans one
    micro-job per day of recursion depth: measured 7.5s for ~1.1k rows
    at sf0.1 vs <1s here, 25× off for identical output. The depth is
    calendar-bounded (not data-bounded) so it was never a scale killer
    — just the wrong plan shape for a linear range."""
    events = load_table(spark, sf_dir, "events")
    b = events.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    spine = b.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events")
    )


@register(
    "j_lateral_topk_nation",
    """
    SELECT n.n_name, c.c_custkey, c.acctbal
    FROM nation n, LATERAL (
        SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
    ) c
    """,
    doc="LATERAL correlated top-k: 2 richest customers per nation",
)
def j_lateral_topk_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row correlated top-k through a LATERAL subquery — the SQL
    surface for 'top N related rows per outer row' that window-rank
    rewrites approximate. Catalyst decorrelates this into a ranked join
    (same physical shape as k_topk_per_group), so the declarative form
    costs nothing extra; the query proves the engine accepts it."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("msql_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("msql_customer")
    return spark.sql(
        """
        SELECT n.n_name, c.c_custkey, c.acctbal
        FROM msql_nation n, LATERAL (
            SELECT c_custkey, round(c_acctbal, 2) AS acctbal
            FROM msql_customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) c
        """
    )


@register(
    "f_variant_props_stats",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k
    FROM events GROUP BY 1
    """,
    doc="VARIANT semi-structured extraction: typed path reads over JSON props",
)
def f_variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads through Spark 4's VARIANT type:
    ``parse_json`` once into the binary variant encoding, then typed
    ``variant_get`` path extraction — the schema-on-read answer to the
    reference's evolving-JSON events, without a fixed from_json schema.
    At scale VARIANT beats string re-parsing per access: the binary
    form is parsed once at ingest and shredded lazily."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).cast("bigint").alias("min_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )


@register(
    "u6_python_udtf_props",
    """
    WITH pairs AS (
        SELECT e.event_type, 'k' AS key,
               CAST(json_extract_string(e.props, '$.k') AS BIGINT) AS val
        FROM events e
    )
    SELECT event_type, key, count(*) AS n, CAST(sum(val) AS BIGINT) AS sum_val
    FROM pairs GROUP BY 1, 2
    """,
    doc="U-surface UDTF: registered Python table function, 1 row -> n rows in SQL",
)
def u6_python_udtf_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A genuine Python UDTF (Spark 4 ``@udtf``): each event's JSON
    props explode into (key, value) rows via a registered table
    function invoked with LATERAL correlation from SQL — the
    table-generating user-function surface (U1/T2's 1→n form) as a
    first-class engine feature rather than an explode() composition.
    Row-at-a-time Python: correct for the U-surface demo, kept off hot
    paths (the JVM explode/flatMap family is the scale path)."""
    import json

    from pyspark.sql.functions import udtf

    @udtf(returnType="key string, val bigint")
    class PropsPairs:
        def eval(self, props: str):
            if props:
                for k, v in json.loads(props).items():
                    yield (str(k), int(v))

    spark.udtf.register("msql_props_pairs", PropsPairs)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("msql_events_udtf")
    return spark.sql(
        """
        SELECT e.event_type, p.key, count(*) AS n,
               CAST(sum(p.val) AS BIGINT) AS sum_val
        FROM msql_events_udtf e, LATERAL msql_props_pairs(e.props) p
        GROUP BY 1, 2
        """
    )


@register(
    "f_collated_group_dedup",
    """
    WITH v AS (
        SELECT CASE WHEN doc_id % 3 = 0 THEN upper(lang || ':' || source)
                    ELSE lang || ':' || source END AS k
        FROM documents
    )
    SELECT min(k) AS canonical, count(*) AS n,
           count(DISTINCT k) AS n_case_variants
    FROM v GROUP BY lower(k)
    """,
    doc="collation-aware grouping: case-insensitive dedup via UTF8_LCASE",
)
def f_collated_group_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive key dedup through Spark 4's native collation
    support: group on ``collate(k, 'UTF8_LCASE')`` instead of
    normalizing with lower() — at scale the collation comparator runs
    inside the hash aggregate (no derived key column, and it extends to
    locale/accent-aware collations lower() cannot express). A third of
    the keys are upper-cased to force real case variance; outputs are
    computed on the binary form so both engines pick identical
    representatives."""
    docs = load_table(spark, sf_dir, "documents")
    k_raw = F.concat_ws(":", "lang", "source")
    k = F.when(F.col("doc_id") % 3 == 0, F.upper(k_raw)).otherwise(k_raw)
    return (
        docs.select(k.alias("k"))
        .groupBy(F.collate("k", "UTF8_LCASE").alias("ck"))
        .agg(
            F.min("k").alias("canonical"),
            F.count("*").alias("n"),
            F.countDistinct("k").alias("n_case_variants"),
        )
        .select("canonical", "n", "n_case_variants")
    )


@register(
    "f_sql_scripting_threshold",
    """
    WITH cand AS (SELECT 50.0 * i AS cutoff FROM generate_series(0, 20) t(i)),
    ok AS (
        SELECT cutoff FROM cand
        WHERE (SELECT count(*) FROM events WHERE value > cutoff) * 10
              <= (SELECT count(*) FROM events)
    ),
    pick AS (SELECT min(cutoff) AS cutoff FROM ok)
    SELECT (SELECT cutoff FROM pick) AS cutoff,
           count(*) AS n_above,
           round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2)
               AS total_above
    FROM events WHERE value > (SELECT cutoff FROM pick)
    """,
    doc="SQL scripting (Spark 4): WHILE-loop threshold search, final SELECT",
)
def f_sql_scripting_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procedural SQL through Spark 4's SQL scripting: a WHILE loop
    raises the cutoff in fixed steps until at most 10% of events exceed
    it, then the script's final SELECT reports the tail. The oracle
    replays the loop declaratively (smallest step-multiple satisfying
    the predicate). Control flow runs driver-side; every iteration's
    predicate is a distributed count — exactly the shape of iterative
    threshold tuning over a 100 TB fact table."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "msql_events_script"
    )
    key = "spark.sql.scripting.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        return spark.sql(
            """
            BEGIN
              DECLARE cutoff DOUBLE DEFAULT 0.0;
              WHILE (SELECT count(*) FROM msql_events_script
                     WHERE value > cutoff) * 10
                    > (SELECT count(*) FROM msql_events_script) DO
                SET cutoff = cutoff + 50.0;
              END WHILE;
              SELECT cutoff AS cutoff,
                     count(*) AS n_above,
                     round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2)
                         AS total_above
              FROM msql_events_script WHERE value > cutoff;
            END
            """
        ).localCheckpoint(eager=True)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


# Spark 4 SQL pipe syntax (|>): the same logical plan as nested SELECTs,
# written as a linear transformation chain. The oracle states the ANSI
# equivalent — plan equality across syntaxes is exactly what is tested.
_PIPE_SQL = """
    FROM lineitem
    |> WHERE l_shipdate >= DATE '1998-01-01'
    |> JOIN supplier ON l_suppkey = s_suppkey
    |> JOIN nation ON s_nationkey = n_nationkey
    |> AGGREGATE count(*) AS n_items,
                 CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS revenue_cents
       GROUP BY n_name
    |> WHERE n_items > 0
    |> SELECT n_name, n_items, revenue_cents
"""

_PIPE_ORACLE = """
    SELECT n_name, count(*) AS n_items,
           CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE l_shipdate >= DATE '1998-01-01'
    GROUP BY n_name
    HAVING count(*) > 0
"""


@register(
    "f_sql_pipe_syntax",
    _PIPE_ORACLE,
    doc="Spark 4 SQL pipe syntax (|> WHERE/JOIN/AGGREGATE chain) over"
    " the warehouse views; oracle is the equivalent ANSI statement",
)
def f_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipe-syntax surface (public Spark 4 / GoogleSQL design):
    each |> stage consumes the previous relation, so the query reads in
    execution order — but Catalyst compiles it to the identical plan as
    the nested form, which the ANSI oracle proves by hash equality.
    Broadcast joins and the pre-aggregation filter all behave exactly
    as in the classic syntax; this is a parser feature, not a new
    engine path."""
    from big_data_training_spark.data import register_views

    register_views(spark, sf_dir)
    return spark.sql(_PIPE_SQL)


@register(
    "f8_xml_roundtrip",
    """
    SELECT o_orderstatus AS status,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders GROUP BY 1
    """,
    doc="S8/F: native XML codec roundtrip — to_xml(struct) -> from_xml"
    " -> aggregate; oracle recomputes from the base table, so any"
    " serialization loss hash-mismatches",
)
def f8_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's built-in XML surface, proven by the same roundtrip
    pattern as the Avro/Protobuf wire codecs (F2/F4): serialize each
    order to an XML document (JVM to_xml, no UDF), parse it back with a
    declared schema, and aggregate ONLY parsed fields. Hash equality
    with the base-table oracle proves the codec lossless for the typed
    fields (BIGINT cents survive text roundtrip exactly — doubles would
    not, which is why cents are fixed before serialization). One scan,
    codegen'd both directions; at 100 TB this is the ingest shape for
    XML feeds (from_xml over a raw text column)."""
    orders = load_table(spark, sf_dir, "orders")
    xml = orders.select(
        F.expr(
            "to_xml(named_struct("
            "'k', o_orderkey,"
            " 'p', CAST(floor(o_totalprice * 100) AS BIGINT),"
            " 's', o_orderstatus))"
        ).alias("doc")
    )
    parsed = xml.select(
        F.expr("from_xml(doc, 'k BIGINT, p BIGINT, s STRING')").alias("r")
    )
    return parsed.groupBy(F.col("r.s").alias("status")).agg(
        F.count("*").alias("n_orders"),
        F.sum("r.p").cast("bigint").alias("total_cents"),
    )


@register(
    "u8_sql_udf",
    """
    SELECT l_returnflag,
           count(*) AS n,
           CAST(sum((CAST(floor(l_extendedprice * 100) AS BIGINT)
                     * (1000 - CAST(floor(l_discount * 1000) AS BIGINT)))
                    // 1000) AS BIGINT) AS discounted_cents
    FROM lineitem GROUP BY 1
    """,
    doc="U1/F: SQL-defined scalar UDF (CREATE FUNCTION ... RETURN expr)"
    " applied in an aggregate; oracle inlines the body",
)
def u8_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDFs: the function body is declared in SQL and
    INLINED by Catalyst — unlike Python UDFs it stays inside
    whole-stage codegen, so this is the zero-cost way to share scalar
    business logic (here: exact discounted cents with permille
    discounts, all BIGINT). The oracle states the inlined expression,
    which is literally what the optimizer executes."""
    from big_data_training_spark.data import register_views

    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION discounted_cents("
        "price DOUBLE, disc DOUBLE) RETURNS BIGINT RETURN"
        " (CAST(floor(price * 100) AS BIGINT)"
        "  * (1000 - CAST(floor(disc * 1000) AS BIGINT))) div 1000"
    )
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(discounted_cents(l_extendedprice, l_discount))
                    AS BIGINT) AS discounted_cents
        FROM lineitem GROUP BY 1
        """
    )
