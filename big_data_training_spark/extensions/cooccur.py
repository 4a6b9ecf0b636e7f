"""Co-occurrence recommenders over the order/part incidence — item-item
cosine neighbors, user-user Jaccard k-NN, and NPMI-scored item pairs.

Reference stage "analyze" (README.md:18-22), market-basket chapter
(extensions/basket.py works at BRAND grain): these queries recommend at
ITEM (part) and USER grain — the classic collaborative-filtering
primitives. All pair generation is blocked by a shared container
(order for items, part for users), so only co-occurring entities ever
meet: the same inverted-index discipline as the dedup miners, with the
same hub guard economics (per-order part sets are tiny; per-part
customer lists are df-bounded).

Determinism: counts are exact; cosine is floored to milli fixed point
(floors of identical doubles), Jaccard is an exact integer division,
and NPMI uses the shared 1/16-bit fixed-point log2 kernel
(extensions/retrieval.py) — no float logarithm anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.infotheory import _apply_steps
from big_data_training_spark.extensions.retrieval import (
    _nest_sql,
    log2_fp16_steps,
)
from big_data_training_spark.registry import register

ITEM_TOP_K = 5
USER_TOP_K = 3
ITEM_MOD = 97
USER_MOD = 149
NPMI_MIN_CO = 3
NPMI_TOP = 20

_SQL_ITEM_CO = """
    sets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    co AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v,
               CAST(count(*) AS BIGINT) AS co
        FROM sets a JOIN sets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    sz AS (SELECT l_partkey AS p, CAST(count(*) AS BIGINT) AS n
           FROM sets GROUP BY 1)
"""


def _item_co(spark: SparkSession, sf_dir: str):
    """(co pairs u<v with counts, per-item order counts) — built from
    per-order sorted part sets: one shuffle of lineitem, pairs
    generated JVM-side (bounded by order size), no fact self-join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    grp = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = grp.select(
        F.posexplode("ps").alias("i", "u"), "ps"
    ).select("u", F.explode(F.expr("slice(ps, i + 2, size(ps))")).alias("v"))
    co = pairs.groupBy("u", "v").agg(F.count("*").alias("co"))
    sz = (
        grp.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count("*").alias("n"))
    )
    return co, sz


@register(
    "rec_item_item_cosine",
    f"""
    WITH {_SQL_ITEM_CO},
    sym AS (
        SELECT u AS item, v AS nbr, co FROM co
        UNION ALL
        SELECT v, u, co FROM co
    ),
    scored AS (
        SELECT item, nbr, co,
               CAST(floor(1000.0 * co / sqrt(CAST(si.n AS DOUBLE) * sj.n))
                    AS BIGINT) AS cos_milli
        FROM sym JOIN sz si ON si.p = item JOIN sz sj ON sj.p = nbr
        WHERE item % {ITEM_MOD} = 0
    )
    SELECT CAST(item AS BIGINT) AS item, CAST(nbr AS BIGINT) AS neighbor,
           co, cos_milli, CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY item
                    ORDER BY cos_milli DESC, nbr) AS rk FROM scored)
    WHERE rk <= {ITEM_TOP_K}
    """,
    doc=f"item-item collaborative filtering: top-{ITEM_TOP_K} cosine"
    " co-order neighbors per sampled item, fixed-point scores",
)
def rec_item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item CF: cos(i,j) = co(i,j)/√(nᵢ·nⱼ) over order baskets.
    Pairs exist only where a basket contains both items (blocked
    generation — the candidate stream is Σ basket² over ≤7-item
    baskets, linear in orders), and the neighbor ranking floors the
    score to milli with an id tie-break. Sampled query items bound the
    certified output; at scale the sample filter IS the serving shard
    (per-item neighbor lists are embarrassingly parallel)."""
    co, sz = _item_co(spark, sf_dir)
    sym = co.selectExpr("u AS item", "v AS nbr", "co").unionAll(
        co.selectExpr("v AS item", "u AS nbr", "co")
    )
    scored = (
        sym.filter(F.col("item") % ITEM_MOD == 0)
        .join(F.broadcast(sz.selectExpr("p AS item", "n AS ni")), "item")
        .join(F.broadcast(sz.selectExpr("p AS nbr", "n AS nj")), "nbr")
        .selectExpr(
            "item",
            "nbr",
            "co",
            "CAST(floor(1000.0 * co / sqrt(CAST(ni AS DOUBLE) * nj))"
            " AS BIGINT) AS cos_milli",
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("cos_milli"), F.asc("nbr"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= ITEM_TOP_K)
        .selectExpr(
            "CAST(item AS BIGINT) AS item",
            "CAST(nbr AS BIGINT) AS neighbor",
            "co",
            "cos_milli",
            "CAST(rk AS BIGINT) AS rk",
        )
    )


@register(
    "rec_user_jaccard_knn",
    f"""
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    sz AS (SELECT cust, CAST(count(*) AS BIGINT) AS n FROM cp GROUP BY 1),
    pairs AS (
        SELECT a.cust AS qcust, b.cust AS ncust,
               CAST(count(*) AS BIGINT) AS co
        FROM cp a JOIN cp b ON a.part = b.part AND a.cust <> b.cust
        WHERE a.cust % {USER_MOD} = 0
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT qcust, ncust, co,
               CAST(co * 1000 // (sa.n + sb.n - co) AS BIGINT) AS jac_milli
        FROM pairs JOIN sz sa ON sa.cust = qcust
                   JOIN sz sb ON sb.cust = ncust
    )
    SELECT CAST(qcust AS BIGINT) AS cust, CAST(ncust AS BIGINT) AS neighbor,
           co, jac_milli, CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY qcust
                    ORDER BY jac_milli DESC, co DESC, ncust) AS rk
          FROM scored)
    WHERE rk <= {USER_TOP_K}
    """,
    doc=f"user-user k-NN: top-{USER_TOP_K} Jaccard neighbors on"
    " purchased-part sets for sampled query users, exact permille",
)
def rec_user_jaccard_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-user CF: Jaccard of purchased part SETS via the
    inverted-index block on the part key — only users sharing a part
    ever pair, and the QUERY side is hash-sampled first so the
    candidate stream is (sampled users × per-part co-buyers), not all
    pairs. Jaccard is an exact integer division; ties break on raw
    overlap then id. The full-side sizes come from one keyed count."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    cp = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
        )
        .distinct()
    )
    sz = cp.groupBy("cust").agg(F.count("*").alias("n"))
    a = cp.filter(F.col("cust") % USER_MOD == 0).selectExpr(
        "cust AS qcust", "part"
    )
    b = cp.selectExpr("cust AS ncust", "part")
    pairs = (
        a.join(b, "part")
        .filter(F.col("qcust") != F.col("ncust"))
        .groupBy("qcust", "ncust")
        .agg(F.count("*").alias("co"))
    )
    scored = (
        pairs.join(F.broadcast(sz.selectExpr("cust AS qcust", "n AS na")), "qcust")
        .join(F.broadcast(sz.selectExpr("cust AS ncust", "n AS nb")), "ncust")
        .selectExpr(
            "qcust",
            "ncust",
            "co",
            "CAST(co * 1000 div (na + nb - co) AS BIGINT) AS jac_milli",
        )
    )
    w = Window.partitionBy("qcust").orderBy(
        F.desc("jac_milli"), F.desc("co"), F.asc("ncust")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= USER_TOP_K)
        .selectExpr(
            "CAST(qcust AS BIGINT) AS cust",
            "CAST(ncust AS BIGINT) AS neighbor",
            "co",
            "jac_milli",
            "CAST(rk AS BIGINT) AS rk",
        )
    )


def _npmi_oracle() -> str:
    grid = f"""
    SELECT co.u, co.v, co.co, nb.n_orders,
           co.co * nb.n_orders AS num, si.n * sj.n AS den
    FROM co JOIN sz si ON si.p = co.u JOIN sz sj ON sj.p = co.v,
         (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM lineitem) nb
    WHERE co.co >= {NPMI_MIN_CO} AND co.co * nb.n_orders >= si.n * sj.n
    """
    stepped = _nest_sql(grid, log2_fp16_steps("num", "den", "pmi16", " // "))
    stepped = _nest_sql(
        f"SELECT * FROM ({stepped})",
        log2_fp16_steps("n_orders", "co", "nlog16", " // ", pfx="n_"),
    )
    return f"""
    WITH {_SQL_ITEM_CO},
    scored AS (
        SELECT u, v, co, CAST(pmi16 AS BIGINT) AS pmi16,
               CAST(1000 * pmi16 // nlog16 AS BIGINT) AS npmi_permille
        FROM ({stepped})
    )
    SELECT CAST(u AS BIGINT) AS item_i, CAST(v AS BIGINT) AS item_j,
           co, pmi16, npmi_permille
    FROM (SELECT *, row_number() OVER (ORDER BY npmi_permille DESC,
                                       u, v) AS rk FROM scored)
    WHERE rk <= {NPMI_TOP}
    """


@register(
    "rec_cooccur_npmi",
    _npmi_oracle(),
    doc=f"top-{NPMI_TOP} item pairs by normalized PMI (co-order lift"
    " beyond chance), exact 1/16-bit fixed-point logs",
    bench=True,
)
def rec_cooccur_npmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NPMI = pmi/−log p(i,j) rescales PMI into [−1, 1] so rare and
    common pairs rank comparably — the association measure phrase
    mining and complement detection use. Both logs go through the
    shared integer log2 kernel (16th-bit fixed point), so the ranking
    is bit-exact in both engines; only positive-PMI pairs qualify
    (num ≥ den — the recommendation side of the distribution). Same
    blocked pair generation as the cosine query."""
    co, sz = _item_co(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    nb = li.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    grid = (
        co.filter(F.col("co") >= NPMI_MIN_CO)
        .join(F.broadcast(sz.selectExpr("p AS u", "n AS ni")), "u")
        .join(F.broadcast(sz.selectExpr("p AS v", "n AS nj")), "v")
        .crossJoin(F.broadcast(nb))
        .selectExpr(
            "u", "v", "co", "n_orders",
            "co * n_orders AS num", "ni * nj AS den",
        )
        .filter("num >= den")
    )
    stepped = _apply_steps(
        grid, log2_fp16_steps("num", "den", "pmi16", " div ")
    )
    stepped = _apply_steps(
        stepped,
        log2_fp16_steps("n_orders", "co", "nlog16", " div ", pfx="n_"),
    )
    scored = stepped.selectExpr(
        "u",
        "v",
        "co",
        "CAST(pmi16 AS BIGINT) AS pmi16",
        "CAST(1000 * pmi16 div nlog16 AS BIGINT) AS npmi_permille",
    )
    w = Window.orderBy(F.desc("npmi_permille"), F.asc("u"), F.asc("v"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= NPMI_TOP)
        .selectExpr(
            "CAST(u AS BIGINT) AS item_i",
            "CAST(v AS BIGINT) AS item_j",
            "co",
            "pmi16",
            "npmi_permille",
        )
    )
