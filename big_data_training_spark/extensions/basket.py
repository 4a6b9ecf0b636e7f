"""Market-basket analysis: pair co-occurrence, association rules,
item-item similarity — the classic recommender/affinity workload
(reference scope: the Kafka/Flink notes' per-key aggregation and join
patterns, /root/reference/flink/README.md keyed-aggregation sections,
applied to the co-purchase question every retail pipeline asks).

Baskets are orders; items are part brands (bounded vocabulary). The
whole family is built on ONE distinct-(basket, item) projection:

* pair counts come from a self-equi-join on basket_id — the expansion
  per basket is C(k, 2) for k distinct items in that basket, and k is
  bounded by order width (≤ 7 lineitems), so the shuffle is O(rows),
  never all-pairs across the corpus;
* item marginals are a |V|-row aggregate (|V| = 25 brands) that
  broadcasts back onto the pair table for confidence/lift/Jaccard —
  no second big shuffle.

At 100 TB the same plan holds: the only large exchange is the hash
shuffle of (basket, item) rows on basket_id; the pair key space is
bounded by |V|²/2 so every aggregate after the expansion is tiny.
Lift/confidence are exact integers (floor division, both engines
truncate toward zero on BIGINT operands); at extreme corpus sizes the
lift numerator c_ab·N·10^6 needs DECIMAL(38,0) — documented, not
needed below ~10^9 baskets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.hints import dim_gate
from big_data_training_spark.registry import register

MIN_PAIR_SUPPORT = 20  # pairs below this are noise at every SF
TOPK_SIMILAR = 3

_SQL_BASKETS = """
    baskets AS (
        SELECT DISTINCT l.l_orderkey AS basket_id, p.p_brand AS item
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n_baskets AS (
        SELECT count(DISTINCT basket_id) AS n FROM baskets
    ),
    item_counts AS (
        SELECT item, count(*) AS c FROM baskets GROUP BY item
    ),
    pair_counts AS (
        SELECT a.item AS item_a, b.item AS item_b, count(*) AS c_ab
        FROM baskets a
        JOIN baskets b
          ON a.basket_id = b.basket_id AND a.item < b.item
        GROUP BY a.item, b.item
    )
"""


def _baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # part is SF-scaled: broadcast only under the footer-byte gate
    # (pruned to the two kept columns)
    bp = dim_gate(spark, sf_dir, "part", ["p_partkey", "p_brand"])
    return (
        l.join(bp(p), l.l_partkey == p.p_partkey)
        .select(
            F.col("l_orderkey").alias("basket_id"),
            F.col("p_brand").alias("item"),
        )
        .distinct()
    )


def _pair_counts(b: DataFrame) -> DataFrame:
    a = b.alias("a")
    c = b.alias("c")
    return (
        a.join(
            c,
            (F.col("a.basket_id") == F.col("c.basket_id"))
            & (F.col("a.item") < F.col("c.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("c.item").alias("item_b")
        )
        .agg(F.count("*").alias("c_ab"))
    )


@register(
    "mb_brand_pairs",
    f"""
    WITH {_SQL_BASKETS}
    SELECT pc.item_a, pc.item_b,
           CAST(pc.c_ab AS BIGINT) AS pair_count,
           CAST(pc.c_ab * 1000 // (SELECT n FROM n_baskets) AS BIGINT)
               AS support_permille
    FROM pair_counts pc
    WHERE pc.c_ab >= {MIN_PAIR_SUPPORT}
    ORDER BY pair_count DESC, item_a, item_b
    """,
    doc="market basket: frequent brand pairs with exact co-occurrence"
    " support (bounded per-basket expansion, no all-pairs)",
)
def mb_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-itemset mining at pair size: distinct (order, brand)
    rows self-join on the order key — the Apriori candidate-pair pass
    with the candidate generation fused into the join condition
    (item_a < item_b). Support is an exact permille of basket count
    (scalar broadcast). The expansion is C(k,2) per basket with k
    bounded by order width, so the job is one keyed shuffle at any
    corpus size."""
    b = _baskets(spark, sf_dir)
    n = b.select(F.countDistinct("basket_id").alias("n"))
    return (
        _pair_counts(b)
        .filter(F.col("c_ab") >= MIN_PAIR_SUPPORT)
        .crossJoin(F.broadcast(n))
        .select(
            "item_a",
            "item_b",
            F.col("c_ab").cast("bigint").alias("pair_count"),
            F.expr("CAST(c_ab * 1000 div n AS BIGINT)").alias(
                "support_permille"
            ),
        )
        .orderBy(F.desc("pair_count"), "item_a", "item_b")
    )


@register(
    "mb_assoc_rules",
    f"""
    WITH {_SQL_BASKETS},
    directed AS (
        SELECT item_a AS antecedent, item_b AS consequent, c_ab
        FROM pair_counts
        UNION ALL
        SELECT item_b, item_a, c_ab FROM pair_counts
    )
    SELECT d.antecedent, d.consequent,
           CAST(d.c_ab AS BIGINT) AS pair_count,
           CAST(d.c_ab * 1000 // ca.c AS BIGINT) AS confidence_permille,
           CAST(d.c_ab * (SELECT n FROM n_baskets) * 1000000
                // (ca.c * cb.c) AS BIGINT) AS lift_micro
    FROM directed d
    JOIN item_counts ca ON ca.item = d.antecedent
    JOIN item_counts cb ON cb.item = d.consequent
    WHERE d.c_ab >= {MIN_PAIR_SUPPORT}
    ORDER BY lift_micro DESC, antecedent, consequent
    """,
    doc="association rules a=>b with exact integer confidence (permille)"
    " and lift (micro); marginals broadcast onto the pair table",
    bench=True,
)
def mb_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules from the pair pass: each undirected pair
    yields two directed rules; confidence = c_ab/c_a (permille) and
    lift = c_ab·N/(c_a·c_b) (micro) are exact floor divisions —
    Spark `div` and DuckDB `//` both truncate toward zero on BIGINT.
    The item-marginal table (|V| rows) and the basket-count scalar
    broadcast onto the pair table, so beyond the basket self-join
    nothing shuffles. Lift numerator c_ab·N·10^6 stays under int64
    below ~10^9 baskets; past that, swap to DECIMAL(38,0) in both
    dialects."""
    b = _baskets(spark, sf_dir)
    n = b.select(F.countDistinct("basket_id").alias("n"))
    items = b.groupBy("item").agg(F.count("*").alias("c"))
    pairs = _pair_counts(b).filter(F.col("c_ab") >= MIN_PAIR_SUPPORT)
    directed = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "c_ab",
    ).unionAll(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "c_ab",
        )
    )
    ca = items.select(
        F.col("item").alias("antecedent"), F.col("c").alias("c_a")
    )
    cb = items.select(
        F.col("item").alias("consequent"), F.col("c").alias("c_b")
    )
    return (
        directed.join(F.broadcast(ca), "antecedent")
        .join(F.broadcast(cb), "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            F.col("c_ab").cast("bigint").alias("pair_count"),
            F.expr("CAST(c_ab * 1000 div c_a AS BIGINT)").alias(
                "confidence_permille"
            ),
            F.expr(
                "CAST(c_ab * n * 1000000 div (c_a * c_b) AS BIGINT)"
            ).alias("lift_micro"),
        )
        .orderBy(F.desc("lift_micro"), "antecedent", "consequent")
    )


@register(
    "mb_item_jaccard_topk",
    f"""
    WITH {_SQL_BASKETS},
    directed AS (
        SELECT item_a AS item, item_b AS other, c_ab FROM pair_counts
        UNION ALL
        SELECT item_b, item_a, c_ab FROM pair_counts
    ),
    scored AS (
        SELECT d.item, d.other,
               CAST(d.c_ab * 1000 // (ca.c + cb.c - d.c_ab) AS BIGINT)
                   AS jaccard_permille
        FROM directed d
        JOIN item_counts ca ON ca.item = d.item
        JOIN item_counts cb ON cb.item = d.other
    ),
    ranked AS (
        SELECT item, other, jaccard_permille,
               row_number() OVER (PARTITION BY item
                                  ORDER BY jaccard_permille DESC, other)
                   AS rank
        FROM scored
    )
    SELECT item, other, jaccard_permille, CAST(rank AS BIGINT) AS rank
    FROM ranked
    WHERE rank <= {TOPK_SIMILAR}
    ORDER BY item, rank
    """,
    doc="item-item similarity: top-3 most-similar brands per brand by"
    " exact basket-set Jaccard (permille), from the same pair pass",
)
def mb_item_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative similarity without any vector math:
    Jaccard of basket sets computed exactly from the pair pass and
    the item marginals — |A∩B| = c_ab, |A∪B| = c_a + c_b − c_ab —
    then a per-item top-3 window over the ≤|V|²/2-row scored table.
    Deterministic tiebreak (other item name); the window runs on a
    bounded table so no distributed sort is involved."""
    b = _baskets(spark, sf_dir)
    items = b.groupBy("item").agg(F.count("*").alias("c"))
    pairs = _pair_counts(b)
    directed = pairs.select(
        F.col("item_a").alias("item"), F.col("item_b").alias("other"), "c_ab"
    ).unionAll(
        pairs.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("other"),
            "c_ab",
        )
    )
    ca = items.select(F.col("item").alias("item"), F.col("c").alias("c_a"))
    cb = items.select(F.col("item").alias("other"), F.col("c").alias("c_b"))
    scored = (
        directed.join(F.broadcast(ca), "item")
        .join(F.broadcast(cb), "other")
        .select(
            "item",
            "other",
            F.expr(
                "CAST(c_ab * 1000 div (c_a + c_b - c_ab) AS BIGINT)"
            ).alias("jaccard_permille"),
        )
    )
    w = "(PARTITION BY item ORDER BY jaccard_permille DESC, other)"
    return (
        scored.selectExpr(
            "item",
            "other",
            "jaccard_permille",
            f"CAST(row_number() OVER {w} AS BIGINT) AS rank",
        )
        .filter(F.col("rank") <= TOPK_SIMILAR)
        .orderBy("item", "rank")
    )
