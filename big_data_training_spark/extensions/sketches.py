"""Distributed sketches: KMV distinct-count estimation and a bloom-
filter membership pipeline — the approximate-counting / compact-filter
layer a 100 TB engine needs where exact distinct or a full join is too
expensive (the role HyperLogLog / bloom indexes play in the reference's
ecosystem; SURVEY.md §2 A-family at scale).

Why KMV and not HLL here: the queries must verify bit-for-bit against
the DuckDB oracle, and Spark's `approx_count_distinct` HLL++ sketch is
engine-private. K-Minimum-Values over the portable md5-derived hash
(functions/hashing.py) is deterministic in *any* engine: the sketch is
literally "the k smallest distinct hashes", and the estimator
(k-1)·M/h_k uses only exactly-representable doubles plus one
round-to-nearest bigint→double cast that IEEE 754 fixes identically
everywhere. Same operator family, exact cross-engine parity.

Scale design:

* The per-group k-smallest runs as a row_number window — Spark plans
  WindowGroupLimit, which pre-filters each map partition to its local
  top-k BEFORE the shuffle, so the exchange carries O(groups · k) rows
  no matter how many billions of inputs.
* KMV sketches merge by set-union + re-truncate (any hash in the
  global k-smallest is in its group's k-smallest); both the merge and
  the direct comparator take the global k-smallest via
  ``orderBy().limit(k)`` — TakeOrderedAndProject, a parallel partial
  top-k per partition plus a k-row driver merge, never a
  single-partition Window funnel. That mergeability is what a
  1000-executor partial aggregate relies on.
* The bloom filter is 65 words × 63 bits (63 so no set bit ever lands
  on the sign bit — bigint shifts then behave identically in every
  engine). Build = one bit_or aggregate over exploded probe positions;
  probe = equi-join against the 65-row word table (broadcast), never a
  key-to-key join. Replacing a 100 TB semi-join with a kilobyte of
  broadcast state is the entire point of the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_training_spark.data import load_table
from big_data_training_spark.functions.hashing import hash60, sql_hash60
from big_data_training_spark.registry import register

KMV_K = 16
_M_DOUBLE = float(2**60)  # hash60 range; (KMV_K-1)*M is an exact double


def _kmv_est(kth: str, n_sketch: str):
    """KMV estimator: exact when the sketch is unsaturated, else
    (k-1)·M / h_k floored to bigint (deterministic: see module doc)."""
    return F.when(F.col(n_sketch) < KMV_K, F.col(n_sketch)).otherwise(
        F.floor(F.lit((KMV_K - 1) * _M_DOUBLE) / F.col(kth).cast("double"))
    )


def _sql_kmv_est(kth: str, n_sketch: str) -> str:
    return (
        f"CASE WHEN {n_sketch} < {KMV_K} THEN {n_sketch} ELSE CAST(floor("
        f"{float(KMV_K - 1)} * {_M_DOUBLE!r} / CAST({kth} AS DOUBLE)) AS BIGINT)"
        f" END"
    )


_SQL_KMV_PER_TYPE_CTE = f"""
    WITH dh AS (
        SELECT DISTINCT event_type, user_id FROM events
    ), hashed AS (
        SELECT event_type, {sql_hash60("CAST(user_id AS VARCHAR)")} AS h FROM dh
    ), ranked AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM hashed
    ), sk AS (
        SELECT event_type, max(h) AS kth_hash, count(*) AS n_sketch
        FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
    ), ex AS (
        SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        FROM events GROUP BY event_type
    )
"""


@register(
    "sk_kmv_distinct_per_type",
    _SQL_KMV_PER_TYPE_CTE
    + f"""
    SELECT sk.event_type, sk.n_sketch, sk.kth_hash,
           {_sql_kmv_est('sk.kth_hash', 'sk.n_sketch')} AS est_distinct,
           ex.exact_distinct
    FROM sk JOIN ex ON ex.event_type = sk.event_type
    """,
    doc="KMV distinct-count sketch per key (k smallest portable hashes;"
    " engine-exact estimator), with the exact count alongside",
)
def sk_kmv_distinct_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-size distinct estimation: the shuffle after the local
    WindowGroupLimit carries at most k rows per group regardless of
    input size. The exact count rides along to exhibit sketch error."""
    ev = load_table(spark, sf_dir, "events")
    hashed = (
        ev.select("event_type", "user_id")
        .distinct()
        .select(
            "event_type", hash60(F.col("user_id").cast("string")).alias("h")
        )
    )
    w = Window.partitionBy("event_type").orderBy("h")
    sk = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.max("h").alias("kth_hash"), F.count("*").alias("n_sketch"))
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return (
        sk.join(exact, "event_type")
        .withColumn("est_distinct", _kmv_est("kth_hash", "n_sketch"))
        .select(
            "event_type", "n_sketch", "kth_hash", "est_distinct", "exact_distinct"
        )
    )


@register(
    "sk_kmv_merge_global",
    _SQL_KMV_PER_TYPE_CTE
    + f"""
    , merged AS (
        SELECT h, row_number() OVER (ORDER BY h) AS rn
        FROM (SELECT DISTINCT h FROM ranked WHERE rn <= {KMV_K})
    ), msk AS (
        SELECT max(h) AS kth_hash, count(*) AS n_sketch
        FROM merged WHERE rn <= {KMV_K}
    ), direct AS (
        SELECT max(h) AS kth_hash, count(*) AS n_sketch FROM (
            SELECT h, row_number() OVER (ORDER BY h) AS rn
            FROM (SELECT DISTINCT {sql_hash60("CAST(user_id AS VARCHAR)")} AS h
                  FROM events)
        ) WHERE rn <= {KMV_K}
    ), exg AS (SELECT count(DISTINCT user_id) AS exact_distinct FROM events)
    SELECT {_sql_kmv_est('msk.kth_hash', 'msk.n_sketch')} AS est_merged,
           {_sql_kmv_est('direct.kth_hash', 'direct.n_sketch')} AS est_direct,
           exg.exact_distinct
    FROM msk, direct, exg
    """,
    doc="KMV mergeability: union of per-key sketches re-truncated equals"
    " the sketch built directly over the whole log",
)
def sk_kmv_merge_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge path vs direct path: the global k-smallest is a subset of
    the union of per-group k-smallest, so merging sketches (tiny) gives
    the same estimate as sketching the full log — the invariant that
    lets partial aggregates combine across 1000 executors."""
    ev = load_table(spark, sf_dir, "events")
    hashed = (
        ev.select("event_type", "user_id")
        .distinct()
        .select(
            "event_type", hash60(F.col("user_id").cast("string")).alias("h")
        )
    )
    wg = Window.partitionBy("event_type").orderBy("h")
    per_group = (
        hashed.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") <= KMV_K)
        .select("h")
        .distinct()
    )
    # Global k-smallest via orderBy().limit(): plans TakeOrderedAndProject
    # (parallel per-partition top-k, then a k-row merge on one task) — never
    # a single-partition Window funnel.
    merged = (
        per_group.orderBy("h")
        .limit(KMV_K)
        .agg(F.max("h").alias("kth_hash"), F.count("*").alias("n_sketch"))
        .withColumn("est_merged", _kmv_est("kth_hash", "n_sketch"))
        .select("est_merged")
    )
    direct = (
        ev.select(hash60(F.col("user_id").cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
        .agg(F.max("h").alias("kth_hash"), F.count("*").alias("n_sketch"))
        .withColumn("est_direct", _kmv_est("kth_hash", "n_sketch"))
        .select("est_direct")
    )
    exact = ev.agg(F.count_distinct("user_id").alias("exact_distinct"))
    return merged.crossJoin(direct).crossJoin(exact)


# Bloom geometry: 63 usable bits per word keeps every shift below the
# sign bit (engine-identical bigint semantics); 65 words ≈ 4095 bits for
# ~657 build keys at 3 probes -> ~5% false-positive rate, visible in the
# confusion counts without drowning them.
BLOOM_WORDS = 65
BLOOM_BITS = BLOOM_WORDS * 63
BLOOM_PROBES = 3
BLOOM_ACCTBAL_MIN = 5000.0


def _bloom_positions_spark(key_col: str):
    """The BLOOM_PROBES hash positions of a bigint key, as (word, bit)."""
    return [
        F.pmod(
            hash60(F.concat(F.lit(f"bloom{i}:"), F.col(key_col).cast("string"))),
            F.lit(BLOOM_BITS),
        ).alias(f"pos{i}")
        for i in range(BLOOM_PROBES)
    ]


def _sql_bloom_pos(i: int, key_expr: str) -> str:
    salted = "'bloom" + str(i) + ":' || CAST(" + key_expr + " AS VARCHAR)"
    return f"{sql_hash60(salted)} % {BLOOM_BITS}"


_SQL_BLOOM_CTE = f"""
    WITH build_keys AS (
        SELECT c_custkey AS key FROM customer WHERE c_acctbal > {BLOOM_ACCTBAL_MIN}
    ), build_pos AS (
        {" UNION ALL ".join(f"SELECT key, {_sql_bloom_pos(i, 'key')} AS pos FROM build_keys" for i in range(BLOOM_PROBES))}
    ), words AS (
        SELECT pos // 63 AS word, bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS w
        FROM build_pos GROUP BY 1
    ), probe_keys AS (
        SELECT DISTINCT o_custkey AS key FROM orders
    ), probe_pos AS (
        {" UNION ALL ".join(f"SELECT key, {_sql_bloom_pos(i, 'key')} AS pos FROM probe_keys" for i in range(BLOOM_PROBES))}
    ), probe_hits AS (
        SELECT p.key,
               min(CASE WHEN ((coalesce(w.w, 0) >> CAST(p.pos % 63 AS INT)) & 1) = 1
                        THEN 1 ELSE 0 END) AS all_set
        FROM probe_pos p LEFT JOIN words w ON w.word = p.pos // 63
        GROUP BY p.key
    ), flags AS (
        SELECT h.key, h.all_set = 1 AS maybe_member,
               b.key IS NOT NULL AS is_member
        FROM probe_hits h LEFT JOIN build_keys b ON b.key = h.key
    )
"""


@register(
    "sk_bloom_membership",
    _SQL_BLOOM_CTE
    + """
    SELECT maybe_member, is_member, count(*) AS n
    FROM flags GROUP BY maybe_member, is_member
    """,
    doc="Bloom-filter membership: kilobyte bit array replaces a key join;"
    " confusion counts show FPs but never FNs",
)
def sk_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a 65-word bloom filter over high-balance customers with one
    bit_or aggregate, probe every distinct order customer against the
    broadcast word table, and tally (maybe, actual) — no row of which
    may be (maybe=false, actual=true), the no-false-negative guarantee.
    At 100 TB the words table is still 65 rows: the probe side scales
    linearly with zero shuffle before the final 4-row aggregate."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    build_keys = customer.filter(F.col("c_acctbal") > BLOOM_ACCTBAL_MIN).select(
        F.col("c_custkey").alias("key")
    )
    pos_cols = _bloom_positions_spark("key")
    build_pos = (
        build_keys.select("key", *pos_cols)
        .selectExpr(
            "key", f"explode(array({', '.join(f'pos{i}' for i in range(BLOOM_PROBES))})) AS pos"
        )
    )
    words = build_pos.groupBy((F.col("pos") / 63).cast("bigint").alias("word")).agg(
        F.bit_or(F.expr("shiftleft(1L, cast(pos % 63 as int))")).alias("w")
    )
    probe_keys = orders.select(F.col("o_custkey").alias("key")).distinct()
    probe_pos = (
        probe_keys.select("key", *pos_cols)
        .selectExpr(
            "key", f"explode(array({', '.join(f'pos{i}' for i in range(BLOOM_PROBES))})) AS pos"
        )
    )
    hits = (
        probe_pos.join(
            F.broadcast(words),
            (F.col("pos") / 63).cast("bigint") == F.col("word"),
            "left",
        )
        .select(
            "key",
            F.when(
                F.expr("(shiftright(coalesce(w, 0L), cast(pos % 63 as int)) & 1) = 1"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("hit"),
        )
        .groupBy("key")
        .agg((F.min("hit") == 1).alias("maybe_member"))
    )
    flags = hits.join(
        F.broadcast(build_keys.withColumn("is_member", F.lit(True))), "key", "left"
    ).select("maybe_member", F.coalesce("is_member", F.lit(False)).alias("is_member"))
    return flags.groupBy("maybe_member", "is_member").agg(F.count("*").alias("n"))


CMS_D = 4  # hash rows
CMS_W = 64  # counters per row

# Shared by the batch query and its streaming twin (streaming/
# sketch_stream.py) so the two registrations are single-sourced: the
# same oracle string, the same cell expansion, the same probe finish.
_CMS_SQL = f"""
    WITH hashed AS (
        SELECT user_id, r, {sql_hash60("concat(CAST(r AS VARCHAR), ':', CAST(user_id AS VARCHAR))")} % {CMS_W} AS bucket
        FROM events, generate_series(0, {CMS_D - 1}) AS g(r)
    ), cms AS (
        SELECT r, bucket, count(*) AS c FROM hashed GROUP BY r, bucket
    ), probes AS (
        SELECT user_id, count(*) AS true_n FROM events
        WHERE user_id % 25 = 0 GROUP BY user_id
    ), est AS (
        SELECT p.user_id, p.true_n, min(cms.c) AS cms_est
        FROM probes p,
             generate_series(0, {CMS_D - 1}) AS g(r)
        JOIN cms ON cms.r = g.r
               AND cms.bucket = {sql_hash60("concat(CAST(g.r AS VARCHAR), ':', CAST(p.user_id AS VARCHAR))")} % {CMS_W}
        GROUP BY p.user_id, p.true_n
    )
    SELECT user_id, true_n, cms_est FROM est
    """


def _cms_rows():
    return F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("r")


def _cms_bucket():
    return (
        F.pmod(
            hash60(
                F.concat(
                    F.col("r").cast("string"),
                    F.lit(":"),
                    F.col("user_id").cast("string"),
                )
            ),
            F.lit(CMS_W),
        )
    ).alias("bucket")


def _cms_cells(ev: DataFrame) -> DataFrame:
    """Expand each key occurrence into its d (row, bucket) cells — the
    map-side input of the d×w counter aggregate."""
    return ev.select("user_id", _cms_rows()).select("user_id", "r", _cms_bucket())


def _cms_probe_estimate(cms: DataFrame, probes: DataFrame) -> DataFrame:
    """The CMS point-estimate finish: min over the d counters each probe
    key hashes to. ``cms`` is the (r, bucket, c) counter table (≤ d·w
    rows — broadcast), ``probes`` is (user_id, true_n)."""
    probe_cells = probes.select("user_id", "true_n", _cms_rows()).select(
        "user_id", "true_n", "r", _cms_bucket()
    )
    return (
        probe_cells.join(F.broadcast(cms), ["r", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("c").alias("cms_est"))
        .select("user_id", "true_n", "cms_est")
    )


@register(
    "sk_cms_heavy_hitters",
    _CMS_SQL,
    doc="count-min sketch: mergeable heavy-hitter counts, engine-exact",
)
def sk_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the event key stream (Cormode &
    Muthukrishnan's public construction): {CMS_D} portable-hash rows ×
    {CMS_W} counters; point estimate = min over rows of the hit
    counter, never under the true count. Engine-exact because the
    hashes are the portable md5-60 family and counters are integers.
    Scale shape: the sketch build is a map-side partial aggregate down
    to d×w = 256 counters regardless of input size, the definition of
    a mergeable summary (bit-identical to merging per-partition
    sketches by cell-wise +); probes join a broadcast 256-row table."""
    ev = load_table(spark, sf_dir, "events")
    cms = _cms_cells(ev).groupBy("r", "bucket").agg(F.count("*").alias("c"))
    probes = (
        ev.filter(F.col("user_id") % 25 == 0)
        .groupBy("user_id")
        .agg(F.count("*").alias("true_n"))
    )
    return _cms_probe_estimate(cms, probes)


# ---------------------------------------------------------------------------
# Portable HyperLogLog (Flajolet et al. 2007): the KMV caveat above rules
# out Spark's engine-private HLL++ bytes, not the *algorithm* — registers
# built from the same md5-derived hash are bit-identical in any engine.
# Layout: 60-bit hash → top 8 bits pick one of m=256 buckets, the low 52
# bits w give rho = (#leading zeros in the 52-bit window) + 1 = 53 -
# bitlength(w). Register = max(rho) per bucket: a partial-agg-mergeable
# max, so a 1000-executor build ships 256 small ints per group, and
# sketch union is elementwise max — the property that makes HLL the
# standard distributed-distinct sketch. The harmonic-mean denominator is
# kept as an exact BIGINT (sum of 2^(53-register) ≤ 256·2^53 < 2^63);
# the estimate does a single IEEE division by it, deterministic across
# engines. The small-range linear-counting correction needs ln(), whose
# last-ulp behavior is libm-specific — so the 256 possible m·ln(m/V)
# values are precomputed in Python and embedded as a literal lookup
# table in both engines (see _HLL_LC_TABLE).
# ---------------------------------------------------------------------------

HLL_M = 256
_HLL_W_MASK = (1 << 52) - 1
_HLL_DENOM_SCALE = 1 << 53
# alpha_m * m^2 * 2^53 precomputed once in Python; the literal is embedded
# in both engines so neither re-derives it with its own float ops.
_HLL_NUMERATOR = 0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M * float(_HLL_DENOM_SCALE)
# Small-range (linear counting) correction, applied when the raw estimate
# is below 2.5m and empty buckets exist: m·ln(m/V). ln() is libm-specific
# in its last ulp, so instead of evaluating it per engine the 256 possible
# values (V = 1..m) are computed HERE once and embedded as literals — both
# engines just index the table, bit-identical by construction.
_HLL_LC_TABLE = tuple(
    HLL_M * __import__("math").log(HLL_M / v) for v in range(1, HLL_M + 1)
)
_HLL_SMALL_RANGE = 2.5 * HLL_M
_SQL_HLL_LC_LIST = "[" + ", ".join(repr(x) for x in _HLL_LC_TABLE) + "]"

_SQL_HLL_REGS_CTE = f"""
    WITH hashed AS (
        SELECT event_type,
               {sql_hash60("CAST(user_id AS VARCHAR)")} AS h
        FROM events
    ), parts AS (
        SELECT event_type, h >> 52 AS bucket, h & {_HLL_W_MASK} AS w
        FROM hashed
    ), regs AS (
        SELECT event_type, bucket,
               max(CASE WHEN w = 0 THEN 53
                        ELSE 53 - length(bin(w)) END) AS register
        FROM parts GROUP BY 1, 2
    )
"""


def _hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parts = ev.select(
        "event_type", hash60(F.col("user_id").cast("string")).alias("h")
    ).select(
        "event_type",
        F.shiftright("h", 52).alias("bucket"),
        F.expr(f"h & {_HLL_W_MASK}").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin("w"))
    )
    return (
        parts.select("event_type", "bucket", rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").cast("int").alias("register"))
    )


@register(
    "sk_hll_registers",
    _SQL_HLL_REGS_CTE
    + """
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
           CAST(register AS INT) AS register
    FROM regs
    """,
    doc="HyperLogLog register table per key (portable hash; integer-exact)",
)
def sk_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch itself: (key, bucket, register) rows — what executors
    emit as partial aggregates and what sketch union merges by
    elementwise max. Integer-exact, so oracle parity is bit-for-bit."""
    return _hll_registers(spark, sf_dir).select(
        "event_type", F.col("bucket").cast("bigint").alias("bucket"), "register"
    )


@register(
    "sk_hll_estimate",
    _SQL_HLL_REGS_CTE
    + f"""
    , denom AS (
        SELECT event_type,
               count(*) AS n_used,
               CAST(sum(1::BIGINT << (53 - register)) AS BIGINT) AS used_scaled
        FROM regs GROUP BY 1
    ), ex AS (
        SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        FROM events GROUP BY event_type
    )
    , raw AS (
        SELECT d.event_type,
               CAST({HLL_M} - d.n_used AS BIGINT) AS n_empty,
               d.used_scaled + ({HLL_M} - d.n_used) * {_HLL_DENOM_SCALE} AS denom_scaled,
               {_HLL_NUMERATOR!r} /
                   CAST(d.used_scaled + ({HLL_M} - d.n_used) * {_HLL_DENOM_SCALE}
                        AS DOUBLE) AS raw_est
        FROM denom d
    )
    SELECT r.event_type, r.n_empty, r.denom_scaled,
           round(CASE WHEN r.n_empty > 0 AND r.raw_est < {_HLL_SMALL_RANGE!r}
                      THEN ({_SQL_HLL_LC_LIST})[r.n_empty]
                      ELSE r.raw_est END, 2) AS est_distinct,
           ex.exact_distinct
    FROM raw r JOIN ex ON ex.event_type = r.event_type
    """,
    doc="HyperLogLog distinct estimate per key, exact integer denominator",
)
def sk_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator over the register table. Empty buckets contribute 2^0
    to the harmonic mean, folded in as (m - n_used)·2^53 on the scaled
    integer denominator — no float accumulation anywhere; the raw
    estimate is one IEEE division, and the small-range branch indexes
    the precomputed m·ln(m/V) literal table (see module constants)."""
    ev = load_table(spark, sf_dir, "events")
    regs = _hll_registers(spark, sf_dir)
    denom = regs.groupBy("event_type").agg(
        F.count("*").alias("n_used"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - register)"))
        .cast("bigint")
        .alias("used_scaled"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    denom_scaled = F.col("used_scaled") + (
        (F.lit(HLL_M) - F.col("n_used")) * F.lit(_HLL_DENOM_SCALE)
    )
    n_empty = (F.lit(HLL_M) - F.col("n_used")).cast("bigint")
    raw_est = F.lit(_HLL_NUMERATOR) / denom_scaled.cast("double")
    lc_table = F.array(*[F.lit(x) for x in _HLL_LC_TABLE])
    est = F.when(
        (n_empty > 0) & (raw_est < F.lit(_HLL_SMALL_RANGE)),
        F.element_at(lc_table, n_empty.cast("int")),
    ).otherwise(raw_est)
    return (
        denom.join(exact, "event_type")
        .select(
            "event_type",
            n_empty.alias("n_empty"),
            denom_scaled.alias("denom_scaled"),
            F.round(est, 2).alias("est_distinct"),
            "exact_distinct",
        )
    )


@register(
    "sk_hll_union_global",
    _SQL_HLL_REGS_CTE
    + f"""
    , merged AS (
        SELECT bucket, max(register) AS register FROM regs GROUP BY 1
    ), denom AS (
        SELECT count(*) AS n_used,
               CAST(sum(1::BIGINT << (53 - register)) AS BIGINT) AS used_scaled
        FROM merged
    ), ex AS (
        SELECT count(DISTINCT user_id) AS exact_distinct FROM events
    )
    SELECT CAST({HLL_M} - d.n_used AS BIGINT) AS n_empty,
           d.used_scaled + ({HLL_M} - d.n_used) * {_HLL_DENOM_SCALE} AS denom_scaled,
           round(CASE WHEN ({HLL_M} - d.n_used) > 0
                       AND {_HLL_NUMERATOR!r} /
                           CAST(d.used_scaled + ({HLL_M} - d.n_used) * {_HLL_DENOM_SCALE}
                                AS DOUBLE) < {_HLL_SMALL_RANGE!r}
                      THEN ({_SQL_HLL_LC_LIST})[{HLL_M} - d.n_used]
                      ELSE {_HLL_NUMERATOR!r} /
                           CAST(d.used_scaled + ({HLL_M} - d.n_used) * {_HLL_DENOM_SCALE}
                                AS DOUBLE) END, 2) AS est_distinct,
           ex.exact_distinct
    FROM denom d, ex
    """,
    doc="global distinct estimate by union-merging per-key HLL sketches",
)
def sk_hll_union_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch union: the global distinct-user estimate computed purely by
    elementwise max over the per-type register tables — never rescanning
    the raw stream. This is the property that lets 1000 executors (or
    1000 days of partial sketches) answer the corpus-wide question with
    m integers per shard."""
    ev = load_table(spark, sf_dir, "events")
    merged = (
        _hll_registers(spark, sf_dir)
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    denom = merged.agg(
        F.count("*").alias("n_used"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - register)"))
        .cast("bigint")
        .alias("used_scaled"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
    denom_scaled = F.col("used_scaled") + (
        (F.lit(HLL_M) - F.col("n_used")) * F.lit(_HLL_DENOM_SCALE)
    )
    n_empty = (F.lit(HLL_M) - F.col("n_used")).cast("bigint")
    raw_est = F.lit(_HLL_NUMERATOR) / denom_scaled.cast("double")
    lc_table = F.array(*[F.lit(x) for x in _HLL_LC_TABLE])
    est = F.when(
        (n_empty > 0) & (raw_est < F.lit(_HLL_SMALL_RANGE)),
        F.element_at(lc_table, n_empty.cast("int")),
    ).otherwise(raw_est)
    return denom.crossJoin(F.broadcast(exact)).select(
        n_empty.alias("n_empty"),
        denom_scaled.alias("denom_scaled"),
        F.round(est, 2).alias("est_distinct"),
        "exact_distinct",
    )
