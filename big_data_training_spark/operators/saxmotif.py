"""Symbolic time-series analysis: SAX-style discretization of each
user's event-value series and motif (trigram) frequency mining.

SAX (Lin et al. 2003) turns a numeric series into a short alphabet
string so subsequence patterns can be counted, indexed and joined like
tokens — the time-series analogue of the n-gram operators the text
side already has (tx_ngram_novelty, per-user path trigrams). Classic
SAX z-normalizes per series and cuts at Gaussian breakpoints; both
steps are float-heavy, so this engine's variant cuts the raw value
into fixed-width integer bands — the discretize-then-count semantics
(and every count downstream) stay engine-exact, and a deployment can
swap the band function without touching the motif machinery.

Scale: banding is a stateless row map; the sliding trigram window is
partitioned per user (state bounded by one user's history, the same
argument as the sessionization operators); motif counting is one
map-side-combinable groupBy on a key space bounded by |bands|^3.
Nothing global, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_training_spark.data import load_table
from big_data_training_spark.registry import register

BAND_WIDTH = 100  # value in [0, ~490] -> bands 0..4
MOTIF_TOP = 20


@register(
    "ts_sax_motifs",
    f"""
    WITH s AS (
        SELECT user_id, ts, event_id,
               CAST(floor(value / {BAND_WIDTH}) AS BIGINT) AS band
        FROM events
    ),
    w AS (
        SELECT user_id, band AS b0,
               lag(band, 1) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS b1,
               lag(band, 2) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS b2
        FROM s
    ),
    motifs AS (
        SELECT CAST(b2 AS VARCHAR) || CAST(b1 AS VARCHAR)
               || CAST(b0 AS VARCHAR) AS motif
        FROM w WHERE b2 IS NOT NULL
    )
    SELECT motif,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(*) * 1000000 //
                (SELECT count(*) FROM motifs) AS BIGINT) AS share_ppm
    FROM motifs
    GROUP BY motif
    ORDER BY n_occurrences DESC, motif
    LIMIT {MOTIF_TOP}
    """,
    doc=f"SAX-style motif mining: per-user value series discretized "
    f"into width-{BAND_WIDTH} bands, sliding trigram words counted "
    f"globally; top {MOTIF_TOP} motifs with exact ppm share",
)
def ts_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's event values become a band string; every
    3-consecutive-readings word is a motif. The window state is one
    user's series (per-key bounded); the count key space is
    |bands|^3, so the aggregate output is constant-size at any scale.
    Ties in the top-20 break lexicographically — deterministic."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.selectExpr(
        "user_id",
        "ts",
        "event_id",
        f"CAST(floor(value / {BAND_WIDTH}) AS BIGINT) AS band",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    motifs = (
        s.withColumn("b1", F.lag("band", 1).over(w))
        .withColumn("b2", F.lag("band", 2).over(w))
        .filter(F.col("b2").isNotNull())
        .selectExpr(
            "CAST(b2 AS STRING) || CAST(b1 AS STRING)"
            " || CAST(band AS STRING) AS motif"
        )
    )
    total = motifs.agg(F.count("*").alias("tot"))
    return (
        motifs.groupBy("motif")
        .agg(F.expr("CAST(count(*) AS BIGINT)").alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "motif",
            "n_occurrences",
            "CAST(n_occurrences * 1000000 div tot AS BIGINT)"
            " AS share_ppm",
        )
        .orderBy(F.desc("n_occurrences"), "motif")
        .limit(MOTIF_TOP)
    )
