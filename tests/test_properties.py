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


def test_cluster_components_invariants(spark, sf_dir):
    """Connected components over the near-dup pair graph: both ends of
    every pair share a component, the component id is the minimum
    member id, and docs outside the pair graph don't appear."""
    from big_data_training_spark.extensions.dedup import (
        dd_cluster_components,
        dd_minhash_lsh_pairs,
    )

    pairs = dd_minhash_lsh_pairs(spark, sf_dir).collect()
    comp = {
        r.doc_id: r.component_id
        for r in dd_cluster_components(spark, sf_dir).collect()
    }
    nodes = {d for r in pairs for d in (r.doc_i, r.doc_j)}
    assert set(comp) == nodes
    for r in pairs:
        assert comp[r.doc_i] == comp[r.doc_j], (r.doc_i, r.doc_j)
    members: dict[int, list[int]] = {}
    for node, c in comp.items():
        members.setdefault(c, []).append(node)
    for c, ms in members.items():
        assert c == min(ms), (c, ms)


def test_components_chain_graph_converges(spark):
    """Adversarial chain 0-1-2-…-N: diameter N defeats naive min-label
    propagation round caps; large-star/small-star must still converge
    (O(log² n) rounds) and label every node with the chain minimum."""
    from big_data_training_spark.extensions.components import (
        connected_components,
    )

    n = 300
    chain = [(i, i + 1) for i in range(n)]
    # a second component plus an isolated-pair component, shuffled ids
    extra = [(1000 + i, 1000 + (i + 1) % 7) for i in range(7)] + [(5000, 4999)]
    edges = spark.createDataFrame(chain + extra, "doc_i bigint, doc_j bigint")
    got = {
        r.node: r.comp
        for r in connected_components(edges, max_rounds=12).collect()
    }
    assert {r for r in got} == set(range(n + 1)) | {1000 + i for i in range(7)} | {4999, 5000}
    assert all(got[i] == 0 for i in range(n + 1))
    assert all(got[1000 + i] == 1000 for i in range(7))
    assert got[4999] == 4999 and got[5000] == 4999


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=10, deadline=None)
def test_components_match_union_find(spark, pairs):
    """Star-algorithm labels equal a reference union-find on arbitrary
    small graphs (self-loops and duplicate edges included)."""
    from big_data_training_spark.extensions.components import (
        connected_components,
    )

    edges = spark.createDataFrame(pairs, "doc_i bigint, doc_j bigint")
    got = {r.node: r.comp for r in connected_components(edges).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in pairs:
        if a == b:
            continue
        nodes |= {a, b}
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in nodes}
    assert got == want


def test_token_pack_partitions_corpus(spark, sf_dir):
    """Packing is a partition of the corpus: per-source doc counts and
    token totals are preserved, and every pack except a shard's last
    stays under budget + its own overflow document."""
    from big_data_training_spark.extensions.textstats import tx_token_pack

    packs = tx_token_pack(spark, sf_dir).collect()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.ceil(F.length("text") / 4.0).cast("bigint")).alias("tok"),
        )
        .collect()
    )
    want = {r.source: (r.n, r.tok) for r in docs}
    got: dict[str, list[int]] = {}
    for p in packs:
        n, tok = got.setdefault(p.source, [0, 0])
        got[p.source] = [n + p.n_docs, tok + p.n_tokens]
    assert {s: tuple(v) for s, v in got.items()} == want


def test_split_assign_deterministic_and_partitioning(spark, sf_dir):
    """The split assignment is a total function of doc_id: stable across
    invocations, every doc in exactly one split, ratios near 80/10/10."""
    from big_data_training_spark.extensions.textstats import tx_split_assign

    a = {r.doc_id: r.split for r in tx_split_assign(spark, sf_dir).collect()}
    b = {r.doc_id: r.split for r in tx_split_assign(spark, sf_dir).collect()}
    assert a == b
    n = len(a)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert n == n_docs
    train = sum(1 for s in a.values() if s == "train") / n
    assert 0.6 < train < 0.95


# --- FastSS deletion-variant blocking soundness -------------------------


def _deletion_variants(s: str) -> set[str]:
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


@given(
    st.text(alphabet="abc", min_size=0, max_size=10),
    st.integers(min_value=0, max_value=10),
    st.sampled_from(["sub", "ins", "del", "same"]),
    st.sampled_from("abc"),
)
@settings(max_examples=300, deadline=None)
def test_deletion_blocking_sound_for_ed1(s, pos, op, ch):
    """Any pair within edit distance 1 must share a deletion variant —
    the soundness invariant dd_fuzzy_title_pairs' candidate join relies
    on (overgeneration is fine; misses are not)."""
    if op == "same":
        t = s
    elif op == "sub" and s:
        i = pos % len(s)
        t = s[:i] + ch + s[i + 1 :]
    elif op == "del" and s:
        i = pos % len(s)
        t = s[:i] + s[i + 1 :]
    else:
        i = pos % (len(s) + 1)
        t = s[:i] + ch + s[i:]
    assert _deletion_variants(s) & _deletion_variants(t)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(0, 10**9),
    st.binary(min_size=0, max_size=400),
)
def test_wav_roundtrip_header_fields(doc_id, body):
    """synth_wav → parse_wav_header must recover exactly the fields the
    generator encoded, for arbitrary payloads (incl. bodies that contain
    'data'/'fmt ' byte sequences — the chunk walk must not be fooled)."""
    from big_data_training_spark.extensions.multimodal_av import (
        _RATES,
        parse_wav_header,
        synth_wav,
    )

    payload = synth_wav(doc_id, body)
    parsed = parse_wav_header(payload)
    assert parsed is not None
    channels, rate, bits, n_frames = parsed
    block_align = (1 + doc_id % 2) * 2
    assert channels == 1 + doc_id % 2
    assert rate == _RATES[doc_id % 3]
    assert bits == 16
    assert n_frames == len(body) // block_align


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_wav_parser_rejects_non_wav(junk):
    """Arbitrary junk without RIFF/WAVE framing parses to None."""
    from big_data_training_spark.extensions.multimodal_av import parse_wav_header

    if junk[:4] == b"RIFF" and junk[8:12] == b"WAVE":
        return  # astronomically unlikely, but not this test's subject
    assert parse_wav_header(junk) is None


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
                min_size=1, max_size=200))
def test_zvalue_interleave_bijective(spark, pairs):
    """The Z-order bit-interleave must be a bijection on 16-bit pairs:
    de-interleaving the Spark-computed z recovers (a, b) exactly, and z
    is within 32 bits. One Spark roundtrip per example, batched."""
    from big_data_training_spark.operators.layout import _z_expr

    sdf = spark.createDataFrame(pairs, "a int, b int").selectExpr(
        "a", "b", _z_expr("a", "b") + " AS z"
    )
    for r in sdf.collect():
        z = r.z
        assert 0 <= z < (1 << 32)
        a = sum(((z >> (2 * i)) & 1) << i for i in range(16))
        b = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (a, b) == (r.a, r.b)


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 10**9), st.binary(min_size=0, max_size=600))
def test_mp4_roundtrip_header_fields(doc_id, body):
    """synth_mp4 → parse_mp4 must recover exactly the encoded container
    fields for arbitrary payloads — including bodies embedding fake
    'moov'/'mvhd' box headers, which the size-driven walk must ignore."""
    from big_data_training_spark.extensions.multimodal_av import (
        _FPS,
        _TIMESCALES,
        parse_mp4,
        synth_mp4,
    )

    parsed = parse_mp4(synth_mp4(doc_id, body))
    assert parsed is not None
    timescale, duration, width, height, n_top = parsed
    assert timescale == _TIMESCALES[doc_id % 3]
    assert duration == (len(body) // 256) * timescale // _FPS[doc_id % 3]
    assert width == 320 + 16 * (doc_id % 8)
    assert height == 240 + 16 * ((doc_id * 3) % 8)
    assert n_top == 3  # ftyp, moov, mdat


def test_mp4_walker_not_fooled_by_embedded_boxes():
    from big_data_training_spark.extensions.multimodal_av import parse_mp4, synth_mp4
    import struct

    # body contains a byte-perfect fake moov+mvhd with a bogus timescale
    fake = struct.pack(">I", 116) + b"moov" + struct.pack(">I", 108) + b"mvhd" + b"\x00" * 100
    payload = synth_mp4(7, fake * 3)
    parsed = parse_mp4(payload)
    assert parsed is not None
    assert parsed[0] == 1000  # real timescale (7 % 3 == 1), not the fake 0


_words = st.text(
    alphabet=st.sampled_from("abcde"), min_size=2, max_size=10
)


@settings(max_examples=50, deadline=None)
@given(st.lists(_words, min_size=1, max_size=20), st.sampled_from("abcde"), st.sampled_from("abcde"))
def test_bpe_greedy_fold_invariants(words, a, b):
    """The lm_bpe_second_round string fold must implement greedy
    leftmost merging: after applying merge (a, b), (1) no adjacent
    symbol pair is exactly (a, b); (2) concatenating the symbols
    reproduces the word; (3) every symbol is either one char or the
    merged pair. Verified against a reference Python implementation of
    the same fold rule."""

    def fold(w: str) -> list[str]:
        syms: list[str] = []
        for ch in w:
            if syms and syms[-1] == a and ch == b:
                syms[-1] = syms[-1] + ch
            else:
                syms.append(ch)
        return syms

    for w in words:
        syms = fold(w)
        assert "".join(syms) == w
        assert all(s == a + b or len(s) == 1 for s in syms)
        assert not any(
            syms[i] == a and syms[i + 1] == b for i in range(len(syms) - 1)
        )


@settings(max_examples=10, deadline=None)
@given(
    st.lists(_words, min_size=1, max_size=10, unique=True),
    st.sampled_from("abcde"),
    st.sampled_from("abcde"),
)
def test_bpe_sql_fold_matches_reference(spark, words, a, b):
    """The ACTUAL SQL fold used by lm_bpe_second_round (BPE_FOLD_EXPR) must produce the reference greedy-leftmost merge for arbitrary words and any merge pair - the cross-engine contract the oracle relies on."""
    from big_data_training_spark.extensions.lmstats import BPE_FOLD_EXPR

    def fold(w: str) -> list[str]:
        syms: list[str] = []
        for ch in w:
            if syms and syms[-1] == a and ch == b:
                syms[-1] = syms[-1] + ch
            else:
                syms.append(ch)
        return syms

    sdf = spark.createDataFrame(
        [(w, a, b) for w in words], "w string, a string, b string"
    )
    got = {
        r.w: r.s for r in sdf.select("w", F.expr(BPE_FOLD_EXPR).alias("s")).collect()
    }
    for w in words:
        assert got[w] == "|".join(fold(w)), (w, a, b, got[w])


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet=st.sampled_from("xyz "), min_size=0, max_size=60), min_size=1, max_size=6))
def test_window_hash_batches_counts(texts):
    """The Arrow-batched sliding-window hasher must emit exactly
    max(len(tokens) - W + 1, 0) windows per doc, in md5-hex form, and
    identical tokens must yield identical hashes across docs."""
    import pandas as pd

    from big_data_training_spark.extensions.filters import (
        SPAN_W,
        _window_hash_batches,
    )

    pdf = pd.DataFrame(
        {"doc_id": list(range(len(texts))), "text": texts}
    ).astype({"doc_id": "int64"})
    out = pd.concat(list(_window_hash_batches([pdf])), ignore_index=True)
    for i, t in enumerate(texts):
        n_tok = len(t.split())
        expect = max(n_tok - SPAN_W + 1, 0)
        assert (out["doc_id"] == i).sum() == expect
    assert all(len(h) == 32 for h in out["h"])
    # determinism: same text twice -> same hash multiset
    pdf2 = pd.DataFrame({"doc_id": [0, 1], "text": [texts[0], texts[0]]}).astype(
        {"doc_id": "int64"}
    )
    out2 = pd.concat(list(_window_hash_batches([pdf2])), ignore_index=True)
    assert sorted(out2[out2.doc_id == 0]["h"]) == sorted(
        out2[out2.doc_id == 1]["h"]
    )


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(-(10**15), 10**15), min_size=1, max_size=20),
    st.integers(1, 10**9),
)
def test_integer_division_semantics_match_duckdb(spark, xs, s):
    """The power-iteration / permille paths rely on Spark's `div` and
    DuckDB's `//` agreeing on signed operands (both truncate toward
    zero). Property-check the full signed range we use."""
    import duckdb

    duck = [
        duckdb.sql(f"SELECT CAST({x} AS BIGINT) // CAST({s} AS BIGINT)").fetchone()[0]
        for x in xs
    ]
    rows = (
        spark.createDataFrame([(x,) for x in xs], "x bigint")
        .select(F.expr(f"x div CAST({s} AS BIGINT)").alias("d"))
        .collect()
    )
    assert [r.d for r in rows] == duck


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(0, 10**6), min_size=2, max_size=60, unique=True),
    st.integers(1, 8),
)
def test_bottomk_sample_is_mergeable(spark, ids, k):
    """The KMV/bottom-k property sm_bottomk_sample's scale claim rests
    on: bottom-k of a union == bottom-k of the concatenated per-shard
    bottom-ks, for ANY shard split."""
    import hashlib

    def h(i: int) -> int:
        return int(hashlib.md5(f"sample:{i}".encode()).hexdigest()[:15], 16)

    mid = len(ids) // 2
    shard_a, shard_b = ids[:mid], ids[mid:]
    bottom = lambda seq: sorted(seq, key=lambda i: (h(i), i))[:k]  # noqa: E731
    merged = bottom(bottom(shard_a) + bottom(shard_b))
    assert merged == bottom(ids)


@given(
    st.integers(min_value=0, max_value=10**12),
    st.integers(min_value=1, max_value=200),
)
def test_attribution_splits_conserve_cents(cents, n):
    """The three multi-touch credit formulas (linear, position-based,
    time-decay) must conserve cents exactly for ANY purchase value and
    touch count — the floor-remainder algebra, mirrored from
    operators/attribution.py, checked over the whole input space."""
    # linear: every touch cents//n, remainder to the most recent
    linear = [cents // n] * n
    linear[0] = cents - (n - 1) * (cents // n)
    assert sum(linear) == cents and all(c >= 0 for c in linear)

    # position-based: 40/40/20 with remainders to the last touch
    if n == 1:
        pos = [cents]
    else:
        first = (2 * cents) // 5
        mid = (cents - 2 * ((2 * cents) // 5)) // (n - 2) if n > 2 else 0
        last = cents - first - (n - 2) * mid
        pos = [first] + [mid] * (n - 2) + [last]
    assert sum(pos) == cents and all(c >= 0 for c in pos)

    # time-decay: arbitrary positive integer weights (power-of-two in
    # production; any weights must conserve), remainder to touch 0
    weights = [1 << (i % 4) for i in range(n)]
    tot = sum(weights)
    base = [(cents * w) // tot for w in weights]
    credits = list(base)
    credits[0] += cents - sum(base)
    assert sum(credits) == cents and all(c >= 0 for c in credits)
