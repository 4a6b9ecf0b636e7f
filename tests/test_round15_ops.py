"""Invariant checks for the round-15 optimization changes — contracts
the DuckDB oracle cannot see (conf wiring, the pin-sizing rule) plus
the subset lemma the one-pass ppjoin audit rests on.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pin_rule_scales_with_trigger_volume():
    """The streaming shuffle pin is the documented rule
    pin = clamp(ceil(bytes/target), floor, cap) — it must sit at the
    measured sf0.1 floor for today's tiny per-trigger volumes and GROW
    with synthetic volume (the 100 TB footgun VERDICT r14 #5 names:
    a constant pin would serialize the stateful operators)."""
    from big_data_training_spark.streaming.replay import (
        _LIGHT_STREAM_PIN_FLOOR,
        _STREAM_PIN_CAP,
        _STREAM_PIN_FLOOR,
        _TARGET_TRIGGER_BYTES_PER_TASK,
        pin_for_trigger_bytes,
    )

    # unknown / tiny volume -> floor (today's measured optima)
    assert pin_for_trigger_bytes(None, _STREAM_PIN_FLOOR) == "16"
    assert pin_for_trigger_bytes(0, _LIGHT_STREAM_PIN_FLOOR) == "4"
    assert pin_for_trigger_bytes(1, _LIGHT_STREAM_PIN_FLOOR) == "4"
    # every sf0.1 per-trigger volume stays at its floor (A/B-flat
    # contract of the r15 change): largest single fixture ~10.8 MB,
    # largest segment ~0.6 MB, dual-source j2 ~4.1 MB
    assert pin_for_trigger_bytes(11 << 20, _STREAM_PIN_FLOOR) == "16"
    assert pin_for_trigger_bytes(600 << 10, _LIGHT_STREAM_PIN_FLOOR) == "4"
    assert pin_for_trigger_bytes(4200 << 10, _LIGHT_STREAM_PIN_FLOOR) == "4"
    # the volume term takes over at scale and scales linearly
    t = _TARGET_TRIGGER_BYTES_PER_TASK
    assert pin_for_trigger_bytes(64 * t, _LIGHT_STREAM_PIN_FLOOR) == "64"
    assert pin_for_trigger_bytes(64 * t, _STREAM_PIN_FLOOR) == "64"
    assert pin_for_trigger_bytes(1024 * t, _STREAM_PIN_FLOOR) == "1024"
    # cap bounds pathological volumes
    assert pin_for_trigger_bytes(1 << 50, _STREAM_PIN_FLOOR) == str(
        _STREAM_PIN_CAP
    )


def test_pin_rule_wired_through_sessions(spark):
    """light_stream_session / stream_session must apply the rule, not a
    constant: a synthetic large trigger volume yields a clone pinned
    above the floor, while the parent session stays untouched."""
    from big_data_training_spark.streaming.replay import (
        _TARGET_TRIGGER_BYTES_PER_TASK,
        light_stream_session,
        stream_session,
    )

    big = 256 * _TARGET_TRIGGER_BYTES_PER_TASK
    assert (
        light_stream_session(spark, trigger_bytes=big).conf.get(
            "spark.sql.shuffle.partitions"
        )
        == "256"
    )
    assert (
        stream_session(spark, trigger_bytes=big).conf.get(
            "spark.sql.shuffle.partitions"
        )
        == "256"
    )
    assert (
        spark.conf.get("spark.sql.shuffle.partitions") != "256"
    )


def test_recorded_trigger_bytes_consumed_once():
    """read_stream_table records each source fixture's size on the
    current thread; the pin consumer takes the SUM exactly once (a
    stale record must never size the next query's pin)."""
    from big_data_training_spark.streaming.replay import (
        _record_trigger_bytes,
        take_recorded_trigger_bytes,
    )

    take_recorded_trigger_bytes()  # drain whatever this thread holds
    _record_trigger_bytes(100)
    _record_trigger_bytes(23)
    assert take_recorded_trigger_bytes() == 123
    assert take_recorded_trigger_bytes() == 0


def test_prefix_candidates_subset_of_index_candidates(spark, sf_dir):
    """The lemma the one-pass ppjoin audit rests on: every prefix
    candidate pair is also a full-index candidate pair (a prefix
    collision on h implies df(h) >= 2, so the df>=2 self-join pairs the
    same docs). If this ever broke, n_prefix_candidates would silently
    undercount in the joined aggregate."""
    from big_data_training_spark.extensions import dedup as _dedup
    from big_data_training_spark.extensions.ppjoin import (
        _index_candidates,
        _prefix_candidates,
    )

    inv1 = _dedup._capped_inverted_index(
        spark, sf_dir, sample_pct=_dedup.EXACT_AUDIT_SAMPLE_PCT
    )
    cand = _prefix_candidates(inv1)
    idx = _index_candidates(inv1)
    assert cand.join(idx, ["doc_i", "doc_j"], "left_anti").count() == 0
    assert cand.count() > 0  # vacuous subset would certify nothing
