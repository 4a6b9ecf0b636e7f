"""Epoch-shuffle and linear-counting invariants: permutations must be
distinct across epochs yet reproducible, shards must balance, and the
LC estimate must track the true distinct count at the accuracy its
load factor promises."""

from __future__ import annotations

import hashlib
import math

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.epochplan import (
    EPOCHS,
    HEAD_PER_EPOCH,
    SHARDS,
    tx_epoch_shard_balance,
    tx_epoch_shuffle,
)
from big_data_training_spark.extensions.lincount import (
    LC_M,
    sk_linear_counting,
)


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_epoch_shuffle_reproducible_and_distinct(spark, sf_dir):
    doc_ids = [
        r.doc_id
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    got = tx_epoch_shuffle(spark, sf_dir).collect()
    per_epoch: dict[int, list] = {}
    for r in got:
        per_epoch.setdefault(r.epoch, []).append(r)
    assert set(per_epoch) == set(EPOCHS)
    orders = {}
    for e, rows in per_epoch.items():
        assert [r.position for r in rows] == list(
            range(1, HEAD_PER_EPOCH + 1)
        )
        expected = sorted(doc_ids, key=lambda d: (_hash60(f"{e}:{d}"), d))[
            :HEAD_PER_EPOCH
        ]
        assert [r.doc_id for r in rows] == expected
        for r in rows:
            assert r.shard == _hash60(f"{e}:{r.doc_id}") % SHARDS
        orders[e] = tuple(r.doc_id for r in rows)
    # epochs must yield different permutations
    assert len(set(orders.values())) == len(EPOCHS)


def test_shard_balance_conserves_and_is_even(spark, sf_dir):
    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = tx_epoch_shard_balance(spark, sf_dir).collect()
    for e in EPOCHS:
        per = [r for r in rows if r.epoch == e]
        assert sum(r.n_docs for r in per) == n_docs
        # hash balance: no shard beyond +-30% of fair share at fixture n
        for r in per:
            assert 700 <= r.load_permille <= 1300, (e, r.shard, r.load_permille)


def test_linear_counting_accuracy(spark, sf_dir):
    rows = sk_linear_counting(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.occupied_cells <= LC_M
        # the float reference the fixed-point kernel approximates
        z = LC_M - r.occupied_cells
        ref = LC_M * math.log(LC_M / max(z, 1))
        assert abs(r.lc_estimate - ref) <= max(0.06 * ref, 64), (
            r.event_type,
            r.lc_estimate,
            ref,
        )
        # LC at this load factor should be within ~10% of the truth
        assert abs(r.err_permille) <= 100, (r.event_type, r.err_permille)
        assert (
            r.err_permille
            == (r.lc_estimate - r.n_exact) * 1000 // r.n_exact
            or abs(
                r.err_permille
                - (r.lc_estimate - r.n_exact) * 1000 // r.n_exact
            )
            <= 1  # div truncates toward zero, python floors
        )
