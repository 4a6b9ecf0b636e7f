"""Streaming CDC → SCD2: the incremental merge must be genuinely
multi-batch AND converge to the batch closed form (the oracle hash
checks the latter; here we also check it directly and assert the
micro-batch count so a single-batch degenerate run can't pass)."""

from __future__ import annotations

from big_data_training_spark.operators.cdc import cdc_scd2_history
from big_data_training_spark.streaming import cdc_stream
from big_data_training_spark.streaming.cdc_stream import (
    N_SEGMENTS,
    st_scd2_stream,
)


def test_scd2_stream_matches_batch_and_is_incremental(spark, sf_dir):
    streamed = st_scd2_stream(spark, sf_dir)
    assert sorted(cdc_stream.last_epochs_applied) == list(range(N_SEGMENTS))
    batch = cdc_scd2_history(spark, sf_dir)
    key = lambda r: (r.user_id, r.valid_from, r.event_type)  # noqa: E731
    s_rows = sorted(streamed.collect(), key=key)
    b_rows = sorted(batch.collect(), key=key)
    assert len(s_rows) == len(b_rows)
    assert s_rows == b_rows
