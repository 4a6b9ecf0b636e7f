"""Streaming trigram invariants: the stream must process all
micro-batches (not one big batch), equal the batch miner exactly, and
the tail state must stay at most 2 rows per user."""

from __future__ import annotations

import os

from big_data_training_spark.operators.pathmine import ev_path_trigrams
from big_data_training_spark.streaming import pathmine_stream
from big_data_training_spark.streaming.incremental import N_SEGMENTS
from big_data_training_spark.streaming.pathmine_stream import (
    st_path_trigrams,
)


def test_stream_equals_batch_across_epochs(spark, sf_dir):
    batch = [tuple(r) for r in ev_path_trigrams(spark, sf_dir).collect()]
    stream = [tuple(r) for r in st_path_trigrams(spark, sf_dir).collect()]
    assert stream == batch
    # all segments actually replayed as separate micro-batches
    assert pathmine_stream.last_epochs_applied == list(range(N_SEGMENTS))
