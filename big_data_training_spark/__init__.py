"""big_data_training_spark — a PySpark-native batch + streaming analytics
engine realizing the capability surface of the reference corpus
``yihaoye/big-data-training`` (see SURVEY.md for the operator inventory).

Everything is idiomatic Spark SQL / DataFrame / Structured Streaming:
Catalyst is the optimizer, Tungsten/WholeStageCodegen the runtime; we do
not hand-schedule execution. Operator IDs in docstrings (S1, A6, C1, ...)
refer to SURVEY.md §2, which cites the reference spec by file:line.
"""

from big_data_training_spark.session import get_session, session_builder
from big_data_training_spark.data import TABLES, load_table, load_tables, register_views

__all__ = [
    "get_session",
    "session_builder",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
]

__version__ = "0.1.0"
