"""Oracle output-type audit.

The external driver hashes *typed* values, so any DuckDB oracle whose
output schema contains a type pandas renders differently from Spark's
(HUGEINT/int128, UBIGINT/uint64) will hash-mismatch even when every value
is numerically identical — the exact bug class behind the 3 red rows in
CORRECTNESS_r03. This audit DESCRIBEs every registered oracle (plan-only,
no execution) and fails on any forbidden output type, so the class cannot
recur.
"""

from __future__ import annotations

import pytest

from big_data_training_spark.registry import all_queries

FORBIDDEN = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")

_SPECS = {n: s for n, s in all_queries().items() if s.oracle is not None}


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_oracle_output_types(duck, name):
    desc = duck.execute(f"DESCRIBE {_SPECS[name].oracle}").fetchdf()
    bad = [
        (r["column_name"], r["column_type"])
        for _, r in desc.iterrows()
        if any(t in str(r["column_type"]).upper() for t in FORBIDDEN)
    ]
    assert not bad, (
        f"oracle for {name} emits driver-hostile types {bad}; "
        "wrap the aggregate in CAST(... AS BIGINT)"
    )
