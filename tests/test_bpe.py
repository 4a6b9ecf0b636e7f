"""BPE training invariants: the bracket-encoding ``replace()`` trick is
proven equal to a pure-Python greedy left-to-right merge, and the full
training loop is cross-checked against a brute-force Python BPE trainer
on the small fixture."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.bpe import (
    N_MERGES,
    lm_bpe_train_rounds,
)


def _encode(tokens: list[str]) -> str:
    return "".join(f"({t})" for t in tokens)


def _py_merge(tokens: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b)."""
    out: list[str] = []
    i = 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


_tok = st.text(alphabet="ab", min_size=1, max_size=3)


@given(st.lists(_tok, min_size=0, max_size=12), _tok, _tok)
@settings(max_examples=300, deadline=None)
def test_bracket_replace_is_greedy_merge(tokens, a, b):
    """replace('(a)(b)' -> '(ab)') on the bracket encoding == greedy
    left-to-right merge — including self-overlap ((a)(a)(a)(a)) and
    tokens that are substrings of each other."""
    got = _encode(tokens).replace(f"({a})({b})", f"({a}{b})")
    assert got == _encode(_py_merge(tokens, a, b))


def _py_train(word_freqs: dict[str, int], rounds: int):
    seqs = {w: list(w) for w in word_freqs}
    log = []
    for r in range(1, rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, toks in seqs.items():
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] = (
                    counts.get((toks[i], toks[i + 1]), 0) + word_freqs[w]
                )
        # max weight, ties broken by the bracket-pair string ascending
        # (the engine's ORDER BY wc DESC, pair ASC).
        (a, b), wc = min(
            counts.items(), key=lambda kv: (-kv[1], f"({kv[0][0]})({kv[0][1]})")
        )
        log.append((r, a, b, wc))
        seqs = {w: _py_merge(t, a, b) for w, t in seqs.items()}
    return log


def test_train_rounds_match_python_bpe(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    freqs: dict[str, int] = {}
    for d in docs:
        for w in re.findall("[a-z]+", d.text.lower()):
            freqs[w] = freqs.get(w, 0) + 1
    expected = _py_train(freqs, N_MERGES)

    rows = lm_bpe_train_rounds(spark, sf_dir).orderBy("round").collect()
    assert len(rows) == N_MERGES
    for row, (r, a, b, wc) in zip(rows, expected):
        assert row["round"] == r
        assert row["pair"] == f"({a})({b})"
        assert row["merged"] == f"({a}{b})"
        assert row["wc"] == wc
