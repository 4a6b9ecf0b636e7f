"""RAKE and path-mining invariants, proven against pure-Python
brute-force reimplementations on the small fixture."""

from __future__ import annotations

from big_data_training_spark.data import load_table
from big_data_training_spark.extensions.keywords import (
    RAKE_MAX_PHRASE_LEN,
    RAKE_STOPWORDS,
    RAKE_TOP_WORDS,
    tx_rake_top_phrases,
    tx_rake_word_scores,
)
from big_data_training_spark.operators.pathmine import ev_path_trigrams


def _rake_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    phrases: list[list[str]] = []
    for d in docs:
        cur: list[str] = []
        for w in (t for t in d.text.split(" ") if t):
            if w in RAKE_STOPWORDS:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
    kept = [p for p in phrases if len(p) <= RAKE_MAX_PHRASE_LEN]
    for p in kept:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p)
    return freq, deg, kept


def test_rake_word_scores_bruteforce(spark, sf_dir):
    freq, deg, _ = _rake_stats(spark, sf_dir)
    expected = sorted(
        (
            (deg[w] * 1000 // freq[w], freq[w], w)
            for w in freq
        ),
        key=lambda t: (-t[0], -t[1], t[2]),
    )[:RAKE_TOP_WORDS]
    got = tx_rake_word_scores(spark, sf_dir).collect()
    assert [
        (r.score_permille, r.freq, r.word) for r in got
    ] == expected
    for r in got:
        assert r.word not in RAKE_STOPWORDS
        assert r.deg >= r.freq  # every occurrence is in a phrase of len>=1


def test_rake_phrases_structure(spark, sf_dir):
    freq, deg, kept = _rake_stats(spark, sf_dir)
    wscore = {w: deg[w] * 1000 // freq[w] for w in freq}
    phrase_counts: dict[str, int] = {}
    phrase_score: dict[str, int] = {}
    for p in kept:
        if len(p) < 2:
            continue
        text = " ".join(p)
        phrase_counts[text] = phrase_counts.get(text, 0) + 1
        phrase_score[text] = sum(wscore[w] for w in p)
    got = tx_rake_top_phrases(spark, sf_dir).collect()
    assert got
    for r in got:
        toks = r.phrase.split(" ")
        assert 2 <= len(toks) <= RAKE_MAX_PHRASE_LEN
        assert not set(toks) & set(RAKE_STOPWORDS)
        assert r.n_occurrences == phrase_counts[r.phrase]
        assert r.score_permille == phrase_score[r.phrase]
        assert r.phrase_len == len(toks)


def test_trigrams_bruteforce(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    per_user: dict[int, list] = {}
    for e in events:
        per_user.setdefault(e.user_id, []).append(e)
    counts: dict[tuple, int] = {}
    for seq in per_user.values():
        seq.sort(key=lambda e: (e.ts, e.event_id))
        types = [e.event_type for e in seq]
        for i in range(len(types) - 2):
            k = tuple(types[i : i + 3])
            counts[k] = counts.get(k, 0) + 1
    total = sum(counts.values())
    got = ev_path_trigrams(spark, sf_dir).collect()
    assert {
        (r.step1, r.step2, r.step3): r.n_paths for r in got
    } == counts
    for r in got:
        assert r.share_permille == r.n_paths * 1000 // total
