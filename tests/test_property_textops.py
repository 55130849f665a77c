"""Property-based conformance for the training-data text ops: Hypothesis
generates adversarial corpora (tiny vocab so collisions are dense, repeated
words, single-word docs, duplicate docs) and checks the Spark operators
against straightforward pure-Python references — the same role the pandas
reducer plays for the LWW pipeline."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from debezium_spark.functions import dedup as D
from debezium_spark.functions import text as X

VOCAB = ["a", "bb", "ccc", "dd", "e"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=24).map(" ".join),
    min_size=1,
    max_size=10,
)


def _ref_repetition(doc_id: int, text: str):
    words = text.split(" ")
    wc = Counter(words)
    top_word, top_word_n = min(
        wc.items(), key=lambda kv: (-kv[1], kv[0])
    )
    grams = [f"{a} {b}" for a, b in zip(words, words[1:])]
    if grams:
        gc = Counter(grams)
        top_g, top_g_n = min(gc.items(), key=lambda kv: (-kv[1], kv[0]))
    else:
        top_g, top_g_n = "", 0
    return {
        "doc_id": doc_id,
        "n_words": len(words),
        "n_distinct_words": len(set(words)),
        "top_word": top_word,
        "top_word_n": top_word_n,
        "top_2gram": top_g,
        "top_2gram_n": top_g_n,
    }


def _ref_span_dedup(texts: list[str], span_words: int):
    seen: set[str] = set()
    out = {}
    for doc_id, text in enumerate(texts):
        words = text.split(" ")
        spans = [
            " ".join(words[i : i + span_words])
            for i in range(0, len(words), span_words)
        ]
        kept = []
        for s in spans:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        if kept:
            out[doc_id] = {
                "text_dedup": " ".join(kept),
                "n_spans": len(spans),
                "n_kept": len(kept),
            }
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy)
def test_repetition_stats_matches_reference(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in X.repetition_stats(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _ref_repetition(i, t), (i, t)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy)
def test_dedup_spans_matches_reference(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: {
            "text_dedup": r["text_dedup"],
            "n_spans": r["n_spans"],
            "n_kept": r["n_kept"],
        }
        for r in D.dedup_spans(df, span_words=4).collect()
    }
    assert got == _ref_span_dedup(texts, 4)
