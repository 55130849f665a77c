"""Text-analysis operators for large-scale training-data pipelines.

All pure `pyspark.sql.functions` column algebra (JVM-side, codegen'd) — designed to
run over a 100 TB `documents` table with zero Python in the row path. Each operator
has a matching ANSI-SQL oracle in __spark_entry__.py so DuckDB can verify it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword anchors for the n-gram language heuristic.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " in "],
    "de": [" der ", " die ", " und ", " das ", " ist "],
    "fr": [" le ", " la ", " les ", " et ", " est "],
    "es": [" el ", " la ", " que ", " de ", " los "],
}

_STOPWORDS_EN = [
    "the", "and", "of", "to", "in", "a", "is", "that", "it", "for",
    "on", "was", "with", "as", "are", "be", "this", "at", "by", "an",
]


def token_count(col: Column) -> Column:
    """Whitespace token count; 0 for empty/null."""
    t = F.trim(F.coalesce(col, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-approximate token count: word-ish pieces + digits + punctuation runs.

    Regex mirrors the GPT-2 pre-tokenizer shape (contractions | letter runs |
    digit runs | punctuation runs) — a cheap, deterministic token estimator.
    """
    pieces = F.regexp_extract_all(
        F.coalesce(col, F.lit("")),
        F.lit(r"('s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+)"),
        1,
    )
    return F.size(pieces).cast("long")


def punct_ratio(col: Column) -> Column:
    c = F.coalesce(col, F.lit(""))
    total = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", ""))
    return F.when(total > 0, punct.cast("double") / total).otherwise(F.lit(0.0))


def stopword_ratio(col: Column) -> Column:
    """Fraction of whitespace tokens that are (lowercased) English stopwords."""
    toks = F.split(F.lower(F.trim(F.coalesce(col, F.lit("")))), r"\s+")
    n = F.size(toks)
    sw = F.array(*[F.lit(w) for w in _STOPWORDS_EN])
    hits_full = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.when(F.array_contains(sw, t), 1).otherwise(0),
    )
    return F.when(n > 0, hits_full.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite document-quality heuristic in [0,1]:
    length band + moderate punctuation + stopword presence (fluency proxy)."""
    n_chars = F.length(F.coalesce(col, F.lit("")))
    len_ok = F.when((n_chars >= 200) & (n_chars <= 20000), F.lit(1.0)).otherwise(
        F.when(n_chars > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    p = punct_ratio(col)
    punct_ok = F.when((p >= 0.005) & (p <= 0.2), F.lit(1.0)).otherwise(F.lit(0.5))
    s = stopword_ratio(col)
    sw_ok = F.when(s >= 0.1, F.lit(1.0)).otherwise(F.when(s > 0, F.lit(0.5)).otherwise(F.lit(0.0)))
    return ((len_ok + punct_ok + sw_ok) / 3.0).alias("quality")


def language_guess(col: Column) -> Column:
    """Marker-based language ID over {en,de,fr,es}, 'unk' when nothing matches.

    Counts language-specific function-word occurrences (padded, lowercased) and
    picks the max — the classic n-gram/stopword heuristic at trivial cost.
    """
    padded = F.concat(F.lit(" "), F.lower(F.coalesce(col, F.lit(""))), F.lit(" "))

    def score(lang: str) -> Column:
        s = F.lit(0)
        for m in _LANG_MARKERS[lang]:
            # occurrence count via length delta
            s = s + (
                (F.length(padded) - F.length(F.regexp_replace(padded, m.strip(), "")))
                / len(m.strip())
            ).cast("int")
        return s

    scores = F.array(*[
        F.struct(score(lang).alias("s"), F.lit(lang).alias("l"))
        for lang in _LANG_MARKERS
    ])
    best = F.array_max(scores)
    return F.when(best.getField("s") > 0, best.getField("l")).otherwise(F.lit("unk"))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: xxhash64 of punctuation/whitespace-normalized text —
    a rolling-hash-style identity robust to formatting noise."""
    norm = F.regexp_replace(
        F.lower(F.regexp_replace(F.coalesce(col, F.lit("")), r"[^A-Za-z0-9]+", " ")),
        r"\s+",
        " ",
    )
    return F.xxhash64(F.trim(norm))


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection over a documents table."""
    c = F.col(text_col)
    return docs.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        language_guess(c).alias("lang_guess"),
        fingerprint(c).alias("fingerprint"),
    )


def pack_shards(
    docs: DataFrame,
    *,
    tokens_per_shard: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int | None = None,
) -> DataFrame:
    """Assign documents to ~``tokens_per_shard`` training shards by token
    offset: ``shard_id = running_token_offset // tokens_per_shard`` where the
    running offset is the total tokens of all docs with a smaller ``id_col``
    (the streaming-pack rule every sharded-corpus writer uses — deterministic,
    order-stable, every shard within one doc of the budget).

    Scale note — this is a GLOBAL prefix sum, and the naive
    ``Window.orderBy(id)`` with no partition key compiles to ``Exchange
    SinglePartition``: the whole table through one task. Instead, the
    textbook two-pass distributed scan:

    1. range-partition the slim ``(id, n_tokens)`` projection by id and
       freeze it (``localCheckpoint`` — the range sampler must not re-draw
       boundaries between the two passes; swap ``checkpoint`` in on a real
       cluster);
    2. local cumulative sums per partition (window PARTITION BY the physical
       partition id — all partitions in parallel);
    3. one bounded collect of ``n_partitions`` partial totals -> broadcast
       base-offset map added back per row.

    Per-row cost is one slim shuffle + one map lookup regardless of table
    size; the only driver state is one row per partition.
    """
    from pyspark.sql import Window

    n_tok = token_count(F.col(text_col)).alias("n_tokens")
    base = docs.select(F.col(id_col), n_tok)
    parts = partitions or base.sparkSession.sparkContext.defaultParallelism
    ranged = (
        base.repartitionByRange(parts, F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()  # freeze sampled range boundaries across both passes
    )
    w = Window.partitionBy("_pid").orderBy(id_col)
    local = ranged.withColumn(
        "_local_off", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    totals = sorted(
        ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).collect(),
        key=lambda r: r["_pid"],
    )
    bases: dict[int, int] = {}
    run = 0
    for r in totals:
        bases[r["_pid"]] = run
        run += int(r["t"] or 0)
    base_map = F.create_map(
        *[F.lit(x) for pid, off in bases.items() for x in (pid, off)]
    )
    offset = F.col("_local_off") + F.coalesce(
        base_map[F.col("_pid")], F.lit(0)
    )
    return local.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.floor(offset / F.lit(tokens_per_shard)).cast("long").alias("shard_id"),
    )


def repetition_stats(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al. 2021,
    "Scaling Language Models: Methods, Analysis & Insights from Training
    Gopher", table A1 repetition filters): duplicate-word mass and the most
    frequent word / word-2-gram with its occurrence count. Downstream filters
    threshold on e.g. ``top_2gram_n * len(top_2gram) / n_chars`` — the stats
    here are exact integers so the oracle comparison is drift-free, and the
    caller picks the (float) threshold.

    Plan shape at 100 TB: two map-side-combining groupBys keyed
    ``(doc, token)`` (never a per-doc collect), a per-doc window over the
    tiny ``(doc, token, count)`` aggregate, and one join back on ``doc`` —
    every shuffle carries counts, not text. Ties on the top token break
    deterministically (count DESC, token ASC).
    """
    from pyspark.sql import Window

    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    w = F.split(t, " ")
    base = docs.select(
        F.col(id_col),
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct_words"),
        w.alias("_ws"),
    )
    # words and 2-grams explode from the same slim projection; the 2-gram
    # build is a zip of the array with itself shifted by one (pure codegen)
    grams = F.zip_with(
        F.slice(F.col("_ws"), 1, F.size(F.col("_ws")) - 1),
        F.slice(F.col("_ws"), 2, F.size(F.col("_ws")) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )

    def top(tokens: Column, prefix: str) -> DataFrame:
        win = Window.partitionBy(id_col).orderBy(
            F.desc("c"), F.asc("tok")
        )
        return (
            base.select(id_col, F.explode(tokens).alias("tok"))
            .groupBy(id_col, "tok")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rn", F.row_number().over(win))
            .where(F.col("rn") == 1)
            .select(
                id_col,
                F.col("tok").alias(f"top_{prefix}"),
                F.col("c").alias(f"top_{prefix}_n"),
            )
        )

    out = (
        base.drop("_ws")
        .join(top(F.col("_ws"), "word"), id_col)
        .join(top(grams, "2gram"), id_col, "left")
    )
    return out.select(
        id_col,
        "n_words",
        "n_distinct_words",
        "top_word",
        "top_word_n",
        F.coalesce(F.col("top_2gram"), F.lit("")).alias("top_2gram"),
        F.coalesce(F.col("top_2gram_n"), F.lit(0)).cast("long").alias("top_2gram_n"),
    )


# Java-regex / RE2 common-subset patterns (no backrefs, no lookaround) so the
# DuckDB oracle applies the IDENTICAL expressions.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?\d{1,3}[- ]\d{3,4}[- ]?\d{4}"


def scrub_pii(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction for training corpora: replace email addresses and
    phone-shaped numbers with ``<EMAIL>`` / ``<PHONE>`` tokens and count the
    redactions (the scrub every public corpus pipeline applies before
    training; e.g. the C4 / ROOTS preprocessing steps).

    Pure ``regexp_replace`` / ``regexp_extract_all`` column algebra — stays
    in whole-stage codegen, no Python in the row path, embarrassingly
    parallel (no shuffle at all). Emails are scrubbed first; phones are
    counted on the email-scrubbed text so digit runs inside addresses are
    never double-counted.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    no_email = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    return docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(PII_PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(no_email, PII_PHONE_RE, "<PHONE>").alias("text_clean"),
    )


def hash_sample(
    docs: DataFrame,
    *,
    rate_ppm: int,
    id_col: str = "doc_id",
    salt: str = "dbz",
) -> DataFrame:
    """Deterministic corpus sampling: keep a document iff the first 15 hex
    chars of ``md5(salt || ':' || id)`` (a uniform 60-bit integer) fall below
    ``rate_ppm`` parts-per-million — the hash-mod sampling every corpus
    pipeline uses instead of random(): reproducible across runs, stable under
    re-partitioning, and joinable (the same doc is in-sample in every derived
    dataset). Pure codegen'd filter: no shuffle, no RNG state, prunes at the
    scan when id ordering correlates with storage. md5 (not xxhash64) so the
    DuckDB oracle applies the identical expression (dedup._h64, the shared
    oracle-portable hash)."""
    from debezium_spark.functions.dedup import _h64

    bucket = F.pmod(
        _h64(F.col(id_col).cast("string"), salt), F.lit(1_000_000)
    )
    return docs.where(bucket < F.lit(int(rate_ppm))).withColumn(
        "sample_bucket", bucket.cast("long")
    )
