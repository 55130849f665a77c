"""Deduplication operators for training-data pipelines, Spark-first.

Exact dedup is a hash-groupBy; near-dup families are MinHash+LSH (shingle →
minhash signature → bands → bucket join), SimHash, n-gram Jaccard, and
embedding-cosine. Hash functions are md5-hex-prefix based so every operator has a
bit-exact ANSI-SQL oracle (DuckDB) — xxhash64 would be faster but is not portable
to the oracle; swap `_h64`'s body for F.xxhash64 on a real cluster if oracle
parity isn't needed.

Scale notes (100 TB):
  * exact_dedup: one shuffle on a 64-hex digest; map-side combine via min() agg.
  * minhash_lsh: O(docs × perms) signature compute fully codegen'd (no UDF),
    then a self-join restricted to LSH band buckets — candidate pairs only,
    never the full cross product. Band buckets are salted-skew-safe because
    bucket ids include the band index.
  * simhash: 64-bit signature from token hashes; near-dup = signature XOR
    popcount <= k via band-bucket join on 4×16-bit chunks (exact for k<=3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h64(col: Column, salt: int | str = 0) -> Column:
    """Portable 64-bit-ish hash: first 15 hex chars of md5 (60 bits, positive).

    conv() keeps it in [0, 2^60) — identical in DuckDB via
    CAST(('0x' || substr(md5(x),1,15)) AS BIGINT) semantics (see oracle SQL).
    The ONE hash expression every oracle-checked op shares — do not inline
    copies (a drift in any copy silently breaks its oracle parity).
    """
    salted = F.concat(F.lit(f"{salt}:"), col)
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def normalize_text(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics to single spaces — dedup canonical form."""
    return F.trim(
        F.regexp_replace(
            F.lower(F.regexp_replace(col, r"[^A-Za-z0-9]+", " ")), r"\s+", " "
        )
    )


# --------------------------------------------------------------------- exact
def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per exact (normalized) content digest."""
    digest = F.sha2(normalize_text(F.col(text_col)), 256)
    return (
        docs.withColumn("_digest", digest)
        .groupBy("_digest")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )


# ------------------------------------------------------------------ shingles
def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle array over normalized text (distinct, sorted).

    The token array is bound ONCE as a lambda variable (outer transform over a
    1-element wrapper array): referencing the raw `split(normalize(...))`
    expression inside the gram lambda would re-run both regex passes for every
    element_at of every gram — lambda-bound subexpressions are excluded from
    Catalyst CSE, which made the naive form ~6x slower.
    """
    toks = F.split(normalize_text(col), " ")
    grams2d = F.transform(
        F.array(toks),
        lambda t: F.slice(
            F.transform(
                t,
                lambda x, i: F.concat_ws(
                    " ", x, *[F.try_element_at(t, i + k + 1) for k in range(1, n)]
                ),
            ),
            1,
            F.greatest(F.size(t) - (n - 1), F.lit(0)),
        ),
    )
    return F.array_sort(F.array_distinct(F.element_at(grams2d, 1)))


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    prefilter_hash: bool = True,
    max_doc_freq: int | None = 256,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    Candidates come from sharing at least one shingle (inverted index join).
    ``max_doc_freq`` caps posting-list length: a shingle appearing in more than
    that many documents is dropped from the *candidate index only* (the Jaccard
    itself is still computed on the full shingle sets of surviving pairs, so
    reported similarities stay exact). Without the cap, one stop-word shingle
    shared by k documents explodes into k^2 candidate pairs — the classic
    inverted-index skew killer at 100 TB. Pairs whose ONLY shared shingles are
    high-frequency ones are missed; by the Jaccard definition such pairs have
    similarity <= max_doc_freq-capped recall documented here, which is the same
    trade every production MinHash/LSH pipeline makes.
    """
    from pyspark.sql import Window

    sh = docs.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh")
    ).where(F.size("sh") > 0)
    inv = sh.select("id", F.explode("sh").alias("g"))
    if max_doc_freq is not None:
        # One shuffle on g (shared with the candidate join's clustering); the
        # count-window is a single cheap pass even over a skewed posting list.
        inv = inv.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("g"))
        ).where(F.col("_df") <= max_doc_freq).drop("_df")
    cand = (
        inv.alias("a")
        .join(inv.alias("b"), on="g")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    joined = (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return joined.select(
        "id_a", "id_b", (inter / union).alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


# ------------------------------------------------------------------- minhash
def minhash_signature(col: Column, *, n: int = 3, num_perm: int = 32) -> Column:
    """MinHash signature: per permutation p, min over shingles of h(p, shingle)."""
    sh = shingles(col, n)

    # Bind the shingle array once (CSE-exclusion trap, see shingles()); the
    # per-permutation closure keeps each inner lambda single-arg — a 2-param
    # lambda would bind as (element, index) and shadow the salt with the index.
    def mins(t):
        return F.array(
            *[
                F.array_min(F.transform(t, (lambda q: lambda g: _h64(g, salt=q))(p)))
                for p in range(num_perm)
            ]
        )

    return F.element_at(F.transform(F.array(sh), mins), 1)


def minhash_lsh_dedup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    max_band_freq: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-duplicate detection.

    signature (num_perm mins) → `bands` bands of rows=num_perm/bands → bucket id =
    hash(band idx, band slice) → self-join per bucket → estimate Jaccard as
    signature agreement; keep pairs above threshold. Returns (id_a, id_b, est_jaccard).

    ``max_band_freq`` caps band-bucket population — the same skew guard as
    ``ngram_jaccard_pairs``'s ``max_doc_freq``: one degenerate band key shared
    by k documents (boilerplate cluster, empty docs) otherwise emits k² join
    candidates, the classic LSH bucket explosion at 100 TB. A band bucket
    whose population exceeds the cap is dropped from the CANDIDATE INDEX only
    (surviving pairs still score on the full signature); pairs whose every
    shared band is over-populated are missed — but such pairs sit in a ≥cap
    near-dup cluster whose pair OUTPUT is itself O(cap²), so at scale the
    right move is cluster-by-band-key, not pairwise enumeration. Recommended
    at 10^9+ docs: 256 (matches ``max_doc_freq``'s documented trade).
    """
    from pyspark.sql import Window
    rows = num_perm // bands
    sig = docs.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), n=n, num_perm=num_perm).alias("sig"),
    ).where(~F.exists("sig", lambda x: x.isNull()))
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",", *[F.element_at("sig", b * rows + r + 1).cast("string") for r in range(rows)]
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    if max_band_freq is not None:
        # one count-window pass on the (band, bkey) shuffle the candidate
        # join needs anyway — same pattern as ngram max_doc_freq
        banded = (
            banded.withColumn(
                "_bf", F.count(F.lit(1)).over(Window.partitionBy("band", "bkey"))
            )
            .where(F.col("_bf") <= max_band_freq)
            .drop("_bf")
        )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bkey"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return cand.select(
        "id_a", "id_b", (agree.cast("double") / num_perm).alias("est_jaccard")
    ).where(F.col("est_jaccard") >= jaccard_threshold)


# -------------------------------------------------------------------- simhash
SIMHASH_BITS = 60  # _h64 yields 60-bit values (15 hex chars)


def simhash(col: Column) -> Column:
    """SimHash over word tokens: majority vote per bit of per-token hashes -> 60-bit
    signature. For each bit b, the signature bit is set iff more than half the token
    hashes have bit b set — computed without exploding rows.
    """
    toks = F.array_distinct(F.split(normalize_text(col), " "))
    # Single-arg lambda: passing _h64 directly would make PySpark bind its
    # (col, salt=0) signature as an (element, index) lambda, salting each token
    # by the stringified index Column instead of 0.
    th = F.transform(toks, lambda t: _h64(t))

    # Bind the hash array ONCE as a lambda variable (outer transform over a
    # 1-element wrapper): referencing `th` directly in all 60 bit tests would
    # re-hash every token 60x — lambda-bound subexpressions are excluded from
    # Catalyst CSE (same trap as shingles()).
    def fold_bits(t):
        n = F.size(t)
        out = F.lit(0).cast("long")
        for b in range(SIMHASH_BITS):
            mask = 1 << b
            set_cnt = F.size(
                F.filter(
                    t,
                    lambda h: h.bitwiseAND(F.lit(mask).cast("long"))
                    != F.lit(0).cast("long"),
                )
            )
            out = out.bitwiseOR(
                F.when(set_cnt * 2 > n, F.lit(mask).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
            )
        return out

    return F.element_at(F.transform(F.array(th), fold_bits), 1)


def simhash_near_dups(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int | None = None,
    max_bucket_freq: int | None = None,
) -> DataFrame:
    """Near-dups by SimHash: pairs with Hamming distance <= k on 60-bit signatures.

    Candidate generation is Manku-style block permutation (Manku/Jain/Sarma,
    "Detecting Near-Duplicates for Web Crawling", WWW'07 §3): split the 60 bits
    into ``b`` blocks; two signatures within Hamming k differ in at most k
    blocks, so they AGREE on at least ``m = b - k`` blocks — candidates must
    match on the CONCATENATION of some m-block combination, probed across all
    C(b, m) tables. Exact (no recall loss) for any k < b, then verified by
    popcount.

    Why not single-chunk pigeonhole (the r2 design — 4 chunks of 15 bits,
    match on ONE chunk): a 15-bit key space floors candidate volume at
    N²/2^15 REGARDLESS of data — explosive at 10^9 docs. Multi-block
    concatenated keys trade more probe tables (C(6,3)=20 at the k=3 default
    vs 4) for a ~2^30 key space: expected candidate volume N²/2^30 per
    table — six orders of magnitude fewer bucket collisions, and each table's
    join key still partitions the shuffle.

    ``blocks`` defaults to k+3 for k<=4 (30-bit keys, C(k+3,3) tables), k+2
    for k<=8, else k+1. ``max_bucket_freq`` additionally caps per-(table, key)
    population — the same boilerplate-cluster guard as
    ``minhash_lsh_dedup``'s ``max_band_freq`` (a ≥cap cluster of identical
    signatures is better clustered by key than pairwise-enumerated); None
    preserves exactness.
    """
    from itertools import combinations

    from pyspark.sql import Window

    k = int(max_hamming)
    if blocks is None:
        m = 3 if k <= 4 else (2 if k <= 8 else 1)
        blocks = min(k + m, SIMHASH_BITS)
    m = blocks - k
    if m < 1 or blocks > SIMHASH_BITS:
        raise ValueError(
            f"need max_hamming < blocks <= {SIMHASH_BITS}; got k={k}, blocks={blocks}"
        )
    # bit layout: uneven split is fine — pigeonhole needs a partition of the
    # bits, not equal widths
    sizes = [
        SIMHASH_BITS // blocks + (1 if i < SIMHASH_BITS % blocks else 0)
        for i in range(blocks)
    ]
    offs = [sum(sizes[:i]) for i in range(blocks)]

    def block_val(i: int):
        return F.shiftrightunsigned(F.col("sig"), offs[i]).bitwiseAND(
            F.lit((1 << sizes[i]) - 1).cast("long")
        )

    sig = docs.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sig"))
    probes = []
    for t, combo in enumerate(combinations(range(blocks), m)):
        key, shift = F.lit(0).cast("long"), 0
        for i in combo:  # concatenated m-block key, <= 60 bits total
            key = key.bitwiseOR(F.shiftleft(block_val(i), shift))
            shift += sizes[i]
        probes.append(F.struct(F.lit(t).alias("tbl"), key.alias("tkey")))
    keyed = sig.select(
        "id", "sig", F.explode(F.array(*probes)).alias("tt")
    ).select("id", "sig", "tt.tbl", "tt.tkey")
    if max_bucket_freq is not None:
        keyed = (
            keyed.withColumn(
                "_bf", F.count(F.lit(1)).over(Window.partitionBy("tbl", "tkey"))
            )
            .where(F.col("_bf") <= max_bucket_freq)
            .drop("_bf")
        )
    cand = (
        keyed.alias("a")
        .join(keyed.alias("b"), on=["tbl", "tkey"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# ----------------------------------------------------- near-dup clustering
def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Duplicate-pair graph -> duplicate CLUSTERS: ``(id, component)`` where
    ``component`` is the smallest node id reachable from ``id``.

    The step after pair detection every dedup pipeline needs: near-dup
    relations are not transitive (a~b, b~c but not a~c at the threshold), so
    keep-one-per-pair under-deletes; the operational rule is keep one doc per
    CONNECTED COMPONENT of the pair graph.

    Algorithm: distributed min-label propagation — each round every node takes
    ``min(own label, neighbors' labels)``; fixpoint = component minimum.
    Rounds needed = graph diameter, and each round is one groupBy-min shuffle
    over the (deduped, symmetric) edge list with map-side combine. Duplicate
    clusters are near-cliques (diameter a handful of hops even for boilerplate
    families), so propagation converges in a few rounds; for a general
    high-diameter graph at 10^11 edges you would swap in the alternating
    large-star/small-star contraction (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14 — public algorithm) which converges in
    O(log n) rounds; the propagation loop below keeps the per-round plan
    simpler and its convergence check free (the changed-label count rides the
    same job).

    Iterative-plan hygiene: every round references the previous labels twice
    (propagate + least), so an untruncated logical plan DOUBLES per round —
    exponential analyzer/codegen blow-up long before data size matters. Each
    round therefore ends in an eager ``localCheckpoint`` (labels are one slim
    row per node), which both truncates lineage and materializes the frame the
    convergence check reads. On a real cluster point
    ``spark.sparkContext.setCheckpointDir`` at durable storage and swap
    ``checkpoint`` in for executor-loss tolerance.

    Skew: a mega-component funnels all its labels to one min — safe here
    because the shuffle key is the NODE (fan-in per node = its degree), never
    the component id; the min agg combines map-side.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = sym.localCheckpoint()  # edge list is re-read every round
    labels = sym.select(F.col("a").alias("id")).distinct().select(
        "id", F.col("id").alias("component")
    )
    for _it in range(max_iterations):
        nbr = (
            sym.join(
                labels.select(
                    F.col("id").alias("b"), F.col("component").alias("nc")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nc").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels["id"] == nbr["a"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nbr_min"), F.col("component")) < F.col("component"))
                .cast("long")
                .alias("_changed"),
            )
            .localCheckpoint()  # eager: truncate the self-doubling lineage
        )
        changed = new_labels.agg(F.sum("_changed").alias("c")).collect()[0]["c"] or 0
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    return labels


def dup_clusters(
    docs_pairs: DataFrame, *, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Pairs -> per-doc cluster assignment with sizes: ``(id, component,
    cluster_size)``. ``component`` doubles as the keep-representative (the
    smallest doc id), so ``WHERE id != component`` is the delete list."""
    cc = connected_components(docs_pairs, src=src, dst=dst)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "component").select("id", "component", "cluster_size")


def dedup_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 16,
) -> DataFrame:
    """Cross-document exact SPAN dedup: split every document into fixed
    ``span_words``-word windows, keep only the globally FIRST occurrence of
    each span (ordered by ``(id, span_index)``), and re-assemble the
    surviving text — the fixed-window analogue of C4's three-sentence-span
    dedup (Raffel et al. 2020 §2.2) for corpora without sentence structure.

    Plan shape at 100 TB: one explode, ONE shuffle keyed on the span string
    (row_number window per span — bucket population is the duplicate count,
    naturally bounded by corpus redundancy), one map-side-combining groupBy
    to re-assemble. At petabyte scale key the window on ``sha2(span, 256)``
    instead of the raw string so the exchange carries 32-byte digests; the
    raw-string key here keeps the oracle comparison byte-exact. Documents
    whose every span is a duplicate drop out entirely (their text is empty).
    """
    from pyspark.sql import Window

    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    w = F.split(t, " ")
    n_spans = F.floor((F.size(w) + span_words - 1) / F.lit(span_words)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.array_join(
            F.slice(w, i * span_words + 1, span_words), " "
        ),
    )
    exploded = docs.select(
        F.col(id_col), F.posexplode(spans).alias("idx", "span")
    )
    first = Window.partitionBy("span").orderBy(id_col, "idx")
    kept = (
        exploded.withColumn("rn", F.row_number().over(first))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    totals = exploded.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_spans"))
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "span"))),
                lambda s: s.getField("span"),
            ),
            " ",
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return rebuilt.join(totals, id_col).select(
        id_col, "text_dedup", "n_spans", "n_kept"
    )


def word_shingles_expr(text_col: str, ngram_words: int):
    """Unbound column expression: all ``ngram_words``-word shingles of
    ``text_col`` (space-joined, positional — one entry per start offset),
    empty array when the doc is shorter than one shingle. THE shared
    shingle definition for decontaminate and decontaminate_bloom — both
    oracles depend on its exact semantics, so there is exactly one copy."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    w = F.split(t, " ")
    return F.when(
        F.size(w) >= ngram_words,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - ngram_words + 1),
            lambda i: F.array_join(F.slice(w, i, ngram_words), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_words: int = 8,
) -> DataFrame:
    """Benchmark decontamination (Brown et al. 2020, GPT-3 appendix C): flag
    every training document sharing any ``ngram_words``-word shingle with the
    evaluation set, so contaminated docs can be dropped before training.

    Plan shape at 100 TB: the eval side is tiny by construction (benchmarks
    are thousands of docs, the corpus is billions), so its distinct shingle
    set BROADCASTS and the corpus-side probe is a broadcast hash join — no
    corpus shuffle at all; the only aggregation is the per-doc hit count
    (map-side combining groupBy on ``id``). Shingles join on the raw string
    here so the DuckDB oracle is byte-exact; at petabyte scale key on
    ``xxhash64(shingle)`` to shrink both the broadcast and the probe.

    Returns one row per corpus doc: ``(id, n_hits, contaminated)`` where
    ``n_hits`` counts shingle POSITIONS (not distinct shingles) that appear
    anywhere in the eval set.
    """

    sh = word_shingles_expr(text_col, ngram_words)
    eval_sh = eval_docs.select(F.explode(sh).alias("sh")).distinct()
    corpus_sh = docs.select(F.col(id_col), F.explode(sh).alias("sh"))
    hits = (
        corpus_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    salt: str = "winnow",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD 2003 — the
    MOSS algorithm): hash every POSITIONAL word k-gram, then keep the MINIMUM
    hash of each sliding window of ``window`` consecutive k-grams. Guarantees
    any shared substring of >= k + window - 1 words contributes at least one
    shared fingerprint, while storing only ~2/(window+1) of the k-gram hashes
    — the partial-copy detector that whole-doc `fingerprint` and set-based
    Jaccard are not.

    Entirely per-row array algebra (positional grams, _h64 hashes, window
    minima, distinct) — zero shuffles; the ONLY corpus-sized pass is the
    final explode. Hashes are the shared oracle-portable `_h64`, so the
    DuckDB oracle reproduces every fingerprint bit-for-bit.

    Output: one row per DISTINCT (doc, fingerprint): (id_col, fp BIGINT).
    """
    if k < 1 or window < 1:
        raise ValueError("k and window must be >= 1")
    toks = F.split(normalize_text(F.col(text_col)), " ")
    # positional k-grams with the same single-bind CSE pattern as shingles()
    grams2d = F.transform(
        F.array(toks),
        lambda t: F.slice(
            F.transform(
                t,
                lambda x, i: F.concat_ws(
                    " ", x, *[F.try_element_at(t, i + j + 1) for j in range(1, k)]
                ),
            ),
            1,
            F.greatest(F.size(t) - (k - 1), F.lit(0)),
        ),
    )
    grams = F.element_at(grams2d, 1)
    hashes2d = F.transform(
        F.array(grams), lambda g: F.transform(g, lambda x: _h64(x, salt))
    )
    fps = F.transform(
        F.array(F.element_at(hashes2d, 1)),
        lambda h: F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size(h) - (window - 1), F.lit(0))
                ),
                lambda i: F.array_min(F.slice(h, i, window)),
            )
        ),
    )
    out = docs.select(
        F.col(id_col), F.explode(F.element_at(fps, 1)).alias("fp")
    )
    return out


def winnow_shared_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_doc_freq: int | None = 256,
    salt: str = "winnow",
) -> DataFrame:
    """Partial-copy candidate pairs over winnowing fingerprints: documents
    sharing >= ``min_shared`` fingerprints. The inverted-index join carries
    only the winnowed ~2/(window+1) fraction of k-gram hashes (the whole
    point of winnowing at corpus scale), and ``max_doc_freq`` caps posting
    lists exactly like ngram_jaccard_pairs — one boilerplate fingerprint
    shared by n docs can never emit n^2 candidates.

    Output: (id_a, id_b, n_shared), id_a < id_b.
    """
    from pyspark.sql import Window

    inv = winnow_fingerprints(
        docs, id_col=id_col, text_col=text_col, k=k, window=window, salt=salt
    ).select(F.col(id_col).alias("id"), "fp")
    if max_doc_freq is not None:
        inv = inv.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        ).where(F.col("_df") <= max_doc_freq).drop("_df")
    return (
        inv.alias("a")
        .join(inv.alias("b"), "fp")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------- bloom
def _bloom_pos(value: Column, i: int, m_bits: int) -> Column:
    """Bit position of hash i for ``value`` in an m-bit bloom filter.
    xxhash64 (JVM-vectorized — this runs in corpus-sized paths, where the
    md5 portable hash would be the slow choice; membership SEMANTICS, not
    hash values, are what the oracle checks)."""
    return F.pmod(F.xxhash64(F.concat(F.lit(f"b{i}:"), value)), F.lit(m_bits))


def bloom_build(
    df: DataFrame,
    value_col: str,
    *,
    m_bits: int = 1 << 17,
    k_hashes: int = 5,
) -> list:
    """Build an m-bit bloom filter over ``value_col`` and return it as a
    Python list of ``m_bits/64`` ints (the driver-side literal
    :func:`bloom_probe` embeds in its plan).

    Distributed build: each value explodes to ``k_hashes`` bit positions,
    positions groupBy their 64-bit WORD index with a map-side-combined
    ``bit_or`` of single-bit masks — the shuffle carries at most
    ``m_bits/64`` rows total (one per non-zero word), and only that bounded
    word table is collected. Never collects values; never a driver loop
    over rows.

    Sizing: false-positive rate ≈ (1 - e^(-k*n/m))^k; with n keys,
    m = 16n bits and k=5 gives ~5e-4. There are NO false negatives ever
    (pytest-pinned law). At 10^9 keys a 2 GB bit array outgrows a plan
    literal — at that scale hand the filter to executors as a broadcast
    variable inside a pandas UDF, or keep the word TABLE and equi-join on
    word index; this literal form targets the broadcast-filter sweet spot
    (≤ ~2^24 bits) where it replaces a shuffle semi-join outright.
    """
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    v = F.col(value_col).cast("string")
    pos = df.select(
        F.explode(
            F.array(*[_bloom_pos(v, i, m_bits) for i in range(k_hashes)])
        ).alias("pos")
    )
    words = (
        pos.select(
            F.shiftright("pos", 6).alias("widx"),
            # call_function: python F.shiftleft only takes an int shift
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.col("pos").bitwiseAND(F.lit(63)).cast("int"),
            ).alias("mask"),
        )
        .groupBy("widx")
        .agg(F.bit_or("mask").alias("word"))
    )
    arr = [0] * (m_bits // 64)
    for r in words.collect():  # bounded: <= m_bits/64 rows by construction
        arr[int(r["widx"])] = int(r["word"])
    return arr


def bloom_probe(
    df: DataFrame,
    value_col: str,
    words: list,
    *,
    k_hashes: int = 5,
    hit_col: str = "bloom_hit",
    broadcast_threshold_words: int = 1 << 14,
) -> DataFrame:
    """Probe each row's ``value_col`` against a bloom filter built by
    :func:`bloom_build`: adds ``hit_col`` (int 0/1), 1 iff ALL k bits are
    set. The k bit positions are computed into ONE array column and tested
    with a single ``forall`` over ONE shared reference to the word array —
    the array appears exactly once in the physical plan, not once per hash
    (a k-way literal duplication bloats the serialized plan k-fold for
    zero benefit). Up to ``broadcast_threshold_words`` (128 KB of longs)
    the words ride the plan as a literal; above it they ship once per
    executor via a broadcast one-row frame instead, so a 2^24-bit filter
    doesn't serialize megabytes into every task. Either way the probe is a
    zero-shuffle projection over the corpus — the scale payoff vs. a
    semi-join against the key set. Membership law: every inserted value
    hits (no false negatives); non-members hit with probability ≈ the
    documented FP rate, so downstream use is "cheap prefilter, exact check
    on survivors" (or accept the bounded FP rate, as dedup pipelines do).
    """
    m_bits = len(words) * 64
    v = F.col(value_col).cast("string")
    pos_arr = F.array(*[_bloom_pos(v, i, m_bits) for i in range(k_hashes)])

    def _bit_set(word_arr, p):
        word = F.element_at(word_arr, (F.shiftright(p, 6) + F.lit(1)).cast("int"))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), p.bitwiseAND(F.lit(63)).cast("int")
        )
        return word.bitwiseAND(mask) != F.lit(0)

    if len(words) <= broadcast_threshold_words:
        # one py4j call for the whole array — element-wise F.lit would cost
        # thousands of driver round-trips just to BUILD the expression
        lit_words = F.lit([int(w) for w in words]).cast("array<bigint>")
        hit = F.forall(pos_arr, lambda p: _bit_set(lit_words, p))
        return df.withColumn(hit_col, hit.cast("int"))
    wcol = "_bloom_words"
    while wcol in df.columns:  # never collide with (or drop) a caller column
        wcol += "_"
    wdf = df.sparkSession.createDataFrame(
        [([int(w) for w in words],)], f"{wcol} array<bigint>"
    )
    return (
        df.crossJoin(F.broadcast(wdf))
        .withColumn(
            hit_col,
            F.forall(pos_arr, lambda p: _bit_set(F.col(wcol), p)).cast("int"),
        )
        .drop(wcol)
    )


def decontaminate_bloom(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_words: int = 8,
    m_bits: int = 1 << 17,
    k_hashes: int = 5,
) -> DataFrame:
    """:func:`decontaminate` with the eval-shingle set compressed into a
    bloom filter: flags corpus docs sharing any ``ngram_words``-word shingle
    with the eval set, but the corpus-side probe is a zero-join bit test
    instead of a broadcast hash join — the variant to reach for when the
    eval shingle set outgrows a comfortable broadcast hash table (a bloom
    is ~16 bits/key vs ~100+ bytes/key for broadcast strings, ~50x more
    keys in the same executor memory).

    Same output contract as :func:`decontaminate`
    (``id, n_hits, contaminated``) with n_hits counting shingle POSITIONS
    that test positive. False positives inflate n_hits at the documented
    bloom FP rate (size m_bits accordingly); false negatives cannot occur,
    so nothing contaminated is ever missed — the safe failure direction
    for decontamination.
    """

    sh = word_shingles_expr(text_col, ngram_words)
    eval_sh = eval_docs.select(F.explode(sh).alias("sh")).distinct()
    words = bloom_build(eval_sh, "sh", m_bits=m_bits, k_hashes=k_hashes)
    corpus_sh = docs.select(F.col(id_col), F.explode(sh).alias("sh"))
    probed = bloom_probe(corpus_sh, "sh", words, k_hashes=k_hashes)
    hits = (
        probed.where(F.col("bloom_hit") == 1)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )
