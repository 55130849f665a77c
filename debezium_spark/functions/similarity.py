"""Similarity search over embedding columns (array<float|double>).

Baseline: brute-force cosine top-k — one pass over the table with
`F.zip_with`/`F.aggregate` dot products (JVM-side, no UDF), `min_by`-style top-k via
window or groupBy-collect avoided in favor of a rank-limit.

Scale path: LSH (random-hyperplane / sign) bucketing — probe only the query's
bucket(s) instead of the full table: at 100 TB this turns a full scan into a
partition-pruned read when the table is written bucketed by `lsh_bucket`.
Hyperplanes are deterministic (seeded hash), so bucket assignment is reproducible
with no stored model.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def scaled(col: Column, scale: int = 10000) -> Column:
    """Portable fixed-point quantization: floor(x*scale + 0.5) as BIGINT.

    Pure IEEE-double ops, bit-identical across engines (Spark, DuckDB, ...),
    unlike double->DECIMAL casts whose rounding mode differs (HALF_UP in Spark,
    half-even in DuckDB)."""
    return F.floor(col * scale + F.lit(0.5)).cast("long")


def brute_force_topk(
    vectors: DataFrame,
    query: list[float],
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    order_scale: int | None = None,
) -> DataFrame:
    """Exact cosine top-k for one query vector: scan, score, take k.

    Uses sort-limit (Spark turns ORDER BY+LIMIT into a TakeOrdered — no full sort
    shuffle, each partition keeps only its local top-k). ``order_scale`` orders by
    the fixed-point-quantized score (ties broken by id) so the selected k rows are
    deterministic across engines computing cosine with different summation order.
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = vectors.select(
        F.col(id_col), cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim")
    )
    order = (
        scaled(F.col("cos_sim"), order_scale) if order_scale else F.col("cos_sim")
    )
    return scored.orderBy(F.desc(order), F.col(id_col)).limit(k)


def _hyperplane(dim: int, plane: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (Box-Muller over a hash chain)."""
    import hashlib

    vals = []
    i = 0
    while len(vals) < dim:
        h = hashlib.sha256(f"{seed}:{plane}:{i}".encode()).digest()
        for j in range(0, 24, 8):
            u1 = (int.from_bytes(h[j : j + 4], "big") + 1) / 2**32
            u2 = (int.from_bytes(h[j + 4 : j + 8], "big") + 1) / 2**32
            vals.append(math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.pi * u2))
            if len(vals) >= dim:
                break
        i += 1
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def lsh_bucket(vec: Column, *, dim: int, planes: int = 8, seed: int = 42) -> Column:
    """Sign-LSH bucket id: bit b = (vec . hyperplane_b) >= 0."""
    out = F.lit(0)
    for b in range(planes):
        hp = F.array(*[F.lit(x) for x in _hyperplane(dim, b, seed)])
        bit = F.when(dot(vec.cast("array<double>"), hp) >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        out = out + bit
    return out.cast("int")


def lsh_topk(
    vectors: DataFrame,
    query: list[float],
    *,
    k: int = 10,
    planes: int = 8,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    order_scale: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only rows in the query's LSH bucket (and buckets
    within `probe_hamming` bit flips — multi-probe to recover boundary losses).

    On a bucketed/partitioned table this is a partition-pruned read; here the
    filter still prunes row groups via predicate pushdown on a materialized
    `lsh_bucket` column when present, else computes it on the fly.
    ``order_scale``: see brute_force_topk — engine-portable deterministic top-k.
    """
    dim = len(query)
    qb = _query_bucket(query, planes=planes, seed=seed)
    probes = {qb}
    if probe_hamming >= 1:
        for b in range(planes):
            probes.add(qb ^ (1 << b))
    if "lsh_bucket" in vectors.columns:
        cand = vectors.where(F.col("lsh_bucket").isin(list(probes)))
    else:
        cand = vectors.withColumn(
            "lsh_bucket", lsh_bucket(F.col(vec_col), dim=dim, planes=planes, seed=seed)
        ).where(F.col("lsh_bucket").isin(list(probes)))
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = cand.select(
        F.col(id_col), cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim")
    )
    order = (
        scaled(F.col("cos_sim"), order_scale) if order_scale else F.col("cos_sim")
    )
    return scored.orderBy(F.desc(order), F.col(id_col)).limit(k)


def _query_bucket(query: list[float], *, planes: int, seed: int) -> int:
    b = 0
    for p in range(planes):
        hp = _hyperplane(len(query), p, seed)
        if sum(x * y for x, y in zip(query, hp)) >= 0:
            b |= 1 << p
    return b


def ivf_assign(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    vec_col: str = "embedding",
    scale: int = 10000,
    broadcast_threshold_cells: int = 1024,
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid cell.

    ``centroids`` is a [(cell_id, vector)] list. Up to
    ``broadcast_threshold_cells`` it rides the plan as ONE 2-D array literal
    (cheap at typical nprobe-era cell counts); above it — at the FAISS
    ``sqrt(N)`` sizing a 10^9-vector index is ~32k cells x 64 dims ≈ 8-16 MB,
    which a plan literal would serialize into EVERY task — the centroid
    matrix ships once per executor via a broadcast one-row frame instead
    (the same threshold switch as ``bloom_probe``'s
    ``broadcast_threshold_words``). Either way the per-row argmax stays
    JVM-side column algebra with no shuffle. Cell choice is deterministic
    and engine-portable: maximize the fixed-point-quantized cosine, ties
    broken toward the SMALLEST cell id — encoded as array_max over
    (scaled_cos, -cell_id) structs so float summation-order drift can never
    flip the winner.

    At scale the table is written partitioned/bucketed by ``ivf_cell`` so a
    probe reads only nprobe partitions (partition pruning), the IVF analogue of
    lsh_topk's bucket pruning.
    """
    e = F.col(vec_col).cast("array<double>")
    cvals = [[float(x) for x in cv] for _, cv in centroids]
    cidvals = [int(cid) for cid, _ in centroids]  # cids may be sparse

    def _best(cmat, cids):
        # one 2-D centroid array + parallel cid array, walked with an indexed
        # transform — never k*dim per-centroid literals
        ranked = F.transform(
            cmat,
            lambda cv, i: F.struct(
                scaled(cosine(e, cv), scale).alias("s"),
                (-F.element_at(cids, i + F.lit(1))).alias("negcid"),
            ),
        )
        return F.array_max(ranked)

    if len(centroids) <= broadcast_threshold_cells:
        best = _best(
            F.lit(cvals).cast("array<array<double>>"),
            F.lit(cidvals).cast("array<int>"),
        )
        return vectors.withColumn(
            "ivf_cell", (-best.getField("negcid")).cast("int")
        )
    ccol, icol = "_ivf_cmat", "_ivf_cids"
    while ccol in vectors.columns or icol in vectors.columns:
        ccol, icol = ccol + "_", icol + "_"  # never collide with caller columns
    cdf = vectors.sparkSession.createDataFrame(
        [(cvals, cidvals)], f"{ccol} array<array<double>>, {icol} array<int>"
    )
    return (
        vectors.crossJoin(F.broadcast(cdf))
        .withColumn(
            "ivf_cell",
            (-_best(F.col(ccol), F.col(icol)).getField("negcid")).cast("int"),
        )
        .drop(ccol, icol)
    )


def ivf_train_kmeans(
    vectors: DataFrame,
    *,
    n_cells: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 16_384,
    iters: int = 10,
) -> list[tuple[int, list[float]]]:
    """Deterministic sampled Lloyd's k-means -> [(cell_id, centroid)] for
    :func:`ivf_assign` / :func:`ivf_topk`.

    The scale contract: training touches a BOUNDED sample (the ``sample``
    lowest-id rows — deterministic, no RNG; at 100 TB the sample collect is a
    pushed-down ``id < ~sample*C`` scan of a few thousand rows), and the
    per-iteration work is pure numpy on the driver: O(sample × n_cells × dim)
    — milliseconds for any sane sizing. The full table is never scanned for
    training; only the one-pass ``ivf_assign`` touches it, exactly like the
    training-free bootstrap.

    Sizing guidance (the FAISS/IVF rule of thumb): ``n_cells ≈ sqrt(N)`` and
    ``nprobe`` 1-10% of cells keeps probe fraction ~nprobe/sqrt(N) and cell
    population ~sqrt(N) — at 10^9 vectors that is ~32k cells, a centroid set
    of a few MB that still ships with the plan as literals. 16 cells / probe
    4 (25% of the table!) is a toy setting — it measures the scorer, not the
    index.

    Deterministic by construction: init = first n_cells sampled vectors,
    assignment ties break toward the lowest cell id, empty cells keep their
    previous centroid. Same inputs -> bit-identical centroids on any host.
    """
    import numpy as np

    rows = (
        vectors.orderBy(F.col(id_col))
        .limit(int(sample))
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    if len(x) < n_cells:
        raise ValueError(f"sample ({len(x)}) smaller than n_cells ({n_cells})")
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0] = 1.0
    xn = x / norms[:, None]                 # spherical k-means (cosine geometry)
    cents = xn[:n_cells].copy()
    for _ in range(int(iters)):
        sims = xn @ cents.T                  # (sample, n_cells)
        # argmax with lowest-cell-id tie-break (np.argmax takes the first max)
        assign = np.argmax(sims, axis=1)
        for c in range(n_cells):
            members = xn[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return [(c, [float(v) for v in cents[c]]) for c in range(n_cells)]


def ivf_centroids_trained(
    vectors: DataFrame,
    *,
    n_cells: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 16_384,
    iterations: int = 2,
    scale: int = 10**6,
) -> list[tuple[int, list[float]]]:
    """Trained IVF coarse centroids via the EXACT fixed-point k-means
    (:func:`kmeans_fit`) over a bounded id-pruned sample — the default
    quantizer for :func:`ivf_topk` / :func:`ivf_pq_topk` (untrained first-N
    centroids skew probe populations once cells stop looking like the data).

    ``n_cells=None`` applies the FAISS sizing rule ``n_cells ≈ sqrt(N)``
    (one count job), clamped to the sample size. Training scans only
    ``id < sample`` (pushed-down at any scale; at 10^10 rows that's a
    16k-row pruned read, never a full-table pass) and every arithmetic step
    is scaled-BIGINT exact, so the same inputs give bit-identical centroids
    on any engine — which is what lets the DuckDB oracle replay the
    training (unrolled Lloyd rounds) and hash-gate the trained index
    end-to-end. Euclidean training + cosine assignment is the standard
    FAISS pairing for IP/cosine IVF. Returns ``[(cell_id, float centroid)]``
    (fixed-point grid points divided by ``scale`` — deterministic doubles).
    """
    if n_cells is None:
        import math

        n_cells = max(1, math.isqrt(vectors.count()))
    n_cells = min(int(n_cells), int(sample))
    train = vectors.where(F.col(id_col) < sample)
    cents = kmeans_fit(
        train, k=n_cells, iterations=iterations,
        vec_col=vec_col, id_col=id_col, scale=scale,
    )
    return [(cid, [c / scale for c in cv]) for cid, cv in enumerate(cents)]


def ivf_topk(
    vectors: DataFrame,
    query: list[float],
    *,
    k: int = 10,
    n_cells: int | None = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    order_scale: int = 10000,
    centroids: list[tuple[int, list[float]]] | None = None,
    train_sample: int = 16_384,
    train_iters: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: probe only the nprobe cells nearest the query.

    Default centroids are TRAINED: :func:`ivf_centroids_trained` runs the
    exact fixed-point k-means over a bounded ``train_sample`` id-pruned
    sample (untrained first-N centroids skew probe populations at scale —
    cells end up shaped by insertion order, not the data). Pass
    ``n_cells=None`` for the ``sqrt(N)`` sizing rule, or explicit
    ``centroids`` (e.g. from :func:`ivf_train_kmeans` for float spherical
    training) — the probe/assign/score machinery is identical either way.
    Everything per-row is column algebra. Probe order and the final top-k
    both rank by the fixed-point score with id tie-breaks, so results are
    deterministic across engines. Probe fraction is ~nprobe/n_cells.
    """
    if centroids is None:
        centroids = ivf_centroids_trained(
            vectors, n_cells=n_cells, vec_col=vec_col, id_col=id_col,
            sample=train_sample, iterations=train_iters,
        )
    # probe set: nprobe cells ranked by (scaled cos to query) desc, cell id asc
    qv = query
    probe_rank = sorted(
        (
            (-_scaled_py(_cos_py(qv, cv), order_scale), cid)
            for cid, cv in centroids
        ),
    )[:nprobe]
    probes = [cid for _, cid in probe_rank]
    assigned = ivf_assign(vectors, centroids, vec_col=vec_col, scale=order_scale)
    cand = assigned.where(F.col("ivf_cell").isin(probes))
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = cand.select(
        F.col(id_col),
        F.col("ivf_cell"),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
    )
    return scored.orderBy(
        F.desc(scaled(F.col("cos_sim"), order_scale)), F.col(id_col)
    ).limit(k)


def _cos_py(a: list[float], b: list[float]) -> float:
    num = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return num / (na * nb) if na > 0 and nb > 0 else 0.0


def _scaled_py(x: float, scale: int = 10000) -> int:
    return int(math.floor(x * scale + 0.5))


def embedding_near_dups(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cosine_threshold: float = 0.95,
    planes: int = 8,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH-bucketed self-join.

    Pairs are only scored inside a shared sign-LSH bucket — candidate generation is
    O(sum bucket^2), not O(n^2). Returns (id_a, id_b, cos_sim >= threshold).
    """
    if dim is None:
        first = vectors.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    v = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        lsh_bucket(F.col(vec_col), dim=dim, planes=planes, seed=seed).alias("b"),
    )
    pairs = (
        v.alias("a")
        .join(v.alias("b"), on="b")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos_sim"),
        )
    )
    return pairs.where(F.col("cos_sim") >= cosine_threshold)


def semantic_dedup(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cosine_threshold: float = 0.95,
    planes: int = 8,
    dim: int | None = None,
    seed: int = 42,
    pairs: DataFrame | None = None,
    max_iterations: int = 50,
) -> DataFrame:
    """SemDeDup: semantic deduplication over an embedding column (public
    algorithm — Abbas et al., "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication", arXiv:2303.09540).

    Pipeline: near-duplicate PAIRS from the LSH-bucketed cosine self-join
    (:func:`embedding_near_dups` — O(sum bucket^2) candidates, never all-pairs),
    then CONNECTED COMPONENTS over the pair graph (near-dup relations are not
    transitive, so keep-one-per-pair under-deletes), then one representative
    kept per component (smallest id — SemDeDup keeps one exemplar per semantic
    cluster; min-id is its deterministic analogue). Returns EVERY input id:
    ``(id_col, component, kept)`` — singletons are their own component and
    always kept, so ``where(kept)`` is the deduplicated corpus and
    ``where(~kept)`` the semantic-duplicate drop list.

    ``pairs``: optionally pass a precomputed/pre-filtered edge frame
    ``(id_a, id_b)`` — e.g. thresholded on a fixed-point-quantized score for
    engine-portable boundaries — instead of the internal pair generation.

    Scale: the pair join is bucket-bounded (``planes`` must grow with N —
    8 planes = 256 buckets); components is the min-label propagation of
    :func:`debezium_spark.functions.dedup.connected_components` (per-round
    slim (id, component) shuffle, map-side-combined min, eager lineage
    truncation); the final assignment is one left join of the full id set
    against the component labels — labels carry two longs per CLUSTERED doc
    only, far smaller than the corpus whenever dedup is worth running.
    """
    from debezium_spark.functions.dedup import connected_components

    if pairs is None:
        pairs = embedding_near_dups(
            vectors,
            vec_col=vec_col,
            id_col=id_col,
            cosine_threshold=cosine_threshold,
            planes=planes,
            dim=dim,
            seed=seed,
        )
    cc = connected_components(
        pairs.select("id_a", "id_b"), max_iterations=max_iterations
    )
    out = (
        vectors.select(F.col(id_col))
        .join(cc.withColumnRenamed("id", id_col), on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        )
    )
    return out.withColumn("kept", F.col(id_col) == F.col("component"))


def pq_codebooks_from_head(
    vectors: DataFrame,
    *,
    m: int = 4,
    ks: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Training-free product-quantization codebooks: sub-slices of the first
    ``ks`` vectors by id (the PQ analogue of ivf_topk's head-row coarse
    centroids — deterministic, no RNG, and the collect is ``ks`` rows pushed
    down as an ``id < ks`` scan). Returns ``codebooks[s][j]`` = the j-th
    sub-centroid of subspace s; train real codebooks per-subspace with
    k-means over a bounded sample at scale (same recipe as
    :func:`ivf_train_kmeans` applied to each slice) — the encode/search
    machinery is identical either way.
    """
    rows = (
        vectors.where(F.col(id_col) < ks)
        .select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    if len(rows) < ks:
        raise ValueError(f"need at least ks={ks} head vectors, got {len(rows)}")
    head = [list(r["v"]) for r in sorted(rows, key=lambda r: r[id_col])][:ks]
    dim = len(head[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    return [[v[s * d : (s + 1) * d] for v in head] for s in range(m)]


def _pq_int_kmeans(
    sub_int: list[list[list[int]]], ks: int, iterations: int, scale: int
) -> list[list[list[float]]]:
    """Per-subspace exact integer Lloyd's k-means over scaled-BIGINT
    subvectors (same arithmetic contract as :func:`kmeans_fit`: argmin of
    exact integer squared distance with ties to the smallest code, update =
    per-dim ``sum DIV count`` truncating toward zero, empty codes keep their
    previous sub-centroid, init = first ``ks`` subvectors). ``sub_int[s]``
    is subspace s's sample subvectors in id order. Pure driver-side ints
    over a bounded sample — bit-identical on any host, which is what lets
    an SQL oracle replay the training. Returns float codebooks
    (ints / scale — deterministic doubles)."""
    m = len(sub_int)
    out: list[list[list[float]]] = []
    for s in range(m):
        xs = sub_int[s]
        if len(xs) < ks:
            raise ValueError(f"subspace {s}: sample {len(xs)} < ks={ks}")
        cents = [list(v) for v in xs[:ks]]
        for _ in range(int(iterations)):
            sums = [[0] * len(cents[0]) for _ in range(ks)]
            counts = [0] * ks
            for v in xs:
                best = min(
                    (sum((a - b) * (a - b) for a, b in zip(v, cv)), j)
                    for j, cv in enumerate(cents)
                )[1]
                counts[best] += 1
                for dd, a in enumerate(v):
                    sums[best][dd] += a
            for j in range(ks):
                if counts[j]:
                    cents[j] = [
                        abs(s_) // counts[j] * (1 if s_ >= 0 else -1)
                        for s_ in sums[j]
                    ]
        out.append([[c / scale for c in cv] for cv in cents])
    return out


def pq_train_codebooks(
    vectors: DataFrame,
    *,
    m: int = 4,
    ks: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 16_384,
    iterations: int = 2,
    scale: int = 10**6,
) -> list[list[list[float]]]:
    """Trained product-quantization codebooks: quantize a bounded id-pruned
    sample once to scaled BIGINTs, then run the exact integer k-means of
    :func:`_pq_int_kmeans` independently per subspace — the trained default
    for :func:`pq_topk` (head-row codebooks cover only the head's corner of
    the space; trained sub-centroids cut ADC quantization error across the
    whole sample). The collect is ``id < sample`` (pushed down — never a
    full scan), training is driver-side integer arithmetic over it, and the
    result is deterministic on any engine, so a DuckDB oracle can replay
    the training and hash-gate the trained index end-to-end."""
    rows = (
        vectors.where(F.col(id_col) < sample)
        .select(F.col(id_col).alias("_id"), _kq(vec_col, scale).alias("vq"))
        .collect()
    )
    vqs = [list(r["vq"]) for r in sorted(rows, key=lambda r: r["_id"])]
    if not vqs:
        raise ValueError("empty training sample")
    dim = len(vqs[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    sub = [[v[s * d : (s + 1) * d] for v in vqs] for s in range(m)]
    return _pq_int_kmeans(sub, ks, iterations, scale)


def _sq_dist(a: Column, b: Column) -> Column:
    """Exact-order squared L2: left-to-right fold of (a-b)*(a-b) — the same
    IEEE op sequence the DuckDB oracle and the driver-side table use."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    vec_col: str = "embedding",
    scale: int = 10000,
    code_col: str = "pq_code",
) -> DataFrame:
    """Product-quantization encode: split each vector into ``m`` subvectors,
    assign each to its nearest sub-centroid (squared L2, fixed-point
    quantized, ties to the smallest code), and pack the ``m`` codes into ONE
    BIGINT (``sum(code_s << (bits*s))`` — how FAISS stores PQ codes).

    The compression that makes 10^10-vector ANN feasible: a 64-dim float32
    vector (256 B) becomes m*log2(ks) bits (here 2 B — 128x). Codebooks ship
    as plan literals (m*ks sub-centroids — a few KB even for production
    m=16/ks=256); the encode is ONE scan of pure codegen'd column algebra —
    no shuffle, no Python, no UDF. Argmin is encoded as array_min over
    (scaled_dist, code) structs so float summation-order drift can never
    flip a winner (same trick as ivf_assign).
    """
    e = F.col(vec_col).cast("array<double>")
    return vectors.withColumn(code_col, _pq_pack_expr(e, codebooks, scale))


def _pq_pack_expr(
    e: Column, codebooks: list[list[list[float]]], scale: int
) -> Column:
    """Packed-code expression over any array<double> Column (raw vector for
    plain PQ, cell residual for IVF-PQ) — per-subspace argmin of scaled
    squared L2, ties to the smallest code, codes bit-packed into one long."""
    m, ks = len(codebooks), len(codebooks[0])
    bits = max(1, (ks - 1).bit_length())
    d = len(codebooks[0][0])
    packed = F.lit(0).cast("long")
    for s in range(m):
        sub = F.slice(e, s * d + 1, d)
        ranked = F.array(
            *[
                F.struct(
                    F.floor(
                        _sq_dist(sub, F.array(*[F.lit(float(x)) for x in cv]))
                        * scale
                        + 0.5
                    ).cast("long").alias("d"),
                    F.lit(j).alias("code"),
                )
                for j, cv in enumerate(codebooks[s])
            ]
        )
        code_s = F.array_min(ranked).getField("code")
        packed = packed + F.shiftleft(code_s.cast("long"), bits * s)
    return packed


def pq_topk(
    vectors: DataFrame,
    query: list[float],
    codebooks: list[list[list[float]]],
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 10000,
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k: score every vector by the SUM of
    per-subspace distances between the query's subvectors and each CODE's
    sub-centroid — the query-time half of IVF-PQ (Jegou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011).

    The ADC distance table (m x ks scaled-integer literals, computed once
    driver-side from query + codebooks) ships with the plan, so the scan
    reads ONLY the packed code column — at 10^10 vectors that is the
    difference between scanning 2 GB of codes and 2.5 TB of floats. Scores
    are exact BIGINT sums of table entries (engine-portable, no float in the
    row path); top-k is TakeOrdered (per-partition heaps), never a global
    sort. Compose with IVF cell pruning (encode residuals per cell) for the
    full IVF-PQ index; this operator is the ADC scorer both variants share.

    Output: (id_col, pq_code, adc_dist_fp) — the k smallest ADC distances,
    ties broken by id.
    """
    m, ks = len(codebooks), len(codebooks[0])
    bits = max(1, (ks - 1).bit_length())
    d = len(codebooks[0][0])
    if len(query) != m * d:
        raise ValueError(f"query dim {len(query)} != {m * d}")

    def sqd(a: list[float], b: list[float]) -> int:
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        import math

        return int(math.floor(acc * scale + 0.5))

    dtab = [
        [sqd(query[s * d : (s + 1) * d], cv) for cv in codebooks[s]]
        for s in range(m)
    ]
    coded = pq_encode(vectors, codebooks, vec_col=vec_col, scale=scale)
    mask = (1 << bits) - 1
    adc = F.lit(0).cast("long")
    for s in range(m):
        code_s = F.shiftright(F.col("pq_code"), bits * s).bitwiseAND(F.lit(mask))
        adc = adc + F.element_at(
            F.array(*[F.lit(int(v)) for v in dtab[s]]), code_s.cast("int") + 1
        ).cast("long")
    return (
        coded.select(id_col, "pq_code", adc.alias("adc_dist_fp"))
        .orderBy(F.asc("adc_dist_fp"), F.col(id_col))
        .limit(k)
    )


def ivf_pq_topk(
    vectors: DataFrame,
    query: list[float],
    *,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 4,
    ks: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 10000,
    centroids: list[tuple[int, list[float]]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    train_sample: int = 16_384,
    train_iters: int = 2,
) -> DataFrame:
    """IVF-PQ ANN top-k — the canonical 10^10-vector index (FAISS IVFPQ;
    Jegou et al. TPAMI 2011 §IV): coarse-quantize each vector to an IVF cell,
    PQ-encode its RESIDUAL (vector minus cell centroid), and at query time
    probe only the ``nprobe`` nearest cells, scoring candidates with a
    per-probed-cell ADC table built from the QUERY's residual in that cell.

    Why this is the at-scale composition of the two indexes this module
    already ships: IVF prunes the scan to ~nprobe/n_cells of the table
    (partition pruning when the lake is written partitioned by ivf_cell),
    and PQ shrinks what the probed scan reads to m*log2(ks) bits per vector.
    Residual encoding is what makes the shared codebooks tight across cells
    — residuals live near the origin regardless of which cell a vector is in.

    All distance math is fixed-point: cell assignment and code assignment
    quantize before argmin (ties to smallest id/code), the nprobe*m*ks ADC
    tables are scaled-integer literals computed driver-side, and the final
    score is an exact BIGINT sum — deterministic on any engine/partitioning.

    Defaults are TRAINED and deterministic: centroids come from the exact
    fixed-point k-means over a bounded ``train_sample`` id-pruned sample
    (:func:`ivf_centroids_trained` — untrained first-N cells skew probe
    populations at 10^9 vectors), and codebooks from the same exact integer
    k-means per subspace over the sample's RESIDUALS w.r.t. their assigned
    cells (:func:`_pq_int_kmeans`). Both trainings touch only the pruned
    sample, and both are bit-reproducible on any engine. Pass explicit ones
    to override — the encode/probe/score machinery is identical.

    Output: (id_col, ivf_cell, pq_code, adc_dist_fp), k smallest ADC
    distances over the probed cells, ties by id.
    """
    import math

    if centroids is None:
        centroids = ivf_centroids_trained(
            vectors, n_cells=n_cells, vec_col=vec_col, id_col=id_col,
            sample=train_sample, iterations=train_iters,
        )
    cent = dict(centroids)
    dim = len(query)

    def nearest_cell(v: list[float]) -> int:
        # -_scaled_py(cos), NOT _scaled_py(-cos): floor(-x+0.5) differs from
        # -floor(x+0.5) exactly on .5 boundaries, and this driver-side
        # ranking must agree bit-for-bit with ivf_assign's runtime rule
        # (max floor(cos*scale+0.5), tie to smallest cid) or the residual
        # codebooks train against cells the vectors never occupy
        best = min(
            (
                (-_scaled_py(_cos_py(v, cv), scale), cid)
                for cid, cv in centroids
            )
        )
        return best[1]

    def residual(v: list[float], cid: int) -> list[float]:
        c = cent[cid]
        return [a - b for a, b in zip(v, c)]

    if codebooks is None:
        # trained residual codebooks: exact integer k-means per subspace
        # over the pruned sample's residuals (quantized once at 10^6)
        samp_rows = (
            vectors.where(F.col(id_col) < train_sample)
            .select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
            .collect()
        )
        if len(samp_rows) < ks:
            raise ValueError(f"need at least ks={ks} sample vectors")
        samp = [list(r["v"]) for r in sorted(samp_rows, key=lambda r: r[id_col])]
        res = [residual(v, nearest_cell(v)) for v in samp]
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        d = dim // m
        q6 = 10**6
        res_int = [
            [int(math.floor(x * q6 + 0.5)) for x in v] for v in res
        ]
        sub = [[v[s * d : (s + 1) * d] for v in res_int] for s in range(m)]
        codebooks = _pq_int_kmeans(sub, ks, train_iters, q6)
    d = len(codebooks[0][0])
    bits = max(1, (ks - 1).bit_length())

    # probe order: nprobe cells nearest the query (same rounding rule as
    # ivf_topk and nearest_cell — negate AFTER quantizing)
    probes = [
        cid
        for _, cid in sorted(
            (-_scaled_py(_cos_py(query, cv), scale), cid)
            for cid, cv in centroids
        )[:nprobe]
    ]

    def sqd(a: list[float], b: list[float]) -> int:
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return int(math.floor(acc * scale + 0.5))

    # per-probed-cell ADC tables over the QUERY residual in that cell
    dtabs = {
        c: [
            [sqd(residual(query, c)[s * d : (s + 1) * d], cv) for cv in codebooks[s]]
            for s in range(m)
        ]
        for c in probes
    }

    assigned = ivf_assign(vectors, centroids, vec_col=vec_col, scale=scale)
    cand = assigned.where(F.col("ivf_cell").isin(probes))
    e = F.col(vec_col).cast("array<double>")
    cent_lits = {
        c: F.array(*[F.lit(float(x)) for x in cent[c]]) for c in probes
    }
    res_expr = None
    for c in probes:
        r = F.zip_with(e, cent_lits[c], lambda a, b: a - b)
        cond = F.col("ivf_cell") == c
        res_expr = r if res_expr is None else F.when(cond, r).otherwise(res_expr)
    # (when-chain order: later probes override earlier 'otherwise' — each row
    # matches exactly one cell, so the chain is a disjoint case split)
    coded = cand.withColumn("pq_code", _pq_pack_expr(res_expr, codebooks, scale))
    mask = (1 << bits) - 1
    adc = F.lit(0).cast("long")
    for s in range(m):
        code_s = (
            F.shiftright(F.col("pq_code"), bits * s).bitwiseAND(F.lit(mask)).cast("int")
        )
        tab_s = None
        for c in probes:
            arr = F.array(*[F.lit(int(v)) for v in dtabs[c][s]])
            cond = F.col("ivf_cell") == c
            tab_s = arr if tab_s is None else F.when(cond, arr).otherwise(tab_s)
        adc = adc + F.element_at(tab_s, code_s + 1).cast("long")
    return (
        coded.select(id_col, "ivf_cell", "pq_code", adc.alias("adc_dist_fp"))
        .orderBy(F.asc("adc_dist_fp"), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------- scalar quant
def sq_params_from_head(
    vectors: DataFrame,
    *,
    head: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[float], list[float]]:
    """Per-dimension scalar-quantization params (FAISS SQ8 analogue): from
    the first ``head`` vectors by id (deterministic, pushed-down
    ``id < head`` scan, bounded collect), ``mins[d]`` and ``steps[d] =
    (max_d - min_d) / 255`` — the affine grid mapping each dimension onto
    0..255. Out-of-range values in the full table clamp (the standard SQ
    saturation trade; widen the head sample if the tails matter)."""
    rows = (
        vectors.where(F.col(id_col) < head)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    if not rows:
        raise ValueError("empty head sample")
    dim = len(rows[0]["v"])
    mins = [min(r["v"][d] for r in rows) for d in range(dim)]
    maxs = [max(r["v"][d] for r in rows) for d in range(dim)]
    steps = [(maxs[d] - mins[d]) / 255.0 or 1.0 for d in range(dim)]
    return mins, steps


def _sq_code(value: Column, mn: float, st: float) -> Column:
    code = F.floor((value - F.lit(mn)) / F.lit(st) + F.lit(0.5)).cast("long")
    return F.greatest(F.lit(0).cast("long"), F.least(F.lit(255).cast("long"), code))


def sq_encode(
    vectors: DataFrame,
    mins: list[float],
    steps: list[float],
    *,
    vec_col: str = "embedding",
    code_col: str = "sq_code",
) -> DataFrame:
    """SQ8 encode: each dimension to its nearest grid point
    ``clamp(floor((v - min_d)/step_d + 0.5), 0, 255)`` — a 64-dim float32
    vector (256 B) becomes 64 bytes (4x; PQ goes further, SQ keeps
    per-dimension fidelity and needs no codebook training). Params ride
    the plan as literals; the encode is one zero-shuffle scan of codegen'd
    array algebra. Output codes are ``array<long>`` holding 0..255."""
    v = F.col(vec_col).cast("array<double>")
    codes = F.array(
        *[_sq_code(F.element_at(v, d + 1), mins[d], steps[d]) for d in range(len(mins))]
    )
    return vectors.withColumn(code_col, codes)


def sq_topk(
    vectors: DataFrame,
    query: list[float],
    mins: list[float],
    steps: list[float],
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "sq_code",
) -> DataFrame:
    """Top-k nearest by squared L2 IN CODE SPACE: the query quantizes onto
    the same grid driver-side, and every distance is the exact BIGINT
    ``sum((qc_d - c_d)^2)`` — pure integer algebra, so ranking is
    deterministic on any engine/partitioning (float ADC never touches the
    scan). Ties break by id. The scan reads only the code column once
    codes are materialized — the SQ payoff at 10^10 vectors: a 4x-smaller
    scan plus integer SIMD distances, with no codebook to train; recall
    equals exact search up to grid rounding (dims off by <= half a step).

    Output: (id, dist_sq) ascending.
    """
    if not (len(query) == len(mins) == len(steps)):
        raise ValueError("query/mins/steps length mismatch")
    qc = [
        max(0, min(255, int(math.floor((query[d] - mins[d]) / steps[d] + 0.5))))
        for d in range(len(query))
    ]
    enc = sq_encode(vectors, mins, steps, vec_col=vec_col, code_col=code_col)
    dist = F.aggregate(
        F.zip_with(
            F.col(code_col),
            F.array(*[F.lit(c).cast("long") for c in qc]),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        enc.select(F.col(id_col).alias("id"), dist.alias("dist_sq"))
        .orderBy(F.asc("dist_sq"), F.asc("id"))
        .limit(k)
    )


# ------------------------------------------------------------ exact k-means
def _kq(vec_col: str, scale: int) -> Column:
    """Vector quantized ONCE to scaled BIGINTs — after this every k-means
    distance and centroid update is exact integer arithmetic."""
    return F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * scale + F.lit(0.5)).cast("long"),
    )


def _nearest_cluster(vq: Column, centroids: list[list[int]]) -> Column:
    """Argmin over centroids of exact BIGINT squared distance; ties to the
    smallest cluster id (min over (dist, cid) structs — integer fields, so
    no float drift can flip a winner). The centroid matrix rides the plan
    as ONE 2-D array literal walked with an indexed transform — k*dim
    per-centroid literals would bloat the serialized plan k-fold (the same
    fix as bloom_probe's shared word array)."""
    cents = F.lit([[int(c) for c in cv] for cv in centroids]).cast(
        "array<array<bigint>>"
    )
    cands = F.transform(
        cents,
        lambda cv, i: F.struct(
            F.aggregate(
                F.zip_with(vq, cv, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
            i.alias("cid"),
        ),
    )
    return F.array_min(cands)


def kmeans_fit(
    vectors: DataFrame,
    *,
    k: int = 8,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 10**6,
) -> list[list[int]]:
    """Exact fixed-point Lloyd's k-means — the clustering step of
    topic-balancing / SemDeDup-style curation, engineered so the FIT is
    bit-reproducible on any engine/partitioning (a float k-means cannot be
    hash-gated: both the distances and the centroid means accumulate in
    partition order):

    * vectors quantize ONCE to scaled BIGINTs (units of 1/scale);
    * assignment = argmin of exact BIGINT squared distance, ties to the
      smallest cluster id;
    * update = per-dimension ``sum DIV count`` (exact TRUNCATING integer
      division, toward zero — the SQL convention; sums go negative, where
      Python ``//`` would floor and drift from the oracle by one unit) —
      centroids stay BIGINT grids forever;
    * init = the first ``k`` vectors by id (deterministic, pushed-down
      ``id < k`` scan — swap in sampled init at scale, the machinery is
      identical);
    * FIXED ``iterations`` (the convergence budget is part of the
      contract), so the oracle is unrolled SQL like graph.pagerank's.

    Per iteration: one zero-join assignment scan (centroids ride the plan
    as k*dim literals) + one map-side-combined per-(cluster, dim) sum
    whose output is k*dim rows — the only driver traffic. Empty clusters
    keep their previous centroid (the standard Lloyd fallback, and the
    deterministic one).

    Returns ``centroids[cid] = [scaled ints]``; feed to
    :func:`kmeans_assign`.
    """
    if k < 1 or iterations < 0:
        raise ValueError("need k >= 1 and iterations >= 0")
    head = (
        vectors.where(F.col(id_col) < k)
        .select(F.col(id_col).alias("_id"), _kq(vec_col, scale).alias("vq"))
        .collect()
    )
    if len(head) < k:
        raise ValueError(f"need at least k={k} head vectors, got {len(head)}")
    cents = [list(r["vq"]) for r in sorted(head, key=lambda r: r["_id"])][:k]
    quant = vectors.select(_kq(vec_col, scale).alias("vq"))
    for _ in range(iterations):
        assigned = quant.select(
            _nearest_cluster(F.col("vq"), cents).getField("cid").alias("cid"), "vq"
        )
        sums = (
            assigned.select("cid", F.posexplode("vq").alias("d", "val"))
            .groupBy("cid", "d")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: k * dim rows
        )
        new_cents = [list(c) for c in cents]  # empty clusters keep position
        by_cid: dict[int, list] = {}
        for r in sums:
            by_cid.setdefault(r["cid"], []).append(r)
        for cid, rows in by_cid.items():
            for r in rows:
                s_, n_ = int(r["s"]), int(r["n"])
                # TRUNCATING division (toward zero), not Python floor:
                # centroid sums go negative, and SQL integer division
                # (DuckDB //, Spark div) truncates — the oracle contract
                new_cents[cid][r["d"]] = abs(s_) // n_ * (1 if s_ >= 0 else -1)
        cents = new_cents
    return cents


def kmeans_assign(
    vectors: DataFrame,
    centroids: list[list[int]],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 10**6,
) -> DataFrame:
    """Assign every vector to its nearest fitted centroid:
    ``(id, cluster, dist_sq)`` with the exact BIGINT distance in scaled
    units squared. One zero-join, zero-shuffle scan — centroids are plan
    literals, the argmin is integer struct-min column algebra."""
    best = _nearest_cluster(_kq(vec_col, scale), centroids)
    return vectors.select(
        F.col(id_col).alias("id"),
        best.getField("cid").alias("cluster"),
        best.getField("d").alias("dist_sq"),
    )
