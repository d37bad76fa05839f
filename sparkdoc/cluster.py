"""Trained vector quantization: distributed Lloyd's k-means, trained-IVF
search and product quantization (PQ) with asymmetric-distance (ADC) scoring —
the FAISS IVF/PQ pair re-expressed as Spark DataFrame plans.

The reference repo has no vector engine; these are LLM-data-pipeline
additions completing the ANN family (similarity.py: brute force, hyperplane
LSH, untrained IVF, SQ8). They close similarity.ivf_assign's "deterministic
quantizer standing in for trained k-means" note: centroids here are actually
trained, so cell populations follow the data distribution (balanced probe
cost) instead of random unit directions.

Determinism contract (the oracle-twin property everything here keeps):

- data vectors are unit-normalized once per row (sequential folds);
- every assignment is argmin-L2, computed as argmax(dot(x, c) - ||c||²/2)
  over centroids in ascending cell order with strict '>' (row norm is
  constant under the argmin, so L2 reduces to a dot plus a per-centroid
  constant) — ties go to the lowest cell, reproducing row_number over
  (score DESC, cell ASC) in any engine;
- centroid updates sum integer micro-units (round(x·1e6) AS BIGINT):
  BIGINT sums are order- and partitioning-independent, so the fit is
  bit-identical across runs and engines — the same quantization trick the
  classifier (classifier.py) and DSIR (selection.py) gates rely on;
- a new centroid component is s / (cnt · 1e6): one double multiply and one
  divide on exact integers, IEEE-identical in Spark, python and DuckDB.

Scale shape (100 TB): per Lloyd iteration ONE job — a map-side argmax over
plan-literal centroids (shuffle-FREE assignment, same shape as
similarity.ivf_assign) plus a map-side-combined groupBy(cell) producing
k·dim BIGINT sums; only k rows ever reach the driver. Train on a
deterministic hash sample (``train_mod``) and assign the full corpus once —
the standard MLlib/FAISS recipe. PQ then stores m small ints per vector
(m·1 byte vs dim·4 — 32× smaller scans at m=8/dim=64) and ADC scores a
candidate with m table lookups instead of dim multiply-adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparkdoc.similarity import _as_double, _with_unit, dot

#: micro-unit scale for the integer centroid-update sums
E6 = 1e6


def _quantize(vec: Column) -> Column:
    """round(x·1e6) per element as BIGINT — the exact-update representation."""
    return F.transform(vec, lambda x: F.round(x * E6).cast("long"))


def _half_sq(c: list[float]) -> float:
    """||c||²/2 with a sequential left fold starting at 0.0 — matches the
    DuckDB twin's list_reduce over squares exactly (0.0 + x² == x²)."""
    acc = 0.0
    for x in c:
        acc += x * x
    return acc / 2


def _lit_vec(c: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in c])


def l2_argmax_cell(vec: Column, cents: list[list[float]]) -> Column:
    """argmin-L2 cell id as a shuffle-free fold over plan-literal centroids:
    argmax(dot(v, c) - ||c||²/2), strict '>' over ascending cells (ties →
    lowest cell). Same fold shape as similarity.ivf_assign's, with the L2
    constant folded in so NON-unit (trained) centroids order correctly."""
    scores = F.array(
        *[
            F.struct(
                F.lit(i).alias("cell"),
                (dot(vec, _lit_vec(c)) - F.lit(_half_sq(c))).alias("score"),
            )
            for i, c in enumerate(cents)
        ]
    )
    best = F.aggregate(
        scores,
        F.struct(F.lit(-1).alias("cell"), F.lit(float("-inf")).alias("score")),
        lambda acc, s: F.when(s["score"] > acc["score"], s).otherwise(acc),
    )
    return best["cell"]


def _hash_rank(id_col: str, seed: int) -> Column:
    """Deterministic corpus shuffle key: md5('<id>:<seed>') — identical hex
    in Spark and DuckDB, binary-collated in both."""
    return F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))


def _train_sample(c: DataFrame, id_col: str, seed: int, train_mod: int | None) -> DataFrame:
    """Deterministic training sample: md5(id:seed) hash % train_mod == 0 —
    shared by kmeans_fit and pq_fit so the sampling rule can never drift
    between the two trainers."""
    if train_mod is None or train_mod <= 1:
        return c
    return c.filter(
        F.conv(F.substring(_hash_rank(id_col, seed), 1, 15), 16, 10).cast("bigint")
        % train_mod
        == 0
    )


def _lut_expr(cb: list[list[list[float]]]) -> Column:
    """Per-query ADC lookup table from the unit query vector ``qv``:
    LUT[sub][cell] = dot(q_slice_sub, codebook[sub][cell]). ONE definition
    for pq_topk and ivfpq_topk — the build/query hash-agreement contract
    depends on these never drifting."""
    m = len(cb)
    dsub = len(cb[0][0])
    return F.array(
        *[
            F.array(
                *[dot(F.slice(F.col("qv"), s * dsub + 1, dsub), _lit_vec(c)) for c in cb[s]]
            )
            for s in range(m)
        ]
    )


def _adc_sum(m: int) -> Column:
    """Σ_sub LUT[sub][code_sub] in FIXED ascending-sub order (static
    expression, not a data-dependent fold) — deterministic, twin-
    reproducible; shared by pq_topk and ivfpq_topk."""
    score = None
    for s in range(m):
        term = F.element_at(F.element_at("lut", s + 1), F.element_at("codes", s + 1) + 1)
        score = term if score is None else score + term
    return score


def _probe_scores_expr(cents: list[list[float]]) -> Column:
    """(cell, score) struct array for centroid probing: score =
    dot(qv, c) - |c|²/2 (the L2-argmin rewrite over a unit query); shared
    by ivf_topk_trained and ivfpq_topk."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("cell"),
                (dot(F.col("qv"), _lit_vec(c)) - F.lit(_half_sq(c))).alias("score"),
            )
            for i, c in enumerate(cents)
        ]
    )


def _seed_rows(
    corpus_u: DataFrame, k: int, id_col: str, seed: int
) -> list[tuple[object, list[float]]]:
    """The k corpus rows with the smallest (md5(id:seed), id) key — a
    deterministic sample standing in for random init, reproducible in SQL
    via the same row_number. Returns [(id, unit_vec)] in cell order."""
    rows = (
        corpus_u.select(id_col, "_e", _hash_rank(id_col, seed).alias("_hk"))
        .orderBy("_hk", id_col)
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"kmeans: k={k} exceeds corpus size {len(rows)}")
    return [(r[id_col], list(r["_e"])) for r in rows]


def _lloyd_iterations(
    df: DataFrame,
    cents: dict[int, list[list[float]]],
    iters: int,
    dsub: int,
) -> dict[int, list[list[float]]]:
    """Shared Lloyd loop over a (sub, sv array<double>, sq array<long>)
    frame; ``cents[sub]`` is that subspace's centroid list (k-means is the
    single-subspace case). Per iteration: shuffle-free argmin assignment +
    one map-side-combined groupBy(sub, cell) of BIGINT sums; k·m rows to the
    driver. Empty cells carry their previous centroid (FAISS behaviour)."""
    subs = sorted(cents)
    for _ in range(iters):
        if len(subs) == 1:
            cell = l2_argmax_cell(F.col("sv"), cents[subs[0]])
        else:
            cell = F.when(F.col("sub") == subs[0], l2_argmax_cell(F.col("sv"), cents[subs[0]]))
            for s in subs[1:]:
                cell = cell.when(F.col("sub") == s, l2_argmax_cell(F.col("sv"), cents[s]))
        grouped = (
            df.select("sub", cell.alias("cell"), "sq")
            .groupBy("sub", "cell")
            .agg(
                F.count("*").alias("cnt"),
                *[F.sum(F.element_at("sq", j + 1)).alias(f"s{j}") for j in range(dsub)],
            )
            .collect()
        )
        new = {s: [list(c) for c in cents[s]] for s in subs}
        for r in grouped:
            s_, c_ = r["sub"], r["cell"]
            cnt = r["cnt"]
            new[s_][c_] = [r[f"s{j}"] / (cnt * E6) for j in range(dsub)]
        cents = new
    return cents


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 13,
    train_mod: int | None = None,
) -> list[list[float]]:
    """Distributed Lloyd's k-means over unit-normalized vectors. Returns the
    trained centroids as plain lists (k·dim doubles — plan-literal size).

    ``train_mod``: train on the deterministic hash sample
    md5(id:seed) % train_mod == 0 — at 100 TB the fit touches a fixed-size
    sample and only the final assignment (kmeans_assign / ivf_topk_trained)
    scans the full corpus."""
    c = _train_sample(
        _with_unit(corpus, vec_col, "_e").select(id_col, "_e"), id_col, seed, train_mod
    ).persist()
    try:
        cents = [v for _, v in _seed_rows(c, k, id_col, seed)]
        df = c.select(F.lit(0).alias("sub"), F.col("_e").alias("sv"), _quantize(F.col("_e")).alias("sq"))
        cents = _lloyd_iterations(df, {0: cents}, iters, dim)[0]
    finally:
        c.unpersist()
    return cents


def kmeans_assign(
    corpus: DataFrame,
    cents: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, v) — unit vectors assigned to their argmin-L2 centroid.
    Shuffle-free (centroids are plan literals); at 100 TB this is the single
    full-corpus pass after a sampled fit, and the output is what you write
    bucketed by cell."""
    c = _with_unit(corpus, vec_col, "v").select(id_col, "v")
    return c.select(id_col, l2_argmax_cell(F.col("v"), cents).alias("cell"), "v")


def kmeans_stats(
    corpus: DataFrame,
    cents: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Integer-exact fit artifact for the correctness gate: assign the corpus
    to ``cents`` and emit one row per (cell, dimension) with the BIGINT
    micro-unit component sum and the cell population — the exact state a
    next Lloyd iteration would consume. All-integer output: bit-identical in
    any engine, no float tolerance anywhere."""
    assigned = kmeans_assign(corpus, cents, id_col, vec_col).withColumn(
        "sq", _quantize(F.col("v"))
    )
    grouped = assigned.groupBy("cell").agg(
        F.count("*").alias("cnt"),
        *[F.sum(F.element_at("sq", j + 1)).alias(f"s{j}") for j in range(dim)],
    )
    pairs = F.array(
        *[
            F.struct(F.lit(j).alias("j"), F.col(f"s{j}").alias("s_e6"))
            for j in range(dim)
        ]
    )
    return grouped.select("cell", "cnt", F.explode(pairs).alias("p")).select(
        "cell",
        F.col("p.j").alias("j"),
        F.col("p.s_e6").alias("s_e6"),
        "cnt",
    )


def ivf_topk_trained(
    corpus: DataFrame,
    queries: DataFrame,
    cents: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN over TRAINED centroids: corpus assigned once (shuffle-free
    argmin over plan literals), each query probes its nprobe argmin-L2 cells,
    exact cosine (dot of pre-normalized units) within probed cells. Identical
    output shape to similarity.ivf_topk; trained cells track the data
    distribution, so probe cost is balanced instead of hash-lucky."""
    assigned = kmeans_assign(corpus, cents, id_col, vec_col)
    q = _with_unit(queries, vec_col, "qv").select(F.col(id_col).alias("query_id"), "qv")
    probe_scores = _probe_scores_expr(cents)
    probes = (
        q.select("query_id", "qv", F.explode(probe_scores).alias("ps"))
        .select("query_id", "qv", F.col("ps.cell").alias("cell"), F.col("ps.score").alias("score"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("cell").asc())
    probes = (
        probes.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    cand = probes.join(
        assigned.select(F.col(id_col).alias("neighbor_id"), "cell", F.col("v").alias("cv")),
        "cell",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select("query_id", "neighbor_id", dot(F.col("qv"), F.col("cv")).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )


# --- Product quantization ----------------------------------------------------------


def pq_fit(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 13,
    train_mod: int | None = None,
) -> list[list[list[float]]]:
    """Train m per-subspace codebooks of ksub centroids each (classic PQ:
    the unit vector is split into m contiguous dsub = dim/m slices; each
    slice space gets its own k-means). All m subspaces train JOINTLY — one
    exploded (sub, slice) frame, one job per Lloyd iteration for ALL
    codebooks, m·ksub rows to the driver per iteration.

    Init: the ksub hash-ranked seed rows (same rule as kmeans_fit) donate
    their slices to every subspace — deterministic and SQL-reproducible.
    Returns codebooks[sub][cell] = list of dsub floats."""
    if dim % m != 0:
        raise ValueError(f"pq_fit: dim={dim} not divisible by m={m}")
    dsub = dim // m
    c = _train_sample(
        _with_unit(corpus, vec_col, "_e").select(id_col, "_e"), id_col, seed, train_mod
    ).persist()
    try:
        seeds = _seed_rows(c, ksub, id_col, seed)
        cents: dict[int, list[list[float]]] = {
            s: [v[s * dsub : (s + 1) * dsub] for _, v in seeds] for s in range(m)
        }
        slices = F.array(
            *[
                F.struct(
                    F.lit(s).alias("sub"),
                    F.slice(F.col("_e"), s * dsub + 1, dsub).alias("sv"),
                )
                for s in range(m)
            ]
        )
        df = (
            c.select(F.explode(slices).alias("sl"))
            .select(F.col("sl.sub").alias("sub"), F.col("sl.sv").alias("sv"))
            .withColumn("sq", _quantize(F.col("sv")))
        )
        cents = _lloyd_iterations(df, cents, iters, dsub)
    finally:
        c.unpersist()
    return [cents[s] for s in range(m)]


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> of length m): per subspace, the argmin-L2
    codebook cell for that slice of the unit vector. Pure plan-literal
    exprs, shuffle-free — at 100 TB the codes table is what you WRITE
    (m bytes/vector vs dim·4 raw), and every later search reads codes only."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    c = _with_unit(corpus, vec_col, "v").select(id_col, "v")
    codes = F.array(
        *[
            l2_argmax_cell(F.slice(F.col("v"), s * dsub + 1, dsub), codebooks[s])
            for s in range(m)
        ]
    )
    return c.select(id_col, codes.alias("codes"))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k: the query stays full precision;
    each candidate's approximate cosine is Σ_sub LUT[sub][code_sub], where
    LUT[sub][cell] = dot(q_slice_sub, codebook[sub][cell]) is computed ONCE
    per query (queries broadcast). Per candidate the score costs m array
    lookups + adds instead of dim multiply-adds — with stored codes this is
    the classic IVF-PQ scan (pair with ivf_topk_trained cells to prune).

    The LUT sum runs in FIXED ascending-sub order (a static expression, not
    a data-dependent fold) — deterministic, twin-reproducible."""
    m = len(codebooks)
    codes = pq_encode(corpus, codebooks, id_col, vec_col)
    q = _with_unit(queries, vec_col, "qv").select(F.col(id_col).alias("query_id"), "qv")
    q = q.select("query_id", _lut_expr(codebooks).alias("lut"))
    score = _adc_sum(m)
    scored = (
        F.broadcast(q)
        .crossJoin(codes.withColumnRenamed(id_col, "neighbor_id"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )


def ivfpq_topk(
    cells: DataFrame,
    codes: DataFrame,
    queries: DataFrame,
    cents: list[list[float]],
    cb: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    rescore_factor: int = 32,
    exclude_self: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production IVF-PQ query against a PERSISTED index — the scoring core
    of jobs/ann_index.py query mode (the CLI calls this).

    ``rescore_factor`` default is measured (bench/vq_ops.py, 50k hierarchical
    corpus, nprobe=4): the probe stage's ceiling is recall 1.0, ALL loss is
    the ADC shortlist — rf=4 → 0.28-0.34, rf=32 → 0.74, rf=128 → 1.00.
    Exact-rescoring rf·k rows per query is cheap, so raise rf when recall
    matters more than the last bit of query wall.

    ``cells``: (vec_id, cell, v) — the trained-k-means assignment written
    once at build time (partitioned by cell on disk, so probing prunes
    partitions); ``codes``: (vec_id, codes array<int>) — the PQ codes.

    Per query: probe the ``nprobe`` argmin-L2 trained cells, ADC-score every
    candidate in them via a per-query LUT (m array lookups per candidate —
    no float vector math on the corpus side), then exact-rescore ONLY the
    ``rescore_factor``·k ADC head with true cosine. The rescore step is what
    keeps recall high even where 8-byte codes are too coarse to rank
    correctly on their own. Output: (query_id, neighbor_id, rank, cos)."""
    m = len(cb)
    dsub = len(cb[0][0])

    q = _with_unit(queries, vec_col, "qv").select(F.col(id_col).alias("query_id"), "qv")
    q = q.withColumn("lut", _lut_expr(cb))
    probe_scores = _probe_scores_expr(cents)
    wq = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("cell").asc())
    probes = (
        q.select("query_id", "qv", "lut", F.explode(probe_scores).alias("ps"))
        .select(
            "query_id", "qv", "lut",
            F.col("ps.cell").alias("cell"), F.col("ps.score").alias("score"),
        )
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "lut", "cell")
    )
    cand = probes.join(cells.select(id_col, "cell"), "cell").join(codes, id_col)
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col(id_col))
    adc_score = _adc_sum(m)
    # the ADC rank shuffle carries ONLY (query_id, neighbor_id, adc): the
    # LUT/qv are consumed map-side in the projection above, and the float
    # vectors v/qv re-enter AFTER the rf·k head cut via broadcast joins —
    # shuffling 64 doubles of v (+64 of qv) per CANDIDATE row was the
    # scan-advantage-negating cost this stage used to pay
    adc = cand.select(
        "query_id", F.col(id_col).alias("neighbor_id"), adc_score.alias("adc")
    )
    wa = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), F.col("neighbor_id").asc())
    head = (
        adc.withColumn("_ar", F.row_number().over(wa))
        .filter(F.col("_ar") <= rescore_factor * k)
        .select("query_id", "neighbor_id")
    )
    # exact rescore: head is rf·k rows/query — broadcast it against the
    # column-pruned (vec_id, v) scan (no corpus shuffle), then broadcast the
    # query batch back on for the true cosine
    head_v = cells.select(F.col(id_col).alias("neighbor_id"), "v").join(
        F.broadcast(head), "neighbor_id"
    )
    rescored = head_v.join(
        F.broadcast(q.select("query_id", "qv")), "query_id"
    ).select("query_id", "neighbor_id", dot(F.col("qv"), F.col("v")).alias("cos"))
    wf = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        rescored.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )
