"""Similarity search over embedding columns (array<float>).

Extension surface (SURVEY.md §7.2 layer 7 / BASELINE.json north star):
brute-force cosine top-k as the exact baseline, a sign-random-projection
LSH bucketing as the scale path, and a cosine near-duplicate threshold scan.

Float determinism strategy: all arithmetic is double, and every reduction
is a SEQUENTIAL left fold (Spark ``aggregate``/``zip_with``; DuckDB
``list_reduce``/``list_transform``) so both engines execute the identical
IEEE op sequence — the exported cosines are bit-equal before rounding, and
ranking ties are broken by neighbor id. No Python UDF anywhere: the folds
run inside whole-stage codegen.

Scale notes (100 TB): brute-force is O(n^2) pairs and exists as ground
truth + small-n fallback; the LSH path buckets vectors by 8 hyperplane
signs (256 buckets) so the pair join is bucket-local (equi-join on the
bucket key, AQE handles skewed buckets). For 1000-executor scale, raise
the hyperplane count and add multi-probe (flip one sign) to recover recall
— both are config knobs, not new plumbing.

Algorithms follow the published formulations: sign-random-projection LSH
for cosine (Charikar, STOC 2002; multi-table OR-amplification per
Indyk/Motwani 1998), and the IVF coarse-quantize-then-probe shape of
Jégou/Douze/Schmid ("Product quantization for nearest neighbor search",
TPAMI 2011) with the quantizer swapped for a deterministic sample so the
whole index is oracle-checkable.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.text import (
    round_half_up,
    sql_round_half_up,
)
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import fan_out, load_table

# LCG-style deterministic pseudo-random hyperplane component in [-0.5, 0.5):
#   u(g, d) = ((1103515245 * (g * 64 + d) + 12345) mod 2^31) / 2^31 - 0.5
# where g = table * NUM_HYPERPLANES + j is the global plane index.
# Multi-table OR-amplification: a pair is a candidate if it shares a bucket
# in ANY of the NUM_TABLES independent tables — recall 1-(1-p^b)^L instead
# of the single-table p^b, the standard trade for near-orthogonal vectors.
NUM_HYPERPLANES = 6   # bits per table -> 64 buckets
NUM_TABLES = 8
_LCG_A = 1_103_515_245
_LCG_C = 12_345
_LCG_M = 2_147_483_648  # 2^31


def _as_double_vec(col: str = "embedding") -> Column:
    return F.transform(col, lambda x: x.cast("double"))


# When True (production / the driver's sequential verify session), finalize
# eagerly: checkpoint the small result and release the O(n^2) working caches.
# Plan-contract tests flip this off to inspect the lazy plan.
EAGER_RELEASE = True


def _finalize(result: DataFrame, *caches: DataFrame) -> DataFrame:
    """Materialize the (small, O(n·k)-row) result and release working caches.

    The driver's verify runs every query sequentially in ONE session; a
    persisted O(n^2) pair matrix left behind by a finished query crowds
    the storage pool for everything after it. Eagerly checkpointing the
    final rows cuts their lineage from the caches, so unpersisting is safe."""
    if not EAGER_RELEASE:
        return result
    out = result.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out


def _fold_sum(arr: Column) -> Column:
    """Sequential left-fold sum — deterministic IEEE order."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def with_norms(embeddings: DataFrame) -> DataFrame:
    """(vec_id, v double[], nrm): precomputed L2 norms.

    Fanned out to cluster parallelism first: the single-file scan would
    otherwise leave every downstream pair fold (and the entire cartesian
    product of pairwise_cosine — the streamed side of a nested-loop join
    inherits the left side's partitioning) in ONE task.
    """
    v = _as_double_vec()
    return fan_out(embeddings).select(
        "vec_id",
        v.alias("v"),
        F.sqrt(_fold_sum(F.transform(v, lambda x: x * x))).alias("nrm"),
    )


def pairwise_cosine(e: DataFrame) -> DataFrame:
    """(vec_id, neighbor_id, cos): all ordered pairs, exact double cosine."""
    a, b = e.alias("a"), e.alias("b")
    dot = _fold_sum(F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y))
    return (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos"),
        )
    )


_SQL_NORMED = """
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           sqrt(list_reduce(
             list_prepend(0.0, list_transform(
               list_transform(embedding, x -> CAST(x AS DOUBLE)), x -> x * x)),
             (acc, x) -> acc + x)) AS nrm
    FROM embeddings
"""

_SQL_PAIR_COS = """
    SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           list_reduce(
             list_prepend(0.0, list_transform(
               range(1, length(a.v) + 1), i -> a.v[i] * b.v[i])),
             (acc, x) -> acc + x) / (a.nrm * b.nrm) AS cos
    FROM n a JOIN n b ON a.vec_id != b.vec_id
"""


@query(
    "similarity_cosine_topk",
    oracle=f"""
    WITH n AS ({_SQL_NORMED}),
    p AS ({_SQL_PAIR_COS})
    SELECT vec_id, neighbor_id, {sql_round_half_up('cos', 4)} AS cos_sim,
           CAST(rnk AS INT) AS rank
    FROM (
      SELECT vec_id, neighbor_id, cos,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY {sql_round_half_up('cos', 4)} DESC, neighbor_id
             ) AS rnk
      FROM p
    ) WHERE rnk <= 5
    """,
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 neighbors for every vector.

    cos(a,b) = cos(b,a), so the fold — the dominant cost — runs only for
    the n(n-1)/2 unordered pairs; the persisted half-matrix (3 scalars per
    pair, no vectors) is then mirrored to the ordered form the per-vector
    window needs."""
    e = with_norms(load_table(spark, sf_dir, "embeddings")).persist()
    a, b = e.alias("a"), e.alias("b")
    dot = _fold_sum(F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y))
    half = (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos"),
        )
        .persist(StorageLevel.DISK_ONLY)  # O(n^2) rows: keep off-heap
    )
    pairs = half.unionByName(
        half.select(
            F.col("neighbor_id").alias("vec_id"),
            F.col("vec_id").alias("neighbor_id"),
            "cos",
        )
    )
    cos4 = round_half_up(F.col("cos"), 4)
    w = Window.partitionBy("vec_id").orderBy(cos4.desc(), "neighbor_id")
    topk = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("vec_id", "neighbor_id", cos4.alias("cos_sim"), "rank")
    )
    return _finalize(topk, e, half)


@query(
    "similarity_near_dup",
    oracle=f"""
    WITH n AS ({_SQL_NORMED}),
    p AS ({_SQL_PAIR_COS})
    SELECT vec_id, neighbor_id, {sql_round_half_up('cos', 4)} AS cos_sim
    FROM p
    WHERE vec_id < neighbor_id AND {sql_round_half_up('cos', 4)} >= 0.45
    """,
)
def similarity_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine high-similarity pairs (cos >= 0.45, unordered).

    The synthetic embeddings carry no planted exact near-dups (max pair
    cosine ~0.6), so the threshold sits where real pairs exist at every
    scale factor — the operator itself takes any threshold."""
    e = with_norms(load_table(spark, sf_dir, "embeddings"))
    pairs = pairwise_cosine(e)
    cos4 = round_half_up(F.col("cos"), 4)
    return (
        pairs.filter(F.col("vec_id") < F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", cos4.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.45)
    )


def _hyperplane_dot(v: Column, g: int) -> Column:
    """dot(v, hyperplane_g) with LCG-derived components, sequential fold;
    g is the global plane index (table * NUM_HYPERPLANES + j).

    (A precomputed literal-array plane measured 3x SLOWER here: Spark
    evaluates the 512-child CreateArray per row rather than folding it to
    a constant, so the inline LCG arithmetic wins.)"""
    def comp(d: Column) -> Column:
        seed = (F.lit(g * 64).cast("long") + d) * F.lit(_LCG_A) + F.lit(_LCG_C)
        return (seed % _LCG_M).cast("double") / F.lit(float(_LCG_M)) - F.lit(0.5)

    prods = F.transform(
        F.sequence(F.lit(0), F.size(v) - 1), lambda d: F.get(v, d) * comp(d)
    )
    return _fold_sum(prods)


def lsh_bucket(v: Column, table: int = 0) -> Column:
    """64-bucket sign-LSH key for one table: bit j set iff dot(v, hp) > 0."""
    bits = [
        F.when(_hyperplane_dot(v, table * NUM_HYPERPLANES + j) > 0, F.lit(1 << j))
        .otherwise(0)
        for j in range(NUM_HYPERPLANES)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def _sql_lsh_bucket(v_expr: str, table: int = 0) -> str:
    terms = []
    for j in range(NUM_HYPERPLANES):
        g = table * NUM_HYPERPLANES + j
        dot = (
            f"list_reduce(list_prepend(0.0, list_transform("
            f"range(1, length({v_expr}) + 1), "
            f"d -> {v_expr}[d] * ("
            f"CAST((({g} * 64 + (d - 1)) * {_LCG_A} + {_LCG_C}) % {_LCG_M} AS DOUBLE)"
            f" / {float(_LCG_M)} - 0.5))), (acc, x) -> acc + x)"
        )
        terms.append(f"CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS INT)"


@query(
    "similarity_lsh_buckets",
    oracle=f"""
    WITH n AS ({_SQL_NORMED})
    SELECT vec_id, {_sql_lsh_bucket('v')} AS bucket FROM n
    """,
)
def similarity_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sign-LSH bucket assignment (the ANN partition key)."""
    e = with_norms(load_table(spark, sf_dir, "embeddings"))
    return e.select("vec_id", lsh_bucket(F.col("v")).alias("bucket"))


_SQL_BUCKET_LIST = "[" + ", ".join(
    _sql_lsh_bucket("v", t) for t in range(NUM_TABLES)
) + "]"


@query(
    "similarity_ann_lsh",
    oracle=f"""
    WITH n AS ({_SQL_NORMED}),
    bk AS (
      SELECT vec_id, unnest(range(0, {NUM_TABLES})) AS tbl,
             unnest({_SQL_BUCKET_LIST}) AS bucket
      FROM n
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS neighbor_id
      FROM bk a JOIN bk b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id != b.vec_id
    ),
    p AS (
      SELECT c.vec_id, c.neighbor_id,
             list_reduce(
               list_prepend(0.0, list_transform(
                 range(1, length(x.v) + 1), i -> x.v[i] * y.v[i])),
               (acc, q) -> acc + q) / (x.nrm * y.nrm) AS cos
      FROM cand c
      JOIN n x ON x.vec_id = c.vec_id
      JOIN n y ON y.vec_id = c.neighbor_id
    )
    SELECT vec_id, neighbor_id, {sql_round_half_up('cos', 4)} AS cos_sim,
           CAST(rnk AS INT) AS rank
    FROM (
      SELECT vec_id, neighbor_id, cos,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY {sql_round_half_up('cos', 4)} DESC, neighbor_id
             ) AS rnk
      FROM p
    ) WHERE rnk <= 5
    """,
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via multi-table sign-LSH: candidates are pairs
    sharing a bucket in ANY of the 8 tables (OR-amplification,
    1-(1-p^6)^8 recall), then exact cosine + rank over candidates only.

    This is the 100 TB execution shape: the bucket equi-join replaces the
    O(n^2) cross join; recall vs the brute-force baseline is asserted in
    tests. Raising NUM_TABLES buys recall linearly in join cost without
    new plumbing."""
    # e feeds three subtrees (bucket table + both sides of the cosine join)
    # and bk feeds both sides of the candidate self-join; without persist
    # Spark recomputes the 48 hyperplane folds per vector once PER subtree.
    e = with_norms(load_table(spark, sf_dir, "embeddings")).persist()
    buckets = F.array(*[lsh_bucket(F.col("v"), t) for t in range(NUM_TABLES)])
    bk = e.select("vec_id", F.posexplode(buckets).alias("tbl", "bucket")).persist()
    a, b = bk.alias("a"), bk.alias("b")
    cand = (
        a.join(b, (F.col("a.tbl") == F.col("b.tbl"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_id"),
                F.col("b.vec_id").alias("neighbor_id"))
        .distinct()
    )
    # candidate sharing is symmetric: each unordered pair gets ONE cosine
    # fold below, mirrored afterwards — halves distinct() input and dots.
    x = e.select(F.col("vec_id").alias("vec_id"), F.col("v").alias("xv"),
                 F.col("nrm").alias("xn"))
    y = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("yv"),
                 F.col("nrm").alias("yn"))
    dot = _fold_sum(F.zip_with(F.col("xv"), F.col("yv"), lambda p, q: p * q))
    half = (
        cand.join(x, "vec_id")
        .join(y, "neighbor_id")
        .select("vec_id", "neighbor_id",
                (dot / (F.col("xn") * F.col("yn"))).alias("cos"))
        .persist(StorageLevel.DISK_ONLY)  # O(n^2) rows: keep off-heap
    )
    pairs = half.unionByName(
        half.select(
            F.col("neighbor_id").alias("vec_id"),
            F.col("vec_id").alias("neighbor_id"),
            "cos",
        )
    )
    cos4 = round_half_up(F.col("cos"), 4)
    w = Window.partitionBy("vec_id").orderBy(cos4.desc(), "neighbor_id")
    topk = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("vec_id", "neighbor_id", cos4.alias("cos_sim"), "rank")
    )
    return _finalize(topk, e, bk, half)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantize -> probe nearest cells
# ---------------------------------------------------------------------------

IVF_CELLS = 16
IVF_NPROBE = 2

_SQL_IVF_DOT = (
    "list_reduce(list_prepend(0.0, list_transform("
    "range(1, length({a}) + 1), i -> {a}[i] * {b}[i])), (acc, q) -> acc + q)"
)


@query(
    "similarity_ann_ivf",
    oracle=f"""
    WITH n AS ({_SQL_NORMED}),
    cents AS (
      SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
      FROM n ORDER BY vec_id LIMIT {IVF_CELLS}
    ),
    ac AS (
      SELECT n.vec_id, c.cent_id,
             {_SQL_IVF_DOT.format(a='n.v', b='c.cv')} / (n.nrm * c.cnrm) AS cos
      FROM n CROSS JOIN cents c
    ),
    ranked AS (
      SELECT vec_id, cent_id,
             row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id)
               AS rk
      FROM ac
    ),
    members AS (SELECT vec_id, cent_id FROM ranked WHERE rk = 1),
    probes  AS (SELECT vec_id, cent_id FROM ranked WHERE rk <= {IVF_NPROBE}),
    cand AS (
      SELECT DISTINCT p.vec_id, m.vec_id AS neighbor_id
      FROM probes p JOIN members m
        ON p.cent_id = m.cent_id AND p.vec_id != m.vec_id
    ),
    pairs AS (
      SELECT c.vec_id, c.neighbor_id,
             {_SQL_IVF_DOT.format(a='x.v', b='y.v')} / (x.nrm * y.nrm) AS cos
      FROM cand c
      JOIN n x ON x.vec_id = c.vec_id
      JOIN n y ON y.vec_id = c.neighbor_id
    )
    SELECT vec_id, neighbor_id, {sql_round_half_up('cos', 4)} AS cos_sim,
           CAST(rnk AS INT) AS rank
    FROM (
      SELECT vec_id, neighbor_id, cos,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY {sql_round_half_up('cos', 4)} DESC, neighbor_id
             ) AS rnk
      FROM pairs
    ) WHERE rnk <= 5
    """,
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest of 16 coarse
    cells, probe the query's 2 nearest cells, exact-rank the candidates.

    Coarse centers here are a deterministic sample (the 16 lowest vec_ids)
    so the whole index is DuckDB-oracle-checkable end to end; production
    swaps in seeded KMeans centroids — same three joins, better cells. The
    scale shape: assignment is a broadcast of O(cells) centroids against
    the corpus (no shuffle of the big side), the candidate join is
    cell-local, and nprobe trades recall for cost without new plumbing."""
    e = with_norms(load_table(spark, sf_dir, "embeddings")).persist()
    cents = (
        e.orderBy("vec_id")
        .limit(IVF_CELLS)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cnrm"),
        )
    )
    dot_ac = _fold_sum(F.zip_with(F.col("v"), F.col("cv"), lambda x, y: x * y))
    ac = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cent_id",
        (dot_ac / (F.col("nrm") * F.col("cnrm"))).alias("cos"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), "cent_id"
    )
    ranked = ac.select(
        "vec_id", "cent_id", F.row_number().over(w_assign).alias("rk")
    ).persist()
    members = ranked.filter(F.col("rk") == 1).select(
        F.col("vec_id").alias("neighbor_id"), "cent_id"
    )
    probes = ranked.filter(F.col("rk") <= IVF_NPROBE).select("vec_id", "cent_id")
    cand = (
        probes.join(members, "cent_id")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
        .distinct()
    )
    x = e.select(F.col("vec_id"), F.col("v").alias("xv"), F.col("nrm").alias("xn"))
    y = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("yv"),
        F.col("nrm").alias("yn"),
    )
    dot_xy = _fold_sum(F.zip_with(F.col("xv"), F.col("yv"), lambda p, q: p * q))
    pairs = (
        cand.join(x, "vec_id")
        .join(y, "neighbor_id")
        .select(
            "vec_id",
            "neighbor_id",
            (dot_xy / (F.col("xn") * F.col("yn"))).alias("cos"),
        )
    )
    cos4 = round_half_up(F.col("cos"), 4)
    w = Window.partitionBy("vec_id").orderBy(cos4.desc(), "neighbor_id")
    topk = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("vec_id", "neighbor_id", cos4.alias("cos_sim"), "rank")
    )
    return _finalize(topk, e, ranked)


@query(
    "similarity_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE n AS ({_SQL_NORMED}),
    p AS ({_SQL_PAIR_COS}),
    near AS (
      SELECT vec_id AS a, neighbor_id AS b FROM p
      WHERE vec_id < neighbor_id AND {sql_round_half_up('cos', 4)} >= 0.45
    ),
    edges AS (SELECT a AS src, b AS dst FROM near
              UNION SELECT b, a FROM near),
    reach(id, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS vec_id, min(lab) AS cluster_id FROM reach GROUP BY id
    """,
)
def similarity_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate CLUSTERS: threshold the pairwise
    cosine graph (>= 0.45, the similarity_near_dup surface) and take
    connected components via the two-star algorithm — the semantic-dedup
    composition (embed -> pair -> cluster -> keep one per cluster) used
    for near-identical training examples that exact/minhash dedup misses.
    Oracle: recursive-CTE transitive closure, an independent formulation
    of the same fixpoint."""
    from pyspark_text_classification_spark.operators.dedup import (
        two_star_components,
    )

    e = with_norms(load_table(spark, sf_dir, "embeddings"))
    pairs = (
        pairwise_cosine(e)
        .filter(F.col("vec_id") < F.col("neighbor_id"))
        .filter(round_half_up(F.col("cos"), 4) >= 0.45)
        .select(
            F.col("vec_id").alias("doc_a"), F.col("neighbor_id").alias("doc_b")
        )
        .localCheckpoint(eager=True)  # pin the O(n^2) pair scan ONCE
    )
    return two_star_components(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )
