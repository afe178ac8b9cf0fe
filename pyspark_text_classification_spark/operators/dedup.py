"""Deduplication operators for large-scale training-data pipelines.

Extension surface beyond the reference (SURVEY.md §7.2 layer 7): exact
dedup, n-gram Jaccard near-dup, MinHash+LSH near-dup, and SimHash
fingerprinting — all expressed as declarative DataFrame programs (explode /
groupBy / join) so Catalyst plans the shuffles, and all anchored on the
cross-engine polynomial hash (functions/hashing.py) so every stage is
DuckDB-oracle-checkable, which neither Spark's Murmur3 ``hash()`` nor
MinHashLSH's internal randomness would allow.

Scale notes (100 TB):
- exact dedup is one hash-partitioned groupBy on the text key; for long
  texts group on char_poly_hash(text) + a length column instead of the raw
  string to shrink shuffle payloads, then resolve rare collisions in-group.
- MinHash-LSH replaces the all-pairs O(n^2) join with a band-bucket
  equi-join: cost is (docs x 32 perms) for signatures plus bucket-local
  pair generation. Skewed buckets (e.g. boilerplate) are the hazard; AQE
  skew-join splitting plus an optional bucket-size cap handle it.
- the pair-verification join is a shingle-set intersection restricted to
  LSH candidates (semi-join pushes the candidate filter into the shuffle).

Algorithms follow the published formulations: shingle-set resemblance and
MinHash (Broder, "On the resemblance and containment of documents", 1997),
banded LSH for Jaccard (Leskovec/Rajaraman/Ullman, Mining of Massive
Datasets ch. 3), and SimHash (Charikar, "Similarity estimation techniques
from rounding algorithms", STOC 2002).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.hashing import (
    BAND_ROWS,
    HASH_MOD,
    MINHASH_PERMS,
    SHINGLE_MULT,
    SIMHASH_BITS,
    _poly_hash_sql,
    char_poly_hash,
    sql_char_poly_hash,
    sql_token_shingle_hashes,
    token_shingle_hashes_sql,
)
from pyspark_text_classification_spark.functions.text import (
    round_half_up,
    sql_round_half_up,
    tokenize,
)
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import fan_out, load_table

_SQL_TOKENS = r"list_filter(str_split_regex(lower(text), '\W+'), t -> length(t) >= 2)"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Group identical texts: one hash-partitioned aggregate.

    Returns (keep_id = min doc_id, n_copies) per distinct text — the
    canonical-representative policy used by dropDuplicates-style dedup but
    with an explicit, deterministic keeper.
    """
    return docs.groupBy(text_col).agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    ).select("keep_id", "n_copies")


@query(
    "dedup_exact",
    oracle="""
    SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# shared shingle machinery
# ---------------------------------------------------------------------------


# Spark-SQL twin of tokenize(): SQL string literals unescape backslashes,
# so the regex \W+ is spelled \\W+ inside the parsed expression.
_SPARK_TOKS = r"filter(split(lower(text), '\\W+'), t -> length(t) >= 2)"


def shingle_hashes(docs: DataFrame, k: int = 2) -> DataFrame:
    """(doc_id, h): distinct k-shingle hashes via token-hash combination.

    Each token is char-hashed ONCE; a shingle's hash is then a polynomial
    fold over its k consecutive token hashes (hashing.py SHINGLE_MULT) —
    O(total chars) instead of the string-shingle formulation's O(k x total
    chars), which re-folded every character through array_join + char
    hashing once per overlapping shingle. At sf0.1 the end-to-end time is
    unchanged (the distinct shuffle dominates); the win is per-char work
    that no longer scales with k, and 2 parsed SQL strings instead of
    lambda-built Column chains at construction.
    """
    th = f"transform({_SPARK_TOKS}, t -> {_poly_hash_sql('t')})"
    return (
        fan_out(docs)
        .selectExpr("doc_id", f"{th} AS th")
        .selectExpr(
            "doc_id", f"explode({token_shingle_hashes_sql('th', k)}) AS h"
        )
        .distinct()
    )


def _sql_shingle_hashes(k: int = 2) -> str:
    """DuckDB twin of :func:`shingle_hashes` as a CTE body."""
    th = f"list_transform({_SQL_TOKENS}, t -> {sql_char_poly_hash('t')})"
    return f"""
    SELECT DISTINCT doc_id, h FROM (
      SELECT doc_id, unnest({sql_token_shingle_hashes('th', k)}) AS h
      FROM (SELECT doc_id, {th} AS th FROM documents)
    )
    """


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (all-pairs ground truth)
# ---------------------------------------------------------------------------


def jaccard_pairs(
    shingles: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """All-pairs shingle-set Jaccard >= threshold.

    The pair space is generated by the shared-shingle equi-join (pairs with
    zero overlap never materialize); set sizes come from a pre-aggregate
    that broadcasts. Quadratic in the worst case — the LSH variant below is
    the scale path; this is the exact ground truth used to validate it.
    """
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(b, F.col("a.h") == F.col("b.h"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            round_half_up(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_sql_shingle_hashes(2)}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           {sql_round_half_up('n_inter / (sa.n_sh + sb.n_sh - n_inter)', 4)} AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE {sql_round_half_up('n_inter / (sa.n_sh + sb.n_sh - n_inter)', 4)} >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram Jaccard >= 0.8 over the documents table (finds the
    generator's planted near-duplicates)."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(shingle_hashes(docs, k=2), threshold=0.8)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (the scale path)
# ---------------------------------------------------------------------------


def minhash_band_signatures(shingles: DataFrame) -> DataFrame:
    """(doc_id, band, sig): LSH band signatures from 32 minhashes.

    All 32 permutation minima are plain relational ``min()`` aggregates
    over the (doc_id, h) stream — whole-stage-codegen'd with map-side
    partial aggregation, so the shuffle carries 32 longs per document
    instead of every shingle hash. Measured ~30% faster at sf0.1 than the
    earlier array formulation (collect_list + 32 interpreted
    ``array_min(transform(...))`` folds), and the partial-agg shuffle
    shrink is the part that matters at 100 TB: the old shape shuffled the
    full distinct-shingle stream to build per-doc arrays.
    Band signature = '-'-joined minhash values in perm order.
    """
    return _bands_from_mins(_minhash_mins(shingles))


def _minhash_mins(shingles: DataFrame, with_sizes: bool = False) -> DataFrame:
    """(doc_id, m0..m31[, n_sh]): one pass over the shingle stream.

    ``with_sizes`` folds the shingle-set cardinality into the SAME
    aggregate, so callers that need both signatures and set sizes (the
    LSH verify path) don't re-scan the shingle stream — at 100 TB that is
    one full pass saved."""
    aggs = [
        F.expr(f"min(({a}L * h + {b}L) % {HASH_MOD}L)").alias(f"m{p}")
        for p, a, b in MINHASH_PERMS
    ]
    if with_sizes:
        aggs.append(F.count("*").alias("n_sh"))
    return shingles.groupBy("doc_id").agg(*aggs)


def _bands_from_mins(mins: DataFrame) -> DataFrame:
    n_bands = len(MINHASH_PERMS) // BAND_ROWS
    band_sigs = ", ".join(
        "concat_ws('-', "
        + ", ".join(
            f"CAST(m{band * BAND_ROWS + r} AS STRING)"
            for r in range(BAND_ROWS)
        )
        + ")"
        for band in range(n_bands)
    )
    return mins.selectExpr(
        "doc_id", f"posexplode(array({band_sigs})) AS (band, sig)"
    )


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing at least one band bucket."""
    x = bands.alias("x")
    y = bands.alias("y")
    return (
        x.join(y, (F.col("x.band") == F.col("y.band")) & (F.col("x.sig") == F.col("y.sig")))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_lsh_dedup(
    docs: DataFrame, spark: SparkSession, k: int = 2, threshold: float = 0.8
) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard verification.

    Verification is CANDIDATE-RESTRICTED: the shingle-intersection join
    runs only over pairs LSH surfaced, not all pairs sharing any shingle —
    at scale the all-pairs intersection (boilerplate shingles fan out
    quadratically) costs more than the whole LSH stage, and the semi-join
    result is identical. ``sh`` feeds three subtrees (signatures, sizes,
    intersection) and is persisted so tokenize+hash runs once.
    """
    jac, _cleanup = _minhash_lsh_dedup_parts(docs, k, threshold)
    return jac


def _minhash_lsh_dedup_parts(docs: DataFrame, k: int, threshold: float):
    """(result, cleanup): cleanup() releases the internal shingle cache —
    callers that eagerly materialize the result (dedup_clusters) call it so
    long sessions don't accumulate cache from finished queries."""
    sh = shingle_hashes(docs, k).persist()
    # ONE pass over sh yields both band signatures and set sizes; mins is
    # doc-grain (33 longs/doc) so its cache is tiny next to sh's.
    mins = _minhash_mins(sh, with_sizes=True).persist()
    cands = lsh_candidate_pairs(_bands_from_mins(mins))
    inter = (
        cands.join(sh.alias("a"), F.col("doc_a") == F.col("a.doc_id"))
        .join(
            sh.alias("b"),
            (F.col("doc_b") == F.col("b.doc_id"))
            & (F.col("a.h") == F.col("b.h")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = mins.select("doc_id", "n_sh")
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            round_half_up(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
    )
    def _cleanup():
        mins.unpersist()
        sh.unpersist()

    return jac.filter(F.col("jaccard") >= threshold), _cleanup


def _sql_minhash(k: int = 2, threshold: float = 0.8) -> str:
    perm_rows = ", ".join(f"({p}, {a}, {b})" for p, a, b in MINHASH_PERMS)
    return f"""
    WITH sh AS ({_sql_shingle_hashes(k)}),
    perms(perm_id, a, b) AS (VALUES {perm_rows}),
    mh AS (
      SELECT doc_id, perm_id, min((a * h + b) % {HASH_MOD}) AS mh
      FROM sh CROSS JOIN perms GROUP BY 1, 2
    ),
    bands AS (
      SELECT doc_id, CAST(floor(perm_id / {float(BAND_ROWS)}) AS INT) AS band,
             string_agg(CAST(mh AS VARCHAR), '-' ORDER BY perm_id) AS sig
      FROM mh GROUP BY 1, 2
    ),
    cands AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           {sql_round_half_up('n_inter / (sa.n_sh + sb.n_sh - n_inter)', 4)} AS jaccard
    FROM inter i
    JOIN cands c ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE {sql_round_half_up('n_inter / (sa.n_sh + sb.n_sh - n_inter)', 4)} >= {threshold}
    """


@query("dedup_minhash_lsh", oracle=_sql_minhash(2, 0.8))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 perms) + LSH(8 bands x 4 rows) near-dup at Jaccard >= 0.8.

    Fully oracle-checked — possible because the whole pipeline rests on the
    deterministic cross-engine hash family rather than JVM Murmur3.

    Perf note (sf0.1, local[32], 2026-08-14): first execution in a session
    measures ~11s, repeat executions 2.2-3.5s — the gap is one-time Janino
    compilation of this query's generated classes (the 32-buffer min
    aggregate is the largest) plus JIT, NOT plan cost; round 2's recorded
    13.2s was this fixed overhead, which is amortized to noise at real
    scale. Steady-state work: one pass over the shingle stream yields both
    band signatures and set sizes (``_minhash_mins(with_sizes=True)``),
    candidate verification is LSH-restricted."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_dedup(docs, spark, k=2, threshold=0.8)


# ---------------------------------------------------------------------------
# SimHash fingerprints
# ---------------------------------------------------------------------------


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """32-bit SimHash per document from token polynomial hashes.

    Each token votes +count / -count on every bit of its hash; the
    fingerprint sets bit j iff the weighted sum is positive. The 32
    per-bit vote sums are plain conditional ``sum()`` aggregates in ONE
    groupBy(doc) — whole-stage codegen with map-side partials, the same
    reformulation as minhash_band_signatures (2.2x at sf0.1 over the
    previous per-token vote-array + interpreted zip_with fold; integer
    sums, so order-independent and oracle-identical). Bit reassembly is a
    pure projection.
    """
    toks = fan_out(docs).select("doc_id", F.explode(tokenize("text", 2)).alias("token"))
    tok_h = (
        toks.groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        .select("doc_id", "cnt", char_poly_hash("token").alias("h"))
    )
    votes = tok_h.groupBy("doc_id").agg(
        *[
            F.expr(f"sum(IF((shiftright(h, {j}) & 1) = 1, cnt, -cnt))").alias(f"v{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    bits = " + ".join(f"IF(v{j} > 0, {1 << j}L, 0L)" for j in range(SIMHASH_BITS))
    return votes.selectExpr("doc_id", f"CAST({bits} AS BIGINT) AS simhash")


@query(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, token, count(*) AS cnt
      FROM (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents)
      GROUP BY 1, 2
    ),
    tok_h AS (SELECT doc_id, cnt, {sql_char_poly_hash('token')} AS h FROM tok),
    votes AS (
      SELECT doc_id, bit,
             sum(CASE WHEN (h >> bit) & 1 = 1 THEN cnt ELSE -cnt END) AS vote
      FROM tok_h CROSS JOIN (SELECT unnest(range(0, {SIMHASH_BITS})) AS bit)
      GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN vote > 0 THEN 1::BIGINT << bit ELSE 0 END) AS BIGINT)
             AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_fingerprints(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# dedup clustering: connected components over near-dup pairs
# ---------------------------------------------------------------------------


def connected_components(pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id): connected components of the near-dup pair
    graph, cluster_id = min doc_id in the component (deterministic).

    Iterative min-label propagation: each round every vertex takes the
    minimum label among itself and its neighbors; converges in O(component
    diameter) rounds — near-dup clusters are shallow (copies of one
    source), so 2-4 distributed joins in practice. Each round is one
    shuffle on doc_id; the driver only reads a single change-count per
    round (no data collection). The classic large-graph alternative
    (large-star/small-star, Kiveris et al. 2014) drops in here if
    components ever get deep.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    edges.count()  # pin the (expensive) pair-generation lineage in cache
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
        .persist()
    )
    while True:
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"),
                    F.col("cluster_id").alias("n_label"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("n_label").alias("neighbor_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    "cluster_id", F.coalesce("neighbor_label", "cluster_id")
                ).alias("cluster_id"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    # the component labeling is small (docs-in-clusters rows); checkpoint
    # it locally so the working caches can be RELEASED — long sessions
    # running many queries would otherwise accumulate finished-query cache
    # until storage crowds execution memory
    final = labels.localCheckpoint(eager=True)
    labels.unpersist()
    edges.unpersist()
    return final


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_sql_minhash(2, 0.8)}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: MinHash-LSH pairs -> connected components,
    the step that turns pairwise similarity into keep/drop decisions (keep
    cluster_id, drop the rest). Oracle: DuckDB recursive-CTE transitive
    closure with min-label aggregation — an independent formulation of the
    same fixpoint."""
    docs = load_table(spark, sf_dir, "documents")
    jac, release_shingles = _minhash_lsh_dedup_parts(docs, 2, 0.8)
    # pairs are few; materialize them, then free the MinHash working cache
    pairs = jac.select("doc_a", "doc_b").localCheckpoint(eager=True)
    release_shingles()
    return connected_components(pairs)


def _undirected(pairs: DataFrame) -> DataFrame:
    """Directed both-ways view (u, v) of an unordered pair list."""
    return pairs.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionByName(pairs.select(F.col("b").alias("u"), F.col("a").alias("v")))


def _large_star(pairs: DataFrame) -> DataFrame:
    """One large-star round: every neighbor v > u re-links to
    m = min(u, min neighbors of u). Strictly decreases large components'
    diameter; cannot create edges above a node's component min."""
    nbr = _undirected(pairs)
    mins = nbr.groupBy("u").agg(F.min("v").alias("mn"))
    m = F.least(F.col("u"), F.col("mn"))
    return (
        nbr.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), m.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(pairs: DataFrame) -> DataFrame:
    """One small-star round: each node links itself and all its smaller
    neighbors to their minimum. Every undirected edge is processed at its
    LARGER endpoint, so the two stars together cover every edge."""
    sm = _undirected(pairs).filter(F.col("v") < F.col("u"))
    mins = sm.groupBy("u").agg(F.min("v").alias("mn"))
    return (
        sm.join(mins, "u")
        .select(F.col("v").alias("a"), F.col("mn").alias("b"))
        .unionByName(
            mins.select(F.col("u").alias("a"), F.col("mn").alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def two_star_components(pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id): connected components via the alternating
    large-star / small-star algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC 2014).

    Label propagation (connected_components above) needs O(diameter)
    rounds; the two-star alternation converges in O(log^2 n) — at most
    O(log n) in practice — regardless of diameter, which is the 100 TB
    shape when near-dup chains get long (e.g. boilerplate drift across a
    crawl). Each round is two self-grouped joins on bounded pair sets;
    termination compares consecutive edge sets (cheap: the sets shrink
    toward the star forest). Output contract is identical to
    connected_components: cluster_id = component-minimum doc_id."""
    # each round is localCheckpoint'ed: the star transforms + convergence
    # compare would otherwise stack ~4 plan copies per round and Catalyst
    # re-optimization time grows exponentially with iteration depth
    cur = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        _undirected(cur)
        .select(F.col("u").alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    while True:
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        changed = (
            nxt.exceptAll(cur).count() + cur.exceptAll(nxt).count()
        )
        cur = nxt
        if changed == 0:
            break
    # at the fixpoint `cur` is a star forest rooted at component minima
    labels = cur.select(
        F.col("a").alias("doc_id"), F.col("b").alias("cluster_id")
    ).groupBy("doc_id").agg(F.min("cluster_id").alias("cluster_id"))
    return (
        nodes.join(labels, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
        )
        .localCheckpoint(eager=True)
    )


@query(
    "dedup_clusters_twostar",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_sql_minhash(2, 0.8)}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
    """,
)
def dedup_clusters_twostar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters via large-star/small-star — the
    diameter-independent scale path next to dedup_clusters' label
    propagation; both are held to the same recursive-CTE oracle."""
    docs = load_table(spark, sf_dir, "documents")
    jac, release_shingles = _minhash_lsh_dedup_parts(docs, 2, 0.8)
    pairs = jac.select("doc_a", "doc_b").localCheckpoint(eager=True)
    release_shingles()
    return two_star_components(pairs)


# ---------------------------------------------------------------------------
# sub-document (chunk-level) exact dedup
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32

_CHUNK_FOLD = (
    f"aggregate(slice(th, i * {CHUNK_TOKENS} + 1, {CHUNK_TOKENS}), "
    f"CAST(0 AS BIGINT), "
    f"(acc, h) -> (acc * {SHINGLE_MULT} + h) % {HASH_MOD})"
)

_SQL_CHUNK_FOLD = (
    f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
    f"list_slice(th, i * {CHUNK_TOKENS} + 1, i * {CHUNK_TOKENS} + {CHUNK_TOKENS})), "
    f"(acc, h) -> (acc * {SHINGLE_MULT} + h) % {HASH_MOD})"
)


@query(
    "dedup_chunks",
    oracle=f"""
    WITH th AS (
      SELECT doc_id,
             list_transform({_SQL_TOKENS}, t -> {sql_char_poly_hash('t')}) AS th
      FROM documents
    ),
    ch AS (
      SELECT doc_id, u.chunk_hash AS chunk_hash FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(0, CAST(ceil(length(th) / {CHUNK_TOKENS}.0) AS BIGINT)),
                 i -> {{'chunk_hash': {_SQL_CHUNK_FOLD}}})) AS u
        FROM th WHERE length(th) > 0
      )
    ),
    d AS (
      SELECT chunk_hash FROM ch
      GROUP BY chunk_hash HAVING count(DISTINCT doc_id) > 1
    )
    SELECT c.doc_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(d.chunk_hash) AS BIGINT) AS n_shared_chunks,
           {sql_round_half_up('count(d.chunk_hash) / count(*)', 4)}
             AS shared_chunk_ratio
    FROM ch c LEFT JOIN d ON c.chunk_hash = d.chunk_hash
    GROUP BY c.doc_id
    """,
)
def dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup: split each document into fixed
    {CHUNK_TOKENS}-token chunks and report, per document, how many of its
    chunks also occur verbatim in ANOTHER document — the line/passage-level
    dedup step of web-corpus pipelines (RefinedWeb, C4 remove repeated
    boilerplate passages that whole-document dedup misses).

    Scale shape: chunking is entirely in-row (each token char-hashed once,
    each chunk a polynomial fold over its <= {CHUNK_TOKENS} token hashes),
    so the exploded stream carries (doc_id, chunk_hash) — ~16 bytes/row,
    never chunk text.  The shared-chunk detection is one hash aggregate
    over chunk_hash with map-side partials; the flag-back join shuffles
    hashes only.  Nothing in the plan holds more than a chunk-hash stream,
    so the operator scales like dedup_exact, not like the n-gram family
    (chunks are non-overlapping: ~N/{CHUNK_TOKENS} rows, not N x k).

    A chunk repeated only WITHIN one document does not count as shared
    (count(DISTINCT doc_id) > 1) — within-doc repetition is text_repetition's
    job (operators/textstats.py)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    th = f"transform({_SPARK_TOKS}, t -> {_poly_hash_sql('t')})"
    chunks = (
        docs.selectExpr("doc_id", f"{th} AS th")
        .where("size(th) > 0")
        .selectExpr(
            "doc_id",
            f"explode(transform("
            f"sequence(0, CAST(ceil(size(th) / {CHUNK_TOKENS}.0) AS INT) - 1), "
            f"i -> {_CHUNK_FOLD})) AS chunk_hash",
        )
    )
    shared = (
        chunks.groupBy("chunk_hash")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("chunk_hash", F.lit(1).alias("dup"))
    )
    per_doc = (
        chunks.join(shared, "chunk_hash", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.count("dup").cast("long").alias("n_shared_chunks"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "n_shared_chunks",
        round_half_up(
            F.col("n_shared_chunks") / F.col("n_chunks"), 4
        ).alias("shared_chunk_ratio"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter approximate membership
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 16  # m: filter width in bits
BLOOM_K = 4           # independent hash functions (salted poly hashes)
BLOOM_MOD = 37        # every 37th doc stands in for the reference set


def _bloom_positions_spark(text_expr: str) -> str:
    cells = []
    for j in range(BLOOM_K):
        salted = f"concat({text_expr}, '|b{j}')"
        cells.append(f"({_poly_hash_sql(salted)}) % {BLOOM_BITS}")
    return f"array({', '.join(cells)})"


def _bloom_positions_sql(text_expr: str) -> str:
    cells = []
    for j in range(BLOOM_K):
        salted = f"{text_expr} || '|b{j}'"
        cells.append(f"({sql_char_poly_hash(salted)}) % {BLOOM_BITS}")
    return f"[{', '.join(cells)}]"


@query(
    "dedup_bloom_filter",
    oracle=f"""
    WITH ref AS (
      SELECT text FROM documents WHERE doc_id % {BLOOM_MOD} = 0
    ),
    bits AS (
      SELECT DISTINCT unnest({_bloom_positions_sql('text')}) AS bit FROM ref
    ),
    cand AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {BLOOM_MOD} <> 0
    ),
    probe AS (
      SELECT doc_id, unnest({_bloom_positions_sql('text')}) AS bit FROM cand
    ),
    m AS (
      SELECT p.doc_id, CAST(count(b.bit) AS BIGINT) AS hits
      FROM probe p LEFT JOIN bits b USING (bit) GROUP BY p.doc_id
    ),
    mem AS (
      SELECT DISTINCT {sql_char_poly_hash('text')} AS th FROM ref
    )
    SELECT c.doc_id AS doc_id,
           CAST(CASE WHEN m.hits = {BLOOM_K} THEN 1 ELSE 0 END AS INT)
             AS bloom_positive,
           CAST(CASE WHEN mm.th IS NOT NULL THEN 1 ELSE 0 END AS INT)
             AS is_member
    FROM cand c
    JOIN m ON m.doc_id = c.doc_id
    LEFT JOIN mem mm ON mm.th = {sql_char_poly_hash('c.text')}
    """,
)
def dedup_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter approximate membership (Bloom 1970): has this document
    already been ingested?  A {BLOOM_BITS}-bit / {BLOOM_K}-hash filter is
    built from the reference set (every {BLOOM_MOD}th document stands in
    for "the corpus so far") and every candidate probes it; the exact
    text-hash membership rides along so false positives are directly
    observable (bloom_positive=1, is_member=0 — never the reverse: Bloom
    filters have no false negatives, which the oracle equality proves on
    every row).

    Scale shape: the filter is REPRESENTED RELATIONALLY as its set-bit
    table — at most min(k x |ref|, {BLOOM_BITS}) rows — so it BROADCASTS
    like any bounded dimension and the probe is a map-side hash join over
    the candidates' exploded bit positions ({BLOOM_K} rows per doc), with
    one doc-bounded aggregate to AND the probes together.  The corpus
    text never shuffles; only 16-bit positions move.  The salted poly
    hashes are the cross-engine-deterministic stand-in for the
    independent hash family; production tunes m and k from the target
    false-positive rate (p ~= (1 - e^(-kn/m))^k)."""
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % BLOOM_MOD == 0)
    cand = fan_out(docs.filter(F.col("doc_id") % BLOOM_MOD != 0))
    pos = _bloom_positions_spark("text")
    bits = (
        ref.selectExpr(f"explode({pos}) AS bit")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    probe = cand.selectExpr("doc_id", f"explode({pos}) AS bit")
    m = (
        probe.join(F.broadcast(bits), "bit", "left")
        .groupBy("doc_id")
        .agg(F.count("hit").alias("hits"))
    )
    mem = (
        ref.select(char_poly_hash("text").alias("th"))
        .distinct()
        .withColumn("seen", F.lit(1))
    )
    return (
        cand.select("doc_id", char_poly_hash("text").alias("th"))
        .join(m, "doc_id")
        .join(F.broadcast(mem), "th", "left")
        .select(
            "doc_id",
            (F.col("hits") == BLOOM_K).cast("int").alias("bloom_positive"),
            F.col("seen").isNotNull().cast("int").alias("is_member"),
        )
    )


# ---------------------------------------------------------------------------
# incremental-ingest admission (batch twin of the streaming admission filter)
# ---------------------------------------------------------------------------

INGEST_MOD = 10
INGEST_REM = 7  # doc_id % 10 == 7 stands in for the incoming batch


@query(
    "dedup_incremental_ingest",
    oracle=f"""
    WITH pairs AS ({_sql_minhash(2, 0.8)}),
    inc AS (
      SELECT doc_id, {sql_char_poly_hash('text')} AS th
      FROM documents WHERE doc_id % {INGEST_MOD} = {INGEST_REM}
    ),
    ex AS (
      SELECT DISTINCT {sql_char_poly_hash('text')} AS th
      FROM documents WHERE doc_id % {INGEST_MOD} <> {INGEST_REM}
    ),
    xact AS (SELECT DISTINCT i.doc_id FROM inc i JOIN ex e ON i.th = e.th),
    near AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id, doc_b AS other FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
      ) WHERE doc_id % {INGEST_MOD} = {INGEST_REM}
          AND other % {INGEST_MOD} <> {INGEST_REM}
    )
    SELECT i.doc_id AS doc_id,
           CASE WHEN x.doc_id IS NOT NULL THEN 'exact'
                WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'admitted' END AS decision
    FROM inc i
    LEFT JOIN xact x ON x.doc_id = i.doc_id
    LEFT JOIN near n ON n.doc_id = i.doc_id
    """,
)
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest admission — the batch twin of the streaming
    near-dup admission filter: an incoming batch (every doc with id % 10
    == 7 stands in for it) is admitted against the existing corpus unless
    it is an EXACT duplicate (content-hash membership) or a NEAR duplicate
    (MinHash-LSH Jaccard >= 0.8 against an existing doc). Each incoming
    doc gets a decision: 'exact' beats 'near_dup' beats 'admitted' — the
    dedup gate every growing corpus runs per ingestion cycle.

    Scale shape: the exact gate joins 64-bit content hashes (never text);
    the near gate reuses the banded-LSH candidate machinery — the only
    pairs materialized are bucket-collision candidates, and only the
    incoming-vs-existing direction survives the filter. In production the
    existing side's signatures/hashes are a precomputed INDEX (written
    once, read per batch) rather than recomputed; the plan shape per
    batch is identical."""
    docs = load_table(spark, sf_dir, "documents")
    is_inc = F.col("doc_id") % INGEST_MOD == INGEST_REM
    incoming = docs.filter(is_inc)
    xi = incoming.select("doc_id", char_poly_hash("text").alias("th"))
    xe = (
        docs.filter(~is_inc)
        .select(char_poly_hash("text").alias("th"))
        .distinct()
        .withColumn("seen", F.lit(1))
    )
    exact_ids = (
        xi.join(xe, "th", "left")
        .filter(F.col("seen").isNotNull())
        .select("doc_id")
        .withColumn("x", F.lit(1))
    )
    jac, release_shingles = _minhash_lsh_dedup_parts(docs, 2, 0.8)
    pairs = jac.select("doc_a", "doc_b").localCheckpoint(eager=True)
    release_shingles()
    both = pairs.select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("other")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("other"))
    )
    near_ids = (
        both.filter(
            (F.col("doc_id") % INGEST_MOD == INGEST_REM)
            & (F.col("other") % INGEST_MOD != INGEST_REM)
        )
        .select("doc_id")
        .distinct()
        .withColumn("nd", F.lit(1))
    )
    return (
        incoming.select("doc_id")
        .join(exact_ids, "doc_id", "left")
        .join(near_ids, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("x").isNotNull(), "exact")
            .when(F.col("nd").isNotNull(), "near_dup")
            .otherwise("admitted")
            .alias("decision"),
        )
    )


# ---------------------------------------------------------------------------
# asymmetric containment (quote / excerpt detection)
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.8


@query(
    "dedup_containment",
    oracle=f"""
    WITH sh AS ({_sql_shingle_hashes(2)}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    dirs AS (
      SELECT doc_a AS doc_sub, doc_b AS doc_super, n_inter FROM inter
      UNION ALL
      SELECT doc_b, doc_a, n_inter FROM inter
    )
    SELECT doc_sub, doc_super,
           CAST(n_inter AS BIGINT) AS n_shared,
           CAST(s.n_sh AS BIGINT) AS n_sub_shingles,
           {sql_round_half_up('n_inter / s.n_sh', 4)} AS containment
    FROM dirs JOIN sizes s ON s.doc_id = doc_sub
    WHERE {sql_round_half_up('n_inter / s.n_sh', 4)}
            >= {CONTAINMENT_THRESHOLD}
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment (Broder 1997's second resemblance measure):
    |A ∩ B| / |A| over shingle sets — high when document A is mostly a
    QUOTE or EXCERPT of B even though their Jaccard is low (a tweet
    quoting a paragraph of an article resembles it barely, but is ~fully
    contained in it). Jaccard-based dedup misses these; containment is
    the standard second pass for excerpt/boilerplate lineage.

    Pair generation is the shared-shingle equi-join (only pairs with at
    least one common shingle materialize — the dedup_ngram_jaccard
    ground-truth shape); both directions of each unordered pair are
    scored since containment is not symmetric. At 100 TB restrict the
    pair space first (LSH candidates plus a size-ratio prefilter on the
    broadcast size table) — the formula and joins are unchanged; the
    candidate generator is the swap-in, exactly as the near-dup family
    swaps brute-force pairs for bucket collisions."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_hashes(docs, 2).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    dirs = inter.select(
        F.col("doc_a").alias("doc_sub"),
        F.col("doc_b").alias("doc_super"),
        "n_inter",
    ).unionByName(
        inter.select(
            F.col("doc_b").alias("doc_sub"),
            F.col("doc_a").alias("doc_super"),
            "n_inter",
        )
    )
    ssub = sizes.select(F.col("doc_id").alias("doc_sub"), "n_sh")
    cont = round_half_up(F.col("n_inter") / F.col("n_sh"), 4)
    out = (
        dirs.join(F.broadcast(ssub), "doc_sub")
        .filter(cont >= CONTAINMENT_THRESHOLD)
        .select(
            "doc_sub",
            "doc_super",
            F.col("n_inter").alias("n_shared"),
            F.col("n_sh").alias("n_sub_shingles"),
            cont.alias("containment"),
        )
        .localCheckpoint(eager=True)
    )
    sh.unpersist()
    return out


@query(
    "dedup_report",
    oracle=f"""
    WITH ex AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts
      FROM documents
    ),
    near AS (
      SELECT CAST(count(*) AS BIGINT) AS n_near_pairs
      FROM ({_sql_minhash(2, 0.8)})
    )
    SELECT ex.n_docs, ex.n_distinct_texts,
           ex.n_docs - ex.n_distinct_texts AS n_exact_dup_docs,
           {sql_round_half_up(
               'CAST(ex.n_docs - ex.n_distinct_texts AS DOUBLE)'
               ' / CAST(ex.n_docs AS DOUBLE)', 4)} AS exact_dup_rate,
           near.n_near_pairs
    FROM ex CROSS JOIN near
    """,
)
def dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus duplication report: exact-duplicate rate plus the count
    of verified near-duplicate pairs (MinHash-LSH at Jaccard >= 0.8) in
    one row — the number a data lead looks at before deciding how hard to
    dedup, composed from the same operators that then do the work.

    Scale shape: the exact side is one distinct-aggregate over text
    hashes; the near side reuses the full banded-LSH pipeline
    (candidate-restricted verification) and collapses it to a count, so
    the report costs no more than the dedup pass it previews."""
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_texts"),
    )
    near = minhash_lsh_dedup(docs, spark, k=2, threshold=0.8).agg(
        F.count("*").alias("n_near_pairs")
    )
    return ex.crossJoin(near).select(
        "n_docs",
        "n_distinct_texts",
        (F.col("n_docs") - F.col("n_distinct_texts")).alias("n_exact_dup_docs"),
        round_half_up(
            (F.col("n_docs") - F.col("n_distinct_texts")).cast("double")
            / F.col("n_docs").cast("double"),
            4,
        ).alias("exact_dup_rate"),
        "n_near_pairs",
    )


_SPLIT_CASE_SQL = """
    CASE WHEN bucket < 80 THEN 'train'
         WHEN bucket < 90 THEN 'val'
         ELSE 'test' END
"""


@query(
    "pipeline_split_leakage",
    oracle=f"""
    WITH pairs AS ({_sql_minhash(2, 0.8)}),
    sp AS (
      SELECT doc_id, {_SPLIT_CASE_SQL} AS split
      FROM (
        SELECT doc_id, {sql_char_poly_hash('text')} % 100 AS bucket
        FROM documents
      )
    )
    SELECT least(sa.split, sb.split) AS split_lo,
           greatest(sa.split, sb.split) AS split_hi,
           CAST(count(*) AS BIGINT) AS n_pairs,
           {sql_round_half_up('min(p.jaccard)', 4)} AS min_jaccard
    FROM pairs p
    JOIN sp sa ON sa.doc_id = p.doc_a
    JOIN sp sb ON sb.doc_id = p.doc_b
    GROUP BY 1, 2
    """,
)
def pipeline_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit: count verified near-duplicate pairs
    (MinHash-LSH, Jaccard >= 0.8) whose endpoints landed in DIFFERENT
    splits of the content-hash 80/10/10 assignment — the check that
    catches evaluation contamination BEFORE a model trains.  Exact
    duplicates can never straddle (identical text hashes to one split);
    near-duplicates can, and the off-diagonal rows of this result are
    exactly that leakage.

    Scale shape: the pair table is the already-linear LSH output; the
    split assignment is a map-side expression joined in twice (AQE
    broadcasts the per-doc split table while it fits, and it is 2 ints +
    a string per doc); output is bounded by (3 choose 2) + 3 rows."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(docs, spark, k=2, threshold=0.8)
    from pyspark_text_classification_spark.operators.pipeline import SPLIT_PCT

    bucket = char_poly_hash("text") % 100
    split = (
        F.when(bucket < SPLIT_PCT[0], "train")
        .when(bucket < SPLIT_PCT[1], "val")
        .otherwise("test")
    )
    sp = docs.select("doc_id", split.alias("split"))
    sa = sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .groupBy(
            F.least("split_a", "split_b").alias("split_lo"),
            F.greatest("split_a", "split_b").alias("split_hi"),
        )
        .agg(
            F.count("*").alias("n_pairs"),
            round_half_up(F.min("jaccard"), 4).alias("min_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# boilerplate shingle detection (RefinedWeb/CCNet-style corpus cleaning)
# ---------------------------------------------------------------------------

BOILER_K = 4  # shingle width in tokens
BOILER_MIN_DF = 3  # shingles in >= this many distinct docs are boilerplate


@query(
    "dedup_boilerplate",
    oracle=f"""
    WITH sh AS ({{sh}}),
    bo AS (
      SELECT h FROM sh GROUP BY h HAVING count(*) >= {BOILER_MIN_DF}
    ),
    per_doc AS (
      SELECT s.doc_id,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(CASE WHEN bo.h IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_boiler
      FROM sh s LEFT JOIN bo ON s.h = bo.h
      GROUP BY 1
    )
    SELECT doc_id, n_shingles, n_boiler,
           CAST(n_boiler * 10000 // n_shingles AS BIGINT) AS boiler_bp
    FROM per_doc
    """,
)
def dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate ratio via cross-document shingle frequency
    (the CCNet/RefinedWeb line-dedup recipe adapted to newline-free docs:
    a 4-token shingle appearing in >= BOILER_MIN_DF distinct documents is
    "boilerplate"; a doc's ratio is the fraction of its distinct shingles
    that are boilerplate, in integer basis points).

    Plan: the distinct (doc, shingle) stream is built once and persisted;
    shingle document-frequency is ONE map-side-combined aggregate, the
    boilerplate set (high-DF shingles are by definition few — DF follows
    Zipf, so the >= MIN_DF tail is a small fraction of distinct shingles)
    broadcasts back as a left join carrying a 1-flag, and the per-doc
    ratio is a second hash aggregate.  Nothing quadratic anywhere; at
    100 TB the only large shuffles are the two hash aggregates, and the
    ratio is integer division (no IEEE rounding to disagree on)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_hashes(docs, k=BOILER_K).persist()
    try:
        out = boilerplate_frame(sh).localCheckpoint(eager=True)
    finally:
        sh.unpersist()
    return out


def boilerplate_frame(sh: DataFrame) -> DataFrame:
    """The LAZY boilerplate plan over a (doc_id, h) shingle stream —
    factored out so the plan contract (tests/test_plans.py) can inspect
    the real join strategy; the registered query wraps it with the
    persist + eager-checkpoint cache hygiene that would otherwise hide
    the plan behind an ExistingRDD scan."""
    boiler = (
        sh.groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= BOILER_MIN_DF)
        .select("h", F.lit(1).alias("b"))
    )
    per_doc = (
        sh.join(F.broadcast(boiler), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("b"), F.lit(0)).cast("long").alias("n_boiler"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_boiler",
        F.expr("n_boiler * 10000 div n_shingles").alias("boiler_bp"),
    )


# fill in the shared shingle CTE (f-string above would need brace escaping
# for the SQL lambdas inside _sql_shingle_hashes, so substitute afterwards)
from pyspark_text_classification_spark.registry import ORACLES as _ORACLES  # noqa: E402

_ORACLES["dedup_boilerplate"] = _ORACLES["dedup_boilerplate"].format(
    sh=_sql_shingle_hashes(BOILER_K)
)


# ---------------------------------------------------------------------------
# diversity sampling (one representative per LSH neighborhood)
# ---------------------------------------------------------------------------

_SQL_B0_PERMS = ", ".join(
    f"({p}, {a}, {b})" for p, a, b in MINHASH_PERMS[:BAND_ROWS]
)


@query(
    "pipeline_diverse_sample",
    oracle=f"""
    WITH sh AS ({{sh}}),
    perms(perm_id, a, b) AS (VALUES {_SQL_B0_PERMS}),
    mh AS (
      SELECT doc_id, perm_id, min((a * h + b) % {HASH_MOD}) AS mh
      FROM sh CROSS JOIN perms GROUP BY 1, 2
    ),
    b0 AS (
      SELECT doc_id,
             string_agg(CAST(mh AS VARCHAR), '-' ORDER BY perm_id) AS sig
      FROM mh GROUP BY 1
    )
    SELECT min(doc_id) AS rep_doc_id, CAST(count(*) AS BIGINT) AS n_members
    FROM b0 GROUP BY sig
    """,
)
def pipeline_diverse_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware corpus sampling: one canonical representative per
    MinHash band-0 neighborhood (the SemDeDup-style recipe — cluster
    near-identical content, keep one per cluster — using the SAME banded
    index dedup_minhash_lsh serves, so "sampled for diversity" and
    "kept by dedup" agree on what a neighborhood is).

    Each document has exactly one band-0 signature, so the buckets
    PARTITION the corpus and ``min(doc_id)`` per bucket is a
    deterministic representative; ``n_members`` is the neighborhood mass
    a mixture-weighted consumer can reweight by.  Two map-side-combined
    aggregates (per-doc mins, per-bucket min/count) — no joins, no pair
    generation, nothing quadratic; at 100 TB this is strictly cheaper
    than the full LSH dedup whose index it reuses."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_hashes(docs, k=2)
    bands = _bands_from_mins(_minhash_mins(sh)).filter(F.col("band") == 0)
    return bands.groupBy("sig").agg(
        F.min("doc_id").alias("rep_doc_id"),
        F.count("*").alias("n_members"),
    ).select("rep_doc_id", "n_members")


_ORACLES["pipeline_diverse_sample"] = _ORACLES["pipeline_diverse_sample"].format(
    sh=_sql_shingle_hashes(2)
)


# threshold bands for the dedup-tuning sweep (half-open, plus exact-1 band)
SWEEP_EDGES = (0.5, 0.6, 0.7, 0.8, 0.9)


@query(
    "dedup_threshold_sweep",
    oracle=f"""
    WITH pairs AS ({_sql_minhash(2, 0.5)})
    SELECT CASE
             WHEN jaccard = 1.0 THEN 'exact'
             WHEN jaccard >= 0.9 THEN 'ge_0.9'
             WHEN jaccard >= 0.8 THEN 'ge_0.8'
             WHEN jaccard >= 0.7 THEN 'ge_0.7'
             WHEN jaccard >= 0.6 THEN 'ge_0.6'
             ELSE 'ge_0.5'
           END AS band,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY 1
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup-tuning table: how many near-dup pairs each Jaccard
    threshold would remove — the measurement that picks a production
    threshold (too low deletes distinct documents, too high leaves
    templated spam).  Candidate pairs come from the SAME MinHash-LSH
    index the production dedup uses (32 perms, 8 bands x 4 rows —
    ``_minhash_lsh_dedup_parts`` at threshold 0.5); exact Jaccard is
    computed only on those candidates and banded into half-open
    threshold ranges plus an 'exact' band.  Counts per band are the
    report (<= 6 rows).

    The sweep is therefore the tuning view OF the deployed LSH dedup:
    band counts are what that pipeline would actually delete at each
    threshold.  Near the 0.5 floor LSH recall is ~40% (1-(1-j^4)^8), so
    the low bands under-count the all-pairs truth; at the thresholds a
    production dedup ships (>= 0.8) recall is >= 97%.  The earlier
    all-pairs formulation (shared-shingle equi-join) is quadratic in
    shingle document frequency — this corpus has a tiny shingle
    vocabulary (~870 distinct 2-shingles at EVERY sf), so df grows
    linearly with corpus size and the pair join fanned out to 21.7s at
    sf0.1 and unboundedly at 100 TB; a fixed df cap is no fix because
    every shingle eventually crosses it (an earlier cap=64 emptied the
    sweep at sf0.1).  Candidate-restriction is deterministic, so the
    DuckDB oracle replicates it bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    jac, cleanup = _minhash_lsh_dedup_parts(docs, 2, 0.5)
    j = F.col("jaccard")
    out = (
        jac.select(
            F.when(j == 1.0, "exact")
            .when(j >= 0.9, "ge_0.9")
            .when(j >= 0.8, "ge_0.8")
            .when(j >= 0.7, "ge_0.7")
            .when(j >= 0.6, "ge_0.6")
            .otherwise("ge_0.5")
            .alias("band")
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_pairs"))
        # <=6 rows: eager-materialize so the shingle/minhash caches can be
        # released before returning (long multi-query driver sessions).
        .localCheckpoint(eager=True)
    )
    cleanup()
    return out


# --------------------------------------------------------------------------
# Fuzzy entity matching: q-gram blocking + edit-distance verify — the
# entity-resolution primitive (merge near-identical names/titles before
# they become duplicate entities in training data).  The q-gram lemma
# (Gravano et al., "Approximate String Joins in a Database (Almost) for
# Free", VLDB 2001): strings at edit distance <= d share at least
# max(|a|,|b|) - q + 1 - d*q q-grams, which is >= 1 whenever
# len >= q*(d+1); with q=2, d=2 that is len >= 6 — every name in the part
# dimension is >= 7 chars, so the 2-gram blocking join is LOSSLESS here
# and the oracle can verify against the brute-force pair join.
# --------------------------------------------------------------------------
FUZZY_Q = 2
FUZZY_MAX_DIST = 2


@query(
    "dedup_fuzzy_names",
    oracle=f"""
    WITH names AS (
      SELECT p_name, CAST(count(*) AS BIGINT) AS n_rows
      FROM part GROUP BY 1
    ),
    p AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
             a.n_rows AS n_a, b.n_rows AS n_b
      FROM names a JOIN names b ON a.p_name < b.p_name
    )
    SELECT name_a, name_b, dist, n_a, n_b
    FROM p WHERE dist <= {FUZZY_MAX_DIST}
    """,
)
def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching over the part-name vocabulary: every name
    pair within edit distance {FUZZY_MAX_DIST}, with each name's row
    support — the entity-resolution report that precedes a canonical-
    name merge.

    Scale shape: match runs at the distinct-NAME grain (the vocabulary,
    not the row count), candidates come from a shared-{FUZZY_Q}-gram
    equi-join (never the vocab cross join — the q-gram lemma in the
    section header makes the blocking lossless at these lengths, which
    is also why the brute-force oracle is a valid twin), and the
    Levenshtein verify runs only on blocked candidates.  At 100 TB the
    gram join is the standard skew point (stopword-like grams): cap or
    drop ultra-frequent grams — each dropped gram only risks pairs that
    share NOTHING ELSE, and the lemma guarantees >= 1 shared gram
    survives for in-distance pairs unless the cap removes all of them;
    production tunes the cap against that bound."""
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count("*").alias("n_rows"))
    )
    grams = names.select(
        "p_name",
        F.explode(
            F.array_distinct(
                # CASE guard: sequence(1, 0) is descending in Spark, so a
                # name shorter than q would emit bogus substring grams
                # where the oracle's range() is empty (the documented
                # len >= 6 losslessness contract already excludes such
                # names, but gram generation must still be well-defined)
                F.expr(
                    f"CASE WHEN length(p_name) >= {FUZZY_Q} THEN"
                    f" transform(sequence(1, length(p_name) - {FUZZY_Q - 1}),"
                    f" i -> substring(p_name, i, {FUZZY_Q}))"
                    f" ELSE array() END"
                )
            )
        ).alias("g"),
    )
    a, b = grams.alias("a"), grams.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
        )
        .distinct()
    )
    verified = cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
    ).filter(F.col("dist") <= FUZZY_MAX_DIST)
    na = names.select(
        F.col("p_name").alias("name_a"), F.col("n_rows").alias("n_a")
    )
    nb = names.select(
        F.col("p_name").alias("name_b"), F.col("n_rows").alias("n_b")
    )
    return (
        verified.join(F.broadcast(na), "name_a")
        .join(F.broadcast(nb), "name_b")
        .select("name_a", "name_b", "dist", "n_a", "n_b")
    )
