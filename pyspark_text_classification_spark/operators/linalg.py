"""Distributed linear algebra as relational programs: PCA power iteration.

The top principal direction of an embedding corpus is the fixed point of
v <- normalize(G @ v) with G the (uncentered) Gram matrix sum_r x_r x_r^T.
The relational trick: G @ v never materializes G —

    (G @ v)_j = sum_r x_rj * (x_r . v)

so one pass computes the per-row scalar s_r = x_r . v (an in-row fold),
and a dimension-exploded aggregate sums x_rj * s_r per j.  That is a
map-side-combined shuffle of |dims| keys no matter the corpus size — the
same shape MLlib's RowMatrix uses for its distributed gramian; the
matrix-free form also generalizes to d where an explicit d x d build
would not fit.

Determinism: vectors quantize to integer ten-thousandths once; the start
vector is the literal alternating (+1, -1, ...) pattern; the renorm
between iterations is the integer prescale v <- floordiv(w, max|w| //
SCALE + 1) instead of a float L2 norm (floor division realized as
subtract-nonneg-remainder-then-exact-divide — exact in both engines
regardless of their shared truncate-toward-zero ``div``/``//`` semantics) — every intermediate is
exact int64 on both engines, so the iterate itself is hash-checked, not
just its sign pattern.  Overflow headroom with |x| < 0.6 (TESTDATA
contract), QUANT=1e4, SCALE=1e3: |s_r| <= 64 * 6e3 * 1e3 < 4e8 and
|w_j| <= n * 6e3 * 4e8 — int64-safe to n ~ 3e6 vectors; larger corpora
drop QUANT one decade per 100x rows (the retrieval int64 bound's trade).

The per-iteration driver state is the 64-long iterate (a bounded
aggregate collect, the graph_pagerank_iter3 loop pattern with a vector
instead of a rank table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import fan_out, load_table

PCA_DIM = 64          # embeddings width (TESTDATA contract)
PCA_QUANT = 10_000    # float -> integer ten-thousandths
PCA_SCALE = 1_000     # renormalized iterate magnitude (max |v_j| ~ SCALE)
PCA_ITERS = 2


_SQL_QV = (
    f"list_transform(embedding, x -> "
    f"CAST(floor(CAST(x AS DOUBLE) * {PCA_QUANT}) AS BIGINT))"
)
_SQL_V0 = ", ".join(
    str(1 if j % 2 == 0 else -1) for j in range(PCA_DIM)
)


def _sql_power_step(prev: str) -> str:
    """One matrix-free step + integer prescale renorm, as a CTE body.

    ``{prev}`` is a (j, vj) table; the iterate re-enters the row scan as
    a one-row ordered-list CROSS JOIN (the broadcast), since DuckDB
    forbids subqueries inside lambda bodies."""
    return f"""
      SELECT j, (w - ((w % p + p) % p)) // p AS vj
      FROM (
        SELECT j, w, max(abs(w)) OVER () // {PCA_SCALE} + 1 AS p
        FROM (
          SELECT j, sum(qvj * s) AS w
          FROM (
            SELECT unnest(q.qv) AS qvj,
                   generate_subscripts(q.qv, 1) AS j,
                   list_sum(list_transform(range(1, {PCA_DIM} + 1),
                            k -> q.qv[k] * vv.vl[k])) AS s
            FROM qvs q
            CROSS JOIN (SELECT list(vj ORDER BY j) AS vl FROM {prev}) vv
          ) GROUP BY 1
        )
      )
    """


@query(
    "ml_pca_power_iter",
    oracle=f"""
    WITH qvs AS (SELECT {_SQL_QV} AS qv FROM embeddings),
    v0 AS (SELECT generate_subscripts(v, 1) AS j, CAST(unnest(v) AS BIGINT)
                  AS vj FROM (SELECT [{_SQL_V0}] AS v)),
    v1 AS ({_sql_power_step('v0')}),
    v2 AS ({_sql_power_step('v1')})
    SELECT CAST(j AS BIGINT) AS j, CAST(vj AS BIGINT) AS v_scaled FROM v2
    """,
)
def ml_pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{PCA_ITERS} matrix-free power-iteration steps toward the corpus'
    top principal direction, entirely in exact int64 (module docstring):
    per step, an in-row integer dot with the literal iterate, a
    dimension-exploded map-side-combined 64-key sum, and an integer
    prescale renorm — output is the 64-row scaled iterate, hash-checked
    against the recurrence unrolled as a DuckDB CTE chain."""
    e = fan_out(load_table(spark, sf_dir, "embeddings"))
    qvs = e.select(
        F.expr(
            f"transform(embedding, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {PCA_QUANT}) AS BIGINT))"
        ).alias("qv")
    ).localCheckpoint(eager=True)  # one scan feeds every iteration

    v = [1 if j % 2 == 0 else -1 for j in range(PCA_DIM)]
    for _ in range(PCA_ITERS):
        v_arr = "array(" + ", ".join(f"{x}L" for x in v) + ")"
        s = (
            f"aggregate(zip_with(qv, {v_arr}, (x, y) -> x * y), "
            f"CAST(0 AS BIGINT), (acc, t) -> acc + t)"
        )
        w_rows = (
            qvs.selectExpr(f"{s} AS s", "qv")
            .selectExpr("posexplode(qv) AS (j0, qvj)", "s")
            .groupBy((F.col("j0") + 1).alias("j"))
            .agg(F.sum(F.col("qvj") * F.col("s")).alias("w"))
            .collect()  # 64 rows: bounded driver state, by design
        )
        w = {int(r["j"]): int(r["w"]) for r in w_rows}
        p = max(abs(x) for x in w.values()) // PCA_SCALE + 1
        v = [w[j + 1] // p for j in range(PCA_DIM)]  # Python // floors
    return spark.createDataFrame(
        [(j + 1, int(v[j])) for j in range(PCA_DIM)],
        "j LONG, v_scaled LONG",
    )
