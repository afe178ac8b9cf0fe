"""Central query registry.

``QUERIES[name] -> fn(spark, sf_dir) -> DataFrame`` and
``ORACLES[name] -> DuckDB SQL`` (absent => driver does a rows-only check).

Modules register via the ``query`` decorator; ``all_queries`` imports every
registering module so the driver sees the full surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register fn under ``name`` with an optional DuckDB oracle twin."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
