"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship tile-assignment query at sf0.001;
``queries``/``oracle_sql`` expose every implemented operator with its
DuckDB oracle (see ``mapchete_xarray_spark/queries.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapchete_xarray_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: assign every synthetic image footprint to its z5
    geodetic tile and count images per tile (SURVEY.md §7 step 3)."""
    # all_queries(): the flagship must resolve regardless of which
    # side of the 50-slot rotation it sits on this round
    return _q.all_queries()["tile_count_geodetic_z5"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return _q.resolve_oracles()
