"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query — the main-content span-extraction
  pipeline over the interleaved-documents table derived from the sf0.001
  ``documents`` parquet (lattice best-path decode + media handling).
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator from
  SURVEY.md §2 plus the training-data ops; oracles are genuine DuckDB
  recomputations (see full_lattice_search_spark/plans/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from full_lattice_search_spark.config import LatticeConfig  # noqa: E402
from full_lattice_search_spark.operators.extract import extract_spans  # noqa: E402
from full_lattice_search_spark.plans.lattice_view import lattice_docs  # noqa: E402
from full_lattice_search_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extraction pipeline on sf0.001 (driver checks rows > 0)."""
    docs = lattice_docs(spark, "/root/testdata/sf0.001")
    return extract_spans(docs, LatticeConfig())


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
