"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in dbt_datbricks_demo_spark/queries/
(inventory.py: SURVEY.md §2 operator families + relational extensions;
llm_ops.py: the LLM-data-pipeline operators; pipeline_ops.py: the
round-2 training-pipeline + surface-completeness queries); this module
just adapts it to the driver's interface. COVERAGE.md maps every query
to its operator and tests. Registration order is part of the contract:
oracle-backed queries register before rows-only ones (see
queries/__init__.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_datbricks_demo_spark.queries import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the pricing-summary hash aggregation."""
    return QUERIES["pricing_summary"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
