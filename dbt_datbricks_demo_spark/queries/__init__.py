"""Query surface: SURVEY §2 operator inventory + EDA queries."""

from dbt_datbricks_demo_spark.queries.inventory import QUERIES, QuerySpec  # noqa: F401
from dbt_datbricks_demo_spark.queries import llm_ops  # noqa: F401  (registers into QUERIES)
