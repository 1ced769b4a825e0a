"""Plan layer: model registry, DAG runner, materializations, orchestration."""

from dbt_datbricks_demo_spark.plans.dag import MODELS, ModelDef, topo_order  # noqa: F401
from dbt_datbricks_demo_spark.plans.materialize import Materializer  # noqa: F401
from dbt_datbricks_demo_spark.plans.runner import PipelineRunner  # noqa: F401
