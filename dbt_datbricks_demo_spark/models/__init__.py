"""The reference's 10-model transformation DAG as DataFrame builders.

Each model is a pure function ``(upstream DataFrames, RunConfig) ->
DataFrame`` — the Spark-native equivalent of a dbt model file. The DAG
wiring (``ref()``/``source()``) lives in plans.dag's registry.
"""

from dbt_datbricks_demo_spark.models.staging import (  # noqa: F401
    stg_alerts,
    stg_devices,
    stg_sensor_readings,
)
from dbt_datbricks_demo_spark.models.intermediate import (  # noqa: F401
    int_alerts_enriched,
    int_device_health,
    int_sensor_readings_cleaned,
)
from dbt_datbricks_demo_spark.models.marts import (  # noqa: F401
    dim_devices,
    fct_anomaly_events,
    fct_device_summary,
    fct_hourly_metrics,
)
