"""Data-quality test framework (reference entry point 2: ``dbt test``).

A test is a function producing a DataFrame of *violating rows*; it passes
iff that DataFrame is empty (the dbt generic-test contract, visible in
reference macros/test_value_in_range.sql:10-23). Four generic kinds are
used by the reference plus one custom generic and one singular test
(SURVEY.md §5).

Scale note: every generic test is a single narrow scan (one column, or
one column + a broadcast anti-join), so the whole 54-test suite is
embarrassingly parallel and each test prunes to a one-column read on
parquet. ``passes()`` uses ``isEmpty()``/``limit(1)`` so a failing test
short-circuits without materializing all violations.
"""

from dbt_datbricks_demo_spark.testing.generic import (  # noqa: F401
    accepted_values,
    not_null,
    relationships,
    unique,
    value_in_range,
)
from dbt_datbricks_demo_spark.testing.runner import (  # noqa: F401
    TestResult,
    TestSpec,
    run_suite,
)
from dbt_datbricks_demo_spark.testing.suite import reference_suite  # noqa: F401
