"""Test suite runner: executes TestSpecs, reports PASS/FAIL counts like
``dbt test`` (reference SETUP_GUIDE.md:347-351 'Done. PASS=54')."""

from __future__ import annotations

from collections.abc import Callable, Mapping
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class TestSpec:
    name: str  # e.g. "not_null_stg_devices_device_id"
    model: str  # model the test targets (for layer/tag selection)
    build: Callable[[Mapping[str, DataFrame]], DataFrame]  # → violations


@dataclass(frozen=True)
class TestResult:
    name: str
    passed: bool
    failures: int  # number of violating rows (0 when passed)


def run_test(
    spec: TestSpec,
    relations: Mapping[str, DataFrame],
    store_failures_dir: str | None = None,
) -> TestResult:
    violations = spec.build(relations)
    # isEmpty() avoids counting all violations just to learn pass/fail…
    if violations.isEmpty():
        return TestResult(spec.name, True, 0)
    # …and only a failing test pays for the full count. With
    # store_failures (dbt `--store-failures`), the violating rows are
    # also persisted under an audit path named after the test so a
    # failure can be debugged without re-running the query.
    if store_failures_dir is not None:
        violations.write.mode("overwrite").parquet(
            f"{store_failures_dir}/{spec.name}"
        )
    return TestResult(spec.name, False, violations.count())


def run_suite(
    specs: list[TestSpec],
    relations: Mapping[str, DataFrame],
    models: set[str] | None = None,
    threads: int = 4,
    store_failures_dir: str | None = None,
) -> list[TestResult]:
    """Run (a selection of) the suite. threads=4 mirrors the reference's
    dbt profile concurrency (profiles.yml.template:24); Spark jobs from
    separate driver threads run concurrently on the cluster."""
    selected = [s for s in specs if models is None or s.model in models]
    with ThreadPoolExecutor(max_workers=threads) as pool:
        return list(
            pool.map(
                lambda s: run_test(s, relations, store_failures_dir), selected
            )
        )


def summarize(results: list[TestResult]) -> str:
    passed = sum(r.passed for r in results)
    failed = [r for r in results if not r.passed]
    lines = [f"Done. PASS={passed} FAIL={len(failed)} TOTAL={len(results)}"]
    for r in failed:
        lines.append(f"  FAIL {r.name}: {r.failures} violating rows")
    return "\n".join(lines)
