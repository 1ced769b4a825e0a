"""Data-quality suite for the driver's testdata tables — the same
generic-test framework that encodes the reference's 54-test suite
(testing/suite.py), applied to a second, unrelated dataset. Declares
key uniqueness, non-nullness, enum domains, referential integrity and
ranges over the TPC-H-ish star schema + documents/embeddings."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_datbricks_demo_spark.testing.generic import (
    accepted_values,
    not_null,
    relationships,
    unique,
    value_in_range,
)
from dbt_datbricks_demo_spark.testing.runner import TestSpec


def _col_spec(model: str, column: str, kind: str, fn) -> TestSpec:
    return TestSpec(f"{kind}_{model}_{column}", model, fn)


def testdata_suite() -> list[TestSpec]:
    specs: list[TestSpec] = []

    for model, key in [
        ("customer", "c_custkey"), ("orders", "o_orderkey"),
        ("part", "p_partkey"), ("supplier", "s_suppkey"),
        ("nation", "n_nationkey"), ("region", "r_regionkey"),
        ("events", "event_id"), ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        specs.append(
            _col_spec(model, key, "unique", lambda r, m=model, k=key: unique(r[m], k))
        )
        specs.append(
            _col_spec(model, key, "not_null", lambda r, m=model, k=key: not_null(r[m], k))
        )

    specs.append(
        TestSpec(
            "accepted_values_lineitem_l_returnflag", "lineitem",
            lambda r: accepted_values(r["lineitem"], "l_returnflag", ["A", "N", "R"]),
        )
    )
    specs.append(
        TestSpec(
            "accepted_values_events_event_type", "events",
            lambda r: accepted_values(
                r["events"], "event_type",
                ["click", "error", "purchase", "signup", "view"],
            ),
        )
    )
    specs.append(
        TestSpec(
            "accepted_values_documents_lang", "documents",
            lambda r: accepted_values(
                r["documents"], "lang", ["en", "de", "es", "fr", "zh"]
            ),
        )
    )
    specs.append(
        TestSpec(
            "relationships_orders_custkey", "orders",
            lambda r: relationships(r["orders"], "o_custkey", r["customer"], "c_custkey"),
        )
    )
    specs.append(
        TestSpec(
            "relationships_lineitem_orderkey", "lineitem",
            lambda r: relationships(
                r["lineitem"], "l_orderkey", r["orders"], "o_orderkey"
            ),
        )
    )
    specs.append(
        TestSpec(
            "relationships_lineitem_partkey", "lineitem",
            lambda r: relationships(r["lineitem"], "l_partkey", r["part"], "p_partkey"),
        )
    )
    specs.append(
        TestSpec(
            "value_in_range_lineitem_discount", "lineitem",
            lambda r: value_in_range(r["lineitem"], "l_discount", 0.0, 0.5),
        )
    )
    specs.append(
        TestSpec(
            "embeddings_dim_64", "embeddings",
            lambda r: r["embeddings"].filter(F.size("embedding") != 64),
        )
    )
    return specs
