"""Documentation artifacts — the `docs generate` parity layer.

The reference's CI runs `dbt docs generate`, producing a manifest
(nodes + lineage) and a catalog (relation schemas) consumed by the docs
site and by tooling (state comparison, impact analysis). This module
emits the same two artifacts for this engine:

  * manifest.json — static: every model with its materialization,
    medallion schema, tags, keys and dependency edges, plus
    parent/child maps (reference: .github/workflows CI docs-generate
    step; model metadata mirrors plans/dag.py MODELS).
  * catalog.json — schema-bearing: column names/types per model,
    derived by building each model's LAZY DataFrame over the seed
    sources in topological order — no materialization, no data read
    beyond schema inference, so it is safe to run against a production
    warehouse.
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from dbt_datbricks_demo_spark.config import RunConfig
from dbt_datbricks_demo_spark.plans.dag import MODELS, topo_order


def build_manifest() -> dict[str, Any]:
    """dbt-manifest-shaped lineage document (static — no Spark)."""
    nodes: dict[str, Any] = {}
    parent_map: dict[str, list[str]] = {}
    child_map: dict[str, list[str]] = {n: [] for n in MODELS}
    for name in topo_order(MODELS):
        m = MODELS[name]
        uid = f"model.{name}"
        nodes[uid] = {
            "name": name,
            "materialization": m.materialization,
            "schema": m.schema_suffix,
            "tags": list(m.tags),
            "unique_key": m.unique_key,
            "watermark_col": m.watermark_col,
            "depends_on": list(m.deps),
        }
        parent_map[name] = list(m.deps)
        for d in m.deps:
            if d in child_map:
                child_map[d].append(name)
    sources = sorted(
        {d for m in MODELS.values() for d in m.deps if d not in MODELS}
    )
    return {
        "nodes": nodes,
        "sources": sources,
        "parent_map": parent_map,
        "child_map": child_map,
    }


def build_catalog(
    spark: SparkSession, seeds: Mapping[str, DataFrame], cfg: RunConfig
) -> dict[str, Any]:
    """Column-level schemas per model from LAZY builds (no writes)."""
    relations: dict[str, DataFrame] = dict(seeds)
    catalog: dict[str, Any] = {}
    for name in topo_order(MODELS):
        m = MODELS[name]
        df = m.build(relations, cfg, None)
        relations[name] = df
        catalog[f"model.{name}"] = {
            "columns": [
                {"name": f.name, "type": f.dataType.simpleString(), "index": i}
                for i, f in enumerate(df.schema.fields)
            ]
        }
    return catalog


def write_artifacts(
    out_dir: str,
    manifest: dict[str, Any],
    catalog: dict[str, Any] | None = None,
) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for fname, doc in [("manifest.json", manifest), ("catalog.json", catalog)]:
        if doc is None:
            continue
        path = os.path.join(out_dir, fname)
        with open(path, "w") as f:
            json.dump(doc, f, indent=2, sort_keys=True)
        written.append(path)
    return written
