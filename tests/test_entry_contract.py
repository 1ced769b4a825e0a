"""Guard the driver contract: entry() smoke, queries()/oracle_sql()
key discipline, and schema stability of the flagship query."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows_with_stable_schema(spark):
    df = entry_mod.entry(spark)
    assert df.columns[:4] == ["l_returnflag", "l_linestatus", "row_cnt", "sum_qty"]
    rows = df.collect()
    assert len(rows) >= 1
    assert all(r["row_cnt"] > 0 for r in rows)


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert len(qs) >= 52
    # every oracle belongs to a registered query
    assert set(osql) <= set(qs)
    # rows-only set is the documented trio, nothing accidental
    assert set(qs) - set(osql) == {
        "ann_ivf_topk", "sketch_report", "label_principal_directions"
    }
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(s, str) and "select" in s.lower() for s in osql.values())
