"""The distributed checksum gate (round-10 verdict item 1) must be
exactly as discriminating as the driver gate on everything above its
documented precision contract — these tests plant every mismatch
class and prove each one is caught, and plant the contract's blind
spots and prove they are REFUSED rather than silently passed.

Both engines read the SAME parquet bytes (explicit nulls — a pandas
float NaN is null to Spark but NaN to DuckDB, so frames never cross
the engine boundary directly here)."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dbt_datbricks_demo_spark.testing.checksum import (
    checksum_compare,
    duckdb_checksum,
    spark_checksum,
)

_TS = pa.timestamp("us")


def _base_table():
    return pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "name": pa.array(["a", "b", None, "d"]),
            "score": pa.array([1.25, -0.333333333, 98765.4321, None]),
            "flag": pa.array([True, False, True, None]),
            "ts": pa.array(
                [1736928000123456, 1736933400000000, None, 1767225599999999],
                _TS,
            ),
        }
    )


def _both_sides(spark, tmp_path, table, fname="t.parquet"):
    p = str(tmp_path / fname)
    pq.write_table(table, p)
    con = duckdb.connect()
    return (
        spark.read.parquet(p),
        con,
        f"select * from read_parquet('{p}')",
    )


def test_checksum_identical_and_order_insensitive(spark, tmp_path):
    sdf, con, rel = _both_sides(spark, tmp_path, _base_table())
    scs = spark_checksum(sdf)
    assert checksum_compare(scs, duckdb_checksum(con, rel)) == []
    # row order must not matter — that is the point of the summed hash
    rev = _base_table().take([3, 2, 1, 0])
    _, con2, rel2 = _both_sides(spark, tmp_path, rev, "rev.parquet")
    assert checksum_compare(scs, duckdb_checksum(con2, rel2)) == []


def _mut_float(t):
    return t.set_column(
        t.schema.get_field_index("score"),
        "score",
        pa.array([1.2500001, -0.333333333, 98765.4321, None]),
    )


def _mut_str(t):
    return t.set_column(
        t.schema.get_field_index("name"),
        "name",
        pa.array(["a", "B", None, "d"]),
    )


def _mut_bool(t):
    return t.set_column(
        t.schema.get_field_index("flag"),
        "flag",
        pa.array([False, False, True, None]),
    )


def _mut_null(t):
    return t.set_column(
        t.schema.get_field_index("name"),
        "name",
        pa.array(["a", "b", None, None]),
    )


def _mut_ts(t):
    return t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        pa.array(
            [1736928000123457, 1736933400000000, None, 1767225599999999],
            _TS,
        ),
    )


def _drop_row(t):
    return t.slice(0, 3)


def _rename_col(t):
    return t.rename_columns(["id", "names", "score", "flag", "ts"])


@pytest.mark.parametrize(
    "mutate, expect",
    [
        (_mut_float, "checksum"),  # float diff above the 1e-9 quantum
        (_mut_str, "checksum"),
        (_mut_bool, "checksum"),
        (_mut_null, "checksum"),
        (_mut_ts, "checksum"),  # 1 µs timestamp diff
        (_drop_row, "row count"),
        (_rename_col, "columns"),
    ],
)
def test_checksum_catches_planted_mismatches(spark, tmp_path, mutate, expect):
    sdf, _, _ = _both_sides(spark, tmp_path, _base_table())
    scs = spark_checksum(sdf)
    _, con, rel = _both_sides(spark, tmp_path, mutate(_base_table()), "m.parquet")
    problems = checksum_compare(scs, duckdb_checksum(con, rel))
    assert problems and expect in problems[0], problems


def _with_score(vals):
    t = _base_table()
    return t.set_column(
        t.schema.get_field_index("score"), "score", pa.array(vals)
    )


def test_checksum_refuses_contract_violations(spark, tmp_path):
    # NaN → refused on both engines
    t = _with_score([1.0, float("nan"), 2.0, 3.0])
    sdf, con, rel = _both_sides(spark, tmp_path, t, "nan.parquet")
    scs = spark_checksum(sdf)
    assert "refused" in scs and "precision contract" in scs["refused"]
    assert "refused" in duckdb_checksum(con, rel)
    # |x| >= 9e15 → refused (bigint floor loses exactness there)
    t = _with_score([1.0, 9.1e15, 2.0, 3.0])
    sdf, con, rel = _both_sides(spark, tmp_path, t, "big.parquet")
    assert "refused" in spark_checksum(sdf)
    assert "refused" in duckdb_checksum(con, rel)
    # non-canonicalizable column (map; scalar arrays are now handled —
    # see test_checksum_array_columns) → refused, never mis-hashed
    mp = spark.createDataFrame(
        [(1, {"a": 1.0})], "id long, v map<string,double>"
    )
    assert "refused" in spark_checksum(mp)
    # a refusal on either side is a problem, not a silent pass
    sdf, con, rel = _both_sides(spark, tmp_path, _base_table(), "ok.parquet")
    ok = duckdb_checksum(con, rel)
    assert checksum_compare({"refused": "x"}, ok)
    assert checksum_compare(ok, {"refused": "x"})


def test_checksum_array_columns(spark, tmp_path):
    """Round-11 verdict item 4: ARRAY columns of int/float/str scalars
    are canonicalized (length prefix + chr(30)-joined element canons,
    chr(2) for null elements) instead of permanently refused — the
    refusal made array-bearing x100 cells fall back to the driver-bound
    exact compare. Pins cross-engine equality (nulls, empties, nested
    null elements), discrimination (element value / order / count), the
    []-vs-[''] disambiguation, and element-sentinel refusal."""

    def tbl(arrs, typ):
        return pa.table(
            {"id": pa.array(range(len(arrs)), pa.int64()),
             "v": pa.array(arrs, pa.list_(typ))}
        )

    # cross-engine equality: ints with nulls, empty, null array
    t = tbl([[1, 2, 3], [], None, [None, 5]], pa.int64())
    sdf, con, rel = _both_sides(spark, tmp_path, t, "ai.parquet")
    scs = spark_checksum(sdf)
    assert "refused" not in scs
    assert checksum_compare(scs, duckdb_checksum(con, rel)) == []

    # strings: [] vs [''] must differ (length prefix), order matters
    t = tbl([["a", "b"], [""], []], pa.string())
    sdf, con, rel = _both_sides(spark, tmp_path, t, "as1.parquet")
    base = spark_checksum(sdf)
    assert "refused" not in base
    assert checksum_compare(base, duckdb_checksum(con, rel)) == []
    # order-insensitive across whole ROWS (ids travel with their arrays)
    t2 = pa.table(
        {"id": pa.array([2, 1, 0], pa.int64()),
         "v": pa.array([[], [""], ["a", "b"]], pa.list_(pa.string()))}
    )
    _, con2, rel2 = _both_sides(spark, tmp_path, t2, "as2.parquet")
    assert checksum_compare(base, duckdb_checksum(con2, rel2)) == []
    # ...but element order INSIDE a row must discriminate
    t3 = tbl([["b", "a"], [""], []], pa.string())
    _, con3, rel3 = _both_sides(spark, tmp_path, t3, "as3.parquet")
    assert checksum_compare(base, duckdb_checksum(con3, rel3)) != []
    # element value change
    t4 = tbl([["a", "c"], [""], []], pa.string())
    _, con4, rel4 = _both_sides(spark, tmp_path, t4, "as4.parquet")
    assert checksum_compare(base, duckdb_checksum(con4, rel4)) != []

    # floats canonicalize via the IEEE quantization; NaN element refuses
    t = tbl([[1.25, -0.5], [0.333333333]], pa.float64())
    sdf, con, rel = _both_sides(spark, tmp_path, t, "af.parquet")
    scs = spark_checksum(sdf)
    assert "refused" not in scs
    assert checksum_compare(scs, duckdb_checksum(con, rel)) == []
    t = tbl([[1.25, float("nan")]], pa.float64())
    sdf, con, rel = _both_sides(spark, tmp_path, t, "afn.parquet")
    assert "refused" in spark_checksum(sdf)
    assert "refused" in duckdb_checksum(con, rel)

    # element containing the chr(30) joiner (or chr(2) null marker)
    # refuses on both engines — the rendering would be ambiguous
    t = tbl([["a\x1eb"]], pa.string())
    sdf, con, rel = _both_sides(spark, tmp_path, t, "asent.parquet")
    assert "refused" in spark_checksum(sdf)
    assert "refused" in duckdb_checksum(con, rel)
    t = tbl([["a\x02"]], pa.string())
    sdf, con, rel = _both_sides(spark, tmp_path, t, "asent2.parquet")
    assert "refused" in spark_checksum(sdf)
    assert "refused" in duckdb_checksum(con, rel)

    # null element vs missing element must differ: [null, 5] vs [5]
    ta = tbl([[None, 5]], pa.int64())
    tb = tbl([[5]], pa.int64())
    sa, cona, rela = _both_sides(spark, tmp_path, ta, "an1.parquet")
    _, conb, relb = _both_sides(spark, tmp_path, tb, "an2.parquet")
    csa = spark_checksum(sa)
    assert checksum_compare(csa, duckdb_checksum(cona, rela)) == []
    assert checksum_compare(csa, duckdb_checksum(conb, relb)) != []

    # nested arrays stay refused
    t = pa.table(
        {"v": pa.array([[[1, 2]]], pa.list_(pa.list_(pa.int64())))}
    )
    sdf, con, rel = _both_sides(spark, tmp_path, t, "anest.parquet")
    assert "refused" in spark_checksum(sdf)
    assert "refused" in duckdb_checksum(con, rel)


def test_checksum_refuses_sentinel_bearing_strings(spark, tmp_path):
    """Round-11 advice: a string VALUE containing the chr(1) NULL
    sentinel or the chr(31) column separator makes the canonical row
    rendering ambiguous — e.g. a NULL column and a literal "\\x01"
    string render identically, so two different results could checksum
    EQUAL (a silent false pass). Both engines must refuse such results
    in the same aggregation pass; sentinel-free strings still pass."""

    def _with_name(vals, fname):
        t = pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "name": pa.array(vals),
            }
        )
        return _both_sides(spark, tmp_path, t, fname)

    # the ambiguity this guards against, demonstrated concretely:
    # (NULL) and ("\x01") canonicalize to the same rendered row
    amb_null = pa.table(
        {"id": pa.array([1], pa.int64()), "name": pa.array([None], pa.string())}
    )
    amb_lit = pa.table(
        {"id": pa.array([1], pa.int64()), "name": pa.array(["\x01"])}
    )
    sdf_n, _, _ = _both_sides(spark, tmp_path, amb_null, "amb_n.parquet")
    sdf_l, con_l, rel_l = _both_sides(spark, tmp_path, amb_lit, "amb_l.parquet")
    assert "refused" not in spark_checksum(sdf_n)  # plain NULL is fine
    scs_lit = spark_checksum(sdf_l)
    assert "refused" in scs_lit and "sentinel" in scs_lit["refused"]
    ocs_lit = duckdb_checksum(con_l, rel_l)
    assert "refused" in ocs_lit and "sentinel" in ocs_lit["refused"]

    # chr(31) separator inside a value → refused on both engines
    sdf, con, rel = _with_name(["a", "b\x1fc", "d"], "sep.parquet")
    assert "refused" in spark_checksum(sdf)
    assert "refused" in duckdb_checksum(con, rel)

    # adjacent control characters (\x00, \x02, \x1e) are NOT sentinels
    # and must still checksum cleanly and equal across engines
    sdf, con, rel = _with_name(["a\x00b", "c\x02d", "e\x1ef"], "ctl.parquet")
    scs = spark_checksum(sdf)
    assert "refused" not in scs
    assert checksum_compare(scs, duckdb_checksum(con, rel)) == []


def test_checksum_matches_driver_gate_on_real_queries(spark):
    """The gate agrees with the exact driver-gate compare on real
    registered queries (float-heavy, timestamp, boolean, null-bearing
    results) — same data on both engines ⇒ checksum-equal."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))
    import __spark_entry__ as entry
    from conftest import SF_SMOKE
    from oracle_harness import make_duckdb

    qs, oras = entry.queries(), entry.oracle_sql()
    con = make_duckdb(SF_SMOKE)
    for name in ("pricing_summary", "gap_fill_interpolate", "simhash_docs"):
        scs = spark_checksum(qs[name](spark, SF_SMOKE))
        ocs = duckdb_checksum(con, oras[name])
        assert checksum_compare(scs, ocs) == [], name


def test_checksum_date_vs_midnight_timestamp_parity(spark, tmp_path):
    """A Spark DATE column whose oracle parquet holds TIMESTAMPs at
    midnight must checksum-equal (the driver gate normalizes both to
    one datetime64 dtype — DuckDB date arithmetic widens date+interval
    to timestamp, which hit date_functions_extended at x100 as a false
    checksum mismatch while the exact gate was green). A NON-midnight
    timestamp must still mismatch."""
    dates = pa.table(
        {"id": pa.array([1, 2], pa.int64()),
         "d": pa.array([7305, 7306], pa.date32())}
    )
    midnight = pa.table(
        {"id": pa.array([1, 2], pa.int64()),
         "d": pa.array([631152000000000, 631238400000000], _TS)}
    )
    noon = pa.table(
        {"id": pa.array([1, 2], pa.int64()),
         "d": pa.array([631152000000000, 631281600000000], _TS)}
    )
    sdf, _, _ = _both_sides(spark, tmp_path, dates, "d.parquet")
    assert dict(sdf.dtypes)["d"] == "date"
    scs = spark_checksum(sdf)
    _, con, rel = _both_sides(spark, tmp_path, midnight, "mid.parquet")
    assert checksum_compare(scs, duckdb_checksum(con, rel)) == []
    _, con, rel = _both_sides(spark, tmp_path, noon, "noon.parquet")
    assert checksum_compare(scs, duckdb_checksum(con, rel))
