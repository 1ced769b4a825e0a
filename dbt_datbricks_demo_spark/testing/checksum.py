"""Distributed order-insensitive result checksum (round-10 verdict
item 1): the scaled-oracle gate's equivalence check computed INSIDE
each engine, so no result rows ever ride to the driver — O(1) driver
memory at any scale, vs the previous full-result ``toPandas()`` pull
that bounded which x100 cells were affordable.

Shape: every row is rendered to one canonical string (columns sorted
by name, a fixed per-type rendering, unit-separator joined), md5'd,
and the two 60-bit hex chunks of the digest are SUMMED across rows.
Two results match iff (row_count, chunk1_sum, chunk2_sum, sorted
column names) all match — commutative sums make the check
order-insensitive, exactly like the driver gate's sorted-rows compare.

The canonical rendering must be BIT-IDENTICAL between Spark and
DuckDB. That rules out every formatting path for doubles — Java's
``%.17e`` pads from the shortest decimal repr while C's expands the
exact binary value, and the engines' double→decimal casts diverge the
same way (measured: 33k/105k mismatches at scale 12). What IS
engine-independent is IEEE-754 arithmetic itself, so doubles are
canonicalized with pure arithmetic::

    floor(x)                       -- exact for |x| < 2^53
    floor((x - floor(x)) * 1e9 + 0.5)   -- fraction, 1e-9 quantized

measured bit-identical across engines on 105k values including
adversarial near-half-boundary cases (0 mismatches). PRECISION
CONTRACT: float differences below the 1e-9 fraction quantum (and
|x| >= 9e15, where the fraction is meaningless) are NOT detected;
results containing such magnitudes, NaN/Inf, or non-scalar columns
are REFUSED (``refused`` reason returned) so the caller falls back to
the exact driver-gate compare rather than silently weakening. The
sub-x30 scales keep the exact compare; this gate exists to make x100
cells affordable.

Reference basis: the reference delegates result verification to dbt's
test framework (store_failures tables, counts only); this is the
scaled analog required by the round-10 verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# types the canonicalization covers; anything else → refuse
_SPARK_FAMILY = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "boolean": "bool",
    "string": "str",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "date": "date",
}

# ARRAY columns of these element families are canonicalized too
# (round-11 verdict item 4: array-bearing results — array_functions/
# map_functions/embedding_quantization reports — were permanently
# checksum-refused, so their x100 cells fell back to the driver-bound
# exact compare; 1.5M-row toPandas pulls at scale). Elements render
# with the scalar canon, joined by chr(30) with chr(2) for NULL
# elements and a length prefix (disambiguating [] from ['']); element
# strings containing any sentinel refuse in-pass like scalar strings.
_ARRAY_ELEM_FAMILY = {"int": "arr_int", "float": "arr_float", "str": "arr_str"}

_DUCK_FAMILY = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "HUGEINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    "FLOAT": "float",
    "REAL": "float",
    "DOUBLE": "float",
    "BOOLEAN": "bool",
    "VARCHAR": "str",
    "TIMESTAMP": "ts",
    "TIMESTAMP_NS": "ts",
    "DATE": "date",
}

_NULL = "chr(1)"  # sentinel for NULL, joined rows never collide with it
_SEP = "chr(31)"  # unit separator between columns
# ...unless a STRING VALUE itself contains chr(1)/chr(31): then two
# genuinely different rows can render identically (column-boundary /
# NULL ambiguity) — a silent false PASS the exact gate would catch.
# Such values are counted in the same aggregation pass (bad_strings,
# mirroring bad_floats) and force a refusal → exact-compare fallback.

# fraction quantum 1e-9; |x| >= 9e15 loses integer exactness in the
# bigint floor — such results are refused, never silently bucketed
FLOAT_CAP = 9.0e15


def _float_canon(c: str, engine: str) -> str:
    """Arithmetic-only canonical rendering of a double — identical in
    both engines because IEEE-754 ops (not formatting) produce every
    digit. Contract violations (NaN/Inf/|x|>=cap) render as 'X' so the
    expression never throws (DuckDB's bigint cast of NaN errors before
    the refusal count could return) — the bad_floats aggregate in the
    same pass still forces the refusal, so an 'X' can never silently
    pass the gate."""
    if engine == "spark":
        ipart = f"cast(cast(floor({c}) as bigint) as string)"
        fpart = (
            f"cast(cast(floor(({c} - floor({c})) * 1000000000 + 0.5) "
            f"as bigint) as string)"
        )
        body = f"concat({ipart}, '.', {fpart})"
        guard = f"isnan({c}) or abs({c}) >= {FLOAT_CAP:.1f}"
    else:
        # DuckDB's concat() SKIPS null args (Spark's propagates) — use
        # the null-propagating || so a NULL float canonicalizes to the
        # sentinel on both engines instead of a bare '.' here
        ipart = f"floor({c})::bigint::varchar"
        fpart = (
            f"floor(({c} - floor({c})) * 1000000000 + 0.5)"
            "::bigint::varchar"
        )
        body = f"({ipart} || '.' || {fpart})"
        guard = f"isnan({c}) or abs({c}) >= {FLOAT_CAP:.1f}"
    return f"case when {guard} then 'X' else {body} end"


def _elem_canon(family: str, engine: str) -> str:
    """Scalar canon of an array ELEMENT bound to lambda variable x —
    the same renderings _canon uses for scalar columns, minus the
    NULL coalesce (the array join supplies chr(2) for null elements)."""
    if family == "int":
        return "cast(x as string)" if engine == "spark" else "x::varchar"
    if family == "str":
        return "x"
    if family == "float":
        wide = "cast(x as double)" if engine == "spark" else "x::double"
        return _float_canon(wide, engine)
    raise ValueError(f"no array-element rendering for family {family!r}")


def _canon(c: str, family: str, engine: str) -> str:
    q = f'"{c}"' if engine == "duckdb" else f"`{c}`"
    if family in _ARRAY_ELEM_FAMILY.values():
        elem = _elem_canon(family.removeprefix("arr_"), engine)
        if engine == "spark":
            body = (
                f"concat(cast(size({q}) as string), ':', "
                f"array_join(transform({q}, x -> "
                f"coalesce({elem}, chr(2))), chr(30)))"
            )
        else:
            # array_to_string of an EMPTY list is NULL in DuckDB
            # (string_agg over zero rows) while Spark's array_join
            # returns '' — coalesce the join, not the whole body, so
            # [] renders '0:' on both and a NULL array still hits the
            # outer NULL sentinel
            body = (
                f"(len({q})::varchar || ':' || "
                f"coalesce(array_to_string(list_transform({q}, x -> "
                f"coalesce({elem}, chr(2))), chr(30)), ''))"
            )
        return f"coalesce({body}, {_NULL})"
    if family == "int":
        body = (
            f"cast({q} as string)" if engine == "spark"
            else f"{q}::varchar"
        )
    elif family == "bool":
        body = (
            f"cast({q} as string)" if engine == "spark"
            else f"{q}::varchar"
        )
    elif family == "str":
        body = q
    elif family == "ts":
        body = (
            f"date_format({q}, 'yyyy-MM-dd HH:mm:ss.SSSSSS')"
            if engine == "spark"
            else f"strftime({q}, '%Y-%m-%d %H:%M:%S.%f')"
        )
    elif family == "date":
        # render as a midnight timestamp, not bare 'YYYY-MM-DD': the
        # driver gate normalizes date and timestamp columns to one
        # datetime64 dtype, so a Spark DATE column whose oracle lands
        # in parquet as TIMESTAMP (e.g. DuckDB date arithmetic widens)
        # must hash identically — measured live on
        # date_functions_extended at x100 (false checksum mismatch,
        # exact gate green)
        body = (
            f"concat(cast({q} as string), ' 00:00:00.000000')"
            if engine == "spark"
            else f"({q}::varchar || ' 00:00:00.000000')"
        )
    elif family == "float":
        # widen float32 exactly; canonicalize with IEEE arithmetic
        wide = (
            f"cast({q} as double)" if engine == "spark"
            else f"{q}::double"
        )
        body = _float_canon(wide, engine)
    else:  # pragma: no cover - callers pre-validate families
        raise ValueError(f"no canonical rendering for family {family!r}")
    return f"coalesce({body}, {_NULL})"


def spark_families(df: DataFrame) -> dict[str, str] | None:
    """Column→family map, or None if any column type is outside the
    canonicalization (structs/maps/decimals/nested arrays → caller
    refuses). Arrays of int/float/str scalars map to arr_* families."""
    fams = {}
    for name, dtype in df.dtypes:
        fam = _SPARK_FAMILY.get(dtype)
        if fam is None and dtype.startswith("array<") and dtype.endswith(">"):
            inner = _SPARK_FAMILY.get(dtype[6:-1])
            fam = _ARRAY_ELEM_FAMILY.get(inner) if inner else None
        if fam is None:
            return None
        fams[name] = fam
    return fams


def _duck_family(dtype: str) -> str | None:
    dtype = dtype.upper()
    fam = _DUCK_FAMILY.get(dtype)
    if fam is None and dtype.endswith("[]"):
        inner = _DUCK_FAMILY.get(dtype[:-2])
        fam = _ARRAY_ELEM_FAMILY.get(inner) if inner else None
    return fam


def spark_checksum(df: DataFrame) -> dict:
    """Compute the checksum of a result DataFrame inside Spark: one
    whole-stage-codegen pass + a scalar aggregate; nothing but five
    numbers returns to the driver. Returns a refusal (reason set,
    sums absent) when the result holds non-scalar columns or float
    values outside the precision contract."""
    fams = spark_families(df)
    if fams is None:
        return {"refused": f"non-scalar column in {df.dtypes}"}
    cols = sorted(fams)
    canons = ", ".join(_canon(c, fams[c], "spark") for c in cols)
    float_cols = [c for c in cols if fams[c] == "float"]
    str_cols = [c for c in cols if fams[c] == "str"]
    arrf_cols = [c for c in cols if fams[c] == "arr_float"]
    arrs_cols = [c for c in cols if fams[c] == "arr_str"]
    # floats outside the contract (NaN/Inf/|x|>=9e15) force refusal —
    # counted in the same pass, no extra scan; array<float> elements
    # under the same contract via exists()
    bad = " + ".join(
        [
            f"sum(case when `{c}` is not null and (isnan(`{c}`) or "
            f"abs(`{c}`) >= {FLOAT_CAP:.1f}) then 1 else 0 end)"
            for c in float_cols
        ]
        + [
            f"sum(case when `{c}` is not null and exists(`{c}`, x -> "
            f"isnan(cast(x as double)) or abs(cast(x as double)) >= "
            f"{FLOAT_CAP:.1f}) then 1 else 0 end)"
            for c in arrf_cols
        ]
    ) or "0"
    # string values containing the NULL/separator sentinels would make
    # the rendering ambiguous (round-11 advice) — refuse, same pass;
    # array<string> elements also refuse the element separators
    # chr(30)/chr(2)
    bad_str = " + ".join(
        [
            f"sum(case when `{c}` is not null and (instr(`{c}`, chr(1)) > 0 "
            f"or instr(`{c}`, chr(31)) > 0) then 1 else 0 end)"
            for c in str_cols
        ]
        + [
            f"sum(case when `{c}` is not null and exists(`{c}`, x -> "
            f"x is not null and (instr(x, chr(1)) > 0 or "
            f"instr(x, chr(31)) > 0 or instr(x, chr(30)) > 0 or "
            f"instr(x, chr(2)) > 0)) then 1 else 0 end)"
            for c in arrs_cols
        ]
    ) or "0"
    carry = [
        f"`{c}`" for c in (*float_cols, *str_cols, *arrf_cols, *arrs_cols)
    ]
    agg_df = (
        df.selectExpr(
            f"concat_ws({_SEP}, {canons}) as _row",
            *carry,
        )
        .selectExpr(
            "cast(conv(substring(md5(_row), 1, 15), 16, 10) "
            "as decimal(38,0)) as _c1",
            "cast(conv(substring(md5(_row), 16, 15), 16, 10) "
            "as decimal(38,0)) as _c2",
            *carry,
        )
        .selectExpr(
            "count(*) as n",
            "sum(_c1) as c1",
            "sum(_c2) as c2",
            f"{bad} as bad_floats",
            f"{bad_str} as bad_strings",
        )
    )
    r = agg_df.collect()[0]
    if (r["bad_floats"] or 0) > 0:
        return {
            "refused": f"{r['bad_floats']} float values outside the "
            f"precision contract (NaN/Inf/|x|>={FLOAT_CAP:.0e})"
        }
    if (r["bad_strings"] or 0) > 0:
        return {
            "refused": f"{r['bad_strings']} string values contain the "
            "chr(1)/chr(31) rendering sentinels (boundary ambiguity)"
        }
    return {
        "columns": cols,
        "n": int(r["n"]),
        "c1": int(r["c1"]) if r["c1"] is not None else 0,
        "c2": int(r["c2"]) if r["c2"] is not None else 0,
    }


def duckdb_checksum(con, relation_sql: str) -> dict:
    """The same checksum computed inside DuckDB over ``relation_sql``
    (e.g. ``select * from read_parquet('oracle.parquet')``). Streams —
    the result never materializes in pandas."""
    desc = con.sql(f"describe {relation_sql}").fetchall()
    fams = {}
    for name, dtype, *_ in desc:
        fam = _duck_family(dtype)
        if fam is None:
            return {"refused": f"non-scalar column {name}: {dtype}"}
        fams[name] = fam
    cols = sorted(fams)
    canons = ", ".join(_canon(c, fams[c], "duckdb") for c in cols)
    float_cols = [c for c in cols if fams[c] == "float"]
    str_cols = [c for c in cols if fams[c] == "str"]
    arrf_cols = [c for c in cols if fams[c] == "arr_float"]
    arrs_cols = [c for c in cols if fams[c] == "arr_str"]
    bad = " + ".join(
        [
            f'sum(case when "{c}" is not null and (isnan("{c}"::double) or '
            f'abs("{c}"::double) >= {FLOAT_CAP:.1f}) then 1 else 0 end)'
            for c in float_cols
        ]
        + [
            f'sum(case when "{c}" is not null and len(list_filter("{c}", '
            f"x -> isnan(x::double) or abs(x::double) >= "
            f"{FLOAT_CAP:.1f})) > 0 then 1 else 0 end)"
            for c in arrf_cols
        ]
    ) or "0"
    bad_str = " + ".join(
        [
            f'sum(case when "{c}" is not null and (instr("{c}", chr(1)) > 0 '
            f'or instr("{c}", chr(31)) > 0) then 1 else 0 end)'
            for c in str_cols
        ]
        + [
            f'sum(case when "{c}" is not null and len(list_filter("{c}", '
            f"x -> x is not null and (instr(x, chr(1)) > 0 or "
            f"instr(x, chr(31)) > 0 or instr(x, chr(30)) > 0 or "
            f"instr(x, chr(2)) > 0))) > 0 then 1 else 0 end)"
            for c in arrs_cols
        ]
    ) or "0"
    carry_cols = [*float_cols, *str_cols, *arrf_cols, *arrs_cols]
    carry = (
        (", " + ", ".join(f'"{c}"' for c in carry_cols))
        if carry_cols
        else ""
    )
    sql = f"""
    with rows as (
      select concat_ws({_SEP}, {canons}) as _row
             {carry}
      from ({relation_sql})
    ), hashed as (
      select ('0x' || substr(md5(_row), 1, 15))::bigint as _c1,
             ('0x' || substr(md5(_row), 16, 15))::bigint as _c2
             {carry}
      from rows
    )
    select count(*) as n, sum(_c1) as c1, sum(_c2) as c2,
           {bad} as bad_floats, {bad_str} as bad_strings
    from hashed
    """
    n, c1, c2, bad_n, bad_str_n = con.sql(sql).fetchone()
    if (bad_n or 0) > 0:
        return {
            "refused": f"{bad_n} float values outside the precision "
            f"contract (NaN/Inf/|x|>={FLOAT_CAP:.0e})"
        }
    if (bad_str_n or 0) > 0:
        return {
            "refused": f"{bad_str_n} string values contain the "
            "chr(1)/chr(31) rendering sentinels (boundary ambiguity)"
        }
    return {
        "columns": cols,
        "n": int(n),
        "c1": int(c1) if c1 is not None else 0,
        "c2": int(c2) if c2 is not None else 0,
    }


def checksum_compare(spark_side: dict, oracle_side: dict) -> list[str]:
    """Driver-gate-shaped problem list; empty = checksum-equal."""
    problems = []
    for side, cs in (("spark", spark_side), ("oracle", oracle_side)):
        if "refused" in cs:
            problems.append(f"{side} refused checksum: {cs['refused']}")
    if problems:
        return problems
    if spark_side["columns"] != oracle_side["columns"]:
        problems.append(
            f"columns: spark={spark_side['columns']} "
            f"oracle={oracle_side['columns']}"
        )
    if spark_side["n"] != oracle_side["n"]:
        problems.append(
            f"row count: spark={spark_side['n']} oracle={oracle_side['n']}"
        )
    if problems:
        return problems
    for k in ("c1", "c2"):
        if spark_side[k] != oracle_side[k]:
            problems.append(
                f"checksum {k}: spark={spark_side[k]} "
                f"oracle={oracle_side[k]}"
            )
    return problems
