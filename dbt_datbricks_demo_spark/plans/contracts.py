"""Model contracts (dbt `contract: {enforced: true}` parity).

A contract pins a model's public schema — column names and data types —
and fails the build when the produced DataFrame drifts, BEFORE anything
is written. The reference ecosystem enforces this warehouse-side when
dbt renders a column spec into the DDL; Spark-side we check the
analyzed schema, which is free (no action is triggered: schemas resolve
at plan time).

Type names are Spark ``simpleString`` forms (``bigint``, ``double``,
``string``, ``timestamp``, ``date``, ``boolean``, ``array<float>`` ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class ContractViolation(Exception):
    """The model's schema does not satisfy its declared contract."""


# dbt/SQL spellings users write -> Spark simpleString
_ALIASES = {
    "long": "bigint",
    "integer": "int",
    "bool": "boolean",
    "float8": "double",
    "varchar": "string",
    "text": "string",
}


def _norm(t: str) -> str:
    t = t.strip().lower()
    return _ALIASES.get(t, t)


def enforce_contract(
    df: DataFrame,
    columns: dict[str, str],
    *,
    model: str = "<model>",
    allow_extra: bool = False,
) -> DataFrame:
    """Validate ``df`` against ``{column: type}``; return it unchanged.

    Raises :class:`ContractViolation` listing every problem at once
    (missing columns, unexpected columns unless ``allow_extra``, type
    mismatches) so a contract failure is one actionable message, not a
    whack-a-mole loop.
    """
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems: list[str] = []
    for col, typ in columns.items():
        if col not in actual:
            problems.append(f"missing column {col!r} ({_norm(typ)})")
        elif actual[col] != _norm(typ):
            problems.append(
                f"column {col!r}: contract {_norm(typ)}, actual {actual[col]}"
            )
    if not allow_extra:
        for col in actual:
            if col not in columns:
                problems.append(f"unexpected column {col!r} ({actual[col]})")
    if problems:
        raise ContractViolation(
            f"model {model!r} violates its contract: " + "; ".join(problems)
        )
    return df
