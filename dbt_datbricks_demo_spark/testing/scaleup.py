"""Deterministic synthetic scale-up of a testdata directory.

Weak-scaling evidence (round-6 verdict item 1): every 100-TB claim in
SCALE.md rests on plan shape measured at ONE scale point (sf0.1). This
module manufactures k× replicas of the sf0.1 tables so the slowest
queries can be timed at 1×/3×/10× and the argued linearity becomes a
measured time-ratio curve (published in SCALE.md, produced by
scripts/weak_scaling.py).

Generation is pure DuckDB SQL — deliberately NOT Spark — so the scaled
parquet is produced by an independent engine and the Spark-vs-DuckDB
oracle harness can run unchanged against the scaled directory
(tests/test_scaleup.py does exactly that). Output is one single-file
parquet per table, the layout both `queries._t` and
`oracle_harness.make_duckdb` expect.

Replica design (replica 0 is the identity; i = 1..k-1):

- Keys are offset per replica (doc_id/event_id/o_orderkey/l_orderkey
  +10M·i; entity keys +1M·i; user_id +100k·i) with FK consistency —
  lineitem.l_orderkey moves with orders.o_orderkey, l_partkey with
  p_partkey, o_custkey with c_custkey — so every join finds exactly
  its replica's partners and join fan-out scales ×k, never ×k².
- `documents.text`: every word at 0-based position p ≡ 0 (mod 7) gets
  the replica number appended. Period 7 < gram order 8 means NO 8-gram
  window survives unchanged across replicas (duplicate-span mass
  scales exactly ×k); ~3/7 of 3-word shingles change, putting
  cross-replica Jaccard ≈ 0.36 — far below every near-dup threshold —
  so MinHash/SimHash component structure replicates ×k instead of
  collapsing into cross-replica mega-clusters. Word 0 always changes,
  so exact duplicates never span replicas. Within a replica the edit
  is position-based and identical for every doc, so replica-internal
  duplicate/near-dup structure is preserved. n_chars is recomputed.
- `embeddings.embedding`: deterministic ±0.01 per-coordinate jitter
  keyed on (vec_id, coordinate, replica) — small against unit-scale
  vectors, so label/cluster geometry is preserved while no two
  replicas are byte-equal; labels unchanged (weak scaling = same
  groups, k× members).
- `events`: user_id offsets mint k× users with identical per-user
  activity — the ideal weak-scaling shape for sessionization /
  gap-fill / as-of (more groups of the same size).
- `nation`/`region` stay fixed: TPC-H itself scales fact tables and
  freezes these dims.

Known non-goals, documented: string dims (names, p_type, event_type,
source domains, lang) are NOT remapped, so distinct-counts over them
stay constant while facts grow — matching the real world (a 10×
crawl does not mint 10× registered domains) and leaving filter
selectivities untouched.
"""

from __future__ import annotations

import json
import os

import duckdb

GENERATOR_VERSION = 1

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# period of the word-perturbation mask; MUST stay < the ExactSubstr
# gram order (8) so no duplicate gram survives across replicas
WORD_PERIOD = 7

_KEY_OFFSETS: dict[str, dict[str, int]] = {
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 100_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
}


def _replica_select(table: str, src: str, i: int) -> str:
    """One replica's SELECT over the source parquet, keys offset and
    content deterministically perturbed (identity when i == 0)."""
    offsets = _KEY_OFFSETS.get(table, {})
    cols: dict[str, str] = {}
    for col, off in offsets.items():
        if i:
            cols[col] = f"({col} + {off * i}) as {col}"
    if table == "documents" and i:
        # word at 0-based position p ≡ 0 (mod WORD_PERIOD) → word||i
        # (DuckDB lambda index j is 1-based)
        cols["text"] = (
            "array_to_string(list_transform(string_split(text, ' '), "
            f"(w, j) -> case when (j - 1) % {WORD_PERIOD} = 0 "
            f"then w || '{i}' else w end), ' ') as text"
        )
        cols["n_chars"] = "0 as n_chars"  # placeholder, fixed below
    if table == "embeddings" and i:
        cols["embedding"] = (
            "list_transform(embedding, (x, j) -> (x + ("
            f"(vec_id::BIGINT * 131071 + j::BIGINT * 8191 + {i} * 97531) "
            "% 2001 - 1000) / 100000.0)::FLOAT) as embedding"
        )
    names = duckdb.sql(f"select * from read_parquet('{src}') limit 0").columns
    exprs = [cols.get(c, c) for c in names]
    inner = f"select {', '.join(exprs)} from read_parquet('{src}')"
    if table == "documents" and i:
        # n_chars must stay the exact length of text (testdata invariant,
        # asserted by tests) — recompute over the perturbed text
        keep = [c for c in names if c != "n_chars"]
        inner = (
            f"select {', '.join(keep)}, length(text)::BIGINT as n_chars "
            f"from ({inner}) order by doc_id"
        )
        # reproject to the source column order so the union lines up
        inner = f"select {', '.join(names)} from ({inner})"
    return inner


def scale_up_dir(
    src_dir: str,
    dst_dir: str,
    factor: int,
    force: bool = False,
    tables: tuple[str, ...] | None = None,
) -> str:
    """Write a ``factor``× scaled copy of ``src_dir`` into ``dst_dir``
    (one single-file parquet per table). Idempotent: a manifest pins
    (src, factor, generator version) and a matching manifest skips the
    rebuild. ``tables`` restricts generation to a subset (round 10:
    the production-threshold tier-2 corpus needs 401 replicas of
    DOCUMENTS only — replicating lineitem 401x would be ~10 GB of
    parquet no consumer reads). Returns ``dst_dir``."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    manifest_path = os.path.join(dst_dir, "manifest.json")
    manifest = {
        "src_dir": os.path.abspath(src_dir),
        "factor": factor,
        "generator_version": GENERATOR_VERSION,
    }
    if tables is not None:
        manifest["tables"] = sorted(tables)
    if not force and os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            if json.load(fh) == manifest:
                return dst_dir
    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    # a factor-wide UNION ALL nests one parse level per replica and
    # trips DuckDB's 1000-deep expression guard at prod factors (the
    # 1001x prodvec2m corpus); the guard protects against runaway
    # recursion, not a flat union, so raising it is safe here
    con.execute(f"set max_expression_depth to {max(2000, factor + 500)}")
    for table in tables if tables is not None else TABLES:
        src = os.path.join(src_dir, f"{table}.parquet")
        dst = os.path.join(dst_dir, f"{table}.parquet")
        if table in ("region", "nation"):
            selects = [_replica_select(table, src, 0)]
        else:
            selects = [
                _replica_select(table, src, i) for i in range(factor)
            ]
        union = " union all ".join(f"({s})" for s in selects)
        con.execute(f"copy ({union}) to '{dst}' (format parquet)")
    con.close()
    with open(manifest_path, "w") as fh:
        json.dump(manifest, fh)
    return dst_dir
