#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each SQL
in DuckDB with views named after the parquet tables in <sfDir>, and compares
against the Spark result parquet at <verifyOutDir>/<name>/. Compares: row
count, column names (sorted), and exact values row-by-row after sorting
columns by name (mirrors the driver's hash compare as closely as we can).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

import pyarrow as pa


def _family(t: "pa.DataType") -> str:
    """Python-value family of an arrow type — the granularity the driver's
    hash distinguishes (int widths collapse to int; decimal is its own)."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_family(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(
            f"{t.field(i).name}:{_family(t.field(i).type)}" for i in range(t.num_fields)) + ">"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    return str(t)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetch_arrow_table()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            failures += 1
            continue
        problems = []
        if exp.num_rows != got.num_rows:
            problems.append(f"rows exp={exp.num_rows} got={got.num_rows}")
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            problems.append(f"cols exp={ecols} got={gcols}")
        else:
            # Type-drift check: the driver's hash canonicalizes integer
            # WIDTHS (int32 vs int64 hash alike — q_range_frame is green)
            # but NOT type families (DuckDB widening SUM(BIGINT) to
            # decimal128(38,0) vs Spark's int64 broke q_image_phash in
            # r15 with equal values). Flag drift across families so that
            # class fails locally before the driver sees it.
            for c in ecols:
                et = _family(exp.schema.field(c).type)
                gt = _family(got.schema.field(c).type)
                if et != gt:
                    problems.append(
                        f"type-family drift on '{c}': oracle={exp.schema.field(c).type}"
                        f" spark={got.schema.field(c).type}")
            e = exp.select(ecols).to_pylist()
            g = got.select(gcols).to_pylist()
            if e != g:
                n_bad = sum(1 for a, b in zip(e, g) if a != b)
                first = next(((a, b) for a, b in zip(e, g) if a != b), None)
                problems.append(f"values: {n_bad}/{len(e)} rows differ; first: exp={first[0]} got={first[1]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok   {name} ({exp.num_rows} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
