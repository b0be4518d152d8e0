#!/usr/bin/env python3
"""Self-test of tools/check.py — guards the r12 lesson: a planted
DuckDB-HUGEINT-vs-Spark-BIGINT divergence (same values, different physical
type) MUST fail the local gate, because the driver hashes typed values and
rejects it. Also asserts the converse: width-only arrow encoding variants
(large_string vs string) stay green, and an honest value match passes.

Usage: python3 tools/check_selftest.py   (exit 0 = checker behaves)
"""
import json
import sys
import tempfile
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).parent))
import check  # noqa: E402


def run_case(queries):
    """queries: name -> (arrow_table, oracle_sql). Returns check.main rc."""
    with tempfile.TemporaryDirectory() as d:
        sf = Path(d) / "sf"
        out = Path(d) / "out"
        sf.mkdir()
        out.mkdir()
        oracle = {}
        for name, (table, sql) in queries.items():
            qdir = out / name
            qdir.mkdir()
            pq.write_table(table, qdir / "part-0.parquet")
            oracle[name] = sql
        (out / "oracle_sql.json").write_text(json.dumps(oracle))
        return check.main(str(sf), str(out))


def main():
    # 1. Planted r12 seam: Spark int64 vs DuckDB sum() HUGEINT -> decimal128.
    #    Values identical (3 == 3); the typed hash is not. Must FAIL.
    rc = run_case({
        "t1_hugeint_seam": (
            pa.table({"x": pa.array([3], type=pa.int64())}),
            "SELECT sum(x) AS x FROM (VALUES (1),(2)) t(x)",
        )})
    assert rc == 1, "type-mismatch case must FAIL (got pass)"

    # 2. Width-only encoding variant: large_string vs string. Must PASS.
    rc = run_case({
        "t2_large_string_ok": (
            pa.table({"s": pa.array(["a", "b"], type=pa.large_string())}),
            "SELECT 'a' AS s UNION ALL SELECT 'b'",
        )})
    assert rc == 0, "width-only variant must PASS (got fail)"

    # 3. Honest match (same type, same values). Must PASS.
    rc = run_case({
        "t3_honest": (
            pa.table({"x": pa.array([1, 2], type=pa.int64())}),
            "SELECT CAST(1 AS BIGINT) AS x UNION ALL SELECT 2",
        )})
    assert rc == 0, "honest match must PASS (got fail)"

    # 4. Value mismatch still fails (the original contract, unregressed).
    rc = run_case({
        "t4_value_bad": (
            pa.table({"x": pa.array([1, 99], type=pa.int64())}),
            "SELECT CAST(1 AS BIGINT) AS x UNION ALL SELECT 2",
        )})
    assert rc == 1, "value mismatch must FAIL (got pass)"

    # 5. Width-only variant NESTED in a struct (large_string child).
    #    canon_type must recurse; a top-level-only canon would FAIL this
    #    honest match. DuckDB's struct_pack builds the struct twin.
    rc = run_case({
        "t5_nested_large_string_ok": (
            pa.table({"r": pa.array([{"a": "x", "n": 1}], type=pa.struct(
                [pa.field("a", pa.large_string()),
                 pa.field("n", pa.int64())]))}),
            "SELECT struct_pack(a := 'x', n := CAST(1 AS BIGINT)) AS r",
        )})
    assert rc == 0, "struct-nested width-only variant must PASS (got fail)"

    print("check_selftest: 5/5 OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
