#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs `sbt runMain graft.Verify <sfDir> <outDir>` results (already produced)
against the DuckDB oracle: for each query parquet in outDir, executes the
matching SQL from oracle_sql.json over views named after the testdata tables,
then compares schema / row count / value hash (columns sorted by name, rows
sorted by all columns).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # match a typical driver: repr of float
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon_type(t):
    """Collapse width-only arrow encoding variants that hold identical
    values (string vs large_string, list vs large_list, binary vs
    large_binary) so only value-representation differences — the kind the
    driver's typed hash rejects, like decimal128 vs int64 — remain."""
    import pyarrow as pa
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_binary(t):
        return pa.binary()
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return pa.list_(canon_type(t.value_type))
    # recurse through nested children too: a large_string buried in a
    # struct or map field is the same width-only variant and must not
    # FAIL as a physical type mismatch
    if pa.types.is_struct(t):
        return pa.struct([pa.field(t.field(i).name,
                                   canon_type(t.field(i).type),
                                   nullable=t.field(i).nullable)
                          for i in range(t.num_fields)])
    if pa.types.is_map(t):
        return pa.map_(canon_type(t.key_type), canon_type(t.item_type))
    return t


def canon(table):
    cols = sorted(table.column_names)
    rows = []
    data = {c: table.column(c).to_pylist() for c in cols}
    for i in range(table.num_rows):
        rows.append(tuple(norm_cell(data[c][i]) for c in cols))
    return cols, sorted(rows)


def main(sf_dir, out_dir):
    out = Path(out_dir)
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for qdir in sorted(out.iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        parts = list(qdir.glob("*.parquet"))
        if not parts:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        import pyarrow as pa
        got = pa.concat_tables([pq.read_table(p) for p in sorted(parts)])
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({got.num_rows} rows)")
            n_skip += 1
            continue
        try:
            want = con.sql(oracle[name]).arrow()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got)
        wc, wr = canon(want)
        # The real driver hashes typed values: a DuckDB HUGEINT (int128 /
        # decimal128) next to a Spark BIGINT passes the normalized compare
        # below but fails the driver (r12's p31). Any physical-type
        # divergence the driver could hash differently is therefore a FAIL
        # here, not a warning — builder green must predict driver green.
        # Width-only arrow encoding variants (large_string vs string, etc.)
        # carry identical values and are normalized away first.
        type_bad = []
        gt = {f.name: f.type for f in got.schema}
        wt = {f.name: f.type for f in want.schema}
        for c0 in sorted(set(gt) & set(wt)):
            if canon_type(gt[c0]) != canon_type(wt[c0]):
                type_bad.append(
                    f"col '{c0}' type spark={gt[c0]} oracle={wt[c0]}")
        if type_bad:
            print(f"FAIL {name}: physical type mismatch "
                  f"(driver hashes typed values): {'; '.join(type_bad)}")
            n_fail += 1
        elif gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
        elif len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            n_fail += 1
        elif gr != wr:
            bad = next(i for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:\n"
                  f"  got  {gr[bad]}\n  want {wr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
