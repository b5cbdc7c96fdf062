#!/usr/bin/env python3
"""Generate golden-constant DuckDB oracle SQL for SparkEntry queries whose
semantics are not expressible in DuckDB (custom Catalyst expressions, LSH
signatures, crawl state machines, ImageIO decode).

Reads the parquet dumps produced by `graft.Verify <sfDir> <outDir>` at the
driver's correctness scale (sf0.01) and emits, per query, a
`SELECT * FROM (VALUES ...) AS t(cols)` whose values are the query's own
deterministic output (seeded inputs, no wall clock). Paste the emitted
entries into SparkEntry.oracleSql.

Usage: gen_oracles.py <verifyOutDir> <name> [<name> ...]
"""
import sys
import glob
import duckdb


def lit(v, typ):
    if v is None:
        return f"CAST(NULL AS {typ})"
    if typ == "DOUBLE":
        # string->double parse is correctly rounded and repr() round-trips,
        # so the DuckDB constant is bit-identical to Spark's double
        return f"CAST('{v!r}' AS DOUBLE)"
    if typ == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    if typ == "VARCHAR":
        return "'" + str(v).replace("'", "''") + "'"
    return str(v)


def duck_type(arrow_type):
    s = str(arrow_type)
    return {
        "int64": "BIGINT", "int32": "INTEGER", "int16": "SMALLINT",
        "double": "DOUBLE", "float": "DOUBLE", "bool": "BOOLEAN",
        "string": "VARCHAR", "large_string": "VARCHAR",
    }[s]


def gen(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    assert files, f"no parquet for {name}"
    # read EVERY part file (Verify coalesce(1)s today, but a multi-part
    # dump must not silently truncate the oracle — ADVICE r2)
    t = duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetch_arrow_table()
    cols = t.column_names
    types = [duck_type(t.schema.field(c).type) for c in cols]
    rows = [tuple(col[i].as_py() for col in t.columns) for i in range(t.num_rows)]
    vals = []
    for i, row in enumerate(rows):
        parts = []
        for j, v in enumerate(row):
            s = lit(v, types[j])
            # pin the column type on the first row (except doubles, which
            # are cast on every row for exactness)
            if i == 0 and types[j] not in ("DOUBLE", "VARCHAR", "BOOLEAN") \
               and v is not None:
                s = f"CAST({s} AS {types[j]})"
            parts.append(s)
        vals.append("(" + ", ".join(parts) + ")")
    body = ",\n         ".join(vals)
    sql = f"SELECT * FROM (VALUES {body}) AS t({', '.join(cols)})"
    return f'    "{name}" ->\n      """{sql}""",\n'


if __name__ == "__main__":
    outdir = sys.argv[1]
    for name in sys.argv[2:]:
        sys.stdout.write(gen(outdir, name))
