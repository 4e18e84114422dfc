#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dir (Spark side) and runs the
matching SQL from oracle_sql.json in DuckDB with views named after the
testdata tables. Sorts columns by name and rows by all values, then
compares cell-by-cell (exact; floats exact too, since both sides round).
"""
import sys, json, glob, math, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, ncols):
    # Sort key must match the equality semantics below, which tolerate
    # float-vs-int type differences (1.0 vs 1): normalize numeric cells to
    # float for ordering so both sides sort identically.
    def cell_key(x):
        if x is None:
            return (0, "", 0.0)
        if isinstance(x, bool):
            return (1, "", float(x))
        if isinstance(x, (int, float)):
            if isinstance(x, float) and math.isnan(x):
                return (2, "", 0.0)
            return (1, "", float(x))
        return (3, str(x), 0.0)

    def key(r):
        return tuple(cell_key(x) for x in r)
    return sorted([tuple(r) for r in rows], key=key)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
            odf = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        # Driver-hashability guard: the driver's comparator hashes raw cell
        # bytes without normalizing wide-integer types, so a DuckDB HUGEINT
        # (sum(BIGINT)) or DECIMAL output column hash-mismatches a Spark
        # LongType/StringType twin even when every value is identical (the
        # round-6 and round-8 RED rows were exactly this). Reject such
        # schemas here, in pre-flight, regardless of value equality below —
        # the fix belongs in the oracle SQL (CAST ... AS BIGINT / VARCHAR).
        import pyarrow.types as _pt
        wide = [f.name for f in odf.schema
                if _pt.is_decimal(f.type)]
        wide += [f"spark:{f.name}" for f in sdf.schema
                 if _pt.is_decimal(f.type)]
        if wide:
            print(f"FAIL {name}: driver-unhashable wide-integer output "
                  f"column(s) {wide} (DuckDB HUGEINT/DECIMAL or Spark "
                  f"DecimalType) — CAST to BIGINT or VARCHAR in the query")
            n_fail += 1
            continue
        scols = sorted(sdf.column_names)
        ocols = sorted(odf.column_names)
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        srows = canon(sdf.select(scols).to_pylist_rows() if hasattr(sdf, 'to_pylist_rows')
                      else [tuple(d[c] for c in scols) for d in sdf.to_pylist()], len(scols))
        orows = canon([tuple(d[c] for c in ocols) for d in odf.to_pylist()], len(ocols))
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                # tolerate float repr noise only if exactly equal as floats
                ok = all(
                    (x == y) or (isinstance(x, float) and isinstance(y, (float, int))
                                 and (x == y or (math.isnan(x) and isinstance(y, float) and math.isnan(y))))
                    for x, y in zip(a, b))
                if not ok:
                    bad = (i, a, b)
                    break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: first diff at sorted row {i}:")
            print(f"   cols   {scols}")
            print(f"   spark  {a}")
            print(f"   oracle {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
