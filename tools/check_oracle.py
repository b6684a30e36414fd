#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: run Verify's output dir
against DuckDB the same way the driver does (sort columns by name, compare
values with 1e-9 relative tolerance on floats). Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        return v
    if isinstance(v, int):
        return v
    return str(v)


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if isinstance(a, float) or isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            tol = 1e-9 * max(abs(a), abs(b), 1.0)
            return abs(a - b) <= tol
        return a == b
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        sc = sorted(spark_df.columns)
        dc = sorted(duck_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        # Numeric-KIND mismatches (int64 vs float64, bool vs int) stringify
        # differently ("13" vs "13.0") and break the driver's value hash even
        # when cells_equal's tolerant compare passes — flag them hard.
        def kind(s):  # signed/unsigned ints stringify identically
            return "i" if s.dtype.kind == "u" else s.dtype.kind
        kind_bad = [
            (c, str(spark_df[c].dtype), str(duck_df[c].dtype)) for c in sc
            if kind(spark_df[c]) != kind(duck_df[c])
            # allow object-vs-anything (dates/strings surface as object
            # inconsistently) but never int vs float vs bool
            and {kind(spark_df[c]), kind(duck_df[c])} <= set("ifb")
        ]
        if kind_bad:
            print(f"FAIL {name}: dtype kind mismatch {kind_bad}")
            n_fail += 1
            continue
        # Mirror the driver's harness: it sort_values() both frames on ALL
        # columns before hashing. Arrays (numpy.ndarray cells) are unhashable
        # there and crash the sort — replicate that as a hard FAIL so local
        # green ⇒ driver green (r5 lesson: 5 probes passed here, died there).
        try:
            spark_df = spark_df[sc].sort_values(by=sc, kind="mergesort")
            duck_df = duck_df[dc].sort_values(by=dc, kind="mergesort")
        except TypeError as e:
            print(f"FAIL {name}: driver-sort error (unsortable cell?): {e}")
            n_fail += 1
            continue
        s_rows = spark_df[sc].values.tolist()
        d_rows = duck_df[dc].values.tolist()
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        import pandas as pd
        def fix(r):
            return [None if (isinstance(x, float) and math.isnan(x)) or x is pd.NaT
                    else norm_cell(x) for x in r]
        bad = None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            sr, dr = fix(sr), fix(dr)
            for j, (a, b) in enumerate(zip(sr, dr)):
                if not cells_equal(a, b):
                    bad = (i, sc[j], a, b)
                    break
            if bad:
                break
        if bad:
            i, cname, a, b = bad
            print(f"FAIL {name}: row {i} col {cname}: spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
