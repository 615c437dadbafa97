#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles (mimics the driver's check).

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01 \
           [--only name1,name2]
Loads each <outDir>/<name> parquet result, runs oracle_sql.json[name] in
DuckDB with the sf tables registered as views, sorts both frames by all
columns, and compares values. `--only` restricts the compare to the named
queries — pass the same list you gave Verify's name filter, otherwise
every un-dumped query reports as a spurious "unreadable" failure.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize lists to tuples for sorting/compare
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     hasattr(v, "tolist") and not isinstance(v, str),
                     na_action="ignore").any():
            df[c] = df[c].map(lambda v: tuple(v.tolist())
                              if hasattr(v, "tolist") else
                              (tuple(v) if isinstance(v, (list, tuple)) else v),
                              na_action="ignore")
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def sform(v) -> str:
    """The driver compares md5 over STRINGIFIED cell values, so the only
    faithful local check is string-form equality. Python `==` is wrong
    here: 4568 == 4568.0 is True but the driver hashes "4568" vs
    "4568.0" — exactly the bpe_train r11 escape (HUGEINT sum rendered as
    float64 by fetchdf). NaN/None collapse to one token because a DuckDB
    NULL lands as NaN in float columns but None in object columns, while
    Spark parquet may do the reverse; the driver's reader pairs like with
    like, so the local check must not flag that representational split."""
    if v is None:
        return "<null>"
    if isinstance(v, float) and math.isnan(v):
        return "<null>"
    if isinstance(v, tuple):
        return "[" + ", ".join(sform(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    return str(v)


def eq(a, b) -> bool:
    return sform(a) == sform(b)


def main(outdir: str, sfdir: str, only=None) -> int:
    import os
    con = duckdb.connect()
    for t in TABLES:
        # driver SFs are single files; GenScale's sf1 tables are Spark
        # output DIRECTORIES of part files — glob those
        p = f"{sfdir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    # sf1 wire format: events.ts is int64 NANOS (the driver SFs carry
    # TIMESTAMP(NANOS), which DuckDB reads natively) — expose the same
    # TIMESTAMP surface either way
    if con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()[0] \
            == "BIGINT":
        con.execute("CREATE OR REPLACE VIEW events AS "
                    "SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                    f"FROM '{sfdir}/events.parquet/*.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    if only is not None:
        oracles = {k: v for k, v in oracles.items() if k in only}
    fails = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = canon(pd.read_parquet(f"{outdir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            fails += 1
            continue
        try:
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            fails += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} "
                  f"vs {list(want.columns)}")
            fails += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            fails += 1
            continue
        # dtype audit: int-vs-float drift between the engine parquet and
        # DuckDB's fetchdf is the class that produced the r11 bpe_train
        # escape. A pure width difference (int32 vs int64) stringifies
        # identically so it's a warning; int-vs-float will additionally
        # fail the string compare below on any non-integral value.
        for c in got.columns:
            gk, wk = got[c].dtype.kind, want[c].dtype.kind
            if gk != wk and {gk, wk} <= {"i", "u", "f"}:
                print(f"warn {name}: dtype drift col {c}: "
                      f"spark={got[c].dtype} duck={want[c].dtype}")
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not eq(got.at[i, c], want.at[i, c]):
                    bad = (i, c, got.at[i, c], want.at[i, c])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} duck={bad[3]!r}")
            fails += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
    # rows-only queries
    import os
    for name in sorted(os.listdir(outdir)):
        if name == "oracle_sql.json" or name in oracles:
            continue
        if only is not None and name not in only:
            continue
        try:
            n = len(pd.read_parquet(f"{outdir}/{name}"))
            print(f"rows {name} ({n} rows)")
        except Exception as e:
            print(f"FAIL {name}: unreadable: {e}")
            fails += 1
    print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    only = None
    args = sys.argv[1:]
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sys.exit(main(args[0], args[1], only))
