"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given scale factor, then compares row count, column
names, and values (columns sorted by name, rows sorted, exact equality
with a float report on mismatch). Run:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == "float32":
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    issues: list[str] = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        issues.append(
            f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
        )
        return issues
    if len(spark_df) != len(duck_df):
        issues.append(f"rowcount differ: spark={len(spark_df)} duck={len(duck_df)}")
    s, d = normalize(spark_df), normalize(duck_df)
    if len(s) != len(d):
        return issues
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype != dv.dtype:
            issues.append(f"col {c}: dtype spark={sv.dtype} duck={dv.dtype}")
        try:
            eq = (sv == dv) | (sv.isna() & dv.isna())
        except Exception as exc:
            issues.append(f"col {c}: compare error {exc}")
            continue
        if not eq.all():
            bad = (~eq).to_numpy().nonzero()[0][:3]
            detail = "; ".join(f"row{j}: {sv.iloc[j]!r} vs {dv.iloc[j]!r}" for j in bad)
            if sv.dtype.kind == "f":
                diffs = (sv - dv).abs()
                detail += f" (maxabsdiff={diffs.max():.3e})"
            issues.append(f"col {c}: {int((~eq).sum())} mismatched values — {detail}")
    return issues


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            raise SystemExit("usage: check_oracle.py [sf_dir] [--json OUT] [query ...]")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from wistia_data_pipeline_project_spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(argv[1:])
    spark = get_spark("oracle-check")
    con = duck_connection(sf_dir)
    failed, passed, weak = [], [], []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failed.append(name)
            report[name] = {"status": "fail", "err": f"spark error: {exc}"[:500]}
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            weak.append(name)
            report[name] = {"status": "weak", "rows": len(sdf)}
            print(f"weak  {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as exc:
            failed.append(name)
            report[name] = {"status": "fail", "err": f"duckdb error: {exc}"[:500]}
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        issues = compare(name, sdf, ddf)
        elapsed = round(time.time() - t0, 2)
        if issues:
            failed.append(name)
            report[name] = {"status": "fail", "issues": issues[:5], "sec": elapsed}
            print(f"FAIL  {name} [{elapsed:.1f}s]")
            for i in issues:
                print(f"      {i}")
        else:
            passed.append(name)
            report[name] = {"status": "ok", "rows": len(sdf), "sec": elapsed}
            print(f"ok    {name}: rows={len(sdf)} [{elapsed:.1f}s]")
    print(
        f"\n{len(passed)} ok, {len(weak)} weak (rows-only), {len(failed)} failed"
        + (f": {failed}" if failed else "")
    )
    if json_out:
        import json

        summary = {
            "sf_dir": sf_dir,
            "ok": len(passed),
            "weak": len(weak),
            "failed": len(failed),
            "entries": report,
        }
        with open(json_out, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
