#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate.

Runs graft.Verify (unless --skip-run), then executes each oracle SQL in
DuckDB over the same parquet tables and compares against the Spark
parquet dumps. Flags both hard mismatches and floats that are close but
not bit-identical (the driver hash-compares, so we aim for bit-equal).

Strict dtype checking is ON by default: Arrow schema types of the Spark
dump and the DuckDB oracle result are compared after a width-normalizing
map (int8..int64 -> int, timestamps unit-normalized) that still keeps
DuckDB HUGEINT (decimal128) distinct from BIGINT — the exact class the
driver's type-sensitive hash rejects while str()-comparison passes.
Pass --lax to skip the dtype gate.

Usage: python3 tools/compare.py [sfdir] [outdir] [--skip-run] [--only q1,q2]
       [--lax] [--json PATH]

--json PATH writes a machine-readable per-query record in the driver's
exact CORRECTNESS schema ({name: {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}}), REWRITTEN AFTER EVERY QUERY so a crash
mid-suite leaves a structured partial artifact instead of nothing (the
r11/r12 driver sweeps both died without writing a single row — this is
the local insurance against that failure mode).
"""
import json
import math
import subprocess
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def norm_type(t) -> str:
    """Collapse representation-level width differences the driver
    tolerates, keep semantic type family differences it rejects."""
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        # the driver compares through pandas, where date32 and
        # timestamp both land as datetime64 — driver-green queries
        # legitimately mix them (e.g. date_trunc vs DuckDB DATE)
        return "timestamp"
    if pa.types.is_integer(t):
        return "int"          # int8..int64, signed/unsigned widths collapse
    if pa.types.is_floating(t):
        return "float"        # float32/float64 collapse
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"  # HUGEINT shows up here
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{norm_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{norm_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def dtype_issues(spark_schema, oracle_schema):
    s = {f.name: norm_type(f.type) for f in spark_schema}
    o = {f.name: norm_type(f.type) for f in oracle_schema}
    out = []
    for c in sorted(set(s) & set(o)):
        # an all-NULL oracle column (e.g. CAST(NULL AS ...) edge) is fine
        if s[c] != o[c] and "null" not in (s[c], o[c]):
            out.append(f"DTYPE MISMATCH col={c}: spark={s[c]} oracle={o[c]}")
    return out

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    key = df.apply(lambda r: tuple(str(v) for v in r), axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)


def compare(name, spark_df, oracle_df):
    issues = []
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} oracle={len(b)}"]
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float); bv = bv.astype(float)
            bit = np.array([x == y or (math.isnan(x) and math.isnan(y))
                            for x, y in zip(av, bv)])
            if not bit.all():
                close = np.isclose(av, bv, rtol=1e-9, equal_nan=True)
                n_off = int((~bit).sum())
                i = int(np.argmax(~bit))
                tag = "CLOSE-BUT-NOT-BITEQUAL" if close.all() else "VALUE MISMATCH"
                issues.append(
                    f"{tag} col={c} n={n_off} e.g. row{i}: "
                    f"spark={av[i]!r} oracle={bv[i]!r}")
        else:
            eq = (pd.Series(av).astype(str) == pd.Series(bv).astype(str))
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                issues.append(
                    f"VALUE MISMATCH col={c} n={int((~eq).sum())} "
                    f"e.g. row{i}: spark={av[i]!r} oracle={bv[i]!r}")
    return issues


def classify(issues):
    """Map compare()/dtype issue strings onto the driver's three match
    booleans. The driver records them independently; mirror that:
    column-set or dtype problems -> schema_match false, row-count ->
    rows_match false, any value/NaN problem -> hash_match false. A
    structural failure (columns differ) also fails the hash, since the
    driver's hash is over the full frame."""
    rows = schema = hsh = True
    for it in issues:
        if it.startswith("columns differ") or "DTYPE MISMATCH" in it:
            schema = False
            hsh = False
        elif it.startswith("row count differs"):
            rows = False
            hsh = False
        else:
            hsh = False
    return rows, schema, hsh


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
    outdir = args[1] if len(args) > 1 else "/tmp/graft_verify"
    only = None
    json_path = None
    for a in sys.argv[1:]:
        if a.startswith("--only"):
            only = set(a.split("=", 1)[1].split(","))
        if a.startswith("--json"):
            json_path = Path(a.split("=", 1)[1])

    # Incrementally-flushed driver-schema record: written after EVERY
    # query so any crash leaves partial structured evidence.
    records = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err):
        if json_path is None:
            return
        records[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }
        tmp = json_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(records, indent=1, sort_keys=True))
        tmp.replace(json_path)
    if "--skip-run" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
            cwd="/root/repo", capture_output=True, text=True)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-30:])
        if r.returncode != 0:
            print(tail); sys.exit(1)
        if "[verify]" in r.stdout + r.stderr:
            print("verify-time failures:")
            for line in (r.stdout + r.stderr).splitlines():
                if "[verify]" in line:
                    print(" ", line)

    # Fresh connection every N queries: one long-lived connection
    # accumulates allocator state across ~150 oracle queries and has
    # twice produced a spurious mid-suite "Out of Memory Error" (once
    # a segfault) that none of the queries reproduce standalone.
    # Views are cheap to recreate; correctness is unaffected.
    # threads=8: the container transiently refuses thread creation
    # (EAGAIN — jemalloc "background thread creation failed (11)"),
    # which DuckDB surfaces as bogus tiny-block "Out of Memory"
    # errors or a std::system_error abort when it spawns its default
    # 32 workers per fresh connection; 8 is plenty for oracle-sized
    # data and cuts the flake's surface 4x. Each query additionally
    # gets ONE retry on a fresh connection (see below) — every flake
    # observed to date passes on the immediate retry.
    # memory_limit + temp_directory (round-12, verdict r11 #1): the
    # r11 driver sweep lost 77 queries to DuckDB OutOfMemoryException
    # failing KB-scale allocations on a loadavg-6+ box. Unbounded,
    # DuckDB sizes its allocator to the box and dies instead of
    # spilling when co-tenants take the memory; bounded with an
    # on-disk temp_directory it spills and finishes. 6 GB is ~40x the
    # sf0.01 working set and still leaves headroom on a 128 GiB host
    # shared with the Spark JVM.
    spill = Path("/tmp/duckdb_spill")
    spill.mkdir(exist_ok=True)

    def fresh_con():
        c = duckdb.connect()
        c.execute("SET threads TO 8")
        c.execute("SET memory_limit='6GB'")
        c.execute(f"SET temp_directory='{spill}'")
        for t in TABLES:
            p = f"{sfdir}/{t}.parquet"
            if Path(p).exists():
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        return c
    con = fresh_con()
    since_reset = 0

    strict = "--lax" not in sys.argv
    oracle = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        since_reset += 1
        if since_reset > 25:
            con.close(); con = fresh_con(); since_reset = 0
        spark_glob = f"{outdir}/{name}/*.parquet"
        if not list(Path(f"{outdir}/{name}").glob("*.parquet")):
            # deterministic: the Verify dump is absent — no retry
            print(f"FAIL {name}: no spark output (missing dump)")
            record(name, False, False, False, 0, 0, "no spark output")
            n_fail += 1
            continue

        # Transient allocator/thread flakes (see fresh_con's note) can
        # hit any DuckDB call, including arrow→pandas; each side gets
        # ONE retry on a fresh connection. If both attempts fail, the
        # FIRST exception is reported (the retry's is usually the less
        # informative cascade).
        def with_retry(run):
            nonlocal con, since_reset
            try:
                return run()
            except Exception as first:
                time.sleep(2)
                try:
                    con.close()
                except Exception:
                    pass
                con = fresh_con(); since_reset = 0
                try:
                    return run()
                except Exception:
                    raise first
        try:
            sarrow = with_retry(
                lambda: con.sql(f"SELECT * FROM '{spark_glob}'").arrow())
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            record(name, False, False, False, 0, 0, f"spark read: {e}")
            n_fail += 1; continue
        try:
            oarrow = with_retry(lambda: con.sql(sql).arrow())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record(name, False, False, False, sarrow.num_rows, 0,
                   f"oracle SQL: {e}")
            n_fail += 1; continue
        try:
            sdf = sarrow.to_pandas()
            odf = oarrow.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: arrow->pandas error: {e}")
            record(name, False, False, False, sarrow.num_rows,
                   oarrow.num_rows, f"arrow->pandas: {e}")
            n_fail += 1
            continue
        issues = compare(name, sdf, odf)
        if strict:
            issues += dtype_issues(sarrow.schema, oarrow.schema)
        rows_m, schema_m, hash_m = classify(issues)
        record(name, rows_m, schema_m, hash_m, len(sdf), len(odf), None)
        if issues:
            n_fail += 1
            print(f"FAIL {name} ({len(sdf)} rows)")
            for it in issues[:6]:
                print("   ", it)
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sdf)} rows)")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
