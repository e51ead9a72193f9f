#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet corpus, then
compares row count, column names, and an order-insensitive value
comparison (exact after canonicalization).  Use before committing:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [name ...]
    python tools/check_oracle.py --changed-only

``--changed-only`` fingerprints each query (md5 of the query function's
source + its oracle SQL + the md5 of the module file defining it + the
sf dir) and skips entries whose fingerprint already has a recorded PASS
in ``tools/.oracle_check_state.json``; the state updates on every PASS,
in both modes.  Caveat: the fingerprint sees the query module, not the
transitive library modules it calls — after editing an operator library
(dataops/, operators/, functions/) name the affected queries explicitly
or run the full sweep (round close runs the full sweep regardless).
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def frame_digest(cols: list[str], rows: list[tuple]) -> tuple[str, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(lines).encode("utf-8", "replace")).hexdigest()
    return h, lines


STATE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".oracle_check_state.json")


def _fingerprint(fn, oracle: str | None, sf: str) -> str:
    import inspect

    # The @query decorator registers a WRAPPER defined in
    # queries/__init__.py; without unwrapping, every fingerprint hashed
    # the wrapper's source + __init__.py and query-body edits were
    # invisible to --changed-only (found round 7: an etl_queries.py
    # change produced "0 to run").
    fn = inspect.unwrap(fn)
    parts = [sf, oracle or "<no-oracle>"]
    try:
        parts.append(inspect.getsource(fn))
        mod_file = inspect.getfile(fn)
        with open(mod_file, "rb") as fh:
            parts.append(hashlib.md5(fh.read()).hexdigest())
    except (OSError, TypeError):
        parts.append(repr(time.time()))  # unhashable source: never skip
    return hashlib.md5("\x00".join(parts).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument(
        "--changed-only",
        action="store_true",
        help="skip queries whose (source+oracle+module+sf) fingerprint "
             "already passed; state in tools/.oracle_check_state.json",
    )
    ap.add_argument(
        "--json-out",
        default=None,
        help="write a machine-readable result file in the driver's "
             "CORRECTNESS_r<N>.json schema ({name: {rows_match, "
             "schema_match, hash_match, spark_rows, oracle_rows, err}}) "
             "so round-close full sweeps are diffable against driver "
             "samples (VERDICT r8 ask #5)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import json

    import duckdb

    import __spark_entry__ as entrymod
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    # An in-memory DuckDB connection has NO temp directory, so a big
    # oracle intermediate (e.g. the 43M-pair leaf self-join the skewed
    # sf1 corpus produces in dedup_semantic_hierarchical) aborts with
    # OOM instead of going out-of-core.  Give it a spill dir and a
    # bounded memory budget so oracle-side resource limits can't
    # masquerade as correctness failures.
    import tempfile

    con.sql(
        f"SET temp_directory = "
        f"'{tempfile.mkdtemp(prefix='duckdb_spill_')}'"
    )
    con.sql("SET max_temp_directory_size = '60GB'")
    con.sql(
        f"SET memory_limit = "
        f"'{os.environ.get('SPARK_GRAFT_DUCK_MEM', '48GB')}'"
    )
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table: a DIRECTORY of part files (local
            # inflated soak corpora); DuckDB needs the glob form
            con.sql(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(queries)

    state: dict[str, str] = {}
    if os.path.exists(STATE_PATH):
        try:
            with open(STATE_PATH) as fh:
                state = json.load(fh)
        except Exception:
            state = {}
    fps = {
        name: _fingerprint(queries[name], oracles.get(name), args.sf)
        for name in names
        if name in queries
    }
    if args.changed_only:
        skipped = [n for n in names if state.get(n) == fps.get(n)]
        names = [n for n in names if state.get(n) != fps.get(n)]
        print(f"changed-only: {len(names)} to run, {len(skipped)} unchanged-skipped")

    failures = 0
    record: dict[str, dict] = {}

    def rec(name, *, rows_match=False, schema_match=False,
            hash_match=False, spark_rows=None, oracle_rows=None, err=None):
        record[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            rec(name, err=f"spark error: {e!r}"[:300])
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?   {name}: rows={len(s_rows)} (no oracle — rows-only check) [{time.time()-t0:.1f}s]")
            rec(name, rows_match=True, schema_match=True, hash_match=True,
                spark_rows=len(s_rows), oracle_rows=None,
                err="no oracle: rows-only check")
            state[name] = fps[name]
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_types = [str(t).upper() for t in rel.types]
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            rec(name, spark_rows=len(s_rows),
                err=f"duckdb error: {e!r}"[:300])
            failures += 1
            continue

        problems = []
        # fetchall() returns python ints/Decimals, so HUGEINT/DECIMAL
        # results hash fine HERE but diverge under the driver's
        # arrow/pandas fetch (HUGEINT -> float64, DECIMAL -> Decimal).
        # Lint the oracle's output types so that gap can't recur.
        unsafe = [
            f"{c}:{t}"
            for c, t in zip(d_cols, d_types)
            if "HUGEINT" in t or "DECIMAL" in t or "INT128" in t
        ]
        if unsafe:
            problems.append(
                "driver-unsafe oracle types (CAST to BIGINT/DOUBLE): "
                + ", ".join(unsafe)
            )
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not problems:
            sh, sl = frame_digest(s_cols, s_rows)
            dh, dl = frame_digest(d_cols, d_rows)
            if sh != dh:
                diffs = [
                    (a, b) for a, b in zip(sl, dl) if a != b
                ][:3]
                problems.append(f"value-hash mismatch; first diffs: {diffs}")
        rows_ok = len(s_rows) == len(d_rows)
        schema_ok = sorted(s_cols) == sorted(d_cols)
        rec(name, rows_match=rows_ok, schema_match=schema_ok,
            hash_match=not problems, spark_rows=len(s_rows),
            oracle_rows=len(d_rows),
            err="; ".join(problems)[:300] if problems else None)
        if problems:
            failures += 1
            state.pop(name, None)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            state[name] = fps[name]
            print(f"PASS  {name}: rows={len(s_rows)} hash-match [{time.time()-t0:.1f}s]")
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(record, fh, indent=1)
        print(f"wrote {args.json_out} ({len(record)} queries)")
    try:
        with open(STATE_PATH, "w") as fh:
            json.dump(state, fh, indent=0, sort_keys=True)
    except OSError:
        pass
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
