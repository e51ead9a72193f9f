#!/usr/bin/env python
"""Benchmark harness: runs every registered query at the bench scale
factor and prints ONE parseable JSON line:

    {"metric": "total_query_seconds", "value": <total>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "sf": <sf>, ...}

Timing = full plan execution into a no-op sink (``format("noop")``), so
scan + shuffle + expression costs are measured without driver collect
overhead.  Per-query wall times land in ``BENCH_r{N}.json`` for
round-over-round comparison.

    SPARK_GRAFT_SF_DIR  corpus dir   (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local cores  (default 32)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entrymod
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    queries = entrymod.queries()

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # plan, not first-run initialization.
    warm = next(iter(queries.values()))
    warm(spark, sf_dir).write.mode("overwrite").format("noop").save()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in queries.items():
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                elapsed = time.perf_counter() - t0
                best = elapsed if best is None else min(best, elapsed)
            except Exception as e:  # keep benching the rest
                failures[name] = f"{type(e).__name__}: {e}"
                break
            finally:
                spark.catalog.clearCache()
        if best is not None:
            # best-of-N damps host-load noise (BENCH_HISTORY shows ~1.5×
            # wall variance on the driver box for identical code)
            timings[name] = round(best, 3)

    import pyspark

    from credit_card_etl_pipeline_spark.functions.eventtime import (
        describe_ts_dtype,
    )

    result = {
        "metric": "total_query_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        # environment canary: catches silent corpus/engine drift (the
        # round-3 ts-type change) right in the bench of record
        "env": {
            "pyspark": pyspark.__version__,
            "events_ts_dtype": describe_ts_dtype(spark, sf_dir),
        },
    }
    if failures:
        result["failures"] = failures
        result["n_failed"] = len(failures)
    print(json.dumps(result, ensure_ascii=False))
    # A partial failure must not erase the whole round's perf record
    # (round 3: 12 broken queries -> rc 1 -> driver recorded parsed:
    # null for the 73 healthy ones).  The JSON carries `failures`;
    # exit non-zero only when nothing ran.
    return 0 if timings else 1


if __name__ == "__main__":
    raise SystemExit(main())
