#!/usr/bin/env python
"""Executor-loss soak for the distributed connected-components loop —
the multi-executor certification the 100 TB story needs (VERDICT r9
ask #1).

Runs label propagation on the adversarial chain graph (diameter =
chain_len - 1 → one round per hop, long enough to attack mid-flight)
under ``local-cluster[2,C,M]`` so shuffles, broadcasts, Python workers
AND the per-round checkpoints all cross real process boundaries, then
SIGKILLs one CoarseGrainedExecutorBackend while the loop is running:

* with ``spark.graft.reliableCheckpoint=true`` (+ setCheckpointDir) the
  job must COMPLETE with bit-identical labels — lost blocks are
  re-read from checkpoint-dir storage, lost tasks re-run on the
  surviving / relaunched executor;
* the control run (default ``localCheckpoint``) documents the hazard
  the conf exists for: the truncated lineage cannot recompute blocks
  that died with their executor, so the job is EXPECTED to fail (the
  standalone master may also occasionally ride it out if no checkpoint
  block lived on the victim — the artifact records what happened).

    python tools/soak_exec_kill.py [--n 2000000] [--chain-len 16]
                                   [--queries-sf .scale/sf1]
                                   [--out SOAK_EXECKILL.json]

Beyond connected components, the soak also kills an executor under
(VERDICT r10 ask #2):

* ``tpch_q21_sole_late_supplier`` — the shuffle-heaviest batch query
  (4 lineitem scans, 3 joins, 2 aggregates): the victim's shuffle
  files die with it, so completion exercises FetchFailed → stage
  resubmission → lineage recompute, and the result hash must equal
  the no-kill baseline run bit-for-bit;
* ``stream_foreachbatch_upsert`` — a real micro-batch stream (one
  file per trigger) merging per-batch aggregates into the versioned
  upsert sink: the kill lands mid-drain, failed tasks re-run, and
  EXACTLY-ONCE is verified by hashing the final state table against
  both the no-kill streaming baseline and the plain batch aggregate.

Writes one JSON artifact and exits non-zero unless every kill row
completed with matching hashes (and the kill actually landed while
the run was in flight).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def df_hash(df) -> tuple[str, int]:
    """Order-insensitive value hash of a DataFrame (same
    canonicalization as tools/check_oracle.py, so 'bit-identical'
    here means exactly what the oracle gate means by it)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from check_oracle import frame_digest

    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    h, _ = frame_digest(cols, rows)
    return h, len(rows)


def executor_pids(app_id: str) -> list[int]:
    """PIDs of this app's CoarseGrainedExecutorBackend JVMs."""
    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    pids = []
    for line in out.splitlines():
        if "CoarseGrainedExecutorBackend" in line and app_id in line:
            pids.append(int(line.split(None, 1)[0]))
    return sorted(pids)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--chain-len", type=int, default=16)
    ap.add_argument(
        "--master", default="local-cluster[2,4,12288]",
        help="2 executors x 4 cores; 12 GiB each — tpch_q21 at sf1 "
        "wants >1 GiB/task of concurrent join/sort reservations "
        "(2048 and 6144 both starved with UNABLE_TO_ACQUIRE_MEMORY "
        "once kill-churn retries stacked tasks onto one executor)",
    )
    ap.add_argument("--kill-frac", type=float, default=0.4,
                    help="kill at this fraction of the dry-run wall")
    ap.add_argument("--queries-sf", default=".scale/sf1",
                    help="corpus for the batch/streaming kill rows "
                    "(big enough that the kill lands mid-flight)")
    ap.add_argument("--out", default="SOAK_EXECKILL.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_card_etl_pipeline_spark.dataops import dedup
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="soak_exec_kill",
        master=args.master,
        # 64 partitions halve per-task sort/join reservations vs the
        # session default 32 — the 8-core cluster runs them in waves
        shuffle_partitions=64,
        # the soak deliberately churns executors; 4 task failures can
        # all land on one half-shutdown executor before the master
        # notices it (observed: baseline q21 aborted on a 'Shutting
        # down' pool right after the control kill) — give the
        # scheduler room to route around the churn.
        # executor.memory must be set EXPLICITLY: local-cluster[n,c,m]
        # sizes the WORKER at m MiB, but executors still launch with
        # the 1g default — three soak attempts OOMed identically at
        # worker 2/6/12 GiB because every executor was actually 1 GiB
        extra_conf={
            "spark.task.maxFailures": "8",
            "spark.executor.memory": "10g",
        },
    )
    app_id = spark.sparkContext.applicationId
    ckpt_dir = tempfile.mkdtemp(prefix="soak_exec_kill_ckpt_")
    spark.sparkContext.setCheckpointDir(ckpt_dir)

    n, k = args.n, args.chain_len

    def chain_graph():
        v = spark.range(n).select(F.col("id").alias("doc_id"))
        e = (
            spark.range(n)
            .where(F.col("id") % k != k - 1)
            .select(
                F.col("id").alias("doc_a"),
                (F.col("id") + 1).alias("doc_b"),
            )
        )
        return v, e

    def run_cc():
        v, e = chain_graph()
        labels = dedup.connected_components(
            v, e, max_iters=k + 4, driver_edge_cap=None
        )
        # correctness: chain member i belongs to component i - i % k
        n_wrong = labels.where(
            F.col("component")
            != F.col("doc_id") - F.col("doc_id") % F.lit(k)
        ).count()
        n_comp = labels.select("component").distinct().count()
        labels.unpersist()
        return n_comp, n_wrong

    def kill_one_executor(delay: float, rec: dict):
        time.sleep(delay)
        pids = executor_pids(app_id)
        if not pids:
            rec["killed_pid"] = None
            rec["error"] = "no executor pid found at kill time"
            return
        victim = pids[0]
        os.kill(victim, signal.SIGKILL)
        rec["killed_pid"] = victim
        rec["kill_at_s"] = round(delay, 2)

    report: dict = {
        "master": args.master,
        "app_id": app_id,
        "n_vertices": n,
        "chain_len": k,
        "checkpoint_dir": ckpt_dir,
        "queries_sf": args.queries_sf,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "generated_utc": time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
        ),
    }

    # --- dry run (reliable ckpt, no kill): calibrates the kill delay
    spark.conf.set(dedup.RELIABLE_CKPT_CONF, "true")
    t0 = time.perf_counter()
    n_comp, n_wrong = run_cc()
    dry_wall = time.perf_counter() - t0
    report["dry_run"] = {
        "wall_s": round(dry_wall, 2),
        "n_components": n_comp,
        "labels_wrong": n_wrong,
    }
    print(json.dumps({"dry_run": report["dry_run"]}), flush=True)

    # --- reliable run WITH a mid-flight executor SIGKILL
    kill_rec: dict = {}
    killer = threading.Thread(
        target=kill_one_executor, args=(dry_wall * args.kill_frac, kill_rec)
    )
    t0 = time.perf_counter()
    killer.start()
    try:
        n_comp, n_wrong = run_cc()
        reliable = {
            "completed": True,
            "wall_s": round(time.perf_counter() - t0, 2),
            "n_components": n_comp,
            "labels_wrong": n_wrong,
            "labels_correct": n_wrong == 0 and n_comp == n // k,
        }
    except Exception as exc:  # noqa: BLE001 - recorded, gates exit code
        reliable = {
            "completed": False,
            "error": f"{type(exc).__name__}: {exc}"[:400],
        }
    killer.join()
    reliable.update(kill_rec)
    report["reliable_with_kill"] = reliable
    print(json.dumps({"reliable_with_kill": reliable}), flush=True)

    # --- control: localCheckpoint path, same kill (expected to fail)
    spark.conf.set(dedup.RELIABLE_CKPT_CONF, "false")
    # wait for the relaunched executor so both runs start from 2
    for _ in range(60):
        if len(executor_pids(app_id)) >= 2:
            break
        time.sleep(1)
    kill_rec = {}
    killer = threading.Thread(
        target=kill_one_executor, args=(dry_wall * args.kill_frac, kill_rec)
    )
    t0 = time.perf_counter()
    killer.start()
    try:
        n_comp, n_wrong = run_cc()
        control = {
            "completed": True,
            "wall_s": round(time.perf_counter() - t0, 2),
            "n_components": n_comp,
            "labels_wrong": n_wrong,
            "note": "survived: no localCheckpoint block lived on the victim",
        }
    except Exception as exc:  # noqa: BLE001
        control = {
            "completed": False,
            "error": f"{type(exc).__name__}: {exc}"[:400],
            "note": "expected: localCheckpoint blocks die with executor",
        }
    killer.join()
    control.update(kill_rec)
    report["control_local_ckpt_with_kill"] = control
    print(json.dumps({"control_local_ckpt_with_kill": control}), flush=True)

    # ============ kill rows for a shuffle-heavy batch query and a ====
    # ============ real streaming query (VERDICT r10 ask #2) ==========
    def wait_two_executors():
        for _ in range(90):
            if len(executor_pids(app_id)) >= 2:
                return True
            time.sleep(1)
        return False

    def settle_cluster():
        """Wait until the executor set is STABLE (same >= 2 pids for
        three consecutive seconds) and a trivial job round-trips: a
        kill leaves half-shutdown executors the master still routes
        tasks to for a few seconds."""
        stable = 0
        prev: list[int] = []
        for _ in range(120):
            pids = executor_pids(app_id)
            stable = stable + 1 if (pids == prev and len(pids) >= 2) else 0
            prev = pids
            if stable >= 3:
                try:
                    spark.range(64, numPartitions=8).select(
                        F.sum("id")
                    ).collect()
                    return
                except Exception:  # noqa: BLE001 - still churning
                    stable = 0
            time.sleep(1)

    def kill_certify(label: str, run_fn) -> dict:
        """Baseline run (no kill) -> hash; then the same run with an
        executor SIGKILL at kill_frac of the baseline wall; completed
        + hash parity + the kill landing mid-flight are the row."""
        settle_cluster()
        base_hash = base_rows = base_wall = None
        for attempt in (1, 2):  # baseline retry: env churn, not signal
            t0 = time.perf_counter()
            try:
                base_hash, base_rows = df_hash(run_fn())
                base_wall = time.perf_counter() - t0
                break
            except Exception:  # noqa: BLE001
                if attempt == 2:
                    raise
                settle_cluster()
        row: dict = {
            "baseline_wall_s": round(base_wall, 2),
            "baseline_rows": base_rows,
            "baseline_hash": base_hash,
        }
        settle_cluster()
        k_rec: dict = {}
        # the kill run is WARMER than the baseline (page cache, codegen)
        # so it finishes faster; aim earlier than the CC section's
        # kill_frac or the kill can land after a fast warm run
        kt = threading.Thread(
            target=kill_one_executor,
            args=(base_wall * min(args.kill_frac, 0.25), k_rec),
        )
        t0 = time.perf_counter()
        kt.start()
        try:
            kh, kr = df_hash(run_fn())
            wall = time.perf_counter() - t0
            row.update(
                completed=True,
                wall_s=round(wall, 2),
                rows=kr,
                hash_match=kh == base_hash,
                kill_landed_mid_flight=(
                    k_rec.get("kill_at_s") is not None
                    and wall > k_rec["kill_at_s"]
                ),
            )
        except Exception as exc:  # noqa: BLE001 - recorded, gates exit
            row.update(
                completed=False,
                error=f"{type(exc).__name__}: {exc}"[:400],
            )
        kt.join()
        row.update(k_rec)
        report[label] = row
        print(json.dumps({label: row}), flush=True)
        return row

    from credit_card_etl_pipeline_spark.queries import QUERIES

    qsf = args.queries_sf
    try:
        batch_row = kill_certify(
            "batch_q21_with_kill",
            lambda: QUERIES["tpch_q21_sole_late_supplier"](spark, qsf),
        )
    except Exception as exc:  # noqa: BLE001 - keep the CC rows
        batch_row = {
            "completed": False,
            "error": f"{type(exc).__name__}: {exc}"[:400],
        }
        report["batch_q21_with_kill"] = batch_row

    # exactly-once reference: the plain batch aggregate the streaming
    # sink must converge to (independent of any streaming machinery)
    ev = spark.read.parquet(os.path.join(qsf, "events.parquet"))
    batch_agg = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("value_cents"),
    )
    agg_hash, _ = df_hash(batch_agg)
    try:
        stream_row = kill_certify(
            "stream_upsert_with_kill",
            lambda: QUERIES["stream_foreachbatch_upsert"](spark, qsf),
        )
    except Exception as exc:  # noqa: BLE001 - keep the earlier rows
        stream_row = {
            "completed": False,
            "error": f"{type(exc).__name__}: {exc}"[:400],
        }
        report["stream_upsert_with_kill"] = stream_row
    stream_row["batch_aggregate_hash"] = agg_hash
    stream_row["exactly_once_vs_batch"] = (
        stream_row.get("completed", False)
        and stream_row.get("baseline_hash") == agg_hash
        and stream_row.get("hash_match", False)
    )
    print(
        json.dumps(
            {"stream_exactly_once_vs_batch":
             stream_row["exactly_once_vs_batch"]}
        ),
        flush=True,
    )

    # ============ kill row for an eager-localCheckpoint query =========
    # ============ (VERDICT r11 ask #9: the durability story) ==========
    # tpch_q11 materializes its twice-consumed CTE with a NON-reliable
    # localCheckpoint (sql_queries.py q11_nat).  The documented
    # contract (SCALE.md localCheckpoint audit): losing an executor
    # that held checkpoint blocks MAY fail the in-flight job — the
    # recovery is a QUERY retry, which rebuilds the checkpoint from
    # parquet; correctness is never at risk.  Certify exactly that:
    # the kill run either survives with a matching hash (no block on
    # the victim / recompute sufficed) or fails and the immediate
    # retry matches bit-for-bit.
    def q11_run():
        return QUERIES["tpch_q11_important_stock"](spark, qsf)

    try:
        q11_row = kill_certify("q11_ckpt_with_kill", q11_run)
    except Exception as exc:  # noqa: BLE001 - retry path below
        q11_row = {
            "completed": False,
            "error": f"{type(exc).__name__}: {exc}"[:400],
        }
        report["q11_ckpt_with_kill"] = q11_row
    if q11_row.get("completed", False):
        q11_row["ckpt_retry_contract_ok"] = q11_row.get("hash_match", False)
    else:
        settle_cluster()
        try:
            rh, rr = df_hash(q11_run())
            base = report.get("q11_ckpt_with_kill", q11_row).get(
                "baseline_hash"
            )
            q11_row["retry_completed"] = True
            q11_row["retry_rows"] = rr
            q11_row["retry_hash_match"] = (base is None) or (rh == base)
            q11_row["ckpt_retry_contract_ok"] = q11_row["retry_hash_match"]
        except Exception as exc:  # noqa: BLE001 - recorded, gates exit
            q11_row["retry_completed"] = False
            q11_row["retry_error"] = f"{type(exc).__name__}: {exc}"[:400]
            q11_row["ckpt_retry_contract_ok"] = False
    report["q11_ckpt_with_kill"] = q11_row
    print(json.dumps({"q11_ckpt_with_kill": q11_row}), flush=True)

    ok = (
        report["dry_run"]["labels_wrong"] == 0
        and reliable.get("labels_correct", False)
        and reliable.get("killed_pid") is not None
        and batch_row.get("completed", False)
        and batch_row.get("hash_match", False)
        and batch_row.get("kill_landed_mid_flight", False)
        and batch_row.get("killed_pid") is not None
        and stream_row.get("exactly_once_vs_batch", False)
        and stream_row.get("kill_landed_mid_flight", False)
        and stream_row.get("killed_pid") is not None
        and q11_row.get("ckpt_retry_contract_ok", False)
    )
    report["pass"] = ok
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"{'PASS' if ok else 'FAIL'}  exec-kill soak -> {args.out}")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
