"""Per-Spark-job attribution profiler (r11).

Runs one registered query with the Spark event log enabled, then parses
the log to print EVERY job the query launched: wall time, the driver-side
gap since the previous job finished (Catalyst planning / py4j / engine
Python), and the call site.  This is the tool that answers "where do the
127 jobs of a lifecycle query come from" — `tools/profile_query.py` only
counts them.

Usage::

    python tools/profile_jobs.py NAME [--min-ms 0]

Prints one line per job plus a tail summary:
``{"total_s", "n_jobs", "job_time_s", "gap_time_s", "by_site": {...}}``.
Measurement tool only — never imported by the engine or the bench.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_postgres_etl_spark.caching import release_caches
from airflow_postgres_etl_spark.plans import QUERIES
from airflow_postgres_etl_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    min_ms = 0
    if "--min-ms" in sys.argv:
        min_ms = int(sys.argv[sys.argv.index("--min-ms") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evt_dir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name="profile-jobs",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evt_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext
    # warm-up mirrors bench.py (JVM + parquet footers), outside the window
    QUERIES["tpch_q6_revenue_forecast"](spark, sf_dir).collect()
    release_caches()

    t0 = time.perf_counter()
    t0_ms = int(time.time() * 1000)
    QUERIES[name](spark, sf_dir).collect()
    total = time.perf_counter() - t0
    release_caches()
    spark.stop()

    jobs: dict[int, dict] = {}
    log_files = []
    for root, _dirs, fns in os.walk(evt_dir):
        log_files += [
            os.path.join(root, f) for f in fns if "appstatus" not in f
        ]
    for fn in log_files:
        with open(fn) as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if e.get("Event") == "SparkListenerJobStart":
                    props = e.get("Properties") or {}
                    stages = e.get("Stage Infos", [])
                    site = props.get("callSite.short")
                    if not site:
                        # writes/localCheckpoints carry no callSite — the
                        # last stage's name says what the job ran
                        site = stages[-1]["Stage Name"] if stages else "?"
                    jobs[e["Job ID"]] = {
                        "start": e["Submission Time"],
                        "site": site,
                        "desc": props.get("spark.job.description"),
                        "n_stages": len(stages),
                    }
                elif e.get("Event") == "SparkListenerJobEnd":
                    if e["Job ID"] in jobs:
                        jobs[e["Job ID"]]["end"] = e["Completion Time"]
    shutil.rmtree(evt_dir, ignore_errors=True)

    # only jobs submitted inside the timed window (skip the warm-up)
    window = sorted(
        (j for j in jobs.values() if j["start"] >= t0_ms and "end" in j),
        key=lambda j: j["start"],
    )
    prev_end = t0_ms
    job_time = 0.0
    gap_time = 0.0
    by_site: dict[str, list] = {}
    for j in window:
        dur = (j["end"] - j["start"]) / 1000.0
        gap = max(0.0, (j["start"] - prev_end) / 1000.0)
        prev_end = max(prev_end, j["end"])
        job_time += dur
        gap_time += gap
        s = by_site.setdefault(j["site"], [0, 0.0, 0.0])
        s[0] += 1
        s[1] += dur
        s[2] += gap
        if dur * 1000 >= min_ms:
            print(
                f"  {dur:7.3f}s  gap {gap:6.3f}s  x{j['n_stages']}st  "
                f"{j['site']}"
            )
    print(json.dumps({
        "query": name,
        "total_s": round(total, 3),
        "n_jobs": len(window),
        "job_time_s": round(job_time, 3),
        "gap_time_s": round(gap_time, 3),
        "by_site": {
            k: [v[0], round(v[1], 3), round(v[2], 3)]
            for k, v in sorted(by_site.items(), key=lambda kv: -(kv[1][1] + kv[1][2]))
        },
    }))


if __name__ == "__main__":
    main()
