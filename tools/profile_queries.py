#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1): for each named
query, capture explain("formatted"), then time a noop-sink run and pull
per-stage metrics (shuffle bytes, task counts, durations) from the UI REST
API — the measured evidence for plan claims in OPTIMIZATION_r*.md.

Usage: python tools/profile_queries.py <out_dir> <query> [query...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

from flink_stream_processing_spark.queries import QUERIES
from flink_stream_processing_spark.session import get_spark


def rest(app_base: str, path: str):
    with urllib.request.urlopen(app_base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM, codegen, python workers, page cache (mirrors bench.py)
    QUERIES["window_metrics"](spark, sf_dir).collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").collect()
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception:
            pass
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[-1]}"
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    summary = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"SKIP unknown {name}", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_explain.txt"), "w") as f:
            f.write(buf.getvalue())
        jobs_before = {j["jobId"] for j in rest(base, "/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        # collect()-timed too, to match the bench methodology
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        wall_collect = time.perf_counter() - t0
        jobs = [j for j in rest(base, "/jobs") if j["jobId"] not in jobs_before]
        stage_rows = []
        n_tasks = 0
        for j in jobs:
            for sid in j.get("stageIds", []):
                try:
                    sts = rest(base, f"/stages/{sid}")
                except Exception:
                    continue
                for st in sts:
                    if st.get("status") == "SKIPPED":
                        continue
                    dur = None
                    if st.get("firstTaskLaunchedTime") and st.get("completionTime"):
                        pass
                    stage_rows.append(
                        {
                            "stage": sid,
                            "name": st.get("name", "")[:90],
                            "tasks": st.get("numCompleteTasks", 0),
                            "input_mb": round(st.get("inputBytes", 0) / 1e6, 2),
                            "shuffle_read_mb": round(
                                st.get("shuffleReadBytes", 0) / 1e6, 2
                            ),
                            "shuffle_write_mb": round(
                                st.get("shuffleWriteBytes", 0) / 1e6, 2
                            ),
                            "exec_run_ms": st.get("executorRunTime", 0),
                            "exec_cpu_ms": round(
                                st.get("executorCpuTime", 0) / 1e6
                            ),
                        }
                    )
                    n_tasks += st.get("numCompleteTasks", 0)
        summary[name] = {
            "noop_wall_s": round(wall, 3),
            "collect_wall_s": round(wall_collect, 3),
            "n_jobs": len(jobs),
            "n_stages": len(stage_rows),
            "n_tasks": n_tasks,
            "stages": sorted(
                stage_rows, key=lambda r: -r["exec_run_ms"]
            )[:12],
        }
        print(
            f"{name}: noop={wall:.3f}s collect={wall_collect:.3f}s "
            f"jobs={len(jobs)} stages={len(stage_rows)} tasks={n_tasks}",
            file=sys.stderr,
        )
    with open(os.path.join(out_dir, "profile_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
