"""Event-log-based stage profile for knn_join / kde at a given core count.

Usage: python tools/stage_profile.py <cpus> <knn|kde|both>

Runs the operator twice (cold+warm) with the engine's production session
configs plus event logging, then prints per-stage wall / run / cpu times
for the WARM run so the 8-vs-32 diff shows which stage fails to scale.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
WHICH = sys.argv[2] if len(sys.argv) > 2 else "both"
LOGDIR = f"/tmp/sparklogs_{CPUS}_{WHICH}"


def main():
    os.makedirs(LOGDIR, exist_ok=True)
    for f in glob.glob(f"{LOGDIR}/*"):
        subprocess.run(["rm", "-rf", f])
    os.environ["SPARK_GRAFT_EVENTLOG"] = LOGDIR

    from pyspark.sql import SparkSession, functions as F
    import bench
    from geowave_spark.session import get_spark

    # get_spark + event logging (uncompressed for easy parsing)
    os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)
    builder_patch = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file:{LOGDIR}",
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    }
    orig = SparkSession.Builder.config

    def patched(self, key=None, value=None, conf=None):
        out = orig(self, key, value, conf)
        for k, v in builder_patch.items():
            out = orig(out, k, v)
        return out

    SparkSession.Builder.config = patched
    spark = get_spark("stageprof", master=f"local[{CPUS}]", shuffle_partitions=128)
    from geowave_spark.deploy import ensure_py_files

    ensure_py_files(spark)
    pts = spark.read.parquet(bench.materialize_points(spark, 500000)).repartition(128).cache()
    pts.count()

    marks = {}

    def run2(name, fn):
        fn()
        spark.sparkContext.setJobGroup(name, name)
        t0 = time.time()
        fn()
        marks[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobGroup("", "")

    if WHICH in ("knn", "both"):
        from geowave_spark.operators.knn import knn_join

        right = pts.select(F.col("image_id").alias("cid"), "lon", "lat")
        run2(
            "knn",
            lambda: knn_join(
                pts, right, k=5, max_distance=0.03, query_id="image_id",
                candidate_id="cid", exclude_self=True,
            ).count(),
        )
    if WHICH in ("kde", "both"):
        from geowave_spark.operators.kde import kde

        run2("kde", lambda: kde(pts, int(os.environ.get("SPARK_GRAFT_KDE_LEVEL", "11"))).count())

    print(json.dumps({"cpus": CPUS, "warm": marks}))
    spark.stop()
    time.sleep(1)

    # ---- parse -----------------------------------------------------------
    evs = []
    tasks = {}
    props = {}
    for f in glob.glob(f"{LOGDIR}/*") + glob.glob(f"{LOGDIR}/*/*"):
        if os.path.isdir(f):
            continue
        for line in open(f, errors="ignore"):
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                grp = (e.get("Properties") or {}).get("spark.jobGroup.id", "")
                for sid in e.get("Stage IDs", []):
                    props[sid] = grp
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                evs.append(
                    (
                        si["Stage ID"],
                        si["Stage Name"].split("\n")[0][:50],
                        si["Number of Tasks"],
                        round((si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000.0, 2),
                    )
                )
            elif ev == "SparkListenerTaskEnd":
                m = e.get("Task Metrics") or {}
                if not isinstance(m, dict):
                    continue
                t = tasks.setdefault(e["Stage ID"], dict(run=0, cpu=0, gc=0, srw=0, pyt=0))
                t["run"] += m.get("Executor Run Time", 0)
                t["cpu"] += m.get("Executor CPU Time", 0) / 1e6
                t["gc"] += m.get("JVM GC Time", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                t["srw"] += sw.get("Shuffle Write Time", 0) / 1e6
    evs.sort()
    print("stage | group | name | ntasks | wall_s | {sums in s}")
    for s in evs:
        grp = props.get(s[0], "")
        if not grp:
            continue  # only the marked warm runs
        t = tasks.get(s[0], {})
        print(s[0], f"[{grp}]", s[1][:40], s[2], s[3], {k: round(v / 1000.0, 2) for k, v in t.items()})


if __name__ == "__main__":
    main()
