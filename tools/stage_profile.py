"""Per-stage wall/CPU profile of one or more headline lanes, warm
(bench methodology: untimed warm-up passes first, then one timed
pass), read back from the Spark status REST API.

Answers "which stage owns the lane's seconds" — the guide-§1 evidence
the aggregate bench number cannot give.  Flags under-parallelized
heavy stages (the AQE coalesce-before-explode trap found in the graph
lane: a tiny exchange coalesced to N<cores partitions feeding a
row-amplifying operator).

Usage: python tools/stage_profile.py <lane>[,lane2,...] [sf_dir] [warmups]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _wall(s: dict) -> float:
    sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
    comp = s.get("completionTime")
    if not (sub and comp):
        return 0.0
    from datetime import datetime

    try:
        return (
            datetime.strptime(comp.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
            - datetime.strptime(sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        ).total_seconds()
    except ValueError:
        return 0.0


def main() -> None:
    lanes = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    warmups = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from bench import headline_impls, run_once
    from tcdb_spark.session import get_spark

    spark = get_spark("stage-profile", extra_conf={"spark.ui.enabled": "true"})
    impls = headline_impls()

    ui = "http://localhost:4040"
    app = spark.sparkContext.applicationId

    def stages() -> dict[int, dict]:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            return {s["stageId"]: s for s in json.loads(r.read())}

    for lane in lanes:
        fn = impls[lane]
        for _ in range(warmups):
            run_once(fn(spark, sf_dir))
        before = stages()
        t0 = time.perf_counter()
        run_once(fn(spark, sf_dir))
        wall = time.perf_counter() - t0
        time.sleep(0.5)
        after = stages()

        new = [s for sid, s in sorted(after.items()) if sid not in before]
        print(f"\n{lane}: wall {wall:.3f}s, {len(new)} new stages")
        print(
            f"{'stage':>5} {'sec':>7} {'cpu_s':>7} {'tasks':>5} {'in_MB':>8} "
            f"{'sh_w_MB':>8} {'sh_r_MB':>8} {'sh_r_rows':>10} {'spill_MB':>8}  name"
        )
        tot = 0.0
        for s in new:
            cpu = (s.get("executorCpuTime") or 0) / 1e9
            wall_s = _wall(s)
            tot += wall_s
            flag = ""
            if cpu > 2.0 and s["numCompleteTasks"] < 16:
                flag = "  <<< heavy stage on few tasks"
            print(
                f"{s['stageId']:>5} {wall_s:>7.3f} {cpu:>7.2f} {s['numCompleteTasks']:>5} "
                f"{s.get('inputBytes', 0) / 2**20:>8.1f} "
                f"{s.get('shuffleWriteBytes', 0) / 2**20:>8.1f} "
                f"{s.get('shuffleReadBytes', 0) / 2**20:>8.1f} "
                f"{s.get('shuffleReadRecords', 0):>10} "
                f"{s.get('diskBytesSpilled', 0) / 2**20:>8.1f}  {s['name'][:40]}{flag}"
            )
        print(f"sum of stage walls: {tot:.3f}s (overlap possible)")


if __name__ == "__main__":
    main()
