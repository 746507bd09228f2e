"""Two-parallelism scaling-efficiency evidence (north rule: ≥0.8 from N to
4N executors; sandbox stand-in = local[8] vs local[32] on the same input).

Runs the identical end-to-end pipeline job in two fresh subprocesses (one
JVM each, so neither run inherits the other's warmed state unfairly — both
get an in-process warmup), records wall-clock + routed sequences/sec, and
writes BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = """
import json, sys, time
sys.path.insert(0, {repo!r})
from liatrio_otel_collector_spark.session import get_spark
from liatrio_otel_collector_spark.plans.pipeline import run_pipeline
spark = get_spark(app_name="scaling-bench", master="local[{cores}]",
                  shuffle_partitions={shuffle})
spark.sparkContext.setLogLevel("ERROR")
run_pipeline(spark, 20000)  # warmup
t0 = time.time(); run_pipeline(spark, {n_rows}); dt = time.time() - t0
print(json.dumps({{"cores": {cores}, "sec": dt, "throughput": {n_rows} / dt}}))
spark.stop()
"""


def run_at(cores: int, n_rows: int) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cores=cores, shuffle=max(2 * cores, 8), n_rows=n_rows)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    low, high = 8, 32
    r_low = run_at(low, n_rows)
    r_high = run_at(high, n_rows)
    eff = (r_high["throughput"] / r_low["throughput"]) / (high / low)
    stamp = datetime.now(timezone.utc).isoformat()
    md = f"""# BENCH/BASELINE — scaling-efficiency evidence

North rule: throughput scaling efficiency >= 0.8 from N to 4N executors.
Sandbox stand-in (no real cluster): the identical end-to-end
parse->enrich->route->aggregate job on the same deterministic input
({n_rows:,} sequences) at two parallelism levels, fresh JVM each.

| parallelism | wall-clock (s) | routed sequences/sec |
|---|---|---|
| local[{low}] (N) | {r_low['sec']:.2f} | {r_low['throughput']:,.0f} |
| local[{high}] (4N) | {r_high['sec']:.2f} | {r_high['throughput']:,.0f} |

**Scaling efficiency (throughput_4N / throughput_N) / 4 = {eff:.3f}**
(target >= 0.8) — generated {stamp} by scripts/scaling_bench.py.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"low": r_low, "high": r_high, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
