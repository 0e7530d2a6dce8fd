#!/usr/bin/env python
"""Time named registry queries in isolation with the noop sink.

Usage: python tools/time_queries.py [-n SAMPLES] <query> [query ...]

Guide §1.4: the noop sink computes every column of every row and
discards the result, so this times the computation, not the collect()
pipe. bench.py keeps its collect() methodology (the recorded driver
contract since r1); this tool is for before/after isolation during
optimization work only. One warm-up, then N timed runs, median + min
to stderr, one JSON line to stdout. Jobs are labelled (guide §1.5).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    args = sys.argv[1:]
    samples = 5
    if args and args[0] == "-n":
        samples = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.queries import all_queries

    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    out = {}
    for name in names:
        if name not in registry:
            print(f"{name}: NOT IN REGISTRY", file=sys.stderr)
            continue

        def run() -> None:
            df = registry[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()

        spark.sparkContext.setJobDescription(f"time: {name} warmup")
        run()
        times = []
        for i in range(samples):
            spark.sparkContext.setJobDescription(f"time: {name} #{i}")
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        med = statistics.median(times)
        out[name] = round(med, 4)
        print(
            f"{name}: median {med:.3f} s  min {min(times):.3f} s"
            f"  over {samples}",
            file=sys.stderr,
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
