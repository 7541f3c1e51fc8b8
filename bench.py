"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query executes to completion through the noop sink (full plan
runs, no driver-side result transfer skewing the measurement).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from social_media_etl_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    spark = get_spark("bench")

    # Session-level throwaway warm-up (VERDICT r4 #2): the per-query
    # warm run below absorbs per-plan JIT, but the FIRST query of the
    # loop used to also absorb session-wide warm-up (executor thread
    # spin-up, parquet footer caches, codegen compiler init — the r3
    # skew_salted_agg_events 0.23→0.77s drift). One untimed scan +
    # shuffle + noop write pays that cost before anything is measured.
    # load_table (not raw spark.read.parquet): the footer sniff keeps
    # the warm-up alive if the driver regenerates events.ts as nanos
    from social_media_etl_spark.catalog import load_table

    (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # Best-of-2 timed runs per query: single-sample timings on this box
    # swing 3-10× on transient stalls (an A/B of identical code showed
    # q14 at 3.36s in one run and 0.26s in the next), which makes
    # round-over-round comparisons meaningless. The min of two runs
    # after a warm run is the standard noise-floor estimate of the
    # plan's actual cost.
    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (JIT, caches)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # "queries" first, headline fields last: the driver keeps only the
    # LAST 2000 chars of stdout, and with 90+ queries the JSON line
    # exceeds that — this ordering sacrifices the earliest per-query
    # timings to the cut instead of the headline total. The full record
    # is also written to BENCH_FULL.json so every timing stays
    # re-derivable regardless of capture truncation.
    record = {
        "queries": timings,
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf,
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"),
            "w",
        ) as f:
            json.dump(record, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: the stdout line still carries the data
    print(json.dumps(record))


if __name__ == "__main__":
    main()
