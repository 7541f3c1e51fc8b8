"""Per-key driver-side profiler for optimization work (guide §1).

Runs one ``queries()`` key through the bench methodology (warm run,
then a timed run) under cProfile and prints the repo-function hotspots
by cumulative time, so commit-machinery phases (_write_data,
_collect_stats, _try_commit, ...) and py4j waits are attributable.

Usage:  python scripts/profile_key.py <key> [sf_dir] [--runs N]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from social_media_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    key = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/root/testdata/sf0.1"
    runs = 1
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = get_spark("profile")
    fn = entrymod.queries()[key]

    # session warm-up (mirror bench.py)
    from social_media_etl_spark.catalog import load_table

    (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # warm run (uncounted)
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    warm = time.perf_counter() - t0

    pr = cProfile.Profile()
    timings = []
    for _ in range(runs):
        t0 = time.perf_counter()
        pr.enable()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        pr.disable()
        timings.append(time.perf_counter() - t0)

    print(f"\n=== {key}: warm={warm:.3f}s timed={[round(t,3) for t in timings]}")
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    print("\n--- repo hotspots (cumtime) ---")
    seen = 0
    for func, (cc, nc, tt, ct, callers) in sorted(
        st.stats.items(), key=lambda kv: -kv[1][3]
    ):
        fname, line, name = func
        if "social_media_etl_spark" in fname or "__spark_entry__" in fname:
            print(f"{ct:8.3f}s  n={nc:<6d} {os.path.basename(fname)}:{line} {name}")
            seen += 1
            if seen >= 40:
                break
    print("\n--- top-level (incl. py4j) by tottime ---")
    st.sort_stats("tottime")
    st.print_stats(15)


if __name__ == "__main__":
    main()
