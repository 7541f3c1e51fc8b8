"""Per-key A/B timing probe for variance adjudication (BENCH_NOTES).

Runs the named queries() keys in ONE fresh process against the repo
checkout given as the first argument — bench.py methodology exactly
(session warm-up scan, then per key: one warm build+run, best-of-2
timed runs through the noop sink) — and prints one JSON line. Drive
it alternately against an old `git worktree` and HEAD to adjudicate a
nominal per-key regression the way BENCH_NOTES records require:

    python scripts/ab_keys.py /tmp/smetl_old  keyA keyB
    python scripts/ab_keys.py /root/repo      keyA keyB
    ... (3 alternating rounds)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    keys = sys.argv[2:]
    if not keys:
        raise SystemExit("usage: ab_keys.py <repo-checkout> <key> [key...]")
    sys.path.insert(0, repo)
    os.chdir(repo)

    import __spark_entry__ as entrymod
    from social_media_etl_spark.catalog import load_table
    from social_media_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-keys")
    (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    qs = entrymod.queries()
    out = {}
    for k in keys:
        fn = qs[k]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[k] = round(best, 3)
    print("ABRESULT " + json.dumps({"repo": repo, "timings": out}))


if __name__ == "__main__":
    main()
