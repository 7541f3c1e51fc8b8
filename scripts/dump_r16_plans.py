"""Dump .explain('formatted') for the r16-touched queries.

Usage: python scripts/dump_r16_plans.py <checkout> <suffix> [key...]
Writes /root/repo/plans/r16/<key>_<suffix>.txt for each key.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

repo = os.path.abspath(sys.argv[1])
suffix = sys.argv[2]
keys = sys.argv[3:]
sys.path.insert(0, repo)
os.chdir(repo)

import __spark_entry__ as entrymod  # noqa: E402
from social_media_etl_spark.session import get_spark  # noqa: E402

OUT = "/root/repo/plans/r16"
os.makedirs(OUT, exist_ok=True)
spark = get_spark("plan-dump")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qs = entrymod.queries()
for k in keys:
    df = qs[k](spark, sf)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(f"{OUT}/{k}_{suffix}.txt", "w") as f:
        f.write(buf.getvalue())
    print(k, "->", f"{OUT}/{k}_{suffix}.txt")
