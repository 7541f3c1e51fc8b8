from __future__ import annotations

import sys
from pathlib import Path

import pytest

# the CHECKOUT OWNING THIS FILE, not a hardcoded /root/repo: a
# `git worktree` A/B run (the BENCH_NOTES variance protocol, the r14
# close-gate replica) must import its own __spark_entry__/package —
# the hardcoded path made worktree pytest silently test the live
# tree's rotated queries() against the worktree's pinned window
# literals (r15 postmortem: 2 phantom failures in an otherwise-green
# 674-test run)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from social_media_etl_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
