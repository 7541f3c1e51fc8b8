"""Model-based property test over the whole VersionedTable DML
surface: hypothesis drives RANDOM op sequences (append / COW delete /
MoR delete / UPDATE / MERGE / OPTIMIZE / column RENAME) against both
the real table
and a pure-Python reference model, then asserts the head reads equal —
the shrunk counterexample is the exact op sequence that disagrees.
Sequences mix copy-on-write with deletion vectors and metadata-only
commits, so cross-op interactions (DV'd rows surviving a later
rewrite, merges over vectored files, compaction clearing vectors) get
coverage no hand-written scenario enumerates."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from social_media_etl_spark.operators.manifest import VersionedTable

_SPARK = {"spark": None}


@pytest.fixture(autouse=True)
def _hold_spark(spark):
    # hypothesis regenerates examples inside one test call; the fixture
    # can't be re-entered per example, so stash the session
    _SPARK["spark"] = spark
    yield


def _df(rows, vname="v"):
    return _SPARK["spark"].createDataFrame(
        rows, f"k long, {vname} string, amt double"
    )


# one op = (kind, modulus, remainder); ranges kept tiny so predicates
# genuinely overlap across ops
_OP = st.tuples(
    st.sampled_from(
        [
            "append", "delete_cow", "delete_mor", "update", "merge",
            "optimize", "rename",
        ]
    ),
    st.integers(min_value=2, max_value=5),
    st.integers(min_value=0, max_value=4),
)


def _apply_model(model, next_k, op, vname):
    """The reference semantics, on a dict k -> (v, amt). Returns
    (next_k, vname) — a rename only moves the column NAME; values are
    untouched (the column-mapping contract)."""
    kind, m, r = op
    r = r % m
    if kind == "rename":
        return next_k, f"{vname}x"
    if kind == "append":
        for i in range(3):
            k = next_k + i
            model[k] = (f"a{k}", float(k))
        return next_k + 3, vname
    if kind in ("delete_cow", "delete_mor"):
        for k in [k for k in model if k % m == r]:
            del model[k]
        return next_k, vname
    if kind == "update":
        for k in list(model):
            if k % m == r:
                v, amt = model[k]
                model[k] = (v.upper(), amt + 10.0)
        return next_k, vname
    if kind == "merge":
        # source: matched ks take s.amt (doubled); one new k inserts;
        # matched ks where amt would exceed 900 delete instead
        src = {k: (f"m{k}", amt * 2) for k, (v, amt) in model.items() if k % m == r}
        src[next_k] = (f"i{next_k}", 7.0)
        for k, (v, amt) in src.items():
            if k in model:
                if amt > 900.0:
                    del model[k]
                else:
                    model[k] = (v, amt)
            else:
                model[k] = (v, amt)
        return next_k + 1, vname
    return next_k, vname  # optimize: content-identical


def _apply_table(t, next_k, op, vname):
    kind, m, r = op
    r = r % m
    if kind == "rename":
        t.rename_column(vname, f"{vname}x")
    elif kind == "append":
        t.append(
            _df(
                [
                    (next_k + i, f"a{next_k + i}", float(next_k + i))
                    for i in range(3)
                ],
                vname,
            )
        )
    elif kind == "delete_cow":
        t.delete(f"k % {m} = {r}")
    elif kind == "delete_mor":
        t.delete(f"k % {m} = {r}", mode="mor")
    elif kind == "update":
        t.update(
            f"k % {m} = {r}",
            {vname: f"upper({vname})", "amt": "amt + 10.0"},
        )
    elif kind == "merge":
        cur = {
            row["k"]: (row[vname], row["amt"]) for row in t.read().collect()
        }
        src_rows = [
            (k, f"m{k}", amt * 2)
            for k, (v, amt) in cur.items()
            if k % m == r
        ] + [(next_k, f"i{next_k}", 7.0)]
        t.merge(
            _df(src_rows, vname),
            on=["k"],
            when_matched_delete="s.amt > 900.0",
            when_matched_update={vname: f"s.{vname}", "amt": "s.amt"},
            when_not_matched_insert="*",
        )
    elif kind == "optimize":
        t.optimize(target_files=2)


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(ops=st.lists(_OP, min_size=1, max_size=5))
def test_dml_op_sequences_match_reference_model(ops):
    d = tempfile.mkdtemp(prefix="smetl_model_")
    try:
        base = [(k, f"a{k}", float(k)) for k in range(10)]
        t = VersionedTable.create(_SPARK["spark"], f"{d}/t", _df(base))
        model = {k: (v, amt) for k, v, amt in base}
        next_k, vname = 10, "v"
        for op in ops:
            _apply_table(t, next_k, op, vname)
            next_k, vname = _apply_model(model, next_k, op, vname)
        head = t.read()
        assert [f.name for f in head.schema.fields] == ["k", vname, "amt"]
        got = sorted(
            (row["k"], row[vname], row["amt"]) for row in head.collect()
        )
        want = sorted((k, v, amt) for k, (v, amt) in model.items())
        assert got == want, f"ops={ops}"
        # v0 time travel always survives whatever the sequence did
        assert sorted(
            (row["k"], row["v"], row["amt"]) for row in t.read(0).collect()
        ) == sorted(base)
    finally:
        shutil.rmtree(d, ignore_errors=True)
