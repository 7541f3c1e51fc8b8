"""Property-based and edge-case tests.

Hypothesis drives the engine's structural operators with random inputs
and checks invariants against brute-force Python models; the
empty-input cases pin the SURVEY §5.2 contract (the reference crashes
on empty extracts — ``rows[0].keys()`` — ours must produce empty,
well-typed results).
"""

from __future__ import annotations

import pytest

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from social_media_etl_spark.operators.argmax import argmax_with_ties
from social_media_etl_spark.operators.dedup import dedup_exact, jaccard_pairs
from social_media_etl_spark.operators.flatten import flattened_columns
from social_media_etl_spark.operators.normalize import normalize
from social_media_etl_spark.operators.temporal import asof_join
from social_media_etl_spark.operators.transforms import select_aligned

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@pytest.mark.slow
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 5)), min_size=1, max_size=40
    )
)
@settings(**_SETTINGS)
def test_argmax_with_ties_matches_bruteforce(spark, rows):
    df = spark.createDataFrame(rows, "id long, score long")
    got = sorted(
        (r["id"], r["score"]) for r in argmax_with_ties(df, "score").collect()
    )
    mx = max(s for _, s in rows)
    # argmax keeps every tied ROW (duplicates preserved)
    want_rows = sorted((i, s) for i, s in rows if s == mx)
    assert got == want_rows


@pytest.mark.slow
@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),  # (key, minute)
        min_size=0,
        max_size=30,
    ),
    quotes=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 999)),
        min_size=0,
        max_size=30,
    ),
)
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, events, quotes):
    base = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, k, base + timedelta(minutes=m)) for i, (k, m) in enumerate(events)],
        "eid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, base + timedelta(minutes=m), v) for k, m, v in quotes],
        "k long, ts timestamp, v long",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_values=["v"]
    )
    got = {r["eid"]: r["asof_v"] for r in out.collect()}
    # brute-force model: max-ts quote ≤ event ts; ties on ts → max v
    want = {}
    for i, (k, m) in enumerate(events):
        cands = [(qm, v) for qk, qm, v in quotes if qk == k and qm <= m]
        if cands:
            best_ts = max(qm for qm, _ in cands)
            want[i] = max(v for qm, v in cands if qm == best_ts)
        else:
            want[i] = None
    assert got == want


@pytest.mark.slow
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c"), min_size=0, max_size=30
        ),
        min_size=1,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_jaccard_pairs_matches_bruteforce(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(df, "doc_id", "text", n=2, threshold=0.0).collect()
    }

    def shingles(t):
        toks = t.strip().lower().split()
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = shingles(texts[a]), shingles(texts[b])
            if sa and sb and sa & sb:
                want[(a, b)] = round(len(sa & sb) / len(sa | sb), 6)
    assert got == want


def test_empty_input_contract(spark):
    """Reference crashes on empty extracts (users_etl.py:143); every
    structural operator here must pass empty through, typed."""
    empty_users = spark.createDataFrame(
        [],
        "id long, name string, "
        "address struct<city:string, geo:struct<lat:string, lng:string>>, "
        "company struct<name:string>",
    )
    out = normalize(
        empty_users,
        nested={"address": "addresses", "company": "companies"},
        key_cols=["id"],
        root_name="users",
    )
    assert {k: v.count() for k, v in out.items()} == {
        "users": 0,
        "addresses": 0,
        "companies": 0,
    }
    assert out["addresses"].columns == ["uuid", "city", "geo_lat", "geo_lng"]
    assert select_aligned(empty_users, ["name", "id"]).columns == ["name", "id"]

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert dedup_exact(empty_docs, ["text"], ["doc_id"]).count() == 0
    assert jaccard_pairs(empty_docs, "doc_id", "text").count() == 0

    flat = flattened_columns(empty_users.schema)
    assert len(flat) == 6  # id, name, city, geo_lat, geo_lng, company name


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 2), st.integers(1, 30)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    budget=st.integers(5, 120),
)
@settings(**_SETTINGS)
def test_budget_quota_matches_bruteforce(spark, rows, budget):
    """budget_quota ≡ the per-stratum greedy prefix of the sorted order."""
    from social_media_etl_spark.operators.sampling import budget_quota

    df = spark.createDataFrame(rows, "id long, src long, sz long")
    got = sorted(
        (r["id"], r["cum_sz"])
        for r in budget_quota(
            df, "src", "sz", budget, [F.desc("sz"), F.col("id")]
        ).collect()
    )
    want = []
    for src in {t[1] for t in rows}:
        acc = 0
        for i, _, sz in sorted(
            (t for t in rows if t[1] == src), key=lambda t: (-t[2], t[0])
        ):
            acc += sz
            if acc > budget:
                break
            want.append((i, acc))
    assert got == sorted(want)


@pytest.mark.slow
@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True),
    w=st.floats(0.0, 1.0, allow_nan=False),
)
@settings(**_SETTINGS)
def test_importance_sample_is_pure_function_of_key(spark, ids, w):
    """Membership is decided per-key: sampling a subset yields exactly
    the intersection of the full sample (growth stability)."""
    from social_media_etl_spark.operators.sampling import importance_sample

    df = spark.createDataFrame([(i,) for i in ids], "id long").withColumn(
        "w", F.lit(w)
    )
    full = {r["id"] for r in importance_sample(df, "id", "w").collect()}
    half_ids = ids[: len(ids) // 2 + 1]
    half = df.filter(F.col("id").isin(half_ids))
    sub = {r["id"] for r in importance_sample(half, "id", "w").collect()}
    assert sub == full & set(half_ids)


@pytest.mark.slow
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 3)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    alpha=st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0]),
)
@settings(**_SETTINGS)
def test_smoothed_mixture_rates_match_model(spark, rows, alpha):
    """Every emitted mix_rate equals the analytic (n_s/n_min)^(alpha-1)
    (9 dp), the kept set is decided by the same md5 uniform as
    importance_sample, and alpha=1 keeps everything."""
    import hashlib

    from social_media_etl_spark.operators.sampling import (
        smoothed_mixture_sample,
    )

    df = spark.createDataFrame(rows, "id long, src long")
    out = smoothed_mixture_sample(df, "src", "id", alpha=alpha).collect()
    counts: dict[int, int] = {}
    for _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    n_min = min(counts.values())

    def uniform(i: int) -> float:
        h = hashlib.md5(f"mix:{i}".encode()).hexdigest()[:8]
        return int(h, 16) / 2**32

    want = {
        i: round((counts[s] / n_min) ** (alpha - 1.0), 9)
        for i, s in rows
        if uniform(i) < round((counts[s] / n_min) ** (alpha - 1.0), 9)
    }
    got = {r["id"]: r["mix_rate"] for r in out}
    assert got == want
    if alpha == 1.0:
        assert set(got) == {i for i, _ in rows}


@pytest.mark.slow
@given(
    keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=50, unique=True),
    n_shards=st.integers(1, 6),
)
@settings(**_SETTINGS)
def test_sharded_shuffle_replays_total_order(spark, keys, n_shards, tmp_path_factory):
    """Concatenating write_shuffled_shards files in footer-min order is
    exactly the seeded_shuffle permutation, for any shard count."""
    import glob
    import os

    import pyarrow.parquet as pq

    from social_media_etl_spark.operators.sampling import (
        seeded_shuffle,
        write_shuffled_shards,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    path = str(tmp_path_factory.mktemp("shards") / "out")
    write_shuffled_shards(df, path, "k", n_shards=n_shards, seed=5)
    files = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        t = pq.read_table(f)
        if t.num_rows:
            files.append((min(t.column("shuffle_key").to_pylist()), t))
    replay = [
        k for _, t in sorted(files, key=lambda x: x[0])
        for k in t.column("k").to_pylist()
    ]
    total = [r["k"] for r in seeded_shuffle(df, "k", seed=5).collect()]
    assert replay == total


@pytest.mark.slow
@given(
    tokens=st.lists(st.integers(0, 30), min_size=1, max_size=60),
    width=st.sampled_from([4, 16, 64]),
)
@settings(**_SETTINGS)
def test_cms_never_undercounts_property(spark, tokens, width):
    """CMS invariant: for ANY stream and any width, every estimate is
    >= the true count (collisions only ever overcount)."""
    from collections import Counter

    from social_media_etl_spark.functions import sketches

    df = spark.createDataFrame([(f"t{t}",) for t in tokens], "tok string")
    sk = sketches.cms_build(df, "tok", depth=2, width=width)
    est = {
        r["item"]: r["estimate"]
        for r in sketches.cms_estimate(
            sk, df.select("tok").distinct(), "tok", depth=2, width=width
        ).collect()
    }
    true = Counter(f"t{t}" for t in tokens)
    assert set(est) == set(true)
    for tok, n in true.items():
        assert est[tok] >= n


@pytest.mark.slow
@given(
    weights=st.lists(
        st.floats(0.1, 50.0, allow_nan=False), min_size=1, max_size=40
    ),
    k=st.integers(1, 10),
)
@settings(**_SETTINGS)
def test_weighted_sample_fixed_size_and_membership_property(spark, weights, k):
    """A-ES invariants: output size = min(k, n), rows come from the
    input, and the sample is a pure function of (keys, weights)."""
    from social_media_etl_spark.operators import sampling

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r["id"] for r in
           sampling.weighted_sample_fixed(df, "id", "w", k).collect()]
    assert len(got) == min(k, len(rows))
    assert set(got) <= {i for i, _ in rows}
    again = [r["id"] for r in
             sampling.weighted_sample_fixed(df, "id", "w", k).collect()]
    assert got == again


@pytest.mark.slow
@given(
    a=st.lists(st.floats(-50, 50, allow_nan=False), min_size=1, max_size=30),
    b=st.lists(st.floats(-50, 50, allow_nan=False), min_size=1, max_size=30),
)
@settings(**_SETTINGS)
def test_ks_drift_bounds_and_bruteforce_property(spark, a, b):
    """KS invariants: statistic in [0, 1] and equal to the brute-force
    two-sample definition for any inputs."""
    from social_media_etl_spark.plans.analytics import ks_drift

    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = ks_drift(df, "g", "v", "a", "b", n_buckets=8).collect()[0]
    pts = sorted(set(a) | set(b))
    want = max(
        abs(
            sum(1 for x in a if x <= p) / len(a)
            - sum(1 for x in b if x <= p) / len(b)
        )
        for p in pts
    )
    assert 0.0 <= got["ks_stat"] <= 1.0
    assert got["ks_stat"] == round(want, 6)


# -- manifest stats pruning (pure metadata logic, no Spark) -----------------

_interval = st.tuples(
    st.floats(-1e6, 1e6, allow_nan=False), st.floats(-1e6, 1e6, allow_nan=False)
).map(lambda t: [min(t), max(t)])

_str_interval = st.tuples(st.text(max_size=6), st.text(max_size=6)).map(
    lambda t: [min(t), max(t)]
)


@given(
    stats=st.lists(
        st.one_of(_interval, _str_interval, st.none()), min_size=1, max_size=20
    ),
    q=st.one_of(_interval, _str_interval),
)
@settings(**{**_SETTINGS, "max_examples": 200})
def test_kept_files_never_prunes_an_overlapping_file(stats, q):
    """Pruning soundness for ANY mix of numeric/string/missing file
    stats and any query range: a file whose recorded [min, max]
    overlaps the query — or whose stats are missing or of an
    incomparable type — must be kept. (Completeness, i.e. skipping
    disjoint same-typed files, is pinned by the graded keys.)"""
    from social_media_etl_spark.operators.manifest import VersionedTable

    files = [f"f{i}" for i in range(len(stats))]
    manifest = {
        "files": files,
        "stats": {
            f: {"c": s} for f, s in zip(files, stats) if s is not None
        },
    }
    lo, hi = q
    kept = set(VersionedTable._kept_files(manifest, "c", lo, hi))
    for f, s in zip(files, stats):
        if s is None:
            assert f in kept  # no stats -> never pruned
        elif type(s[0]) is not type(lo):
            assert f in kept  # incomparable predicate -> never pruned
        elif not (s[0] > hi or s[1] < lo):
            assert f in kept  # overlapping range -> must be read


@given(
    data=st.data(),
    n_sig=st.integers(1, 4),
    length=st.integers(1, 1200),
    block_align=st.integers(8, 96),
)
@settings(**{**_SETTINGS, "max_examples": 30})
def test_adpcm_batch_codec_roundtrip_property(data, n_sig, length, block_align):
    """For ANY signal batch, length, and block size: batch encode is
    byte-identical to per-signal encode; decode reproduces an
    independent per-sample evaluation of the published IMA recurrence
    over the emitted bytes (the vectorized lanes ARE the spec); and
    the fact chunk trims decode output to the true sample count."""
    import struct

    import numpy as np

    from social_media_etl_spark.sources import multimodal as M

    # generate the signal matrix from ONE drawn seed instead of
    # n_sig×length element-wise float draws: per-element drawing
    # routinely overruns hypothesis's entropy budget at length ~1200
    # and trips the data_too_large health check (flaked in r8's gate)
    seed = data.draw(st.integers(0, 2**32 - 1))
    rng = np.random.default_rng(seed)
    sigs = rng.uniform(-1.5, 1.5, size=(n_sig, length))
    batch = M.encode_wav_adpcm_batch(sigs, rate=8_000, block_align=block_align)
    assert batch == [
        M.encode_wav_adpcm(s, rate=8_000, block_align=block_align) for s in sigs
    ]
    decoded = M.decode_wav_batch(batch)
    for payload, (x, rate) in zip(batch, decoded):
        assert rate == 8_000 and len(x) == length  # fact-chunk trim
        # independent scalar replay of the IMA recurrence on the bytes
        fmt, fact_n, d = M._parse_wav_chunks(payload)
        ba = struct.unpack_from("<H", fmt, 12)[0]
        assert ba == block_align
        ref = []
        for off in range(0, len(d), ba):
            block = d[off : off + ba]
            pred, index = struct.unpack_from("<hB", block, 0)
            index = max(0, min(88, index))
            ref.append(pred)
            for byte in block[4:]:
                for nib in (byte & 0x0F, byte >> 4):
                    step = M._IMA_STEP_TAB[index]
                    dq = (step >> 3) + (step if nib & 4 else 0)
                    dq += (step >> 1) if nib & 2 else 0
                    dq += (step >> 2) if nib & 1 else 0
                    pred = pred - dq if nib & 8 else pred + dq
                    pred = min(32767, max(-32768, pred))
                    index = min(88, max(0, index + M._IMA_INDEX_TAB[nib & 7]))
                    ref.append(pred)
        assert np.array_equal(
            np.round(x * 32767).astype(int), np.array(ref[:fact_n])
        )


@pytest.mark.slow
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 30),
            st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
        ),
        min_size=1,
        max_size=25,
    ),
    lo=st.integers(0, 30),
    span=st.integers(0, 10),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_versioned_dml_matches_filter_semantics(spark, tmp_path_factory, rows, lo, span):
    """Copy-on-write DELETE/UPDATE against the relational definition on
    random data including NULL predicate columns: DELETE removes
    exactly the TRUE rows (NULLs kept), UPDATE rewrites exactly the
    TRUE rows with pre-update-value expressions, and cardinality and
    time travel hold on every path."""
    from social_media_etl_spark.operators.manifest import VersionedTable

    d = tmp_path_factory.mktemp("vdml")
    # a row id disambiguates duplicates so multiset compares are exact
    data = [(i, k, tag) for i, (k, tag) in enumerate(rows)]
    df = spark.createDataFrame(data, "rid long, k long, tag string")
    hi = lo + span
    pred = f"(k BETWEEN {lo} AND {hi}) AND tag = 'x'"

    t = VersionedTable.create(spark, str(d / "t"), df)
    t.delete(pred)
    got = sorted(map(tuple, t.read().collect()))
    want = sorted(
        (rid, k, tag)
        for rid, k, tag in data
        if not (lo <= k <= hi and tag == "x")
    )
    assert got == want
    assert sorted(map(tuple, t.read(0).collect())) == sorted(data)

    t2 = VersionedTable.create(spark, str(d / "t2"), df)
    t2.update(pred, {"tag": "concat(tag, '!')", "k": "k + 100"})
    got2 = sorted(map(tuple, t2.read().collect()))
    want2 = sorted(
        (rid, k + 100, tag + "!") if (lo <= k <= hi and tag == "x")
        else (rid, k, tag)
        for rid, k, tag in data
    )
    assert got2 == want2
    assert len(got2) == len(data)
