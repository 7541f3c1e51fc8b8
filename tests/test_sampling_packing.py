"""Sequence packing and corpus sampling/balancing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from social_media_etl_spark.catalog import load_table
from social_media_etl_spark.operators import chunking, sampling

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def chunks(spark):
    docs = load_table(spark, SF, "documents")
    return chunking.chunk_documents(docs, chunk_tokens=32, overlap=8)


def test_pack_chunks_respects_budget_and_covers_all(chunks):
    packed = chunking.pack_chunks(chunks, max_tokens=64)
    rows = packed.collect()
    assert len(rows) == chunks.count()  # every chunk packed exactly once
    by_seq = {}
    for r in rows:
        by_seq.setdefault((r["shard"], r["seq_no"]), []).append(r)
    for members in by_seq.values():
        total = sum(r["n_chunk_tokens"] for r in members)
        assert total <= 64
        # positions are a contiguous prefix-sum layout
        members.sort(key=lambda r: r["pos_in_seq"])
        acc = 0
        for r in members:
            assert r["pos_in_seq"] == acc
            acc += r["n_chunk_tokens"]


def test_pack_chunks_deterministic(chunks):
    a = sorted(map(tuple, chunking.pack_chunks(chunks, max_tokens=64).collect()))
    b = sorted(map(tuple, chunking.pack_chunks(chunks, max_tokens=64).collect()))
    assert a == b


def test_quota_per_stratum_exact_and_deterministic(spark):
    docs = load_table(spark, SF, "documents")
    capped = sampling.quota_per_stratum(docs, "source", 10, ["doc_id"])
    counts = {
        r["source"]: r["count"]
        for r in capped.groupBy("source").count().collect()
    }
    full = {
        r["source"]: r["count"]
        for r in docs.groupBy("source").count().collect()
    }
    for src, n in counts.items():
        assert n == min(10, full[src])
    # keeps the LOWEST doc_ids per source
    first = capped.filter(F.col("source") == list(full)[0])
    ids = sorted(r["doc_id"] for r in first.collect())
    all_ids = sorted(
        r["doc_id"]
        for r in docs.filter(F.col("source") == list(full)[0]).collect()
    )
    assert ids == all_ids[: len(ids)]


def test_stratified_sample_rates(spark):
    docs = load_table(spark, SF, "documents")
    srcs = [r["source"] for r in docs.select("source").distinct().collect()]
    fractions = {s: (0.5 if i % 2 == 0 else 0.1) for i, s in enumerate(srcs)}
    out = sampling.stratified_sample(docs, "source", fractions, seed=7)
    got = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    full = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    for s in srcs:
        # Bernoulli sampling: loose bounds, exact reproducibility below
        assert got.get(s, 0) <= full[s]
    again = sampling.stratified_sample(docs, "source", fractions, seed=7)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_deterministic_split_stable_under_growth(spark):
    base = spark.range(500).select(F.col("id").alias("doc_id"))
    grown = spark.range(1000).select(F.col("id").alias("doc_id"))
    w = {"train": 8, "val": 1, "test": 1}
    a = {
        r["doc_id"]: r["split"]
        for r in sampling.deterministic_split(base, "doc_id", w).collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in sampling.deterministic_split(grown, "doc_id", w).collect()
    }
    # original rows keep their split when the corpus doubles
    assert all(b[k] == v for k, v in a.items())
    # rough proportions
    n_train = sum(1 for v in b.values() if v == "train")
    assert 0.7 < n_train / 1000 < 0.9


def test_md5_split_stable_and_partitioned(spark):
    from social_media_etl_spark.operators import sampling

    docs = spark.range(2000).withColumnRenamed("id", "k")
    out = sampling.md5_split(docs, "k")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"train", "val", "test"}
    # 12/2/2 sixteenths within loose tolerance
    assert 0.6 < counts["train"] / 2000 < 0.9
    # growth stability: first 1000 keys get identical splits inside a
    # corpus twice the size
    small = dict(
        (r["k"], r["split"])
        for r in sampling.md5_split(spark.range(1000).withColumnRenamed("id", "k"), "k").collect()
    )
    big = dict((r["k"], r["split"]) for r in out.filter("k < 1000").collect())
    assert small == big
    import pytest

    with pytest.raises(ValueError):
        sampling.md5_split(docs, "k", {"a": 3, "b": 3})


def test_importance_sample_deterministic_and_proportional(spark):
    """Same input → identical sample across runs; acceptance rate
    tracks the weight (±10% at n=2000, p=0.5)."""
    from social_media_etl_spark.operators.sampling import importance_sample
    from pyspark.sql import functions as F

    df = spark.range(2000).withColumn("w", F.lit(0.5))
    a = sorted(r["id"] for r in importance_sample(df, "id", "w").collect())
    b = sorted(r["id"] for r in importance_sample(df, "id", "w").collect())
    assert a == b
    assert 0.40 * 2000 < len(a) < 0.60 * 2000
    # weight 0 keeps nothing; weight 1 keeps everything
    assert importance_sample(df.withColumn("w", F.lit(0.0)), "id", "w").count() == 0
    assert importance_sample(df.withColumn("w", F.lit(1.0)), "id", "w").count() == 2000


def test_budget_quota_respects_budget_and_order(spark):
    """Every stratum's kept rows satisfy the running budget and are the
    PREFIX of the deterministic order (best-first)."""
    from social_media_etl_spark.operators.sampling import budget_quota
    from pyspark.sql import functions as F

    rows = [(i, "a" if i % 2 == 0 else "b", 10 + (i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, src string, sz long")
    out = budget_quota(df, "src", "sz", 60, [F.desc("sz"), F.col("id")]).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r)
    assert set(by_src) == {"a", "b"}
    for src, kept in by_src.items():
        assert max(r["cum_sz"] for r in kept) <= 60
        # prefix property: kept ids = first len(kept) of the sorted order
        full = sorted(
            (r for r in rows if r[1] == src), key=lambda t: (-t[2], t[0])
        )
        assert sorted(r["id"] for r in kept) == sorted(
            t[0] for t in full[: len(kept)]
        )


def test_funnel_conversion_ordering_semantics(spark):
    """A click BEFORE the user's first view must not count; conversion
    rates divide consecutive step counts."""
    from social_media_etl_spark.plans.analytics import funnel_conversion
    from pyspark.sql import functions as F

    rows = [
        # u1: full ordered funnel
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:05:00"),
        (1, "purchase", "2024-01-01 10:10:00"),
        # u2: click precedes the first view -> stops at view
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 10:00:00"),
        # u3: view then click, no purchase
        (3, "view", "2024-01-01 08:00:00"),
        (3, "click", "2024-01-01 08:30:00"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["step"]: r for r in funnel_conversion(ev).collect()}
    assert out["view"]["n_users"] == 3
    assert out["click"]["n_users"] == 2
    assert out["purchase"]["n_users"] == 1
    assert out["view"]["conv_rate"] is None
    assert abs(out["click"]["conv_rate"] - round(2 / 3, 6)) < 1e-9
    assert out["purchase"]["conv_rate"] == 0.5


def test_seeded_shuffle_deterministic_and_growth_stable(spark):
    """The hash-sort shuffle gives the same permutation on rerun and at
    different parallelism, a different permutation per seed, and
    corpus growth interleaves without moving existing keys."""
    from social_media_etl_spark.operators.sampling import seeded_shuffle

    df = spark.range(500).withColumnRenamed("id", "k")
    a = [r["k"] for r in seeded_shuffle(df, "k", seed=1).collect()]
    b = [r["k"] for r in seeded_shuffle(df.repartition(7), "k", seed=1).collect()]
    assert a == b  # parallelism-independent
    c = [r["k"] for r in seeded_shuffle(df, "k", seed=2).collect()]
    assert a != c  # seed changes the permutation
    assert sorted(a) == list(range(500))  # it IS a permutation
    # growth stability: each row's shuffle_key is unchanged by growth
    small = {
        r["k"]: r["shuffle_key"]
        for r in seeded_shuffle(df, "k", seed=1).collect()
    }
    grown = {
        r["k"]: r["shuffle_key"]
        for r in seeded_shuffle(
            spark.range(1000).withColumnRenamed("id", "k"), "k", seed=1
        ).collect()
    }
    assert all(grown[k] == v for k, v in small.items())


def test_seeded_shuffle_null_keys_get_stable_position(spark):
    """A null key hashes the distinct \\x00null marker (not the empty
    string), so null-key rows land at a deterministic spot — and a row
    whose real key IS the marker-adjacent empty string does not collide
    with them (ADVICE r5)."""
    from social_media_etl_spark.operators.sampling import seeded_shuffle

    df = spark.createDataFrame(
        [("a",), (None,), ("",), ("b",)], "k string"
    )
    rows = {r["k"]: r["shuffle_key"] for r in seeded_shuffle(df, "k", 1).collect()}
    rerun = {r["k"]: r["shuffle_key"] for r in seeded_shuffle(df, "k", 1).collect()}
    assert rows == rerun  # null included, stable across runs
    assert rows[None] is not None
    assert rows[None] != rows[""]  # marker does not collide with ""


def test_smoothed_mixture_sample_flattens_toward_exponent(spark):
    """α-smoothed mixing: the smallest source keeps everything (rate
    1), larger sources thin by (n_s/n_min)^(alpha-1); output shares
    land near n_s^alpha, the published sampling-exponent target, and
    the sample is deterministic across reruns; alpha outside [0,1]
    raises."""
    from social_media_etl_spark.operators.sampling import (
        smoothed_mixture_sample,
    )

    rows = (
        [(i, "big") for i in range(6400)]
        + [(i + 10_000, "mid") for i in range(400)]
        + [(i + 20_000, "small") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "k long, src string")
    out = smoothed_mixture_sample(df, "src", "k", alpha=0.5)
    got = {
        r["src"]: r["n"]
        for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    rates = {r["src"]: r["mix_rate"] for r in out.select("src", "mix_rate").distinct().collect()}
    assert rates["small"] == 1.0          # n_min anchor keeps everything
    assert abs(rates["big"] - (64 ** -0.5)) < 1e-9
    assert abs(rates["mid"] - (4 ** -0.5)) < 1e-9
    assert got["small"] == 100            # rate-1 stratum fully kept
    # expected kept: n_s * rate = n_min^(1-a) * n_s^a → 800 / 200 / 100
    assert abs(got["big"] - 800) < 120    # Bernoulli tolerance (~4σ)
    assert abs(got["mid"] - 200) < 60
    # deterministic: rerun keeps the identical row set
    a = sorted(r["k"] for r in out.collect())
    b = sorted(
        r["k"] for r in smoothed_mixture_sample(df, "src", "k", 0.5).collect()
    )
    assert a == b
    with pytest.raises(ValueError, match="alpha"):
        smoothed_mixture_sample(df, "src", "k", alpha=1.5)


def test_smoothed_mixture_sample_null_source_is_a_stratum(spark):
    """Null-source rows are their own stratum — counted, rated, and
    sampled — not silently dropped by the rates join while their count
    deflates n_min for everyone else (review r6)."""
    from social_media_etl_spark.operators.sampling import (
        smoothed_mixture_sample,
    )

    rows = [(i, "big") for i in range(400)] + [
        (i + 1000, None) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k long, src string")
    out = smoothed_mixture_sample(df, "src", "k", alpha=0.5)
    rates = {
        r["src"]: r["mix_rate"]
        for r in out.select("src", "mix_rate").distinct().collect()
    }
    # the null stratum is n_min → rate 1, fully kept
    assert rates[None] == 1.0
    assert out.filter(F.col("src").isNull()).count() == 100
    assert abs(rates["big"] - (4 ** -0.5)) < 1e-9


def test_smoothed_mixture_sample_big_side_not_shuffled(spark):
    """The rates join must be a BROADCAST hash join — the corpus side
    is never exchanged on the source key (only the tiny count aggregate
    shuffles its one-column projection)."""
    from social_media_etl_spark.operators.sampling import (
        smoothed_mixture_sample,
    )

    df = spark.range(10_000).selectExpr(
        "id AS k", "CASE WHEN id % 4 = 0 THEN 'a' ELSE 'b' END AS src"
    )
    out = smoothed_mixture_sample(df, "src", "k", alpha=0.5)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_write_shuffled_shards_are_contiguous_slices(spark, tmp_path):
    """Sharded shuffle layout: every output file owns a DISJOINT range
    of shuffle_key (verified from parquet footers), and reading files
    in footer-min order replays exactly the seeded_shuffle permutation
    — the trainer's streaming contract (VERDICT r5 #4)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from social_media_etl_spark.operators.sampling import (
        seeded_shuffle,
        write_shuffled_shards,
    )

    df = spark.range(5_000).withColumnRenamed("id", "k")
    path = str(tmp_path / "shards")
    write_shuffled_shards(df, path, "k", n_shards=8, seed=3)

    files = glob.glob(os.path.join(path, "*.parquet"))
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "shuffle_key"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs), f))
    assert len(ranges) > 1  # actually sharded
    ranges.sort()
    for (_, hi, _), (lo2, _, _) in zip(ranges, ranges[1:]):
        assert hi < lo2  # disjoint, contiguous slices

    # concatenating shards in footer-min order == the total-sort order
    replay = []
    for _, _, f in ranges:
        replay.extend(pq.read_table(f).column("k").to_pylist())
    total = [r["k"] for r in seeded_shuffle(df, "k", seed=3).collect()]
    assert replay == total


def test_weighted_sample_fixed_exact_size_and_deterministic(spark):
    from social_media_etl_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, float(1 + i % 10)) for i in range(500)], "id long, w double"
    )
    s1 = sorted(r["id"] for r in
                sampling.weighted_sample_fixed(df, "id", "w", 50).collect())
    s2 = sorted(r["id"] for r in
                sampling.weighted_sample_fixed(df, "id", "w", 50).collect())
    assert len(s1) == 50 and s1 == s2  # exact size, rerun-stable


def test_weighted_sample_fixed_prefers_heavy_weights(spark):
    """Across independent salts, heavy items (w=10) must be included
    far more often than light ones (w=0.1)."""
    from social_media_etl_spark.operators import sampling

    rows = [(i, 10.0 if i < 50 else 0.1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w double")
    heavy = light = 0
    for salt in ("s1", "s2", "s3"):
        ids = {r["id"] for r in
               sampling.weighted_sample_fixed(df, "id", "w", 60, salt).collect()}
        heavy += sum(1 for i in ids if i < 50)
        light += sum(1 for i in ids if i >= 50)
    assert heavy > light * 2


def test_weighted_sample_fixed_excludes_nonpositive_weights(spark):
    from social_media_etl_spark.operators import sampling

    df = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, 5.0)], "id long, w double"
    )
    got = [r["id"] for r in
           sampling.weighted_sample_fixed(df, "id", "w", 10).collect()]
    assert got == [3]


# -- r8 review fixes ----------------------------------------------------------


def test_samplers_handle_null_keys(spark):
    """NULL keys hash the null marker instead of null-propagating: the
    split family assigns a real bucket, the Bernoulli samplers make a
    real accept/reject decision, and the A-ES top-k no longer lets
    NULL jitter sort first and win unconditionally (r8 review)."""
    from social_media_etl_spark.operators import sampling

    df = spark.createDataFrame(
        [(None, 0.5), (1, 0.5), (2, 0.5), (3, 0.5)],
        "doc_id long, w double",
    )
    # md5_split: the NULL row lands in a real split
    splits = sampling.md5_split(df, "doc_id")
    assert splits.filter("split IS NULL").count() == 0
    # weighted top-k: with equal weights, a NULL key must not be an
    # automatic winner — its jitter is a real hash draw
    got = sampling.weighted_sample_fixed(df, "doc_id", "w", k=4)
    assert got.count() == 4  # all rows rank, none crash or vanish


def test_salted_join_refuses_outer_build_side(spark):
    from social_media_etl_spark.operators import skew

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(ValueError, match="probe-preserving"):
        skew.salted_join(df, df, ["k"], how="right")
    with pytest.raises(ValueError, match="probe-preserving"):
        skew.salted_join(df, df, ["k"], how="full")


def test_salted_agg_count_skips_nulls_in_named_column(spark):
    from pyspark.sql import functions as F

    from social_media_etl_spark.operators import skew

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 2.0), ("b", None)],
        "k string, x double",
    )
    out = {
        r["k"]: (r["n_x"], r["n_rows"])
        for r in skew.salted_agg(
            df, ["k"], {"n_x": ("x", "count"), "n_rows": ("*", "count")}
        ).collect()
    }
    assert out == {"a": (2, 3), "b": (0, 1)}


def test_pack_chunks_string_ids_and_oversize_refusal(spark):
    from social_media_etl_spark.operators import chunking

    chunks = spark.createDataFrame(
        [("doc-a", 0, 100), ("doc-a", 1, 100), ("doc-b", 0, 150)],
        "doc_id string, chunk_idx long, n_chunk_tokens long",
    )
    packed = chunking.pack_chunks(chunks, max_tokens=512, n_shards=2)
    assert packed.count() == 3
    assert dict(packed.dtypes)["doc_id"] == "string"
    oversize = spark.createDataFrame(
        [("doc-a", 0, 600)], "doc_id string, chunk_idx long, n_chunk_tokens long"
    )
    with pytest.raises(Exception, match="exceeds"):
        chunking.pack_chunks(oversize, max_tokens=512, n_shards=1).collect()


def test_kmeans_rejects_zero_iterations(spark):
    from social_media_etl_spark.operators.clustering import kmeans_fit_df

    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="iters"):
        kmeans_fit_df(df, iters=0)
