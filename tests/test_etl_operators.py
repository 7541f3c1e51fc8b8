"""ETL operator library tests: flatten (T1), normalize (T2+T3),
rename/cast (T4/T5), alignment (T6), integrity validators (§2.8).

Fixtures follow the reference's users document shape (FIXTURES.md §A1).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from social_media_etl_spark.operators import (
    cast_columns,
    flatten_struct,
    normalize,
    rename_columns,
    select_aligned,
    to_snake_case,
)
from social_media_etl_spark.operators.integrity import (
    fk_violations,
    null_violations,
    pk_violations,
    validate,
)

USER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField(
            "address",
            T.StructType(
                [
                    T.StructField("street", T.StringType()),
                    T.StructField("city", T.StringType()),
                    T.StructField(
                        "geo",
                        T.StructType(
                            [
                                T.StructField("lat", T.StringType()),
                                T.StructField("lng", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(
            "company",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("bs", T.StringType()),
                ]
            ),
        ),
    ]
)


@pytest.fixture(scope="module")
def users_raw(spark):
    rows = [
        Row(
            id=1,
            name="Ana",
            email="a@x.com",
            address=Row(street="S1", city="C1", geo=Row(lat="1.5", lng="-2.5")),
            company=Row(name="Acme", bs="synergy"),
        ),
        Row(
            id=2,
            name="Bo",
            email="b@x.com",
            address=Row(street="S2", city="C2", geo=Row(lat="bad", lng="0.25")),
            company=Row(name="Globex", bs="scale"),
        ),
    ]
    return spark.createDataFrame(rows, USER_SCHEMA)


def test_flatten_struct_key_paths(users_raw):
    flat = flatten_struct(users_raw)
    assert flat.columns == [
        "id",
        "name",
        "email",
        "address_street",
        "address_city",
        "address_geo_lat",
        "address_geo_lng",
        "company_name",
        "company_bs",
    ]
    row = flat.orderBy("id").first()
    assert row["address_geo_lat"] == "1.5"


def test_normalize_vertical_split_with_fk_agreement(users_raw):
    out = normalize(
        users_raw,
        {"address": "addresses", "company": "companies"},
        key_cols=["id"],
        root_name="users",
    )
    users = out["users"]
    addresses = out["addresses"]
    companies = out["companies"]
    assert set(users.columns) == {
        "id", "name", "email", "addresses_uuid", "companies_uuid",
    }
    assert addresses.columns == ["uuid", "street", "city", "geo_lat", "geo_lng"]
    assert companies.columns == ["uuid", "name", "bs"]
    # FK ↔ PK agreement (the SURVEY §7 determinism risk): every parent FK
    # resolves, even across independent recomputations of each frame.
    assert fk_violations(users, ["addresses_uuid"], addresses, ["uuid"]).count() == 0
    assert fk_violations(users, ["companies_uuid"], companies, ["uuid"]).count() == 0
    # Deterministic: rebuilding produces identical keys.
    again = normalize(
        users_raw,
        {"address": "addresses", "company": "companies"},
        key_cols=["id"],
        root_name="users",
    )
    assert sorted(r["uuid"] for r in addresses.collect()) == sorted(
        r["uuid"] for r in again["addresses"].collect()
    )


def test_rename_and_snake_case(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["userId", "postId", "ok_name"])
    assert rename_columns(df, {"userId": "user_id"}).columns == [
        "user_id", "postId", "ok_name",
    ]
    assert to_snake_case(df).columns == ["user_id", "post_id", "ok_name"]


def test_cast_nulls_on_invalid(users_raw):
    flat = flatten_struct(users_raw)
    cast = cast_columns(
        flat, {"address_geo_lat": "double", "address_geo_lng": "double"}
    )
    rows = {r["id"]: r for r in cast.collect()}
    assert rows[1]["address_geo_lat"] == 1.5
    assert rows[2]["address_geo_lat"] is None  # 'bad' → NULL, not error
    assert rows[2]["address_geo_lng"] == 0.25


def test_select_aligned_empty_input_ok(spark):
    empty = spark.createDataFrame([], "a long, b string, c double")
    out = select_aligned(empty, ["b", "a"])
    assert out.columns == ["b", "a"]
    assert out.count() == 0


def test_integrity_validators(spark):
    parent = spark.createDataFrame([(1,), (2,), (2,)], "id long")
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99), (13, None)], "cid long, pid long"
    )
    assert pk_violations(parent, ["id"]).collect()[0]["n_rows"] == 2
    bad_fk = fk_violations(child, ["pid"], parent, ["id"]).collect()
    assert [r["cid"] for r in bad_fk] == [12]  # NULL FK passes
    assert null_violations(child, ["pid"]).collect()[0]["cid"] == 13
    results = validate(
        {
            "child_fk": fk_violations(child, ["pid"], parent, ["id"]),
            "parent_pk": pk_violations(parent, ["id"]),
        }
    )
    assert [r.ok for r in results] == [False, False]
    with pytest.raises(ValueError):
        validate({"parent_pk": pk_violations(parent, ["id"])}, fail_fast=True)


def test_table_profile_certified_matches_exact_profile(spark):
    """Certified profile returns exactly the exact profile's rows when
    the HLL gate holds (it must, on tiny data: HLL sparse mode)."""
    from social_media_etl_spark.operators.profile import (
        table_profile,
        table_profile_certified,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 3}", float(i)) for i in range(50)],
        "id long, s string, v double",
    )
    exact = {(r["column"], r["metric"]): r["value"] for r in table_profile(df).collect()}
    cert = {
        (r["column"], r["metric"]): r["value"]
        for r in table_profile_certified(df).collect()
    }
    assert cert == exact and len(cert) > 0


def test_table_profile_certified_gate_empties_on_breach(spark):
    """An unsatisfiable tolerance must EMPTY the output (loud row-count
    failure), not ship stats."""
    from social_media_etl_spark.operators.profile import table_profile_certified

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "id long, v double"
    )
    out = table_profile_certified(df, rel_err=0.0, abs_slack=-1.0)
    assert out.count() == 0


# -- r8 review fixes ----------------------------------------------------------


def test_cast_columns_strict_raises_without_ansi(spark):
    """strict=True must raise on uncastable values even though the
    project session pins ANSI off (r8 review: Column.cast only raises
    under ANSI, so the old strict mode silently nulled)."""
    import pytest

    from social_media_etl_spark.operators.transforms import cast_columns

    df = spark.createDataFrame([("1.5",), ("bad",)], "x string")
    ok = cast_columns(df.filter("x = '1.5'"), {"x": "double"}, strict=True)
    assert ok.collect()[0]["x"] == 1.5
    with pytest.raises(Exception, match="strict cast"):
        cast_columns(df, {"x": "double"}, strict=True).collect()
    # default stays try_cast: NULL, no raise
    lax = cast_columns(df, {"x": "double"})
    assert sorted(r["x"] for r in lax.collect() if r["x"] is not None) == [1.5]


def test_surrogate_key_null_parts_do_not_collide(spark):
    from social_media_etl_spark.operators.normalize import surrogate_key

    df = spark.createDataFrame(
        [("ann", None), (None, "ann")], "first string, last string"
    )
    keys = [
        r["k"]
        for r in df.select(
            surrogate_key("child", ["first", "last"]).alias("k")
        ).collect()
    ]
    assert keys[0] != keys[1]


def test_fk_violations_rejects_mismatched_key_lists(spark):
    import pytest

    from social_media_etl_spark.operators.integrity import fk_violations

    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="length"):
        fk_violations(df, ["a", "b"], df, ["a"])


def test_to_snake_case_and_flatten_collisions_raise(spark):
    import pytest

    from social_media_etl_spark.operators.flatten import flatten_struct
    from social_media_etl_spark.operators.transforms import to_snake_case

    df = spark.createDataFrame([(1, 2)], "userId long, user_id long")
    with pytest.raises(ValueError, match="collide"):
        to_snake_case(df)
    nested = spark.sql(
        "SELECT named_struct('b_c', 1) AS a, named_struct('c', 2) AS a_b"
    )
    with pytest.raises(ValueError, match="collide"):
        flatten_struct(nested)


def test_approx_quantile_aliases_faithful(spark):
    import pytest

    from social_media_etl_spark.functions.sketches import approx_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    out = approx_quantiles(df, "x", probabilities=(0.29, 0.99, 0.999))
    assert set(out.columns) == {"p29", "p99", "p99_9"}
    with pytest.raises(ValueError, match="collide"):
        approx_quantiles(df, "x", probabilities=(0.5, 0.5))


def test_cms_estimate_rejects_wrong_seed_on_sparse_sketch(spark):
    """A wrong-seed probe whose buckets all land on unoccupied cells
    used to pass the NULL-cell check and return silent 0s — the global
    params fold now raises (r8 review)."""
    import pytest

    from social_media_etl_spark.functions import sketches

    df = spark.createDataFrame([(f"t{i}",) for i in range(5)], "token string")
    sk = sketches.cms_build(df, "token", depth=2, width=4096, seed=7)
    with pytest.raises(Exception, match="cms_estimate"):
        sketches.cms_estimate(
            sk, df.select("token").distinct(), "token",
            depth=2, width=4096, seed=1234,
        ).collect()
