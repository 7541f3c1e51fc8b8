"""Cross-engine cast equivalence for the decimal-money recipe.

The exact-decimal certifications (plans/analytics.py dec_price/
dec_frac/dec_qty) are replay-stable only if Spark and DuckDB cast the
SAME stored double to the SAME decimal. Spark casts through the
double's exact binary expansion (java BigDecimal, HALF_UP); DuckDB's
path may differ near a cast boundary (a double whose exact value sits
within an ulp of an x.xxxxx5 grid point). An r11 census over all 3M
sf0.1 money values found ZERO disagreements; this test re-runs the
census on sf0.01 every round so a driver-side data regeneration that
lands values on cast boundaries is caught here, not as an
unexplained oracle hash drift.
"""

from __future__ import annotations

import decimal

import duckdb
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

CASTS = [
    ("lineitem", "l_extendedprice", "decimal(12,6)"),
    ("lineitem", "l_discount", "decimal(7,6)"),
    ("lineitem", "l_tax", "decimal(7,6)"),
    ("lineitem", "l_quantity", "decimal(8,6)"),
    ("part", "p_retailprice", "decimal(12,6)"),
]


def test_spark_and_duckdb_cast_money_doubles_identically(spark):
    for table, col, typ in CASTS:
        s = (
            spark.read.parquet(f"{SF}/{table}.parquet")
            .select(F.col(col).cast(typ).cast("string").alias("v"))
            .toPandas()["v"]
        )
        d = duckdb.sql(
            f"SELECT CAST(CAST({col} AS {typ.upper()}) AS VARCHAR) AS v"
            f" FROM '{SF}/{table}.parquet'"
        ).df()["v"]
        sd = sorted(decimal.Decimal(x) for x in s)
        dd = sorted(decimal.Decimal(x) for x in d)
        assert len(sd) == len(dd)
        mismatches = sum(1 for a, b in zip(sd, dd) if a != b)
        assert mismatches == 0, (
            f"{table}.{col} -> {typ}: {mismatches} of {len(sd)} values "
            "cast differently across engines — the regenerated data has "
            "values on a cast boundary; widen the cast scale or migrate "
            "the affected certifications before trusting oracle hashes"
        )
