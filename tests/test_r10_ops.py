"""Round-10 invariants: the cross-engine-deterministic round6 formula
(the driver-r9 stream_asof_join flake class) and its adoption by the
tie-capable µs-statistic keys."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from kwery_spark.catalog import round6, round6_sql
from kwery_spark.registry import QUERIES, load_all

load_all()


def test_round6_bit_identical_on_exact_ties(spark):
    """floor(x*1e6+0.5)/1e6 must produce the IDENTICAL double in Spark
    and DuckDB on exact half-µs ties — averages of integer microseconds
    over even counts, the inputs where plain round(x, 6) resolves
    through two different ulp-lotteries (Spark BigDecimal shortest-repr
    HALF_UP vs DuckDB std::round(x*1e6)/1e6) and flaked in driver r9.

    The tie grid: x = (2k+1)/2 µs → x/1e6 has an exact .5 at the 7th
    decimal. Also sweeps near-tie ulp neighbours and plain off-tie
    values so the formula is exercised away from the boundary too.
    """
    # (sum_us, count) pairs whose quotient is an exact half-integer µs,
    # plus odd cases, large magnitudes, and count values seen per-group
    cases = [(3, 2), (5, 2), (7, 2), (9, 2), (101, 2), (2**33 + 1, 2),
             (3 * 7 + 1, 7), (10**12 + 1, 2), (999_999_999, 4),
             (123_456_789, 8), (1, 3), (2, 3), (10**15 + 7, 6)]
    df = spark.createDataFrame(
        [(float(s), float(c)) for s, c in cases], "s double, c double"
    )
    got = [
        r.v
        for r in df.select(
            round6(F.col("s") / F.col("c") / F.lit(1000000.0)).alias("v")
        ).collect()
    ]
    con = duckdb.connect()
    expr = round6_sql("CAST(? AS DOUBLE) / CAST(? AS DOUBLE) / 1000000.0")
    want = [
        con.execute(f"SELECT {expr}", [s, c]).fetchone()[0] for s, c in cases
    ]
    # bit-identical, not approx: the whole point of the formula
    assert got == want, list(zip(cases, got, want))


def test_round6_matches_half_up_off_ties(spark):
    """Away from ties, round6 equals ordinary round-half-up to 6dp."""
    vals = [0.1234564, 0.1234566, 12.9999994, 12.9999996, 5.0, 0.0000001]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.v for r in df.select(round6(F.col("x")).alias("v")).collect()]
    want = [round(v, 6) for v in vals]
    for g, w in zip(got, want):
        assert abs(g - w) < 5e-13, (g, w)


def test_tie_capable_keys_use_round6_not_round(spark):
    """The three µs-ratio keys fixed in r10 must keep FLOOR-based
    rounding in BOTH the Spark plan and the oracle SQL — a regression
    back to round(x, 6) reintroduces the driver-r9 flake."""
    from kwery_spark.registry import ORACLES

    for key in ("stream_asof_join", "events_inter_arrival",
                "events_conversion_lag"):
        sql = ORACLES[key].lower()
        assert "floor(" in sql and "+ 0.5" in sql, key
        # the µs-ratio outputs must not go through round(); percentile
        # inputs stay integer µs so interpolation is exact both sides
        assert "round(cast(s1" not in sql and "round(med" not in sql, key
        assert "round(avg(" not in sql and "round(quantile" not in sql, key
