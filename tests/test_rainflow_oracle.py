"""Preconditions of the rainflow value-hash oracle (SQL_RAINFLOW).

The oracle replays ASTM E1049 bit-exactly; the one step that is NOT
intrinsically cross-engine-exact is the ndigits binning: the kernel's
decimal-HALF_UP of the range's shortest repr (matching Spark F.round)
vs DuckDB's ROUND can disagree for ranges within half an ulp of a .005
decimal midpoint.  These tests turn that from an unchecked empirical
property of the driver data into an enforced invariant, and pin the
HALF_UP semantics itself.
"""

import os

import duckdb
import numpy as np
import pytest

from pandas_sigproc_spark.kernels.rainflow import (
    _round_half_up,
    count_cycles,
    extract_cycles,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# Only the driver-data invariant needs the fixtures; the pure-kernel
# pins below must run everywhere.
needs_testdata = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/events.parquet"), reason="driver testdata absent"
)


def test_round_half_up_matches_spark_semantics():
    # midpoints go UP (Spark BigDecimal HALF_UP), not to even
    assert _round_half_up(0.125, 2) == 0.13
    assert _round_half_up(0.135, 2) == 0.14
    assert _round_half_up(0.1349999999, 2) == 0.13
    # banker's (Python round) would give 0.12 here — the documented
    # deviation from the reference's third-party binning
    assert round(0.125, 2) == 0.12
    # huge magnitudes must not overflow the Decimal context
    assert _round_half_up(1e27, 2) == 1e27


@needs_testdata
def test_driver_data_ranges_round_identically_in_duckdb():
    rows = duckdb.sql(
        f"""
        SELECT CAST(user_id AS VARCHAR) cid, epoch(ts) t, CAST(value AS DOUBLE) v,
               CAST(event_id AS BIGINT) seq
        FROM '{SF_DIR}/events.parquet' ORDER BY cid, t, seq
        """
    ).df()
    con = duckdb.connect()
    n_cycles = 0
    for cid, grp in rows.groupby("cid"):
        for rng, *_ in extract_cycles(grp["v"].to_numpy()):
            n_cycles += 1
            dk = con.sql(
                f"SELECT ROUND(CAST('{rng!r}' AS DOUBLE), 2)"
            ).fetchone()[0]
            assert _round_half_up(rng, 2) == dk, (cid, rng)
    assert n_cycles > 100


def test_count_cycles_astm_example_unaffected_by_rounding_mode():
    # ASTM E1049 worked example: integer ranges, identical under any
    # decimal rounding mode.
    series = np.array([-2.0, 1.0, -3.0, 5.0, -1.0, 3.0, -4.0, 4.0, -2.0])
    got = count_cycles(series, ndigits=2)
    assert got == [(3.0, 0.5), (4.0, 1.5), (6.0, 0.5), (8.0, 1.0), (9.0, 0.5)]
