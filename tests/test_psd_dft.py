"""q_psd_dft (relational O(N^2) DFT) vs the FFT: same segment, same power.

The relational DFT exists so the spectral tier has one fully oracle-checked
query (DuckDB can evaluate the DFT sums but not an FFT).  This test pins it
against numpy's rfft on the identical head-64 segment per channel, making
the docstring's "tests pin the two against each other" claim true.
"""

import os

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/events.parquet"), reason="driver testdata absent"
)


def _head_segments():
    con = duckdb.connect()
    return con.sql(
        f"""
        WITH sig AS (
          SELECT CAST(user_id AS VARCHAR) AS channel_id, epoch(ts) AS t,
                 CAST(value AS DOUBLE) AS value, CAST(event_id AS BIGINT) AS seq
          FROM '{SF_DIR}/events.parquet'
        ),
        r AS (
          SELECT channel_id, value / 100.0 AS x,
                 ROW_NUMBER() OVER (PARTITION BY channel_id ORDER BY t, seq) - 1 AS rn
          FROM sig
        )
        SELECT channel_id, rn, x FROM r WHERE rn < 64 ORDER BY channel_id, rn
        """
    ).df()


def test_relational_dft_matches_fft(spark):
    out = (
        entry_mod.q_psd_dft(spark, SF_DIR)
        .toPandas()
        .sort_values(["channel_id", "k"], ignore_index=True)
    )
    seg = _head_segments()
    for cid, grp in seg.groupby("channel_id"):
        x = grp.sort_values("rn")["x"].to_numpy()
        spec = np.fft.rfft(x, n=64)
        want = np.round(np.abs(spec) ** 2, 3)
        got = out[out.channel_id == cid].sort_values("k")["power"].to_numpy()
        assert len(got) == 33
        np.testing.assert_allclose(got, want, atol=2e-3)
