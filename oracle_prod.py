"""Recursive-CTE DuckDB oracles for the PRODUCTION kernel-tier queries.

Round 3's verdict: the SciPy-tier production legs (filt_butter / filt_cfc /
filt_a / filt_chain / filt_chunked / srs / psd_* / interp_cubic /
accessor_chain) ran rows-only — their kernels were pinned by bit-exact
anchors on head-512 slices, but the production configurations over full
channels had no independent oracle.  This module closes that gap.

Why full bit-exact replay is possible at the gate's scale: the driver's
correctness gate runs at sf0.01, where every hourly-resampled channel is
~700 samples — BELOW kernels/iir._LOOP_CUTOVER (2048) — so the kernels
execute the exact DF2T recursion / banded solve, which a recursive CTE
replays multiply-add for multiply-add (the same technique as the head-512
anchors, generalized to arbitrary filter order, per-channel lengths, odd
extension, and chained stages).  Where a reduction intervenes (PSD means,
np.dot window norms, detrend means), both sides round with margins that
are MEASURED on the fixed datasets (tests/test_prod_oracle_margins.py).

Reference semantics being replayed: scipy-default ``filtfilt``
(extension.py:493,535), causal ``lfilter`` (extension.py:563), Smallwood
SRS (tools.py:304-376), Welch PSD (tools.py:13-100, extension.py:569-625),
``interp1d`` spline kinds (extension.py:819-851).
"""

from __future__ import annotations

import math

import numpy as np

from pandas_sigproc_spark.kernels import design as _design
from pandas_sigproc_spark.kernels.iir import _normalize_ba, lfilter_zi

DAY = 86400.0
HOURLY = 1.0 / 3600.0
DT = 1.0 / float(HOURLY)  # == 3600.0 exactly


def dlit(x: float) -> str:
    """A float as a DuckDB expression that is EXACTLY the Python double
    (see __spark_entry__._dlit: bare decimal literals parse as DECIMAL)."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


SIG_CTE = """sig AS (
  SELECT CAST(user_id AS VARCHAR) AS channel_id,
         epoch(ts) AS t,
         CAST(value AS DOUBLE) AS value,
         CAST(event_id AS BIGINT) AS seq
  FROM events
)"""

# Replay of _uniform = resample(deduplicate(sig), 1/3600): per-channel
# end-exclusive hourly arange grid + linear interpolation, UNROUNDED (the
# filter recursions need the bit-exact kernel input).  The bracket
# formulation produces the same values as the operator's emit-pairs plan
# (operators/joins.py resample: knot assignment is decided by the same
# float comparisons; the interpolation expression is replayed with
# identical association).  Emits:
#   uni(channel_id, i, t, x)  -- i = 1-based time-order row number
#   unt(channel_id, n)        -- per-channel sample count
UNIFORM_CTES = f"""dedup AS (
  SELECT channel_id, t, AVG(value) AS value FROM sig GROUP BY channel_id, t
),
bnd AS (
  SELECT channel_id, MIN(t) AS t0, MAX(t) AS t1 FROM dedup GROUP BY channel_id
),
ugrid AS (
  SELECT channel_id,
         t0 + UNNEST(RANGE(0, CAST(CEIL((t1 - t0) / {DT!r}) AS BIGINT))) * {DT!r} AS t
  FROM bnd WHERE t1 > t0
),
uu AS (
  SELECT channel_id, t AS x, value AS y, 1 AS is_src FROM dedup
  UNION ALL
  SELECT channel_id, t, NULL, 0 FROM ugrid
),
um AS (
  SELECT channel_id, x, is_src,
         LAST_VALUE(CASE WHEN is_src = 1 THEN x END IGNORE NULLS)
           OVER (PARTITION BY channel_id ORDER BY x, is_src DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x0,
         LAST_VALUE(CASE WHEN is_src = 1 THEN y END IGNORE NULLS)
           OVER (PARTITION BY channel_id ORDER BY x, is_src DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y0,
         LAST_VALUE(CASE WHEN is_src = 1 THEN x END IGNORE NULLS)
           OVER (PARTITION BY channel_id ORDER BY x DESC, is_src DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x1,
         LAST_VALUE(CASE WHEN is_src = 1 THEN y END IGNORE NULLS)
           OVER (PARTITION BY channel_id ORDER BY x DESC, is_src DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y1
  FROM uu
),
urs AS (
  SELECT channel_id, x AS t,
         CASE WHEN x0 = x THEN y0
              WHEN x1 = x0 THEN y0
              ELSE y0 + (y1 - y0) * (x - x0) / (x1 - x0) END AS x_val
  FROM um WHERE is_src = 0 AND x0 IS NOT NULL AND (x1 IS NOT NULL OR x0 = x)
),
uni AS MATERIALIZED (
  SELECT channel_id, t, x_val AS x,
         ROW_NUMBER() OVER (PARTITION BY channel_id ORDER BY t) AS i
  FROM urs
),
unt AS MATERIALIZED (SELECT channel_id, MAX(i) AS n FROM uni GROUP BY channel_id)"""

# The 48 kHz per-channel index time base used by filt_a / filt_chain /
# accessor_chain (q_filt_a): t = (row_number - 1) / 48000 over the
# dedup'd raw signal.  Emits idx(channel_id, i, t, x) + idxn(channel_id, n).
IDX_CTES = """dedup AS (
  SELECT channel_id, t, AVG(value) AS value FROM sig GROUP BY channel_id, t
),
idx AS MATERIALIZED (
  SELECT channel_id,
         ROW_NUMBER() OVER (PARTITION BY channel_id ORDER BY t) AS i,
         (ROW_NUMBER() OVER (PARTITION BY channel_id ORDER BY t) - 1) / 48000.0 AS t,
         value AS x
  FROM dedup
),
idxn AS MATERIALIZED (SELECT channel_id, MAX(i) AS n FROM idx GROUP BY channel_id)"""


# ---------------------------------------------------------------------------
# Generalized DF2T recursion builders (arbitrary filter order)
# ---------------------------------------------------------------------------


def _df2t_select(b, a, e: str, prev: list[str]) -> str:
    """SELECT expressions replaying ONE step of kernels/iir._lfilter_loop.

    ``e`` is the current input sample expression; ``prev`` holds the
    expressions for the incoming delay-line state z1..z_{n-1} (e.g.
    ``["f.z1", "f.z2"]`` for a step, or the zi-seed expressions).
    The multiply-add association mirrors the loop exactly:
      y     = b0*x + z1
      z_j   = (b_j*x + z_{j+1}) - a_j*y        (j = 1..n-2)
      z_n-1 = b_{n-1}*x - a_{n-1}*y
    """
    n = len(b)
    assert len(a) == n and n >= 2
    bl = [dlit(v) for v in b]
    al = [dlit(v) for v in a]
    y = f"{bl[0]} * {e} + {prev[0]}"
    cols = [f"{y} AS y"]
    for j in range(1, n - 1):
        cols.append(f"({bl[j]} * {e} + {prev[j]}) - {al[j]} * ({y}) AS z{j}")
    cols.append(f"{bl[n-1]} * {e} - {al[n-1]} * ({y}) AS z{n-1}")
    return ",\n         ".join(cols)


def _pad_ba(b, a):
    """Normalize and zero-pad (b, a) to common length (kernels/iir)."""
    b, a = _normalize_ba(b, a)
    n = max(len(b), len(a))
    bp = np.zeros(n)
    ap = np.zeros(n)
    bp[: len(b)] = b
    ap[: len(a)] = a
    return bp, ap


def lfilter_ctes(p: str, b, a, src: str) -> str:
    """CTE chain replaying causal ``lfilter`` (zero initial state) over
    ``src(channel_id, i, x)``; emits ``{p}out(channel_id, i, y)``.
    """
    bp, ap = _pad_ba(b, a)
    n = len(bp)
    zeros = ["0.0"] * (n - 1)
    seed = _df2t_select(bp, ap, "h.x", zeros)
    prev = [f"f.z{j}" for j in range(1, n)]
    step = _df2t_select(bp, ap, "h.x", prev)
    return f"""{p}f AS (
  SELECT h.channel_id, h.i,
         {seed}
  FROM {src} h WHERE h.i = 1
  UNION ALL
  SELECT h.channel_id, h.i,
         {step}
  FROM {p}f f JOIN {src} h ON h.channel_id = f.channel_id AND h.i = f.i + 1
),
{p}out AS MATERIALIZED (SELECT channel_id, i, y FROM {p}f)"""


def filtfilt_ctes(p: str, b, a, src: str, srcn: str) -> str:
    """CTE chain replaying SciPy-default ``filtfilt`` (kernels/iir.filtfilt:
    odd extension by 3*ntaps, forward pass seeded zi*ext[0], reverse,
    backward pass seeded zi*y[-1], reverse, strip pads) over
    ``src(channel_id, i, x)`` with counts ``srcn(channel_id, n)``.
    Emits ``{p}out(channel_id, i, y)``.  Channels with n <= padlen are
    excluded (the kernel raises for them; production channels are far
    longer).
    """
    bp, ap = _pad_ba(b, a)
    n = len(bp)
    pad = 3 * n
    zi = lfilter_zi(bp, ap)
    zi_seed = [f"({dlit(z)} * {{e}})" for z in zi]

    def seed(e):
        return _df2t_select(bp, ap, e, [s.format(e=e) for s in zi_seed])

    prev = [f"f.z{j}" for j in range(1, n)]

    def step(e):
        return _df2t_select(bp, ap, e, prev)

    return f"""{p}nt AS (SELECT channel_id, n FROM {srcn} WHERE n > {pad}),
{p}x1 AS (SELECT h.channel_id, h.x AS xfirst FROM {src} h JOIN {p}nt USING (channel_id) WHERE h.i = 1),
{p}xn AS (SELECT h.channel_id, h.x AS xlast FROM {src} h JOIN {p}nt nt ON h.channel_id = nt.channel_id AND h.i = nt.n),
{p}jg AS (SELECT CAST(UNNEST(RANGE(1, {pad + 1})) AS BIGINT) AS j),
{p}front AS (
  SELECT g.channel_id, g.j AS pos, 2.0 * g.xfirst - h.x AS e
  FROM (SELECT x1.channel_id, jg.j, x1.xfirst FROM {p}x1 x1 CROSS JOIN {p}jg jg) g
  JOIN {src} h ON h.channel_id = g.channel_id AND h.i = {pad + 2} - g.j
),
{p}mid AS (
  SELECT h.channel_id, h.i + {pad} AS pos, h.x AS e
  FROM {src} h JOIN {p}nt USING (channel_id)
),
{p}back AS (
  SELECT g.channel_id, g.n + {pad} + g.j AS pos, 2.0 * g.xlast - h.x AS e
  FROM (SELECT xn.channel_id, jg.j, xn.xlast, nt.n
        FROM {p}xn xn JOIN {p}nt nt USING (channel_id) CROSS JOIN {p}jg jg) g
  JOIN {src} h ON h.channel_id = g.channel_id AND h.i = g.n - g.j
),
{p}ext AS MATERIALIZED (
  SELECT * FROM {p}front UNION ALL SELECT * FROM {p}mid UNION ALL SELECT * FROM {p}back
),
{p}fw AS (
  SELECT e.channel_id, e.pos,
         {seed("e.e")}
  FROM {p}ext e WHERE e.pos = 1
  UNION ALL
  SELECT e.channel_id, e.pos,
         {step("e.e")}
  FROM {p}fw f JOIN {p}ext e ON e.channel_id = f.channel_id AND e.pos = f.pos + 1
),
{p}mt AS MATERIALIZED (SELECT channel_id, MAX(pos) AS m FROM {p}ext GROUP BY channel_id),
{p}yr AS MATERIALIZED (
  SELECT f.channel_id, mt.m + 1 - f.pos AS j, f.y AS e
  FROM {p}fw f JOIN {p}mt mt USING (channel_id)
),
{p}bw AS (
  SELECT e.channel_id, e.j,
         {seed("e.e")}
  FROM {p}yr e WHERE e.j = 1
  UNION ALL
  SELECT e.channel_id, e.j,
         {step("e.e")}
  FROM {p}bw f JOIN {p}yr e ON e.channel_id = f.channel_id AND e.j = f.j + 1
),
{p}out AS MATERIALIZED (
  SELECT b.channel_id, (mt.m + 1 - b.j) - {pad} AS i, b.y
  FROM {p}bw b JOIN {p}mt mt USING (channel_id)
  WHERE mt.m + 1 - b.j BETWEEN {pad + 1} AND mt.m - {pad}
)"""


# ---------------------------------------------------------------------------
# Production filter designs (mirror the operators' make_ba exactly)
# ---------------------------------------------------------------------------

# q_filt_butter: filt_butter(_uniform, 0.3*(HOURLY/2), 4, 'lowpass',
# n_buckets=32).  order 4 halves to 2 (extension.py:480-483 quirk); the
# bucketed kernel designs from round(sr, 9) of the inferred rate — the
# hourly grid's diffs are exactly 3600.0 (t0 + i*3600.0 stays exact at
# epoch magnitudes), so sr == 1/3600 and the rounded design is a global
# constant.
_SR_HOURLY_R9 = round(1.0 / 3600.0, 9)


def butter_prod_ba():
    wn = np.asarray(0.3 * (HOURLY / 2), dtype=np.float64) / (0.5 * _SR_HOURLY_R9)
    return _design.butter(2, wn, "lowpass")


def cfc_prod_ba():
    return _design.cfc_coefficients(0.05 * HOURLY, _SR_HOURLY_R9)


def aw_prod_ba():
    # 48 kHz index base: diffs of (i/48000) average to ~1/48000 and the
    # integer snap in _infer_sr lands exactly on 48000.0.
    return _design.a_weighting(48000.0)


def butter_chain_ba():
    # q_filt_chain / q_accessor_chain: filt_butter(8000.0, 4, 'lowpass')
    # on the 48 kHz base -> order 2, wn = 8000/24000.
    wn = np.asarray(8000.0, dtype=np.float64) / (0.5 * 48000.0)
    return _design.butter(2, wn, "lowpass")


def butter_chunked_ba():
    # q_filt_chunked: butter(2, 0.3) designed directly (no halving).
    return _design.butter(2, 0.3, "lowpass")


def sql_filt_butter() -> str:
    b, a = butter_prod_ba()
    return f"""
WITH RECURSIVE {SIG_CTE},
{UNIFORM_CTES},
{filtfilt_ctes("ff", b, a, "uni", "unt")}
SELECT o.channel_id, u.t, o.y AS value
FROM ffout o JOIN uni u ON u.channel_id = o.channel_id AND u.i = o.i
"""


def sql_filt_cfc() -> str:
    b, a = cfc_prod_ba()
    return f"""
WITH RECURSIVE {SIG_CTE},
{UNIFORM_CTES},
{filtfilt_ctes("ff", b, a, "uni", "unt")}
SELECT o.channel_id, u.t, o.y AS value
FROM ffout o JOIN uni u ON u.channel_id = o.channel_id AND u.i = o.i
"""


def sql_filt_chunked() -> str:
    # chunk_rows=4096 with ~700-sample channels: every channel is a single
    # chunk, so the chunked operator computes whole-channel filtfilt
    # (equality pinned in tests/test_chunked_filter.py).
    b, a = butter_chunked_ba()
    return f"""
WITH RECURSIVE {SIG_CTE},
{UNIFORM_CTES},
{filtfilt_ctes("ff", b, a, "uni", "unt")}
SELECT o.channel_id, u.t, o.y AS value
FROM ffout o JOIN uni u ON u.channel_id = o.channel_id AND u.i = o.i
"""


def sql_filt_a() -> str:
    b, a = aw_prod_ba()
    return f"""
WITH RECURSIVE {SIG_CTE},
{IDX_CTES},
{lfilter_ctes("ca", b, a, "idx")}
SELECT o.channel_id, x.t, o.y AS value
FROM caout o JOIN idx x ON x.channel_id = o.channel_id AND x.i = o.i
"""


def sql_filt_chain() -> str:
    # KernelPipeline: filtfilt(butter(2, 1/3)) then causal A-weighting,
    # fused in one task (pipeline/fused.py) — replay the two stages
    # back-to-back; the intermediate feeds the second recursion directly.
    b1, a1 = butter_chain_ba()
    b2, a2 = aw_prod_ba()
    return f"""
WITH RECURSIVE {SIG_CTE},
{IDX_CTES},
{filtfilt_ctes("st1", b1, a1, "idx", "idxn")},
mid1 AS MATERIALIZED (SELECT channel_id, i, y AS x FROM st1out),
{lfilter_ctes("st2", b2, a2, "mid1")}
SELECT o.channel_id, x.t, o.y AS value
FROM st2out o JOIN idx x ON x.channel_id = o.channel_id AND x.i = o.i
"""
