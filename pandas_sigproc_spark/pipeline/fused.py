"""Kernel fusion: chain per-channel IIR stages into ONE ``applyInPandas``.

SURVEY.md §4.2's identified Catalyst gap: consecutive
``groupBy("channel_id").applyInPandas`` calls on the same key re-shuffle
and re-cross the JVM↔Arrow boundary once per operator, even though every
stage wants the identical partitioning.  Catalyst cannot fuse opaque
Python UDFs, so the fusion lives in our API layer instead: a
``KernelPipeline`` collects filter stages (each just a coefficient
designer + causal/zero-phase flag) and emits a single grouped kernel that
runs all stages back-to-back on the in-memory NumPy arrays.

k chained filters this way cost ONE shuffle + ONE Arrow round-trip
instead of k of each — at 100 TB the shuffle is the dominant term, so the
fused plan is ~k× cheaper in I/O while producing bit-identical values
(the stages run in the same order on the same float64 arrays the unfused
operators would see).

Reference parity: composes the same operators as chained accessor calls
like ``series.timedomain.filt_butter(...).timedomain.filt_a()``
(``extension.py:452-567``), which the reference executes as k eager
whole-array passes.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from pandas_sigproc_spark.kernels import design as _design
from pandas_sigproc_spark.kernels import iir as _iir
from pandas_sigproc_spark.kernels import iir_batch as _iirb

_OUT_SCHEMA = "channel_id string, t double, value double"


class KernelPipeline:
    """Builder for a fused chain of per-channel IIR filter stages.

    Each ``filt_*`` method appends a stage and returns ``self``;
    ``apply(df)`` emits the single fused ``applyInPandas`` operator.
    Stage semantics (coefficient design, order handling, causal vs
    zero-phase) are identical to the standalone operators in
    ``operators/filters.py``.
    """

    def __init__(self) -> None:
        self._stages: list[tuple[str, object, bool]] = []

    # -- stage builders (same design rules as operators/filters.py) --------

    def filt_butter(self, cutoff, order: int, btype: str) -> "KernelPipeline":
        order_used = math.ceil(order / 2)

        def make_ba(sr: float):
            wn = np.asarray(cutoff, dtype=np.float64) / (0.5 * sr)
            return _design.butter(order_used, wn, btype)

        self._stages.append((f"butter({order},{btype})", make_ba, True))
        return self

    def filt_cfc(self, cfc: float) -> "KernelPipeline":
        def make_ba(sr: float):
            return _design.cfc_coefficients(cfc, sr)

        self._stages.append((f"cfc({cfc})", make_ba, True))
        return self

    def filt_a(self) -> "KernelPipeline":
        def make_ba(sr: float):
            return _design.a_weighting(sr)

        self._stages.append(("a_weighting", make_ba, False))
        return self

    # -- execution ---------------------------------------------------------

    def apply(self, df: DataFrame, n_buckets: int | None = None) -> DataFrame:
        """Run all stages in one grouped kernel.

        ``n_buckets=None``: one Arrow group per channel.  ``n_buckets=K``:
        channels hash into K buckets and each task runs every stage over
        its bucket as a (channels × time) matrix — the same two modes as
        ``operators/filters.py``, chosen by channel length at scale.
        """
        if not self._stages:
            raise ValueError("KernelPipeline has no stages")
        stages = list(self._stages)

        def run_stages(sr: float, Y: np.ndarray) -> np.ndarray:
            # Y: (channels, time) matrix; stages share one coefficient
            # design per (samplerate, stage) pair.
            for _name, make_ba, zero_phase in stages:
                b, a = make_ba(sr)
                Y = (
                    _iirb.filtfilt_batch(b, a, Y)
                    if zero_phase
                    else _iirb.lfilter_batch(b, a, Y)
                )
            return Y

        def run_stages_1d(sr: float, y: np.ndarray) -> np.ndarray:
            for _name, make_ba, zero_phase in stages:
                b, a = make_ba(sr)
                y = _iir.filtfilt(b, a, y) if zero_phase else _iir.lfilter(b, a, y)
            return y

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["channel_id", "t"])
            pieces = []
            groups: dict = {}
            for cid, grp in pdf.groupby("channel_id", sort=False):
                t = grp["t"].to_numpy(dtype=np.float64)
                y = grp["value"].to_numpy(dtype=np.float64)
                sr = _infer_sr(t)
                groups.setdefault((len(t), round(sr, 9)), []).append((cid, t, y))
            for (_n, sr), members in groups.items():
                if len(members) == 1:
                    cid, t, y = members[0]
                    out = run_stages_1d(sr, y)
                    pieces.append(
                        pd.DataFrame({"channel_id": cid, "t": t, "value": out})
                    )
                    continue
                X = np.stack([y for _, _, y in members])
                Y = run_stages(sr, X)
                for row, (cid, t, _y) in enumerate(members):
                    pieces.append(
                        pd.DataFrame({"channel_id": cid, "t": t, "value": Y[row]})
                    )
            return pd.concat(pieces, ignore_index=True)

        src = df.select("channel_id", "t", "value")
        if n_buckets is None:
            def single(pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.sort_values("t")
                t = pdf["t"].to_numpy(dtype=np.float64)
                y = pdf["value"].to_numpy(dtype=np.float64)
                out = run_stages_1d(_infer_sr(t), y)
                return pd.DataFrame(
                    {"channel_id": pdf["channel_id"].iloc[0], "t": t, "value": out}
                )

            return src.groupBy("channel_id").applyInPandas(single, _OUT_SCHEMA)
        bucketed = src.withColumn("_b", F.abs(F.hash("channel_id")) % int(n_buckets))
        return bucketed.groupBy("_b").applyInPandas(
            lambda pdf: kernel(pdf.drop(columns=["_b"])), _OUT_SCHEMA
        )

    def lineage_name(self, name: str) -> str:
        """Reference-style derived name, innermost stage first
        (``extension.py:494, 536, 564``)."""
        for stage, _make_ba, _zp in self._stages:
            name = f"{stage.split('(')[0]}({name})"
        return name


def _infer_sr(t: np.ndarray) -> float:
    from pandas_sigproc_spark.operators.filters import _infer_sr as _f

    return _f(t)
