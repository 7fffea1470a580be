"""Driver-side plot exits (reference ``extension.py:331-369`` time-domain
``plot`` and ``extension.py:59-98`` freq-domain ``plot``).

Plotting is an endpoint, not a distributed op: these helpers collect ONE
channel (or a small named set) via the same driver-side path as
``collect_channel`` and render locally.  Two backends:

- :func:`plot_channel` / :func:`plot_spectrum` — matplotlib, mirroring the
  reference's axes formatting (xlabel, unit ylabel, grid, legend; loglog
  default for spectra).  Import-gated: matplotlib is not installed in this
  environment.
- :func:`save_plot_svg` — zero-dependency SVG line renderer so the exit
  point actually works here: recessive grid, neutral-ink labels, 2px
  series lines in a fixed-order colorblind-validated categorical palette,
  legend only when there are >= 2 series (a single series is named by the
  title).  Log-log mode for spectra.

Never pass an unbounded DataFrame: filter to the channels you want first —
the helpers collect what they are given.
"""

from __future__ import annotations

import html

from pyspark.sql import DataFrame

try:  # pragma: no cover - matplotlib absent in this environment
    import matplotlib.pyplot as plt
except Exception:  # ImportError or backend failures
    plt = None

# Fixed-order categorical palette (adjacent-pair CVD-validated, light
# surface).  Assigned by series order, never cycled past 8 — more than 8
# channels on one plot is a smell; split the plot instead.
PALETTE = [
    "#2a78d6", "#eb6834", "#1baf7a", "#eda100",
    "#e87ba4", "#008300", "#4a3aa7", "#e34948",
]
_INK = "#3d3d3a"
_MUTED = "#8a8a85"
_GRID = "#e7e7e2"


def _series(df: DataFrame, x_col: str, y_col: str, series_col: str):
    pdf = df.select(series_col, x_col, y_col).toPandas().sort_values([series_col, x_col])
    out = []
    for name, grp in pdf.groupby(series_col, sort=True):
        out.append((str(name), grp[x_col].to_numpy("float64"), grp[y_col].to_numpy("float64")))
    if len(out) > len(PALETTE):
        raise ValueError(
            f"{len(out)} series on one plot — filter to <= {len(PALETTE)} "
            "channels or split into several plots"
        )
    return out


def _require_mpl():
    if plt is None:
        raise ImportError(
            "matplotlib is required for plot_channel/plot_spectrum "
            "(pip install matplotlib); save_plot_svg works without it"
        )


def plot_channel(signals: DataFrame, channel_id: str | list[str], ax=None,
                 unit: str = "", **kwargs):
    """Time-domain plot (reference ``extension.py:331-369``): x=time,
    y=unit, grid on, legend, returns the axis."""
    _require_mpl()
    ids = [channel_id] if isinstance(channel_id, str) else list(channel_id)
    if ax is None:
        ax = plt.figure().add_subplot()
    for i, (name, x, y) in enumerate(
        _series(signals.filter(signals.channel_id.isin(ids)), "t", "value", "channel_id")
    ):
        ax.plot(x, y, label=name, color=PALETTE[i], linewidth=2, **kwargs)
    ax.set_xlabel("time")
    ax.set_ylabel(unit)
    ax.grid(True)
    ax.legend()
    return ax


def plot_spectrum(spectra: DataFrame, channel_id: str | list[str], ax=None,
                  unit: str = "", loglog: bool = True, **kwargs):
    """Freq-domain plot (reference ``extension.py:59-98``): loglog by
    default — PSDs are best read in log-log space."""
    _require_mpl()
    ids = [channel_id] if isinstance(channel_id, str) else list(channel_id)
    if ax is None:
        ax = plt.figure().add_subplot()
    for i, (name, x, y) in enumerate(
        _series(spectra.filter(spectra.channel_id.isin(ids)), "freq", "power", "channel_id")
    ):
        ax.plot(x, y, label=name, color=PALETTE[i], linewidth=2, **kwargs)
    ax.set_xlabel("frequency")
    ax.set_ylabel(unit)
    ax.grid(True)
    ax.legend()
    if loglog:
        ax.set_xscale("log")
        ax.set_yscale("log")
    return ax


def _nice_ticks(lo: float, hi: float, n: int = 5):
    import math

    if hi <= lo:
        hi = lo + 1.0
    raw = (hi - lo) / n
    mag = 10.0 ** math.floor(math.log10(raw))
    step = min((s for s in (1, 2, 5, 10) if s * mag >= raw), default=10) * mag
    first = math.ceil(lo / step) * step
    ticks = []
    v = first
    while v <= hi + 1e-12 * step:
        ticks.append(0.0 if abs(v) < step * 1e-9 else v)
        v += step
    return ticks


def _log_ticks(lo: float, hi: float):
    import math

    lo10, hi10 = math.floor(math.log10(lo)), math.ceil(math.log10(hi))
    decades = [10.0 ** e for e in range(lo10, hi10 + 1) if lo <= 10.0 ** e <= hi]
    if decades:
        return decades
    # Sub-decade range with no power of 10 inside (e.g. 2e-3..8e-3):
    # fall back to the 2/5 minor-tick multiples so the axis still gets
    # gridlines and labels.
    minors = [
        m * 10.0 ** e
        for e in range(lo10, hi10 + 1)
        for m in (2.0, 5.0)
        if lo <= m * 10.0 ** e <= hi
    ]
    return sorted(minors) if minors else [lo, hi]


def _fmt(v: float) -> str:
    if v != 0 and (abs(v) >= 1e5 or abs(v) < 1e-3):
        return f"{v:.0e}"
    return f"{v:g}"


def save_plot_svg(
    df: DataFrame,
    path: str,
    x_col: str = "t",
    y_col: str = "value",
    series_col: str = "channel_id",
    title: str = "",
    x_label: str = "",
    y_label: str = "",
    loglog: bool = False,
    width: int = 960,
    height: int = 540,
) -> str:
    """Render the collected frame to a standalone SVG file; returns path.

    For spectra pass ``x_col='freq', y_col='power', loglog=True`` (the
    freq-domain default the reference uses).  Nonpositive values are
    dropped in loglog mode.
    """
    import math

    import numpy as np

    series = _series(df, x_col, y_col, series_col)
    # Non-finite points (NULL values arrive as NaN) drop in BOTH modes:
    # in linear mode a single NaN previously poisoned the axis extrema
    # and emitted literal 'nan' polyline coordinates — a file that
    # writes fine and renders broken (a review finding).
    series = [
        (n, x[np.isfinite(x) & np.isfinite(y)], y[np.isfinite(x) & np.isfinite(y)])
        for n, x, y in series
    ]
    if loglog:
        series = [
            (n, x[(x > 0) & (y > 0)], y[(x > 0) & (y > 0)]) for n, x, y in series
        ]
    series = [(n, x, y) for n, x, y in series if len(x)]
    if not series:
        raise ValueError("nothing to plot")

    xs = [v for _, x, _ in series for v in x]
    ys = [v for _, _, y in series for v in y]
    xlo, xhi, ylo, yhi = min(xs), max(xs), min(ys), max(ys)
    if loglog:
        txlo, txhi = math.log10(xlo), math.log10(xhi)
        tylo, tyhi = math.log10(ylo), math.log10(yhi)
    else:
        txlo, txhi, tylo, tyhi = xlo, xhi, ylo, yhi
    if txhi == txlo:
        txhi += 1.0
    if tyhi == tylo:
        tyhi += 1.0
    # 4% padding on the value axis so lines don't sit on the frame
    pad = 0.04 * (tyhi - tylo)
    tylo, tyhi = tylo - pad, tyhi + pad

    ml, mr, mt, mb = 64, 16, 40 if title else 16, 44
    pw, ph = width - ml - mr, height - mt - mb

    def tx(v):
        t = math.log10(v) if loglog else v
        return ml + (t - txlo) / (txhi - txlo) * pw

    def ty(v):
        t = math.log10(v) if loglog else v
        return mt + ph - (t - tylo) / (tyhi - tylo) * ph

    xticks = _log_ticks(xlo, xhi) if loglog else _nice_ticks(xlo, xhi)
    yticks = (
        _log_ticks(ylo, yhi) if loglog else _nice_ticks(
            tylo, tyhi
        )
    )

    p = []
    p.append(
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}" font-family="sans-serif" font-size="12">'
    )
    p.append(f'<rect width="{width}" height="{height}" fill="#ffffff"/>')
    if title:
        p.append(
            f'<text x="{ml}" y="22" fill="{_INK}" font-size="14" '
            f'font-weight="600">{html.escape(title)}</text>'
        )
    # recessive grid + tick labels in muted ink
    for v in yticks:
        y = ty(v)
        p.append(f'<line x1="{ml}" y1="{y:.1f}" x2="{ml+pw}" y2="{y:.1f}" stroke="{_GRID}"/>')
        p.append(
            f'<text x="{ml-6}" y="{y+4:.1f}" fill="{_MUTED}" text-anchor="end">{_fmt(v)}</text>'
        )
    for v in xticks:
        x = tx(v)
        p.append(
            f'<line x1="{x:.1f}" y1="{mt}" x2="{x:.1f}" y2="{mt+ph}" stroke="{_GRID}"/>'
        )
        p.append(
            f'<text x="{x:.1f}" y="{mt+ph+16}" fill="{_MUTED}" text-anchor="middle">{_fmt(v)}</text>'
        )
    # axis frame (recessive)
    p.append(
        f'<rect x="{ml}" y="{mt}" width="{pw}" height="{ph}" fill="none" stroke="{_GRID}"/>'
    )
    # series lines: 2px, fixed-order palette
    for i, (_name, x, y) in enumerate(series):
        pts = " ".join(f"{tx(a):.1f},{ty(b):.1f}" for a, b in zip(x, y))
        p.append(
            f'<polyline points="{pts}" fill="none" stroke="{PALETTE[i]}" '
            f'stroke-width="2" stroke-linejoin="round"/>'
        )
    # legend only for >= 2 series (single series is named by the title);
    # labels wear neutral ink, the colored swatch carries identity.
    if len(series) >= 2:
        lx = ml + 8
        for i, (name, _x, _y) in enumerate(series):
            yy = mt + 10 + 18 * i
            p.append(
                f'<rect x="{lx}" y="{yy-9}" width="12" height="12" rx="2" fill="{PALETTE[i]}"/>'
            )
            p.append(
                f'<text x="{lx+18}" y="{yy+2}" fill="{_INK}">{html.escape(name)}</text>'
            )
    if x_label:
        p.append(
            f'<text x="{ml+pw/2:.0f}" y="{height-8}" fill="{_INK}" '
            f'text-anchor="middle">{html.escape(x_label)}</text>'
        )
    if y_label:
        p.append(
            f'<text x="14" y="{mt+ph/2:.0f}" fill="{_INK}" text-anchor="middle" '
            f'transform="rotate(-90 14 {mt+ph/2:.0f})">{html.escape(y_label)}</text>'
        )
    p.append("</svg>")
    svg = "\n".join(p)
    with open(path, "w") as f:
        f.write(svg)
    return path
