"""Leg-level NORMALIZED cross-round bench comparison (r13 verdict #5).

Compares two bench_detail.json files on normalization.queries_normalized
— the host-factor-cancelled per-leg numbers that are the adjudication
contract since r13 (PLANS.md round-13 bench section).  Prints a table of
legs whose normalized wall moved beyond the noise band, plus the
composed-gate legs annotated so a verdict reads gate changes as gate
changes.

Usage: python tools/norm_compare.py OLD_detail.json NEW_detail.json
"""

import json
import sys


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    old = json.load(open(old_p))
    new = json.load(open(new_p))
    on = old["normalization"]["queries_normalized"]
    nn = new["normalization"]["queries_normalized"]
    # a leg is a "gate change" only when it is composed on the NEW side
    # but was not yet composed on the OLD side (r15 added
    # filt_butter/rainflow; the old hardcoded since_r14 set missed
    # later generations).  A leg composed in BOTH rounds is
    # norm-comparable and must flag like any other — tagging it forever
    # would suppress genuine regressions on consolidated gates (an r15
    # review finding).
    def _composed(d):
        out = set()
        for key, legs in d.items():
            if key.startswith("composed_legs_since_r"):
                out |= set(legs)
        return out

    composed = _composed(new) - _composed(old)
    # Iterate the UNION of both sides: a leg present only in the OLD
    # file (retired, consolidated, or accidentally dropped from
    # bench.py) must surface as a row, not vanish from the adjudication
    # table (a review finding).
    rows = []
    for name in sorted(set(on) | set(nn)):
        ov, nv = on.get(name), nn.get(name)
        ratio = nv / ov if ov and nv else None
        rows.append((name, ov, nv, ratio))
    rows.sort(key=lambda r: -(r[3] or 0))
    print(f"{'leg':26s} {'old_norm':>9s} {'new_norm':>9s} {'ratio':>6s}")
    flagged = []
    for name, ov, nv, ratio in rows:
        tag = ""
        if name in composed:
            tag = "  [newly composed this round: now runs BOTH plan paths]"
        elif nv is None:
            tag = "  [leg GONE this round — consolidated or dropped?]"
        elif ov is None:
            tag = "  [new leg this round]"
        elif ratio is None:
            # both sides present but one is zero — a measurement that
            # collapsed must be flagged, not read as in-band (a review
            # finding)
            tag = "  <-- zero-valued measurement (collapsed leg?)"
            flagged.append(name)
        elif ratio > 1.5 or ratio < (1 / 1.5):
            tag = "  <-- beyond noise band"
            flagged.append(name)
        print(f"{name:26s} {ov if ov is not None else '-':>9} "
              f"{nv if nv is not None else '-':>9} "
              f"{f'{ratio:.2f}' if ratio else '-':>6}{tag}")
    ot = old["normalization"]["norm_total"]
    nt = new["normalization"]["norm_total"]
    rel = f" ({nt / ot:.3f}x)" if ot else ""
    print(f"\nnorm_total: {ot} -> {nt}{rel}")
    print(f"legs beyond 1.5x (excluding composed/new/gone): {flagged or 'none'}")


if __name__ == "__main__":
    main()
