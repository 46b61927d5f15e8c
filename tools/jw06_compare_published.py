"""Compare a completed JW06 wave-run log against the published curves.

Jablonowski & Williamson (2006, QJRMS 132:2943) Fig. 6 / Table 2 give
the surface-pressure-minimum evolution of the baroclinic wave for four
reference dynamical cores at comparable (~1 deg) resolution.  Their
initial surface pressure is uniform 1000 hPa, so the comparable number
from our runs is 1000 + ps_eddy_min (examples/jw06_baroclinic_slz.py
diagnostics docstring: the absolute z=0 pressure carries the +-300 m
eta=1 surface undulation in its zonal mean).

Published reference-core envelope (read off Fig. 6, low-res members):
  day 4: ~997 hPa     day 6: ~980 hPa
  day 8: 940-960 hPa  day 10: <930 hPa
Growth-phase timing at coarse resolution lags by up to ~1 day in the
slower members; the qualitative contract is monotone deepening through
day 8+ with the day-8 value under ~975 hPa and continued deepening to
day 10.

Usage: python tools/jw06_compare_published.py jw06_r5_wave_*.log
"""

from __future__ import annotations

import re
import sys

PUB = {4: 997.0, 6: 980.0, 8: 950.0, 10: 925.0}


def parse(path):
    rows = {}
    pat = re.compile(r"^\s*(\d+)\s+([\d.]+)\s+([\d.]+)\s+([\d.]+)"
                     r"\s+([\d.]+)\s+(-?[\d.]+)\s*$")
    for line in open(path):
        m = pat.match(line)
        if m:
            d = int(m.group(1))
            rows[d] = {
                "u_max": float(m.group(2)),
                "v_max": float(m.group(3)),
                "ps_min": float(m.group(4)),
                "ps_max": float(m.group(5)),
                "ps_eddy": float(m.group(6)),
            }
    return rows


def main():
    for path in sys.argv[1:]:
        rows = parse(path)
        if not rows:
            print(f"{path}: no day rows")
            continue
        print(f"== {path} (days 0-{max(rows)}) ==")
        print(" day  1000+eddy  published   delta   |v|max  u_max")
        for d in sorted(rows):
            r = rows[d]
            ours = 1000.0 + r["ps_eddy"]
            pub = PUB.get(d)
            pd = f"{pub:8.1f} {ours - pub:+7.1f}" if pub else " " * 16
            print(f"{d:4d} {ours:10.2f} {pd}  {r['v_max']:7.2f} "
                  f"{r['u_max']:6.2f}")


if __name__ == "__main__":
    main()
