"""Machine-condition gauge between two committed bench details.

Round-over-round wall comparisons on this box are dominated by machine
condition (README r09-r12 notes: same-code whole-registry ratios have
spanned 0.98x-1.5x between same-day runs). The standing methodology —
used by the README's performance notes and the judge's verdicts — is a
MEDIAN wall ratio across the UNTOUCHED entries above a noise floor,
with changed entries priced against that gauge rather than raw. This
tool makes the computation mechanical and identical for everyone.

Usage:
    python tools/bench_gauge.py OLD_DETAIL.json NEW_DETAIL.json \
        [--changed a,b,c] [--floor 0.2]

Prints the gauge (median + p90 over untouched entries with old wall >
floor), each changed entry's raw and gauge-adjusted delta, and the
worst untouched movers (candidates for a dedicated idle-box spread —
see the README's three-run spread methodology).
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    argv = sys.argv[1:]
    args: list[str] = []
    changed: set[str] = set()
    floor = 0.2
    i = 0
    while i < len(argv):
        if argv[i] == "--changed" and i + 1 < len(argv):
            changed = {c for c in argv[i + 1].split(",") if c}
            i += 2
        elif argv[i] == "--floor" and i + 1 < len(argv):
            floor = float(argv[i + 1])
            i += 2
        else:
            args.append(argv[i])
            i += 1
    if len(args) != 2:
        raise SystemExit(__doc__)
    old = json.load(open(args[0]))["queries"]
    new = json.load(open(args[1]))["queries"]
    unknown = changed - set(new)
    if unknown:
        raise SystemExit(f"--changed names not in NEW detail: {sorted(unknown)}")
    ratios = sorted(
        (new[q] / old[q], q)
        for q in new
        if q in old and q not in changed and old[q] > floor
    )
    if not ratios:
        raise SystemExit("no untouched entries above the floor")
    vals = [r for r, _ in ratios]
    med = statistics.median(vals)
    p90 = vals[min(len(vals) - 1, int(0.9 * len(vals)))]
    print(
        f"gauge: median {med:.2f}x, p90 {p90:.2f}x over {len(vals)}"
        f" untouched entries (old wall > {floor}s)"
    )
    if changed:
        print("\nchanged entries (raw -> gauge-adjusted):")
        for q in sorted(changed):
            if q not in old:
                print(f"  {q}: NEW ({new[q]:.2f}s)")
                continue
            adj = new[q] / med
            flag = " <-- above p90 band" if new[q] / old[q] > p90 else ""
            print(
                f"  {q}: {old[q]:.2f} -> {new[q]:.2f}s raw"
                f" ({new[q] / old[q]:.2f}x), {adj:.2f}s adj"
                f" ({adj / old[q]:.2f}x){flag}"
            )
    above = [(r, q) for r, q in ratios if r > p90]
    print(f"\nuntouched movers above the p90 band ({len(above)}):")
    for r, q in sorted(above, reverse=True):
        print(f"  {q}: {old[q]:.2f} -> {new[q]:.2f}s ({r:.2f}x)")


if __name__ == "__main__":
    main()
