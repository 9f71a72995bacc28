#!/usr/bin/env python3
"""Scaling-exponent table for SURVEY §7a.1 from Bench JSON lines.

Usage: tools/exponents.py BENCH_SF0.1 BENCH_SF1.0 [BENCH_SF3.0] [BENCH_F32]

Each argument is a file containing (anywhere in it) one Bench JSON line
(`{"metric":"total",...}` — raw Bench stdout logs work). Prints the
per-headliner exponent table, worst first:
  e(0.1→1) = log10(t_sf1 / t_sf0.1)        (a 10× data step)
  e(1→3)   = log(t_sf3 / t_sf1) / log(3)   (a 3× data step)
e < 1 is sublinear. The two-step curve separates true asymptotes from
the ~0.4-0.6 s fixed job overhead that flattens small queries' first
step. The optional 4th file is the 32-part-file sf1.0 layout (GenScale
`files 32`); keys whose flat-vs-f32 delta exceeds 10% are listed —
scan-bound queries whose single-file exponent understates a real
cluster's split-parallel scan.
"""
import json, math, re, sys


def load(p):
    m = re.search(r'\{"metric".*\}', open(p).read())
    if not m:
        sys.exit(f"no Bench JSON line in {p}")
    return json.loads(m.group(0))


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    b01, b10 = load(sys.argv[1]), load(sys.argv[2])
    b30 = load(sys.argv[3]) if len(sys.argv) > 3 else None
    bf32 = load(sys.argv[4]) if len(sys.argv) > 4 else None

    # Bench emits %.3f seconds, so a sub-millisecond timing rounds to
    # 0.000; floor ratio denominators at one emit quantum instead of
    # dividing by zero, and test presence with `is not None` so a real
    # 0.0 timing is not misread as missing.
    floor = lambda t: max(t, 0.001)
    rows = []
    for q, t10 in b10["queries"].items():
        t01 = b01["queries"].get(q)
        if t01 is None:
            continue
        e1 = math.log10(floor(t10) / floor(t01))
        t30 = b30["queries"].get(q) if b30 else None
        e3 = (math.log(floor(t30) / floor(t10)) / math.log(3)
              if t30 is not None else float("nan"))
        rows.append((q, t01, t10,
                     t30 if t30 is not None else float("nan"), e1, e3))

    rows.sort(key=lambda r: -(r[5] if r[5] == r[5] else r[4]))
    print(f"{'query':32s} {'sf0.1':>7s} {'sf1.0':>8s} {'sf3.0':>8s}"
          f" {'e(0.1→1)':>9s} {'e(1→3)':>8s}")
    for q, t01, t10, t30, e1, e3 in rows:
        print(f"{q:32s} {t01:7.2f} {t10:8.2f} {t30:8.2f} {e1:9.2f} {e3:8.2f}")

    line = f"\ntotals: sf0.1 {b01['value']:.1f}s  sf1.0 {b10['value']:.1f}s"
    if b30:
        line += f"  sf3.0 {b30['value']:.1f}s"
    print(line)
    print(f"suite ratio 0.1→1 (10× data): {b10['value'] / b01['value']:.2f}")
    if b30:
        print(f"suite ratio 1→3  (3× data): {b30['value'] / b10['value']:.2f}")

    if bf32:
        print("\nf32 (32-part-file sf1.0) vs flat sf1.0, |delta| > 10%:")
        for q, t10 in b10["queries"].items():
            tf = bf32["queries"].get(q)
            if tf is None:
                continue
            d = (t10 - tf) / floor(t10) * 100
            if abs(d) > 10:
                print(f"  {q:32s} flat {t10:7.2f}  f32 {tf:7.2f}  ({d:+.0f}%)")


if __name__ == "__main__":
    main()
