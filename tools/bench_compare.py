"""Compare two bench.py JSON artifacts query by query.

Usage: python tools/bench_compare.py BENCH_old.json BENCH_new.json [threshold]

Prints per-query ratios for the shared query set (new/old), the median
ratio (the host-noise estimator — a uniform shift means load, not plans),
queries exceeding ``threshold`` x median (true regressions after noise
normalization), and the added/removed sets. Exits 0 always — this is a
triage report, not a gate.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accept either a bare bench.py JSON line or a driver BENCH_r{N}.json
    wrapper, whose "tail" holds the (possibly front-TRUNCATED) bench line —
    per-query timings are recovered by regex, so a clipped prefix only
    loses the queries that fell off the front."""
    import re

    with open(path) as f:
        txt = f.read()
    try:
        d = json.loads(txt)
    except json.JSONDecodeError:
        d = None
        for line in reversed([ln for ln in txt.splitlines() if ln.strip()]):
            try:
                d = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    if d is None:
        raise SystemExit(f"no JSON found in {path}")
    if "queries" in d:
        return d
    if "tail" in d:
        inner = d["tail"]
        queries = {
            m.group(1): float(m.group(2))
            for m in re.finditer(r'\\?"(q_\w+)\\?":\s*(-?[0-9.]+)', inner)
        }
        out = {"queries": queries}
        for key in ("load_avg",):
            m = re.search(r'\\?"' + key + r'\\?":\s*(\[[^\]]*\])', inner)
            if m:
                out[key] = json.loads(m.group(1).replace('\\"', '"'))
        return out
    raise SystemExit(f"no bench queries found in {path}")


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    oq = {k: v for k, v in old["queries"].items() if v and v > 0}
    nq = {k: v for k, v in new["queries"].items() if v and v > 0}
    shared = sorted(set(oq) & set(nq))
    ratios = sorted(nq[k] / oq[k] for k in shared)
    if not ratios:
        med = 1.0
    elif len(ratios) % 2:
        med = ratios[len(ratios) // 2]
    else:
        # true median (mean of middle two): the upper-median shortcut
        # lets a regressed query set its own baseline on small shared
        # sets ([1.0, 2.0] -> med 2.0 -> the 2x regression never flags)
        med = (ratios[len(ratios) // 2 - 1] + ratios[len(ratios) // 2]) / 2
    print(f"shared queries: {len(shared)}  median new/old ratio: {med:.3f}")
    if new.get("load_avg") or old.get("load_avg"):
        print(f"load_avg old={old.get('load_avg')} new={new.get('load_avg')}")
    print(f"sum old={sum(oq[k] for k in shared):.1f}s "
          f"new={sum(nq[k] for k in shared):.1f}s")
    flagged = [
        (k, oq[k], nq[k], nq[k] / oq[k] / med)
        for k in shared
        if nq[k] / oq[k] > threshold * med and nq[k] > 0.3
    ]
    if flagged:
        print(f"\nqueries > {threshold}x the median ratio (noise-normalized):")
        for k, a, b, r in sorted(flagged, key=lambda t: -t[3]):
            print(f"  {k:34s} {a:7.3f}s -> {b:7.3f}s  ({r:.2f}x normalized)")
    else:
        print("\nno noise-normalized regressions above threshold")
    added, removed = sorted(set(nq) - set(oq)), sorted(set(oq) - set(nq))
    if added:
        print(f"\nadded ({len(added)}): " + ", ".join(
            f"{k}={nq[k]}s" for k in added))
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")


if __name__ == "__main__":
    main()
