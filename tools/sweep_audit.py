"""Sweep-log audits — the four row/time cross-scale checks that caught
round 7's vacuous certifications and would-be-quadratic plans, now a
tool instead of ad-hoc one-liners (institutionalized per the verify
skill's "Sweep-log audits" section).

    python tools/sweep_audit.py <sf0.01.log> <sf0.1.log>

Parses `[OK ] name: spark=N oracle=M   (T s)` lines from two
tools/run_oracle.py logs (small scale first) and applies:

1. VACUITY — spark=0 at the DRIVER scale (sf0.01): a 0=0 hash match
   certifies nothing; every query must carry a planted positive or a
   scale-robust predicate (precedents: dedup_cross_source r6;
   except_op and both Q11s r7).
2. ANTI-SCALING — row count SHRINKS >2× while data grows 10×: the
   fixed-threshold fingerprint (a HAVING that empties as N grows).
3. SUPER-LINEAR — row count grows >30× at 10× data: a pair-stage
   explosion (quadratic banding). ×15–25 on dedup pair queries is
   normal planted-dup density; the allowlist names the adjudicated
   growers.
4. TIME-RATIO — wall grows >12× at 10× data (and the absolute time is
   non-trivial): a super-linear plan. dedup_embedding_exact is the one
   documented O(n²) ground-truth twin.

Exit 1 iff any unallowlisted audit fires.
"""

from __future__ import annotations

import re
import sys

_LINE = re.compile(
    r"\[OK \] (?P<name>\w+): spark=(?P<n>\d+) oracle=\S+\s+\((?P<t>[0-9.]+)s\)"
)

# rows-grow adjudications: (query, reason)
SUPER_LINEAR_OK = {
    "dedup_embedding_exact": "documented O(n²) ground-truth twin",
}
# time adjudications
TIME_RATIO_OK = {
    "dedup_embedding_exact": "documented O(n²) ground-truth twin",
    "sim_dedup_threshold_sweep": (
        "documented all-pairs exact calibration (cosine_dup_pairs "
        "kernel); its docstring pins the 100 TB contract — run on a "
        "sample, exactly as the sf-scale query does. x15.9 wall at "
        "x10 data is far below the O(n²) x100 envelope"
    ),
    "graph_bfs": (
        "iterative localCheckpoint query (fixed supersteps ≈ dozens of "
        "scheduler rounds) — wall is scheduler-jitter-dominated on a "
        "shared host: same-binary same-day sweeps measured 9.6→3.1 s "
        "at sf0.01 and 32.9→53.9 s at sf0.1 (pair ratios x3.4 vs "
        "x17.4); ROWS scale exactly linear (150→1500 at 10x data), "
        "and the r7 graph-tier datapoint (12.8M nodes, SCALE.md) is "
        "the compute-scaling evidence"
    ),
}


def parse(path: str) -> dict[str, tuple[int, float]]:
    out: dict[str, tuple[int, float]] = {}
    for line in open(path, errors="replace"):
        m = _LINE.search(line)
        if m:
            out[m.group("name")] = (int(m.group("n")), float(m.group("t")))
    return out


def main() -> int:
    small, big = sys.argv[1], sys.argv[2]
    s, b = parse(small), parse(big)
    if not s or not b:
        print(f"could not parse sweep logs ({len(s)}/{len(b)} rows)")
        return 1
    flags = 0
    for name, (n_s, t_s) in sorted(s.items()):
        if n_s == 0:
            print(f"[FLAG] {name}: VACUOUS — spark=0 at driver scale")
            flags += 1
    for name, (n_s, t_s) in sorted(s.items()):
        if name not in b:
            continue
        n_b, t_b = b[name]
        if n_s > 0 and n_b > 0 and n_s / n_b > 2:
            print(f"[FLAG] {name}: ANTI-SCALING — rows {n_s} -> {n_b} at 10x data")
            flags += 1
        if n_s > 0 and n_b / n_s > 30:
            if name in SUPER_LINEAR_OK:
                print(f"[ADJ ] {name}: rows x{n_b / n_s:.0f} — {SUPER_LINEAR_OK[name]}")
            else:
                print(f"[FLAG] {name}: SUPER-LINEAR rows {n_s} -> {n_b} (x{n_b / n_s:.0f})")
                flags += 1
        if t_s > 0.5 and t_b / t_s > 12 and t_b > 5:
            if name in TIME_RATIO_OK:
                print(f"[ADJ ] {name}: wall x{t_b / t_s:.1f} — {TIME_RATIO_OK[name]}")
            else:
                print(f"[FLAG] {name}: TIME-RATIO {t_s:.1f}s -> {t_b:.1f}s (x{t_b / t_s:.1f})")
                flags += 1
    print(f"{flags} flagged / {len(s)} queries ({len(b)} at large scale)")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
