"""Sweep-log audits — the cross-scale row/time checks that caught
round 7's vacuous certifications and would-be-quadratic plans, now a
tool instead of ad-hoc one-liners (institutionalized per the verify
skill's "Sweep-log audits" section).

    python tools/sweep_audit.py <sf0.01.log> <sf0.1.log> \
        [--small-dir D] [--big-dir D] [--no-rerun]

Parses `[OK ] name: spark=N oracle=M   (T s)` lines from two
tools/run_oracle.py logs (small scale first) and applies:

1. VACUITY — spark=0 at the DRIVER scale (sf0.01): a 0=0 hash match
   certifies nothing; every query must carry a planted positive or a
   scale-robust predicate (precedents: dedup_cross_source r6;
   except_op and both Q11s r7).
2. TOTAL COLLAPSE — spark>0 at sf0.01 but spark=0 at sf0.1: the
   extreme anti-scaling case (a fixed threshold that fully empties as
   data grows). Neither the vacuity check (small-scale log only) nor
   the ratio check (its n_b > 0 guard) sees this form — it gets its
   own flag (ADVICE r8).
3. ANTI-SCALING — row count SHRINKS >2× while data grows 10×: the
   fixed-threshold fingerprint (a HAVING that empties as N grows).
4. SUPER-LINEAR — row count grows >30× at 10× data: a pair-stage
   explosion (quadratic banding). ×15–25 on dedup pair queries is
   normal planted-dup density; the allowlist names the adjudicated
   growers.
5. TIME-RATIO — wall grows >12× at 10× data (and the absolute time is
   non-trivial): a super-linear plan. dedup_embedding_exact is the one
   documented O(n²) ground-truth twin. Because sweep logs are often
   produced on a CONTENDED machine (batteries run pytest + sweeps
   back-to-back), a raw time flag is load-sensitive: rounds 7-8 each
   produced false flags that vanished on idle re-runs (graph_bfs
   ×17.4→×3.4; dedup_substring ×12.4→×1.6; text_perplexity
   ×25.7→×1.2). So the tool now SELF-ADJUDICATES (VERDICT r8 #4): on a
   would-be time flag it re-runs that single query pair once on the
   spot (same binary, seconds apart, loadavg recorded) and flags only
   if the ratio reproduces. Row-based audits are load-immune and never
   re-run.

Exit 1 iff any unallowlisted audit fires (after re-run adjudication
for time flags).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

_LINE = re.compile(
    r"\[OK \] (?P<name>\w+): spark=(?P<n>\d+) oracle=\S+\s+\((?P<t>[0-9.]+)s\)"
)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# rows-grow adjudications: (query, reason)
SUPER_LINEAR_OK = {
    "dedup_embedding_exact": "documented O(n²) ground-truth twin",
}
# time adjudications for plans that are KNOWN super-linear by design —
# the re-run pass handles load artifacts, so this list stays for plans
# whose elevated ratio is real and accepted.
TIME_RATIO_OK = {
    "dedup_embedding_exact": "documented O(n²) ground-truth twin",
    "sim_dedup_threshold_sweep": (
        "documented all-pairs exact calibration (cosine_dup_pairs "
        "kernel); its docstring pins the 100 TB contract — run on a "
        "sample, exactly as the sf-scale query does. x15.9 wall at "
        "x10 data is far below the O(n²) x100 envelope"
    ),
}

TIME_RATIO_THRESHOLD = 12.0


def parse(path: str) -> dict[str, tuple[int, float]]:
    out: dict[str, tuple[int, float]] = {}
    for line in open(path, errors="replace"):
        m = _LINE.search(line)
        if m:
            out[m.group("name")] = (int(m.group("n")), float(m.group("t")))
    return out


def _loadavg() -> str:
    try:
        return "%.2f/%.2f/%.2f" % os.getloadavg()
    except OSError:  # pragma: no cover
        return "?"


def rerun_pair(
    name: str, small_dir: str, big_dir: str
) -> tuple[float, float] | None:
    """Re-run ONE query at both scales seconds apart on the current
    machine state (the adjudication evidence rounds 7-8 gathered by
    hand: same binary, back-to-back, loadavg recorded). Returns
    (t_small, t_big) wall seconds, or None if either leg failed to
    produce a parseable [OK ] row (a failed leg is not adjudication —
    the original flag stands). A leg that HANGS counts as failed too:
    the subprocess carries a generous timeout so one stuck query can't
    block the whole audit (ADVICE r9)."""
    times: list[float] = []
    for d in (small_dir, big_dir):
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(_ROOT, "tools", "run_oracle.py"),
                 d, name],
                cwd=_ROOT, capture_output=True, text=True, timeout=900,
            )
        except subprocess.TimeoutExpired:
            return None
        rows = {
            m.group("name"): float(m.group("t"))
            for m in (_LINE.search(ln) for ln in p.stdout.splitlines())
            if m
        }
        if name not in rows:
            return None
        times.append(rows[name])
    return times[0], times[1]


def audit(
    s: dict[str, tuple[int, float]],
    b: dict[str, tuple[int, float]],
    rerun=None,
) -> int:
    """Run all five audits; return the flag count. ``rerun`` is the
    time-flag adjudicator — a callable (name) -> (t_s, t_b) | None; None
    disables re-running (the raw flag stands), used by tests and
    --no-rerun."""
    flags = 0
    for name, (n_s, t_s) in sorted(s.items()):
        if n_s == 0:
            print(f"[FLAG] {name}: VACUOUS — spark=0 at driver scale")
            flags += 1
    for name, (n_s, t_s) in sorted(s.items()):
        if name not in b:
            continue
        n_b, t_b = b[name]
        if n_s > 0 and n_b == 0:
            print(
                f"[FLAG] {name}: TOTAL COLLAPSE — rows {n_s} -> 0 at 10x "
                f"data (large-scale vacuity; fixed threshold fully empties)"
            )
            flags += 1
        elif n_s > 0 and n_b > 0 and n_s / n_b > 2:
            print(f"[FLAG] {name}: ANTI-SCALING — rows {n_s} -> {n_b} at 10x data")
            flags += 1
        if n_s > 0 and n_b / n_s > 30:
            if name in SUPER_LINEAR_OK:
                print(f"[ADJ ] {name}: rows x{n_b / n_s:.0f} — {SUPER_LINEAR_OK[name]}")
            else:
                print(f"[FLAG] {name}: SUPER-LINEAR rows {n_s} -> {n_b} (x{n_b / n_s:.0f})")
                flags += 1
        if t_s > 0.5 and t_b / t_s > TIME_RATIO_THRESHOLD and t_b > 5:
            if name in TIME_RATIO_OK:
                print(f"[ADJ ] {name}: wall x{t_b / t_s:.1f} — {TIME_RATIO_OK[name]}")
                continue
            if rerun is None:
                print(f"[FLAG] {name}: TIME-RATIO {t_s:.1f}s -> {t_b:.1f}s (x{t_b / t_s:.1f})")
                flags += 1
                continue
            # self-adjudication: load-sensitive check, re-measure once
            # on the spot and flag only if the ratio reproduces
            pair = rerun(name)
            if pair is None:
                print(
                    f"[FLAG] {name}: TIME-RATIO {t_s:.1f}s -> {t_b:.1f}s "
                    f"(x{t_b / t_s:.1f}; re-run FAILED, flag stands; "
                    f"loadavg {_loadavg()})"
                )
                flags += 1
                continue
            r_s, r_b = pair
            ratio = r_b / r_s if r_s > 0 else float("inf")
            if r_s > 0.5 and ratio > TIME_RATIO_THRESHOLD and r_b > 5:
                print(
                    f"[FLAG] {name}: TIME-RATIO reproduced on re-run — "
                    f"log x{t_b / t_s:.1f}, re-run {r_s:.1f}s -> {r_b:.1f}s "
                    f"(x{ratio:.1f}) at loadavg {_loadavg()}"
                )
                flags += 1
            else:
                print(
                    f"[ADJ ] {name}: TIME-RATIO x{t_b / t_s:.1f} in log did "
                    f"NOT reproduce — re-run {r_s:.1f}s -> {r_b:.1f}s "
                    f"(x{ratio:.1f}) at loadavg {_loadavg()} — load "
                    f"artifact, not a plan defect"
                )
    return flags


def main() -> int:
    small_dir = "/root/testdata/sf0.01"
    big_dir = "/root/testdata/sf0.1"
    args = sys.argv[1:]
    positional: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--small-dir":
            small_dir = args[i + 1]
            i += 2
        elif a == "--big-dir":
            big_dir = args[i + 1]
            i += 2
        elif a == "--no-rerun":
            i += 1
        else:
            positional.append(a)
            i += 1
    if len(positional) < 2:
        print(
            "usage: sweep_audit.py [--small-dir D] [--big-dir D] "
            "[--no-rerun] <small_sweep.log> <big_sweep.log>"
        )
        return 2
    small, big = positional[0], positional[1]
    s, b = parse(small), parse(big)
    if not s or not b:
        print(f"could not parse sweep logs ({len(s)}/{len(b)} rows)")
        return 1
    rerun = None
    if "--no-rerun" not in sys.argv:
        rerun = lambda name: rerun_pair(name, small_dir, big_dir)  # noqa: E731
    flags = audit(s, b, rerun=rerun)
    print(f"{flags} flagged / {len(s)} queries ({len(b)} at large scale)")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
