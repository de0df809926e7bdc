"""Unit tests for tools/sweep_audit.py — the cross-scale sweep-log
auditor (vacuity / total collapse / anti-scaling / super-linear /
self-adjudicating time-ratio).

The VERDICT r8 #4 acceptance scenarios are covered directly:
- a load-artifact time flag (log ratio high, re-run ratio low)
  produces 0 flags without manual adjudication;
- a genuinely super-linear case (re-run reproduces) still flags.
The ADVICE r8 scenario — rows N>0 at sf0.01 collapsing to exactly 0 at
sf0.1 — must flag even though the old anti-scaling guard (n_b > 0)
excluded it.
"""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "sweep_audit",
    os.path.join(os.path.dirname(__file__), "..", "tools", "sweep_audit.py"),
)
sweep_audit = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(sweep_audit)  # type: ignore[union-attr]


def _run(s, b, rerun=None, capsys=None):
    flags = sweep_audit.audit(s, b, rerun=rerun)
    out = capsys.readouterr().out if capsys else ""
    return flags, out


def test_clean_logs_no_flags(capsys):
    s = {"q": (100, 1.0)}
    b = {"q": (1000, 8.0)}
    flags, out = _run(s, b, capsys=capsys)
    assert flags == 0
    assert "[FLAG]" not in out


def test_vacuity_flags(capsys):
    flags, out = _run({"q": (0, 0.1)}, {"q": (0, 0.1)}, capsys=capsys)
    assert flags == 1
    assert "VACUOUS" in out


def test_total_collapse_flags(capsys):
    """ADVICE r8: N>0 at sf0.01 -> exactly 0 at sf0.1 was flagged by
    neither vacuity (small-scale only) nor anti-scaling (n_b > 0
    guard) — it now gets its own flag."""
    flags, out = _run({"q": (50, 0.5)}, {"q": (0, 0.5)}, capsys=capsys)
    assert flags == 1
    assert "TOTAL COLLAPSE" in out


def test_anti_scaling_flags(capsys):
    flags, out = _run({"q": (100, 0.5)}, {"q": (10, 0.5)}, capsys=capsys)
    assert flags == 1
    assert "ANTI-SCALING" in out


def test_super_linear_rows_flags(capsys):
    flags, out = _run({"q": (10, 0.5)}, {"q": (500, 0.5)}, capsys=capsys)
    assert flags == 1
    assert "SUPER-LINEAR" in out


def test_super_linear_allowlisted(capsys):
    flags, out = _run(
        {"dedup_embedding_exact": (10, 0.5)},
        {"dedup_embedding_exact": (500, 0.5)},
        capsys=capsys,
    )
    assert flags == 0
    assert "[ADJ ]" in out


def test_time_ratio_load_artifact_self_adjudicates(capsys):
    """VERDICT r8 #4 scenario 1: a contended sweep log shows x25 wall
    growth, but the on-the-spot re-run measures x8 — no flag, no manual
    adjudication needed."""
    s = {"q": (100, 1.0)}
    b = {"q": (1000, 25.0)}  # x25 in the (contended) log
    flags, out = _run(s, b, rerun=lambda name: (1.0, 8.0), capsys=capsys)
    assert flags == 0
    assert "did NOT reproduce" in out
    assert "loadavg" in out


def test_time_ratio_genuine_still_flags(capsys):
    """VERDICT r8 #4 scenario 2: a genuinely super-linear plan
    reproduces its ratio on the idle re-run and still flags."""
    s = {"q": (100, 1.0)}
    b = {"q": (1000, 25.0)}
    flags, out = _run(s, b, rerun=lambda name: (1.0, 22.0), capsys=capsys)
    assert flags == 1
    assert "reproduced on re-run" in out


def test_time_ratio_rerun_failure_keeps_flag(capsys):
    """A failed re-run is not adjudication — the original flag stands."""
    s = {"q": (100, 1.0)}
    b = {"q": (1000, 25.0)}
    flags, out = _run(s, b, rerun=lambda name: None, capsys=capsys)
    assert flags == 1
    assert "re-run FAILED" in out


def test_time_ratio_no_rerun_mode_flags_raw(capsys):
    """--no-rerun (rerun=None) keeps the legacy raw-flag behavior."""
    s = {"q": (100, 1.0)}
    b = {"q": (1000, 25.0)}
    flags, out = _run(s, b, rerun=None, capsys=capsys)
    assert flags == 1
    assert "TIME-RATIO" in out


def test_time_ratio_allowlisted_never_reruns(capsys):
    """Adjudicated-by-design plans (documented O(n²) twins) never
    trigger a re-run — the allowlist reason prints instead."""
    calls = []

    def rerun(name):  # pragma: no cover - must not be called
        calls.append(name)
        return (1.0, 25.0)

    s = {"dedup_embedding_exact": (100, 1.0)}
    b = {"dedup_embedding_exact": (1000, 25.0)}
    flags, out = _run(s, b, rerun=rerun, capsys=capsys)
    assert flags == 0
    assert not calls
    assert "[ADJ ]" in out


def test_parse_round_trip(tmp_path):
    log = tmp_path / "sweep.log"
    log.write_text(
        "[OK ] tpch_q1: spark=6 oracle=6   (0.8s)\n"
        "noise line\n"
        "[OK ] dedup_exact: spark=120 oracle=120   (1.25s)\n"
    )
    parsed = sweep_audit.parse(str(log))
    assert parsed == {"tpch_q1": (6, 0.8), "dedup_exact": (120, 1.25)}


def test_rerun_pair_integration():
    """The self-adjudication path end-to-end: rerun_pair really invokes
    tools/run_oracle.py for one fast query at two scales and parses the
    wall seconds back out. Uses sf0.001 for both legs (the adjudicator
    compares a ratio, so the dirs just need to exist and certify)."""
    pair = sweep_audit.rerun_pair(
        "count_star", "/root/testdata/sf0.001", "/root/testdata/sf0.001"
    )
    assert pair is not None
    t_s, t_b = pair
    assert t_s > 0 and t_b > 0


def test_rerun_pair_unknown_query_returns_none():
    """A query the oracle runner cannot certify yields None — the
    caller keeps the original flag (fail-closed)."""
    assert (
        sweep_audit.rerun_pair(
            "no_such_query_zz", "/root/testdata/sf0.001", "/root/testdata/sf0.001"
        )
        is None
    )


def test_main_usage_on_missing_args(monkeypatch, capsys):
    """Missing log paths print a usage line and exit 2 instead of a
    bare IndexError (ADVICE r9)."""
    monkeypatch.setattr(sweep_audit.sys, "argv", ["sweep_audit.py"])
    assert sweep_audit.main() == 2
    assert "usage:" in capsys.readouterr().out


def test_rerun_pair_timeout_counts_as_failed_leg(monkeypatch):
    """A hung re-run leg expires the subprocess timeout and returns
    None — the original flag stands instead of blocking the audit
    forever (ADVICE r9)."""
    import subprocess as sp

    def _hang(*a, **kw):
        assert kw.get("timeout"), "rerun_pair must pass a timeout"
        raise sp.TimeoutExpired(cmd=a[0], timeout=kw["timeout"])

    monkeypatch.setattr(sweep_audit.subprocess, "run", _hang)
    assert sweep_audit.rerun_pair("q", "/x", "/y") is None
