"""Verification tooling honesty: a mistyped check_oracle selector must
fail loudly, never print a green transcript over zero queries
(VERDICT r04 'What's wrong' #4)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools import check_oracle


def test_unknown_query_name_is_a_hard_error(monkeypatch):
    monkeypatch.setattr(
        sys, "argv", ["check_oracle.py", "/root/testdata/sf0.001", "bogus_q"]
    )
    # returns before any Spark/DuckDB work: exit code 2, not PASS(0)
    assert check_oracle.main() == 2


def test_mixed_known_and_unknown_names_still_error(monkeypatch):
    monkeypatch.setattr(
        sys,
        "argv",
        ["check_oracle.py", "/root/testdata/sf0.001", "q1_pickup_count", "nope"],
    )
    assert check_oracle.main() == 2


def test_make_ledger_covers_every_registry_entry(tmp_path, monkeypatch):
    """LEDGER.md generation: every queries() entry gets a row, rows for
    driver-green entries carry their latest round, and entries never
    seen by the driver are flagged as awaiting their first window."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/make_ledger.py"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-500:]
    import __spark_entry__ as entry

    text = open("/root/repo/LEDGER.md").read()
    for name in entry.queries():
        assert f"| {name} |" in text, name
