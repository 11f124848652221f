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
