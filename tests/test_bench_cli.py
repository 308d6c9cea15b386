"""bench.py CLI argument handling (pure-Python, no Spark session):
--subset parsing accepts labels / name lists and fails fast on usage
errors instead of silently running (and overwriting bench_last.json
with) the wrong sweep."""

from __future__ import annotations

import pytest

from bench import _SETS, _parse_subset


def test_subset_absent_is_full_sweep():
    assert _parse_subset([]) is None
    assert _parse_subset(["--other"]) is None


def test_subset_label_and_names():
    assert _parse_subset(["--subset", "lsh"]) == _SETS["lsh"]
    assert _parse_subset(["--subset=lsh"]) == _SETS["lsh"]
    assert _parse_subset(["--subset", "a,b"]) == ("a", "b")


def test_subset_usage_errors():
    with pytest.raises(SystemExit):
        _parse_subset(["--subset"])  # bare flag
    with pytest.raises(SystemExit):
        _parse_subset(["--subset="])  # empty value
    # ADVICE r14: a following flag must be a usage error, not consumed
    # as the subset value
    with pytest.raises(SystemExit):
        _parse_subset(["--subset", "--other-flag"])
