"""Constraint-count regression (gnark internal/stats analog,
/root/reference/internal/stats/stats_test.go:11-44): per-snippet counts vs
the checked-in baseline. Re-save with `python -m tpusnark.stats save` after
an intentional builder/gadget change."""

from tpusnark.stats import check_against_baseline


def test_constraint_counts_match_baseline():
    problems = check_against_baseline()
    assert not problems, "constraint-count regressions:\n" + "\n".join(problems)
