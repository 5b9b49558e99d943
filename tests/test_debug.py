"""Debug symbol tables: user-stack capture on constraints (gnark debug/
package analog, /root/reference/debug/symbol_table.go + debug.go:10-27)."""

import pytest

from tpusnark import debug as dbgmod
from tpusnark.constraint.solver import UnsatisfiedConstraintError, solve
from tpusnark.fields.spec import TINY
from tpusnark.frontend.builder import Builder
from tpusnark.frontend.plonk_builder import PlonkBuilder


def _bad_circuit(b):
    x = b.secret("x")
    y = b.public("y")
    b.assert_is_equal(b.mul(x, x), y)  # MARKER_LINE
    return b.compile()


def test_stack_captured_when_enabled(monkeypatch):
    monkeypatch.setenv("TPUSNARK_DEBUG", "1")
    cs = _bad_circuit(Builder(TINY.modulus))
    # the mul gate carries an interned user stack pointing at this test file
    stacks = [d for d in cs.debug_info if isinstance(d, tuple)]
    assert stacks, "no stack captured under TPUSNARK_DEBUG=1"
    txt = cs.debug_str(cs.debug_info.index(stacks[0]))
    assert "_bad_circuit" in txt and "test_debug.py" in txt
    # interning: repeated call sites share location records
    assert len(cs.symbols.locations) <= sum(len(s) for s in cs.symbols.stacks)


def test_unsatisfied_error_carries_user_frames(monkeypatch):
    monkeypatch.setenv("TPUSNARK_DEBUG", "1")
    cs = _bad_circuit(Builder(TINY.modulus))
    with pytest.raises(UnsatisfiedConstraintError) as ei:
        solve(cs, {"x": 2, "y": 5})
    assert "_bad_circuit" in str(ei.value)


def test_capture_off_by_default(monkeypatch):
    monkeypatch.delenv("TPUSNARK_DEBUG", raising=False)
    cs = _bad_circuit(Builder(TINY.modulus))
    assert not any(isinstance(d, tuple) for d in cs.debug_info)


def test_scs_stack_capture(monkeypatch):
    monkeypatch.setenv("TPUSNARK_DEBUG", "1")
    cs = _bad_circuit(PlonkBuilder(TINY.modulus))
    stacks = [d for d in cs.debug_info if isinstance(d, tuple)]
    assert stacks
    assert "test_debug.py" in dbgmod.format_dbg(cs.symbols, stacks[0])
