"""Vectorized (device) witness solver: whole dependency levels at once.

gnark analog: the generated level-parallel solver
(/root/reference/constraint/bn254/solver.go:418-524) walks `Levels`
(constraint/core.go:117) with a goroutine worker pool, solving the single
unknown wire of each R1C. The TPU-native redesign replaces the worker pool
with per-level vectorization:

  * the solved wire vector W lives on device as (n_limbs, n_wires+1)
    Montgomery limbs (one dummy column absorbs padded scatters)
  * per level: gather the level's known terms (coeff id, wire id arenas),
    evaluate the L/R/O known parts with one batched Montgomery mul + one
    modular segment-sum, derive every unknown in parallel
    (in-O: w = (l*r - o_rest)*k^-1; in-L: w = (o/r - l_rest)*k^-1; in-R
    symmetric, with the gnark zero-denominator convention w=0), scatter
  * the level program takes the level's arenas as DEVICE INPUTS, not baked
    constants — one compiled program serves every level whose padded sizes
    match (sizes are bucketed to powers of two), so compile count is
    O(log^2) not O(levels)
  * hint instructions sync to the host once per hint-bearing level: inputs
    evaluated on device, decoded, python callbacks run, outputs re-encoded
  * constraint satisfaction is checked in ONE bulk device pass at the end
    (A_i*B_i == C_i for all i) instead of per instruction

The sequential-chain worst case (every level is one instruction) stays on
the host Python solver (`solver.solve`) — `solve_any` picks by level shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.jfield import Field, get_field
from ..fields.spec import FieldSpec
from .solver import UnsatisfiedConstraintError
from .system import ConstraintSystem


def _pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


class _LevelPlan:
    """Host-side prep of one dependency level."""

    __slots__ = ("nI", "terms", "code", "kinv", "targets", "max_seg", "hints")

    def __init__(self):
        self.hints = []  # list of Hint


class LevelSolver:
    """Device solver bound to (ConstraintSystem, Field). Build once, reuse."""

    CODE_CHECK, CODE_O, CODE_L, CODE_R = 0, 1, 2, 3

    def __init__(self, cs: ConstraintSystem, field: Field):
        cs.finalize()
        self.cs = cs
        self.f = field
        p = cs.modulus
        self.coeff_dev = jnp.asarray(field.spec.encode(cs.coeffs, mont=True).T.copy())
        levels = cs.compute_levels()
        self.plans: list[_LevelPlan] = []
        for insts in levels:
            plan = _LevelPlan()
            rows = {s: [] for s in "LRO"}
            cids = {s: [] for s in "LRO"}
            vids = {s: [] for s in "LRO"}
            code, kinv, targets = [], [], []
            for ii in insts:
                inst = cs.instructions[ii]
                if inst[0] == "hint":
                    plan.hints.append(inst[1])
                    continue
                _, cidx, solved = inst
                c = cs.constraints[cidx]
                li = len(code)
                k = 0
                where = None
                for side, e in (("L", c.L), ("R", c.R), ("O", c.O)):
                    for cid, vid in e:
                        if solved is not None and vid == solved:
                            k = (k + cs.coeffs[cid]) % p
                            if where is not None and where != side:
                                raise RuntimeError(
                                    f"constraint #{cidx}: solved wire in multiple expressions"
                                )
                            where = side
                        else:
                            rows[side].append(li)
                            cids[side].append(cid)
                            vids[side].append(vid)
                if solved is None:
                    code.append(self.CODE_CHECK)
                    kinv.append(1)
                    targets.append(cs.n_wires)  # dummy column
                else:
                    code.append(
                        {"O": self.CODE_O, "L": self.CODE_L, "R": self.CODE_R}[where]
                    )
                    kinv.append(pow(k, -1, p))
                    targets.append(solved)
            nI = len(code)
            plan.nI = nI
            nI_pad = _pow2(max(1, nI))
            pad = nI_pad - nI
            plan.code = np.asarray(code + [self.CODE_CHECK] * pad, dtype=np.int32)
            plan.kinv = field.spec.encode(kinv + [1] * pad, mont=True).T.copy()
            plan.targets = np.asarray(
                targets + [cs.n_wires] * pad, dtype=np.int32
            )
            plan.terms = {}
            max_seg = 1
            for s in "LRO":
                r = np.asarray(rows[s], dtype=np.int32)
                if r.size:
                    max_seg = max(max_seg, int(np.bincount(r).max()))
                nT_pad = _pow2(max(1, r.size))
                tp = nT_pad - r.size
                plan.terms[s] = (
                    np.concatenate([r, np.full(tp, nI_pad, np.int32)]),
                    np.concatenate(
                        [np.asarray(cids[s], np.int32), np.zeros(tp, np.int32)]
                    ),
                    np.concatenate(
                        [np.asarray(vids[s], np.int32), np.zeros(tp, np.int32)]
                    ),
                )
            plan.max_seg = _pow2(max_seg)
            self.plans.append(plan)
        self.has_any_inv = any(
            np.any((pl.code == self.CODE_L) | (pl.code == self.CODE_R))
            for pl in self.plans
        )

    # -------------------------------------------------------------- kernels
    @functools.lru_cache(maxsize=None)
    def _level_fn(self, nI_pad: int, nTL: int, nTR: int, nTO: int, max_seg: int,
                  has_inv: bool):
        f = self.f
        coeff_dev = self.coeff_dev

        def eval_side(W, rows, cids, vids):
            c = coeff_dev[:, cids]
            v = W[:, vids]
            return f.segment_sum(f.mul(c, v), rows, nI_pad + 1, max_seg)[:, :nI_pad]

        def run(W, tL, tR, tO, code, kinv, targets):
            l = eval_side(W, *tL)
            r = eval_side(W, *tR)
            o = eval_side(W, *tO)
            # in-O: w = (l*r - o_rest) * k^-1
            w = f.mul(f.sub(f.mul(l, r), o), kinv)
            if has_inv:
                inv_r = f.inv(r)
                inv_l = f.inv(l)
                # in-L: (l_rest + k*w) * r = o  ->  w = (o/r - l_rest)/k
                w_l = f.mul(f.sub(f.mul(o, inv_r), l), kinv)
                w_l = jnp.where(f.is_zero(r), jnp.zeros_like(w_l), w_l)
                # in-R symmetric
                w_r = f.mul(f.sub(f.mul(o, inv_l), r), kinv)
                w_r = jnp.where(f.is_zero(l), jnp.zeros_like(w_r), w_r)
                w = jnp.where(code == self.CODE_L, w_l, w)
                w = jnp.where(code == self.CODE_R, w_r, w)
            keep = code == self.CODE_CHECK
            w = jnp.where(keep, W[:, targets], w)
            return W.at[:, targets].set(w)

        return jax.jit(run)

    @functools.lru_cache(maxsize=None)
    def _hint_eval_fn(self, nH_pad: int, nT: int, max_seg: int):
        f = self.f
        coeff_dev = self.coeff_dev

        def run(W, rows, cids, vids):
            c = coeff_dev[:, cids]
            v = W[:, vids]
            return f.segment_sum(f.mul(c, v), rows, nH_pad + 1, max_seg)[:, :nH_pad]

        return jax.jit(run)

    # ----------------------------------------------------------------- solve
    def solve(self, assignment: dict, hint_overrides: dict | None = None):
        """-> (L, n_wires) Montgomery device wire vector. Raises
        UnsatisfiedConstraintError on an unsatisfied constraint.

        hint_overrides: {hint fn or name -> replacement}, the prover's
        OverrideHint seam (same contract as solver.solve) — BSB22 needs it
        (/root/reference/backend/groth16/bn254/prove.go:84)."""
        cs, f = self.cs, self.f
        p = cs.modulus
        init = [0] * (cs.n_wires + 1)
        init[0] = 1
        for i, name in enumerate(cs.public_names[1:], start=1):
            if name not in assignment:
                raise KeyError(f"missing public input {name!r}")
            init[i] = int(assignment[name]) % p
        for j, name in enumerate(cs.secret_names):
            if name not in assignment:
                raise KeyError(f"missing secret input {name!r}")
            init[cs.n_public + j] = int(assignment[name]) % p
        W = jnp.asarray(f.spec.encode(init, mont=True).T.copy())

        overrides = {}
        if hint_overrides:
            from .hints import hint_name

            for k, v in hint_overrides.items():
                overrides[k if isinstance(k, str) else hint_name(k)] = v

        for plan in self.plans:
            if plan.nI:
                fn = self._level_fn(
                    len(plan.code),
                    plan.terms["L"][0].size,
                    plan.terms["R"][0].size,
                    plan.terms["O"][0].size,
                    plan.max_seg,
                    self.has_any_inv,
                )
                W = fn(
                    W,
                    tuple(jnp.asarray(a) for a in plan.terms["L"]),
                    tuple(jnp.asarray(a) for a in plan.terms["R"]),
                    tuple(jnp.asarray(a) for a in plan.terms["O"]),
                    jnp.asarray(plan.code),
                    jnp.asarray(plan.kinv),
                    jnp.asarray(plan.targets),
                )
            if plan.hints:
                W = self._run_hints(W, plan.hints, overrides)

        W = W[:, : cs.n_wires]
        self._check(W)
        return W

    def solve_with_abc(self, assignment: dict, hint_overrides: dict | None = None):
        """Like solve(), but also returns the per-constraint (A, B, C)
        Montgomery evaluations computed during the satisfaction check — the
        Groth16 prover needs exactly these, so recomputing them would double
        the biggest gather of the prove (reference fills a/b/c during the
        solve too, /root/reference/constraint/bn254/solver.go:532)."""
        W = self.solve(assignment, hint_overrides)
        return W, self._last_abc

    def _run_hints(self, W, hints, overrides):
        """One host sync for all of a level's hints."""
        cs, f = self.cs, self.f
        rows, cids, vids = [], [], []
        metas = []  # (hint, n_inputs)
        h_off = 0
        for h in hints:
            for e in h.inputs:
                for cid, vid in e:
                    rows.append(h_off)
                    cids.append(cid)
                    vids.append(vid)
                h_off += 1
            metas.append((h, len(h.inputs)))
        nH_pad = _pow2(max(1, h_off))
        r = np.asarray(rows, np.int32)
        max_seg = _pow2(int(np.bincount(r, minlength=1).max()) if r.size else 1)
        nT_pad = _pow2(max(1, r.size))
        tp = nT_pad - r.size
        rows_a = np.concatenate([r, np.full(tp, nH_pad, np.int32)])
        cids_a = np.concatenate([np.asarray(cids, np.int32), np.zeros(tp, np.int32)])
        vids_a = np.concatenate([np.asarray(vids, np.int32), np.zeros(tp, np.int32)])
        fn = self._hint_eval_fn(nH_pad, nT_pad, max_seg)
        vals_dev = fn(W, jnp.asarray(rows_a), jnp.asarray(cids_a), jnp.asarray(vids_a))
        vals = f.to_ints(f.canon(vals_dev), mont=True)
        out_wires, out_vals = [], []
        off = 0
        p = self.cs.modulus
        if overrides:
            from .hints import hint_name
        for h, n_in in metas:
            fn = overrides.get(hint_name(h.fn), h.fn) if overrides else h.fn
            outs = fn(p, [vals[off + i] for i in range(n_in)])
            off += n_in
            assert len(outs) == len(h.outputs), "hint output arity mismatch"
            out_wires.extend(h.outputs)
            out_vals.extend(int(v) % p for v in outs)
        enc = jnp.asarray(f.spec.encode(out_vals, mont=True).T.copy())
        return W.at[:, jnp.asarray(np.asarray(out_wires, np.int32))].set(enc)

    def _check(self, W):
        """Bulk satisfaction check: A_i*B_i == C_i for every constraint."""
        ev = _abc_cache(self.cs, self.f)
        A, B, C = ev(W)
        self._last_abc = (A, B, C)
        bad = np.asarray(~self.f.eq(self.f.mul(A, B), C))
        if bad.any():
            idx = int(np.argmax(bad))
            raise UnsatisfiedConstraintError(idx, self.cs.debug_str(idx))


_SOLVERS: dict = {}
_ABCS: dict = {}


def _abc_cache(cs, f):
    from .eval_jax import ABCEvaluator

    key = id(cs)
    if key not in _ABCS:
        _ABCS[key] = ABCEvaluator(cs, f)
    return _ABCS[key]


def get_level_solver(cs: ConstraintSystem, spec: FieldSpec) -> LevelSolver:
    key = (id(cs), spec.modulus)
    s = _SOLVERS.get(key)
    if s is None:
        s = LevelSolver(cs, get_field(spec))
        _SOLVERS[key] = s
    return s


def solve_jax(cs: ConstraintSystem, assignment: dict, spec: FieldSpec):
    """Device-solve; returns the (L, n_wires) Montgomery wire vector."""
    return get_level_solver(cs, spec).solve(assignment)


def solve_jax_ints(cs: ConstraintSystem, assignment: dict, spec: FieldSpec) -> list[int]:
    """Device-solve and decode to python ints (oracle-comparison form)."""
    f = get_field(spec)
    W = solve_jax(cs, assignment, spec)
    return f.to_ints(f.canon(W), mont=True)


# ---- host/device picker ------------------------------------------------------
# Like gnark's minWorkPerCPU=50 split (/root/reference/constraint/bn254/
# solver.go:422): below this mean level width, per-level dispatch overhead
# (one device program + host sync per level) dominates and the serial host
# solver wins. Above it the vectorized level kernels win by orders of
# magnitude at 2^17+ constraints.
MIN_MEAN_LEVEL_WIDTH = 64
MIN_TOTAL_INSTRUCTIONS = 4096


def prefer_device(cs: ConstraintSystem) -> bool:
    """Shape heuristic: device-solve iff the level structure is wide enough
    to amortize per-level dispatch (the mul-chain worst case — every level
    one instruction — stays on host)."""
    cs.finalize()
    levels = cs.compute_levels()
    n_inst = sum(len(l) for l in levels)
    if n_inst < MIN_TOTAL_INSTRUCTIONS or not levels:
        return False
    return n_inst / len(levels) >= MIN_MEAN_LEVEL_WIDTH


def solve_any(
    cs: ConstraintSystem,
    assignment: dict,
    spec: FieldSpec,
    hint_overrides: dict | None = None,
    force_host: bool = False,
    logs: bool = True,
):
    """Solve on device when the level shape favors it, else on host.

    Returns (W_mont_dev | None, abc | None, W_ints | None): exactly one of
    W_mont_dev / W_ints is set; abc rides along on the device path (the
    Groth16 prover consumes it directly). force_host pins the host path
    (ProverConfig accelerator="host", gnark's CPU fallback icicle.go:141)."""
    if not force_host and prefer_device(cs):
        ls = get_level_solver(cs, spec)
        W, abc = ls.solve_with_abc(assignment, hint_overrides)
        return W, abc, None
    from .solver import solve as solve_host

    return None, None, solve_host(
        cs, assignment, hint_overrides=hint_overrides, logs=logs
    )
