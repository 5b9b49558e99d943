"""Device-side evaluation of per-constraint linear expressions.

Given the solved wire vector W (Montgomery limbs, on device), compute the
Groth16 solution vectors A_i = L_i(W), B_i = R_i(W), C_i = O_i(W) for every
constraint i — the arrays the reference's solver fills incrementally while
solving (/root/reference/constraint/bn254/solver.go:532-618, `a[i]=..` in
solveR1C) and that feed computeH (backend/groth16/bn254/prove.go:353).

TPU-native shape: the constraint term arenas (row, coeff_id, wire_id) are
flat uint32 arrays (ConstraintSystem.term_arrays), so each vector is one
gather (coeff limbs), one gather (wire limbs), one batched Montgomery mul,
and one modular segment-sum — all jit-compiled, no per-constraint loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.jfield import Field
from .system import ConstraintSystem


class ABCEvaluator:
    """Precompiled A/B/C evaluator bound to one ConstraintSystem.

    __call__(w_mont) -> (A, B, C), each (n_limbs, n_constraints) Montgomery,
    where w_mont is (n_limbs, n_wires) Montgomery limbs.
    """

    def __init__(self, cs: ConstraintSystem, field: Field):
        self.field = field
        self.n_constraints = len(cs.constraints)
        arenas = cs.term_arrays()
        # coefficient table in Montgomery form, (n_limbs, n_coeffs)
        coeff_dev = jnp.asarray(field.spec.encode(cs.coeffs, mont=True).T.copy())

        parts = {}
        for name in ("L", "R", "O"):
            rows, cids, vids = arenas[name]
            max_seg = int(np.bincount(rows, minlength=1).max()) if rows.size else 1
            parts[name] = (
                jnp.asarray(rows),
                jnp.asarray(cids.astype(np.int32)),
                jnp.asarray(vids),
                max_seg,
            )

        f = field
        nc = self.n_constraints

        def eval_one(w, rows, cids, vids, max_seg):
            if rows.shape[0] == 0:
                return f.zeros((nc,))
            c = coeff_dev[:, cids]  # (n_limbs, T)
            v = w[:, vids]
            prod = f.mul(c, v)
            return f.segment_sum(prod, rows, nc, max_segment=max_seg)

        def eval_abc(w):
            return tuple(
                eval_one(w, *parts[name][:3], parts[name][3]) for name in ("L", "R", "O")
            )

        self._fn = jax.jit(eval_abc)

    def __call__(self, w_mont):
        return self._fn(w_mont)
