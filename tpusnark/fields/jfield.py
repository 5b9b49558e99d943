"""Batched modular (Montgomery) limb arithmetic in JAX for TPU.

Replaces gnark-crypto's generated 4x64-bit Montgomery assembly (SURVEY.md §2.5,
reference call sites: /root/reference/constraint/bn254/solver.go:35,
/root/reference/backend/groth16/bn254/setup.go:128) with a TPU-native design:

  * field elements = ``(n_limbs, *batch)`` uint32 arrays, base 2^16
    little-endian. Limb axis is LEADING so the (large) batch dimension is
    minor-most and maps onto the 128-wide VPU lanes; a trailing 16-limb axis
    would be padded 16->128 on TPU (8x waste).
  * the TPU VPU has no 64-bit lanes; 16x16->32 products never overflow a lane
  * Montgomery form throughout; multiplication = column-accumulation REDC with
    the limb loop unrolled at trace time (static shapes, XLA-fusable)
  * wide accumulations (segment sums for sparse matvec / linear-expression
    evaluation) keep lazily-unreduced 32-bit columns and reduce once at the end
  * the same code runs inside Pallas kernels (it is pure jnp)

Everything is shape-polymorphic over trailing batch dims and closed over a
:class:`~tpusnark.fields.spec.FieldSpec` (no per-curve codegen, unlike the
reference's internal/generator).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .spec import LIMB_BITS, LIMB_MASK, FieldSpec, int_to_limbs

MASK = np.uint32(LIMB_MASK)
SHIFT = LIMB_BITS


def _u32(x: int) -> np.uint32:
    return np.uint32(x & 0xFFFFFFFF)


class Field:
    """JAX limb arithmetic bound to one FieldSpec. All ops are pure jnp.

    Array convention: limb axis first, shape (n_limbs, *batch).
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.n = spec.n_limbs
        p = spec.modulus
        self._p_cols = [_u32(l) for l in int_to_limbs(p, self.n)]
        self._pprime = _u32(spec.pprime)
        # 2^(16k) mod p for folding wide values, k up to 4*n is plenty
        self._fold = [int((1 << (SHIFT * k)) % p) for k in range(4 * self.n + 4)]
        self._r2 = self.const(spec.r2, mont=False)
        self._one_mont = self.const(spec.one_mont, mont=False)
        self._zero = self.const(0, mont=False)

    # ------------------------------------------------------------------ utils
    def const(self, x: int, mont: bool = False) -> jnp.ndarray:
        """A (n_limbs,) device constant. If mont, stores x*R mod p."""
        if mont:
            x = self.spec.to_mont_int(x)
        return jnp.asarray(int_to_limbs(int(x) % self.spec.modulus, self.n))

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.zeros((self.n, *shape), dtype=jnp.uint32)

    @property
    def one(self) -> jnp.ndarray:
        return self._one_mont

    def array(self, xs, mont: bool = True) -> jnp.ndarray:
        """Python ints -> (n_limbs, len(xs)) device array."""
        return jnp.asarray(self.spec.encode(list(xs), mont=mont).T.copy())

    def to_ints(self, a, mont: bool = True):
        """(n_limbs, *batch) -> flat list of ints (batch row-major)."""
        arr = np.asarray(a)
        arr = np.moveaxis(arr, 0, -1)  # (..., n_limbs)
        return self.spec.decode(arr.reshape(-1, self.n), mont=mont)

    # ----------------------------------------------------------- column plumbing
    @staticmethod
    def _cols(a):
        return [a[i] for i in range(a.shape[0])]

    @staticmethod
    def _stack(cols):
        return jnp.stack(cols, axis=0)

    @staticmethod
    def _carry_prop(cols):
        """Propagate carries through u32 columns -> 16-bit limbs + final carry."""
        out = []
        carry = None
        for c in cols:
            v = c if carry is None else c + carry
            out.append(v & MASK)
            carry = v >> SHIFT
        return out, carry

    def _sub_p_if_ge(self, limbs, p_cols):
        """Branchless: limbs - p if limbs >= p else limbs (16-bit limbs in)."""
        borrow = None
        diff = []
        two16 = _u32(1 << SHIFT)
        for a, b in zip(limbs, p_cols):
            t = a + two16 - b if borrow is None else a + two16 - b - borrow
            diff.append(t & MASK)
            borrow = _u32(1) - (t >> SHIFT)
        ge = borrow == 0  # no borrow -> a >= p
        return [jnp.where(ge, d, a) for d, a in zip(diff, limbs)]

    # ------------------------------------------------------------------- add/sub
    def add(self, a, b):
        cols = [x + y for x, y in zip(self._cols(a), self._cols(b))]
        limbs, _ = self._carry_prop(cols)  # carry is always 0: a+b < 2p < 2^(16n)
        limbs = self._sub_p_if_ge(limbs, self._p_cols)
        return self._stack(limbs)

    def sub(self, a, b):
        two16 = _u32(1 << SHIFT)
        borrow = None
        diff = []
        for x, y in zip(self._cols(a), self._cols(b)):
            t = x + two16 - y if borrow is None else x + two16 - y - borrow
            diff.append(t & MASK)
            borrow = _u32(1) - (t >> SHIFT)
        under = borrow != 0
        # if underflow, add p back
        fixed_cols = [d + p for d, p in zip(diff, self._p_cols)]
        fixed, _ = self._carry_prop(fixed_cols)
        return self._stack([jnp.where(under, f, d) for f, d in zip(fixed, diff)])

    def neg(self, a):
        return self.sub(self.broadcast_const(self._zero, a), a)

    def double(self, a):
        return self.add(a, a)

    def broadcast_const(self, c, like):
        """(n_limbs,) const -> broadcast to like's shape."""
        return jnp.broadcast_to(c.reshape((self.n,) + (1,) * (like.ndim - 1)), like.shape)

    # --------------------------------------------------------------- mont mul
    def _p_arr(self, batch_ndim: int):
        """(n, 1, 1, ...) modulus limbs for broadcasting against batch dims."""
        return jnp.asarray(np.array([int(c) for c in self._p_cols], dtype=np.uint32)).reshape(
            (self.n,) + (1,) * batch_ndim
        )

    @staticmethod
    def _slice_add(t, x, i: int):
        """t[i:i+len(x)] += x via slice/update-slice (NOT scatter: XLA's
        scatter lowering makes compile time explode ~20x)."""
        m = x.shape[0]
        chunk = jax.lax.dynamic_slice_in_dim(t, i, m, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(t, chunk + x, i, axis=0)

    def _redc(self, t):
        """Montgomery-reduce a (2n, *batch) column accumulator in place.

        Columns must be < 2^22 on entry so the += below cannot overflow u32.
        Returns canonical (n, *batch)."""
        n = self.n
        p_arr = self._p_arr(t.ndim - 1)
        for i in range(n):
            m = (t[i] * self._pprime) & MASK
            pm = p_arr * m[None]
            t = self._slice_add(t, pm & MASK, i)
            t = self._slice_add(t, pm >> SHIFT, i + 1)
            # column i is now 0 mod 2^16; push its carry up and retire it
            t = self._slice_add(t, (t[i] >> SHIFT)[None], i + 1)
        limbs, _ = self._carry_prop([t[n + i] for i in range(n)])  # result < 2p
        limbs = self._sub_p_if_ge(limbs, self._p_cols)
        return self._stack(limbs)

    def mul(self, a, b):
        """Montgomery product a*b*R^-1 mod p. Inputs/outputs canonical (<p)."""
        n = self.n
        a, b = jnp.broadcast_arrays(a, b)
        t = jnp.zeros((2 * n,) + a.shape[1:], dtype=jnp.uint32)
        # schoolbook partial products row by row, lo/hi split
        # (each column accumulates <= 2n values < 2^16 -> < 2^21, no overflow)
        for i in range(n):
            prod = a[i][None] * b  # (n, *batch)
            t = self._slice_add(t, prod & MASK, i)
            t = self._slice_add(t, prod >> SHIFT, i + 1)
        return self._redc(t)

    def square(self, a):
        return self.mul(a, a)

    def to_mont(self, a):
        return self.mul(a, self.broadcast_const(self._r2, a))

    def from_mont(self, a):
        # multiply by 1 (non-Montgomery) == REDC(a zero-extended to 2n columns)
        n = self.n
        t = jnp.concatenate([a, jnp.zeros_like(a)], axis=0)
        return self._redc(t)

    # ------------------------------------------------------------- comparisons
    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    @staticmethod
    def select(cond, a, b):
        """cond: (*batch,) bool; a,b: (n_limbs, *batch)."""
        return jnp.where(cond, a, b)

    # ----------------------------------------------------------- powering / inv
    def pow_static(self, a, e: int):
        """a^e for a host-known integer exponent, via lax.scan over bits."""
        if e == 0:
            return self.broadcast_const(self._one_mont, a)
        bits = [(e >> i) & 1 for i in range(e.bit_length())]
        bits_arr = jnp.asarray(np.array(bits[::-1], dtype=np.uint32))  # MSB first

        one = self.broadcast_const(self._one_mont, a)

        def body(acc, bit):
            acc = self.square(acc)
            mul_acc = self.mul(acc, a)
            acc = jnp.where(bit == 1, mul_acc, acc)
            return acc, None

        acc, _ = jax.lax.scan(body, one, bits_arr)
        return acc

    def inv(self, a):
        """Batched inversion via Fermat: a^(p-2). inv(0) = 0."""
        return self.pow_static(a, self.spec.modulus - 2)

    # -------------------------------------------------- wide / lazy accumulation
    def reduce_columns(self, cols, bound: int):
        """Reduce a column-represented value (u32 columns, total value < bound)
        to a canonical element. `bound` is a host-side upper bound (inclusive)."""
        n = self.n
        limbs, carry = self._carry_prop(cols)
        limbs.append(carry)
        # represented exactly by len(limbs) 16-bit limbs now
        nlimb_needed = (bound.bit_length() + SHIFT - 1) // SHIFT
        limbs = limbs[: max(n, nlimb_needed)]

        # fold limbs >= n down using 2^(16k) mod p while this makes progress.
        # per-limb bound: limb k <= min(MASK, bound >> 16k); the fold shrinks
        # the value by ~2.3 bits/round (p/2^256) until the low n limbs dominate.
        for _ in range(64):  # static safety cap
            L = len(limbs)
            if L <= n:
                break
            new_bound = (1 << (SHIFT * n)) - 1
            acc = list(limbs[:n])
            extra = None
            for k in range(n, L):
                lb_k = min(LIMB_MASK, bound >> (SHIFT * k))
                new_bound += lb_k * self._fold[k]
                dk = int_to_limbs(self._fold[k], n)
                hk = limbs[k]
                for j in range(n):
                    pm = hk * _u32(dk[j])
                    acc[j] = acc[j] + (pm & MASK)
                    hi = pm >> SHIFT
                    if j + 1 < n:
                        acc[j + 1] = acc[j + 1] + hi
                    else:
                        extra = hi if extra is None else extra + hi
            if new_bound >= bound:
                break  # fixed point: finish with the subtract chain below
            cols2 = acc + ([extra] if extra is not None else [])
            limbs, carry = self._carry_prop(cols2)
            limbs.append(carry)
            nlimb_needed = (new_bound.bit_length() + SHIFT - 1) // SHIFT
            limbs = limbs[: max(n, nlimb_needed)]
            bound = new_bound
        # conditional-subtract chain of p<<j over the remaining limbs:
        # value < bound <= 2*(p<<jmax) with jmax = bound bits - p bits; each
        # step halves the bound until canonical (< p).
        p = self.spec.modulus
        L = len(limbs)
        jmax = max(0, bound.bit_length() - p.bit_length())
        assert p << jmax < (1 << (SHIFT * L)) or jmax == 0, "reduce_columns: bound too wide"
        for j in range(jmax, -1, -1):
            m_cols = [_u32(l) for l in int_to_limbs(p << j, L)]
            limbs = self._sub_p_if_ge(limbs, m_cols)
        limbs = limbs[:n]
        while len(limbs) < n:
            limbs.append(jnp.zeros_like(limbs[0]))
        return self._stack(limbs)

    def sum(self, a, axis: int = 1):
        """Sum of canonical elements along batch axis `axis` (>=1), mod p."""
        assert axis >= 1
        k = a.shape[axis]
        assert k <= 1 << 16, "sum too long for lazy accumulation"
        cols_arr = jnp.sum(a, axis=axis)
        bound = k * (self.spec.modulus - 1)
        return self.reduce_columns(self._cols(cols_arr), bound)

    def segment_sum(self, values, segment_ids, num_segments: int, max_segment: int = 1 << 16):
        """Segmented modular sum: values (n_limbs, N) canonical, ids (N,).

        max_segment bounds the number of elements per segment (host-side),
        needed for the lazy-accumulation overflow analysis."""
        assert max_segment <= 1 << 16
        cols = jnp.zeros((self.n, num_segments), dtype=jnp.uint32).at[:, segment_ids].add(values)
        bound = max_segment * (self.spec.modulus - 1)
        return self.reduce_columns(self._cols(cols), bound)

    # ---------------------------------------------------------------- helpers
    def mul_const(self, a, c: int):
        """Multiply by a host constant (given in normal form, converted here)."""
        cm = self.const(c, mont=True)
        return self.mul(a, self.broadcast_const(cm, a))


@functools.lru_cache(maxsize=None)
def get_field(spec: FieldSpec) -> Field:
    return Field(spec)
