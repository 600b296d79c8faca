"""Host-side vectorized field arithmetic (ctypes over csrc/field256.c).

Why this exists: the sumcheck provers run their small tail rounds on the
host (piop/sum_check.py HOST_TAIL) because each device round through the
TPU tunnel is pure RTT latency. The previous host representation — numpy
object arrays of python ints — peaks around ~2M mulmods/s and pays a
per-element python decode loop on every device->host pull. This module
keeps tail data in packed uint64[n, 4] **Montgomery form** (R = 2^256 —
identical scaling to the device's 16x16-bit limb layout, so a pull is a
vectorized repack, not a bigint decode) and dispatches the bulk arithmetic
to a C CIOS kernel at ~25M muls/s. That moves the efficient host/device
crossover up by ~16x and lets the GKR layer sumchecks (the Lasso prover's
latency floor, VERDICT r4 Next #1) run almost entirely on host.

`HVec` overloads +, -, * against other HVecs and python ints so
`expression.evaluate_host` evaluates composed expressions directly over
packed vectors; `% p` is an identity (values are always reduced).

Fields wider than 4x64 bits are not supported (every production field here
is <= 256 bits); callers must check `available(spec)` and fall back to the
object-int path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Sequence

import numpy as np

from halo2_lasso_tpu.ops.field import FieldSpec

_DLL = None


def _load():
    global _DLL
    if _DLL is not None:
        return _DLL
    if os.environ.get("HALO2_LASSO_TPU_HOST_C", "1") == "0":
        _DLL = False
        return _DLL
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    src = os.path.join(root, "csrc", "field256.c")
    lib = os.path.join(root, "csrc", "libfield256.so")
    try:
        if not os.path.exists(lib) or os.path.getmtime(lib) < os.path.getmtime(src):
            subprocess.run(
                ["gcc", "-O3", "-shared", "-fPIC", "-o", lib, src],
                check=True,
                capture_output=True,
            )
        dll = ctypes.CDLL(lib)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        for name, extra in (
            ("f256_mul", [ctypes.c_uint64]),
            ("f256_mul_scalar", [ctypes.c_uint64]),
            ("f256_add", []),
            ("f256_add_scalar", []),
            ("f256_sub", []),
            ("f256_sub_scalar", []),
            ("f256_scalar_sub", []),
            ("f256_fold", [ctypes.c_uint64]),
        ):
            getattr(dll, name).argtypes = [u64p, u64p, u64p, ctypes.c_long, u64p] + extra
        dll.f256_fold_pairs.argtypes = [u64p, u64p, u64p, ctypes.c_long, u64p, ctypes.c_uint64]
        dll.f256_sum.argtypes = [u64p, u64p, ctypes.c_long, u64p]
        dll.f256_dot.argtypes = [u64p, u64p, u64p, ctypes.c_long, u64p, ctypes.c_uint64]
        dll.f256_dot_diff.argtypes = [u64p] * 5 + [ctypes.c_long, u64p, ctypes.c_uint64]
        dll.f256_gkr_layer.argtypes = [u64p] * 6 + [ctypes.c_long, u64p, ctypes.c_uint64]
        dll.f256_eq_expand.argtypes = [u64p, ctypes.c_long, u64p, u64p, u64p, ctypes.c_uint64]
        _DLL = dll
    except Exception:
        _DLL = False
    return _DLL


def available(spec: Optional[FieldSpec] = None) -> bool:
    if spec is not None and (spec.num_limbs != 16 or spec.modulus >= 1 << 256):
        return False
    return bool(_load())


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


_CTX_CACHE: Dict[str, "HostCtx"] = {}


def ctx_for(spec: FieldSpec) -> "HostCtx":
    ctx = _CTX_CACHE.get(spec.name)
    if ctx is None:
        ctx = HostCtx(spec)
        _CTX_CACHE[spec.name] = ctx
    return ctx


class HostCtx:
    """Per-field constants for the C kernels."""

    def __init__(self, spec: FieldSpec):
        assert available(spec)
        self.spec = spec
        self.p = spec.modulus
        self.p4 = _int_to_u64x4(spec.modulus)
        self.inv = ctypes.c_uint64((-pow(spec.modulus, -1, 1 << 64)) % (1 << 64))
        self.R = getattr(spec, "R")
        self.Rinv = pow(self.R, -1, self.p)
        self.one4 = _int_to_u64x4(self.R)  # Montgomery 1
        self.dll = _load()
        self._scalar_cache: Dict[int, np.ndarray] = {}

    # ---- conversions ----

    def pack_u32(self, limbs: np.ndarray) -> np.ndarray:
        """Device uint32[..., 16] 16-bit Montgomery limbs -> uint64[..., 4]
        (same Montgomery residue; pure vectorized repack)."""
        x = np.ascontiguousarray(limbs).astype(np.uint64)
        out = (
            x[..., 0::4]
            | (x[..., 1::4] << np.uint64(16))
            | (x[..., 2::4] << np.uint64(32))
            | (x[..., 3::4] << np.uint64(48))
        )
        return np.ascontiguousarray(out)

    def unpack_u32(self, packed: np.ndarray) -> np.ndarray:
        """uint64[..., 4] -> uint32[..., 16] 16-bit limbs."""
        p = np.asarray(packed, dtype=np.uint64)
        out = np.empty(p.shape[:-1] + (16,), dtype=np.uint32)
        for j in range(4):
            w = p[..., j]
            for i in range(4):
                out[..., 4 * j + i] = ((w >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(
                    np.uint32
                )
        return out

    def mont_scalar(self, v: int) -> np.ndarray:
        """Canonical int -> packed Montgomery (4,) uint64, cached."""
        v = v % self.p
        s = self._scalar_cache.get(v)
        if s is None:
            s = _int_to_u64x4(v * self.R % self.p)
            if len(self._scalar_cache) < 4096:
                self._scalar_cache[v] = s
        return s

    def to_int(self, packed4: np.ndarray) -> int:
        """Packed Montgomery (4,) -> canonical python int."""
        m = int.from_bytes(np.ascontiguousarray(packed4).tobytes(), "little")
        return m * self.Rinv % self.p

    # ---- vector constructors ----

    def from_dev(self, limbs: np.ndarray) -> "HVec":
        return HVec(self, self.pack_u32(limbs))

    def from_ints(self, values: Sequence[int]) -> "HVec":
        arr = np.empty((len(values), 4), dtype=np.uint64)
        for i, v in enumerate(values):
            arr[i] = self.mont_scalar(int(v))
        return HVec(self, arr)

    def zeros(self, n: int) -> "HVec":
        return HVec(self, np.zeros((n, 4), dtype=np.uint64))

    def eq_expand(self, y: Sequence[int]) -> "HVec":
        """eq(X, y) table over 2^k points (matches poly/multilinear.eq_xy)."""
        k = len(y)
        ya = np.empty((max(k, 1), 4), dtype=np.uint64)
        for i, v in enumerate(y):
            ya[i] = self.mont_scalar(int(v))
        out = np.empty((1 << k, 4), dtype=np.uint64)
        self.dll.f256_eq_expand(
            _ptr(ya), k, _ptr(self.one4), _ptr(out), _ptr(self.p4), self.inv
        )
        return HVec(self, out)

    def gkr_layer(self, pl: "HVec", pr: "HVec", ql: "HVec", qr: "HVec"):
        """(p', q') fraction-tree layer products (piop/gkr.py semantics)."""
        n = pl.n
        pn = np.empty((n, 4), dtype=np.uint64)
        qn = np.empty((n, 4), dtype=np.uint64)
        self.dll.f256_gkr_layer(
            _ptr(pl.a), _ptr(pr.a), _ptr(ql.a), _ptr(qr.a),
            _ptr(pn), _ptr(qn), n, _ptr(self.p4), self.inv,
        )
        return HVec(self, pn), HVec(self, qn)


def _int_to_u64x4(v: int) -> np.ndarray:
    return np.frombuffer(int(v).to_bytes(32, "little"), dtype=np.uint64).copy()


class HVec:
    """Packed Montgomery vector (n, 4) uint64 with field-op overloads.

    Designed to flow through expression.evaluate_host unchanged: `% p` is an
    identity (values stay reduced), int operands are Montgomery-encoded on
    the fly, and 1-element vectors broadcast as scalars.
    """

    __slots__ = ("ctx", "a")

    def __init__(self, ctx: HostCtx, a: np.ndarray):
        self.ctx = ctx
        self.a = a if a.flags["C_CONTIGUOUS"] else np.ascontiguousarray(a)

    @property
    def n(self) -> int:
        return self.a.shape[0]

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, idx) -> "HVec":
        sub = self.a[idx]
        if sub.ndim == 1:
            sub = sub[None, :]
        return HVec(self.ctx, np.ascontiguousarray(sub))

    # ---- field ops ----

    def _coerce(self, other):
        if isinstance(other, HVec):
            return other
        if isinstance(other, (int, np.integer)):
            return HVec(self.ctx, self.ctx.mont_scalar(int(other))[None, :])
        return NotImplemented

    def __add__(self, other):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        c, d = self.ctx, _broadcast(self, o)
        if d is not None:
            return d[0]._add_scalar(d[1])
        out = np.empty_like(self.a)
        c.dll.f256_add(_ptr(self.a), _ptr(o.a), _ptr(out), self.n, _ptr(c.p4))
        return HVec(c, out)

    __radd__ = __add__

    def _add_scalar(self, s4: np.ndarray) -> "HVec":
        c = self.ctx
        out = np.empty_like(self.a)
        c.dll.f256_add_scalar(_ptr(self.a), _ptr(s4), _ptr(out), self.n, _ptr(c.p4))
        return HVec(c, out)

    def __sub__(self, other):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        c = self.ctx
        if o.n == 1 and self.n != 1:
            out = np.empty_like(self.a)
            c.dll.f256_sub_scalar(_ptr(self.a), _ptr(o.a), _ptr(out), self.n, _ptr(c.p4))
            return HVec(c, out)
        if self.n == 1 and o.n != 1:
            out = np.empty_like(o.a)
            c.dll.f256_scalar_sub(_ptr(self.a), _ptr(o.a), _ptr(out), o.n, _ptr(c.p4))
            return HVec(c, out)
        out = np.empty_like(self.a)
        c.dll.f256_sub(_ptr(self.a), _ptr(o.a), _ptr(out), self.n, _ptr(c.p4))
        return HVec(c, out)

    def __rsub__(self, other):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        return o.__sub__(self)

    def __mul__(self, other):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        c, d = self.ctx, _broadcast(self, o)
        if d is not None:
            vec, s4 = d
            out = np.empty_like(vec.a)
            c.dll.f256_mul_scalar(_ptr(vec.a), _ptr(s4), _ptr(out), vec.n, _ptr(c.p4), c.inv)
            return HVec(c, out)
        out = np.empty_like(self.a)
        c.dll.f256_mul(_ptr(self.a), _ptr(o.a), _ptr(out), self.n, _ptr(c.p4), c.inv)
        return HVec(c, out)

    __rmul__ = __mul__

    def __neg__(self):
        return HVec(self.ctx, np.zeros((1, 4), dtype=np.uint64)).__sub__(self)

    def __mod__(self, p):
        assert p == self.ctx.p
        return self

    # ---- reductions / extraction ----

    def fold_pairs(self, r: int) -> "HVec":
        """out[i] = a[2i] + (a[2i+1]-a[2i])*r — fix_var on interleaved pairs."""
        c = self.ctx
        out = np.empty((self.n // 2, 4), dtype=np.uint64)
        c.dll.f256_fold_pairs(
            _ptr(self.a), _ptr(c.mont_scalar(r)), _ptr(out), self.n // 2,
            _ptr(c.p4), c.inv,
        )
        return HVec(c, out)

    def sum_int(self) -> int:
        c = self.ctx
        out = np.empty(4, dtype=np.uint64)
        c.dll.f256_sum(_ptr(self.a), _ptr(out), self.n, _ptr(c.p4))
        return c.to_int(out)

    def dot_int(self, other: "HVec") -> int:
        c = self.ctx
        out = np.empty(4, dtype=np.uint64)
        c.dll.f256_dot(_ptr(self.a), _ptr(other.a), _ptr(out), self.n, _ptr(c.p4), c.inv)
        return c.to_int(out)

    def dot_diff_int(self, a1: "HVec", b0: "HVec", b1: "HVec") -> int:
        """sum (a1-self)*(b1-b0)."""
        c = self.ctx
        out = np.empty(4, dtype=np.uint64)
        c.dll.f256_dot_diff(
            _ptr(self.a), _ptr(a1.a), _ptr(b0.a), _ptr(b1.a), _ptr(out),
            self.n, _ptr(c.p4), c.inv,
        )
        return c.to_int(out)

    def to_int(self, i: int = 0) -> int:
        return self.ctx.to_int(self.a[i])

    def to_ints(self) -> List[int]:
        return [self.ctx.to_int(self.a[i]) for i in range(self.n)]

    def to_dev_limbs(self) -> np.ndarray:
        """-> uint32 (n, 16) device-layout Montgomery limbs."""
        return self.ctx.unpack_u32(self.a)


def _broadcast(a: HVec, b: HVec):
    """Return (vec, scalar4) if one side is a 1-element scalar, else None."""
    if b.n == 1 and a.n != 1:
        return a, b.a[0]
    if a.n == 1 and b.n != 1:
        return b, a.a[0]
    return None
