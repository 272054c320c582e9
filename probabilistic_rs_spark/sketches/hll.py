"""HyperLogLog (dense + sparse) — paper-derived `[papers]`.

The reference lists HLL as planned-but-unimplemented
(``specs/overview.md:20-24``); per SURVEY.md §2.8 this implementation
derives from Flajolet et al. 2007 and the HLL++ sparse-mode idea
(Heule/Nunkesser/Hall 2013), reusing the reference's design idioms:
config → derived parameters, mergeable binary state, batched updates.

* **Dense**: ``m = 2^p`` uint8 registers; update = register-max of
  ``rho(hash)``; merge = element-wise max (associative+commutative, exact).
* **Sparse**: a deduplicated sorted array of raw 64-bit hashes kept while
  ``len <= sparse_threshold``. The estimate in sparse mode is the count of
  distinct hashes, which equals the true distinct count up to 64-bit hash
  collisions (P ≈ n²/2⁶⁵ — negligible at sparse sizes). Merging two sparse
  states = set-union; overflow upgrades to dense.
* **Estimate (dense)**: bias-corrected harmonic mean with the standard
  small-range linear-counting correction; relative error ≤ 1.04/√m.
"""

from __future__ import annotations

import struct

import numpy as np

from probabilistic_rs_spark.errors import SketchConfigError, SketchStateError
from probabilistic_rs_spark.sketches.base import TYPE_HLL, pack_header, unpack_header, unpack_meta

U64 = np.uint64

_META = struct.Struct("<bbqq")  # p, mode(0=sparse,1=dense), sparse_threshold, n_updates

_MODE_SPARSE = 0
_MODE_DENSE = 1


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (branchless binary search)."""
    x = x.astype(U64, copy=True)
    r = np.zeros(x.shape, dtype=U64)
    for s in (32, 16, 8, 4, 2, 1):
        s_ = U64(s)
        big = x >= (U64(1) << s_)
        r += np.where(big, s_, U64(0))
        x = np.where(big, x >> s_, x)
    return r + x  # x is now 0 or 1


class HyperLogLog:
    """Mergeable HLL state over pre-computed 64-bit hashes.

    Callers supply hashes (JVM-side ``xxhash64`` column, or
    ``functions.hashing.hash64_batch``) so the Python side only does the
    register scatter — the hashing hot path stays on the JVM.
    """

    __slots__ = ("p", "m", "sparse_threshold", "mode", "registers", "sparse", "n_updates")

    def __init__(self, p: int = 14, sparse_threshold: int | None = None):
        if not (4 <= p <= 18):
            raise SketchConfigError(f"HLL precision p must be in [4,18], got {p}")
        self.p = p
        self.m = 1 << p
        # default: stay sparse while the sparse payload (8B/entry) is no
        # larger than twice the dense payload (1B/register)
        self.sparse_threshold = (
            sparse_threshold if sparse_threshold is not None else self.m // 4
        )
        self.mode = _MODE_SPARSE
        self.registers: np.ndarray | None = None
        self.sparse: np.ndarray = np.empty(0, dtype=U64)
        self.n_updates = 0

    # -- update --------------------------------------------------------------

    def update_hashes(self, hashes: np.ndarray) -> None:
        hashes = hashes.astype(U64, copy=False)
        self.n_updates += len(hashes)
        if self.mode == _MODE_SPARSE:
            self.sparse = np.unique(np.concatenate([self.sparse, hashes]))
            if len(self.sparse) > self.sparse_threshold:
                self._to_dense()
        else:
            self._dense_update(hashes)

    def _rho_idx(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        p_ = U64(self.p)
        idx = (hashes >> (U64(64) - p_)).astype(np.int64)
        w = (hashes << p_).astype(U64)  # wraps: low 64-p bits shifted up
        rho = (U64(64) - _bit_length_u64(w) + U64(1)).astype(np.uint8)
        rho = np.where(w == 0, np.uint8(64 - self.p + 1), rho)
        return idx, rho

    def _dense_update(self, hashes: np.ndarray) -> None:
        idx, rho = self._rho_idx(hashes)
        np.maximum.at(self.registers, idx, rho)

    def _to_dense(self) -> None:
        self.registers = np.zeros(self.m, dtype=np.uint8)
        self.mode = _MODE_DENSE
        if len(self.sparse):
            self._dense_update(self.sparse)
        self.sparse = np.empty(0, dtype=U64)

    # -- merge ---------------------------------------------------------------

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if self.p != other.p:
            raise SketchStateError(f"HLL precision mismatch: {self.p} vs {other.p}")
        self.n_updates += other.n_updates
        if self.mode == _MODE_SPARSE and other.mode == _MODE_SPARSE:
            self.sparse = np.unique(np.concatenate([self.sparse, other.sparse]))
            if len(self.sparse) > self.sparse_threshold:
                self._to_dense()
        else:
            if self.mode == _MODE_SPARSE:
                self._to_dense()
            if other.mode == _MODE_SPARSE:
                if len(other.sparse):
                    self._dense_update(other.sparse)
            else:
                np.maximum(self.registers, other.registers, out=self.registers)
        return self

    # -- estimate ------------------------------------------------------------

    def estimate(self) -> float:
        if self.mode == _MODE_SPARSE:
            # exact-up-to-hash-collision distinct count (HLL++ sparse idea)
            return float(len(self.sparse))
        m = float(self.m)
        regs = self.registers.astype(np.float64)
        raw = _alpha(self.m) * m * m / np.sum(np.exp2(-regs))
        if raw <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)  # linear counting
        return float(raw)

    def relative_error_bound(self) -> float:
        return 1.04 / (self.m ** 0.5)

    # -- serialization ---------------------------------------------------------

    def to_bytes(self) -> bytes:
        meta = _META.pack(self.p, self.mode, self.sparse_threshold, self.n_updates)
        payload = (
            self.sparse.tobytes() if self.mode == _MODE_SPARSE else self.registers.tobytes()
        )
        return pack_header(TYPE_HLL) + meta + payload

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        _, off = unpack_header(data, TYPE_HLL)
        p, mode, thresh, n_updates = unpack_meta(_META, data, off)
        sk = cls(p=p, sparse_threshold=thresh)
        sk.n_updates = n_updates
        body = data[off + _META.size :]
        if mode == _MODE_SPARSE:
            sk.sparse = np.frombuffer(body, dtype=U64).copy()
        else:
            regs = np.frombuffer(body, dtype=np.uint8)
            if len(regs) != sk.m:
                raise SketchStateError("HLL register count mismatch")
            sk.mode = _MODE_DENSE
            sk.registers = regs.copy()
            sk.sparse = np.empty(0, dtype=U64)
        return sk
