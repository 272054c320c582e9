"""Count sketch + AMS second moment — unbiased point estimates and F2.

The reference's frequency structure is CMS (planned,
``specs/overview.md:20-24``): a one-sided estimator whose overestimate
degrades adversarially under heavy skew (every colliding key ADDS to the
cell). The count sketch (Charikar, Chen, Farach-Colton — "Finding
Frequent Items in Data Streams", ICALP 2002) is the signed complement,
and its rows double as the classic AMS second-moment estimator
(Alon, Matias, Szegedy — "The Space Complexity of Approximating the
Frequency Moments", STOC 1996):

* state: ``d × w`` int64 matrix (w a power of two, d odd);
* update: for each row j, ``table[j, bucket_j(x)] += sign_j(x) · count``
  — collisions cancel in expectation instead of accumulating;
* point estimate: ``median_j( sign_j(x) · table[j, bucket_j(x)] )`` —
  UNBIASED, with ``|est − true| ≤ ε·√F2`` w.h.p. at ``w ≥ 2/ε²``
  (per-row variance ≤ F2/w; the median over d odd rows drives the
  failure probability to δ at ``d = O(log 1/δ)``);
* second moment: ``median_j( Σ_c table[j, c]² )`` estimates
  ``F2 = Σ_x count(x)²`` — the SELF-JOIN SIZE — with per-row variance
  ``≤ 2·F2²/w`` (AMS Thm 2.2). At 100 TB this is the number a planner
  needs before committing to a shuffle join on a possibly-skewed key:
  F2/N² close to 1 means one hot key dominates (salt or broadcast),
  F2 ≈ N means near-unique keys (plain shuffle join is fine).
* merge: matrix add — a LINEAR sketch, so the state is a pure function
  of the absorbed multiset and any partitioning / merge tree yields
  byte-identical ``to_bytes()`` (bit-equality family, SURVEY §2 item 33,
  gated generatively in ``tests/test_properties.py``).

Hash derivation (JVM-parity-safe, mirroring the native-Bloom idiom in
``operators/sketch_agg.native_bloom_base_hash_exprs``): the two KM base
hashes ``h1 = xxhash64(x) >> 2`` (62 bits) and ``h2 = xxhash64(lit(1),
x) >> 8`` (56 bits) are computed JVM-side; the kernel derives

    bucket_j = (h1 + j·h2) & (w−1)            (j·h2 < 31·2^56 → no overflow)
    sign_j   = 1 − 2·((h2 + j·(h1 >> 7)) >> 20 & 1)   (< 2^61 → no overflow)

Buckets and signs come from the two independent xxhash64 evaluations
(bucket chain keyed on h1, sign chain keyed on h2), every step exact in
signed int64 — so ``native_cs_probe`` can re-derive both inside
whole-stage codegen, bit-equal to this kernel's uint64 numpy arithmetic.
The KM-chain construction is the same published trade the Bloom families
make (Kirsch–Mitzenmacher, ESA'06): pairwise-independence constants are
empirical rather than 4-wise-proven, gated by the accuracy tests.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from probabilistic_rs_spark.errors import SketchConfigError, SketchStateError
from probabilistic_rs_spark.sketches.base import TYPE_CS, pack_header, unpack_header, unpack_meta

U64 = np.uint64

_META = struct.Struct("<ddqqq")  # eps, delta, d, w, n_total

_SIGN_SHIFT = U64(20)  # sign bit position in the sign chain (below 2^61 always set-able)


class CountSketch:
    __slots__ = ("eps", "delta", "d", "w", "table", "n_total")

    def __init__(self, eps: float = 0.02, delta: float = 0.001):
        if not (0.0 < eps < 1.0):
            raise SketchConfigError("count sketch eps must be in (0,1)")
        if not (0.0 < delta < 1.0):
            raise SketchConfigError("count sketch delta must be in (0,1)")
        self.eps = eps
        self.delta = delta
        d = max(1, math.ceil(math.log(1.0 / delta)))
        self.d = d if d % 2 == 1 else d + 1  # odd → integer median
        if self.d > 31:
            raise SketchConfigError(
                f"count sketch d={self.d} exceeds 31 (delta too small); "
                "the KM chains' overflow-free bound requires j < 32"
            )
        w = max(16, math.ceil(2.0 / (eps * eps)))
        self.w = 1 << (w - 1).bit_length()  # next power of two
        if self.w > (1 << 26):
            raise SketchConfigError(
                f"count sketch width {self.w} exceeds 2^26 (eps too small); "
                f"state would be {self.d * self.w * 8 / 2**20:.0f} MiB per partial"
            )
        self.table = np.zeros((self.d, self.w), dtype=np.int64)
        self.n_total = 0

    # -- hash chains --------------------------------------------------------

    def _cells_signs(self, base: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(d, n) bucket indices and ±1 signs from the (n, 2) KM base-hash
        matrix. All arithmetic stays below 2^63 (docstring derivation), so
        the uint64 math here is bit-equal to JVM signed-long expressions."""
        h1 = base[:, 0].astype(np.int64, copy=False).view(U64)
        h2 = base[:, 1].astype(np.int64, copy=False).view(U64)
        j = np.arange(self.d, dtype=U64)[:, None]
        mask = U64(self.w - 1)
        cells = ((h1[None, :] + j * h2[None, :]) & mask).astype(np.uint32)
        sign_chain = (h2[None, :] + j * (h1[None, :] >> U64(7))) >> _SIGN_SHIFT
        signs = 1 - 2 * (sign_chain & U64(1)).astype(np.int64)
        return cells, signs

    # -- updates ------------------------------------------------------------

    def update_base_hashes(
        self, base: np.ndarray, counts: np.ndarray | None = None
    ) -> None:
        """Absorb a batch of (n, 2) KM base-hash rows (the ``hash2`` value
        kind — same wire the native-Bloom kernel consumes)."""
        n = len(base)
        if n == 0:
            return
        cells, signs = self._cells_signs(np.asarray(base))
        if counts is None:
            counts = np.ones(n, dtype=np.int64)
            self.n_total += n
        else:
            counts = counts.astype(np.int64, copy=False)
            self.n_total += int(counts.sum())
        for j in range(self.d):
            np.add.at(self.table[j], cells[j], signs[j] * counts)

    # -- estimates ----------------------------------------------------------

    def estimate_base_hashes(self, base: np.ndarray) -> np.ndarray:
        """Unbiased point estimates for a batch: median over the d signed
        cell reads (d odd → the median IS one of the reads: exact int64)."""
        if len(base) == 0:
            return np.zeros(0, dtype=np.int64)
        cells, signs = self._cells_signs(np.asarray(base))
        reads = signs * self.table[np.arange(self.d)[:, None], cells]
        # middle-element select keeps the median in exact int64 (ADVICE
        # r7: np.median converts to float64, which can differ by a ULP
        # from the Batcher network's exact int64 for |read| > 2^53)
        return np.partition(reads, self.d // 2, axis=0)[self.d // 2]

    def f2_estimate(self) -> float:
        """AMS second-moment / self-join-size estimate: median over rows of
        the row's sum of squared cells. float64 — at n_total ~ 10^12 the
        squares exceed int64, and the estimator is approximate anyway."""
        row_f2 = (self.table.astype(np.float64) ** 2).sum(axis=1)
        return float(np.median(row_f2))

    def point_error_bound(self) -> float:
        """Published point-error scale: ``|est − true| ≤ ε·√F2`` with
        probability ≥ 1−δ (per-row Chebyshev at w ≥ 2/ε², median boost).
        Self-certifying: uses the state's own F2 estimate."""
        return self.eps * math.sqrt(max(self.f2_estimate(), 0.0))

    # -- merge ----------------------------------------------------------------

    def merge(self, other: "CountSketch") -> "CountSketch":
        if (self.d, self.w) != (other.d, other.w):
            raise SketchStateError(
                f"count sketch shape mismatch: ({self.d},{self.w}) vs ({other.d},{other.w})"
            )
        self.table += other.table
        self.n_total += other.n_total
        return self

    def merge_bytes(self, data: bytes) -> "CountSketch":
        """Fold a serialized partial in place (one dense allocation per
        reducer — same hot-path contract as CMS.merge_bytes)."""
        version, off = unpack_header(data, TYPE_CS)
        eps, delta, d, w, n_total = unpack_meta(_META, data, off)
        if (self.d, self.w) != (d, w):
            raise SketchStateError(
                f"count sketch shape mismatch: ({self.d},{self.w}) vs ({d},{w})"
            )
        body_off = off + _META.size
        if version == 2:
            body = len(data) - body_off
            if body % 12:
                raise SketchStateError("corrupt sparse count-sketch payload")
            nnz = body // 12
            idx = np.frombuffer(data, dtype=np.uint32, offset=body_off, count=nnz)
            cnt = np.frombuffer(data, dtype=np.int64, offset=body_off + 4 * nnz, count=nnz)
            if nnz and int(idx.max()) >= d * w:
                raise SketchStateError("sparse count-sketch index out of range")
            if nnz > 1 and np.any(np.diff(idx.astype(np.int64)) <= 0):
                # to_bytes emits np.flatnonzero output (sorted-unique); a
                # blob with duplicate indices would decode differently on
                # the assignment vs add paths (ADVICE r7) — reject it
                raise SketchStateError("sparse count-sketch indices not sorted-unique")
            np.add.at(self.table, (idx // w, idx % w), cnt)
        else:
            table = np.frombuffer(data, dtype=np.int64, offset=body_off)
            if len(table) != d * w:
                raise SketchStateError("count-sketch table size mismatch")
            self.table += table.reshape(d, w)
        self.n_total += n_total
        return self

    # -- serialization --------------------------------------------------------

    def to_bytes(self) -> bytes:
        """Adaptive wire like CMS: dense d×w matrix, or sparse (uint32 flat
        index, int64 value) pairs when smaller — partition-local partials
        touch ≤ d·rows cells, so the shuffle carries occupied cells only."""
        meta = _META.pack(self.eps, self.delta, self.d, self.w, self.n_total)
        flat = self.table.ravel()
        nz = np.flatnonzero(flat)
        if len(nz) * 12 < flat.nbytes:
            payload = nz.astype(np.uint32).tobytes() + flat[nz].tobytes()
            return pack_header(TYPE_CS, version=2) + meta + payload
        return pack_header(TYPE_CS, version=1) + meta + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountSketch":
        version, off = unpack_header(data, TYPE_CS)
        eps, delta, d, w, n_total = unpack_meta(_META, data, off)
        sk = cls(eps=eps, delta=delta)
        if (sk.d, sk.w) != (d, w):
            raise SketchStateError("count-sketch derived shape mismatch on deserialize")
        body_off = off + _META.size
        if version == 2:
            body = len(data) - body_off
            if body % 12:
                raise SketchStateError("corrupt sparse count-sketch payload")
            nnz = body // 12
            idx = np.frombuffer(data, dtype=np.uint32, offset=body_off, count=nnz)
            cnt = np.frombuffer(data, dtype=np.int64, offset=body_off + 4 * nnz, count=nnz)
            if nnz and int(idx.max()) >= d * w:
                raise SketchStateError("sparse count-sketch index out of range")
            if nnz > 1 and np.any(np.diff(idx.astype(np.int64)) <= 0):
                raise SketchStateError("sparse count-sketch indices not sorted-unique")
            sk.table[idx // w, idx % w] = cnt
        else:
            table = np.frombuffer(data, dtype=np.int64, offset=body_off)
            if len(table) != d * w:
                raise SketchStateError("count-sketch table size mismatch")
            sk.table = table.reshape(d, w).copy()
        sk.n_total = n_total
        return sk

    # -- stats ------------------------------------------------------------------

    def stats(self) -> dict:
        return {
            "eps": self.eps,
            "delta": self.delta,
            "d": self.d,
            "w": self.w,
            "n_total": self.n_total,
            "f2_estimate": self.f2_estimate(),
            "point_error_bound": self.point_error_bound(),
            "memory_bytes": int(self.table.nbytes) + _META.size + 8,
        }
