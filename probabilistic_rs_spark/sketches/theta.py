"""Theta / KMV sketch — distinct counting WITH set algebra.

The reference's structures (Bloom/cuckoo/quotient membership, HLL
cardinality, CMS counts — ``specs/overview.md:20-24``) stop at union:
HLL register-max merges estimate ``|A ∪ B|`` but cannot estimate
``|A ∩ B|`` or ``|A \\ B|`` without inclusion–exclusion error blow-up.
The theta sketch closes that gap following the published framework
(Dasgupta, Lang, Rhodes, Thaler — "The Theta-Sketch Framework", 2016;
the KMV estimator is Bar-Yossef et al. 2002): keep the ``k`` smallest
distinct 63-bit hash values; the sampling threshold θ then supports
closed-form union / intersection / A-not-B estimates on the retained
samples themselves.

State invariant (pure function of the absorbed distinct-hash set ``D``):

* ``|D| <= k``: ``theta = 2^63`` (no sampling yet), ``retained = D``
  sorted — **exact mode**: ``estimate() == |D|`` up to 63-bit hash
  collisions (P ≈ n²/2⁶⁴, negligible).
* ``|D| > k``: ``theta`` = the (k+1)-th smallest element of ``D``,
  ``retained`` = the k smallest (all strictly below θ).

Because the state depends only on ``D``, ANY batch split, partition
assignment, or merge-tree shape yields byte-identical ``to_bytes()`` —
the same bit-equality contract as Bloom/HLL/CMS/quotient (SURVEY §2
item 33), gated generatively in ``tests/test_properties.py``.

Estimator: ``|retained| / (theta / 2^63)``. With ``theta`` the (k+1)-th
order statistic of ``n`` uniforms and ``|retained| = k`` this is exactly
unbiased (``E[1/U_(j)] = n/(j-1)`` for ``U_(j) ~ Beta(j, n-j+1)``);
relative standard error ≈ ``1/sqrt(k-2)``.

Set operations (module functions, each returning a new sketch so they
compose): under the common threshold ``θ = min(θ_A, θ_B)`` the retained
sets are coordinated uniform samples of their base sets, so

* union:        filter both below θ, set-union, trim to k
* intersection: ``R_A ∩ R_B`` below θ
* A-not-B:      ``R_A \\ R_B`` below θ

each estimated as ``|R| / (θ / 2^63)`` (Dasgupta et al. §3). Note the
intersection/difference RESULTS are valid sketches for further estimates
but are no longer pure functions of a base multiset — only union keeps
the mergeable bit-equality contract, which is why only union appears in
the distributed aggregation path.
"""

from __future__ import annotations

import struct

import numpy as np

from probabilistic_rs_spark.errors import SketchConfigError, SketchStateError
from probabilistic_rs_spark.sketches.base import TYPE_THETA, pack_header, unpack_header, unpack_meta

U64 = np.uint64

THETA_MAX = 1 << 63  # exact-mode threshold: hashes live in [0, 2^63)

_META = struct.Struct("<qQq")  # k, theta (uint64), n_updates


class ThetaSketch:
    """Mergeable KMV/theta state over pre-computed 64-bit hashes.

    Same division of labor as :class:`~probabilistic_rs_spark.sketches.
    hll.HyperLogLog`: callers supply JVM-side ``xxhash64`` values, the
    kernel only filters/sorts. The raw 64-bit hash is shifted right one
    bit so all threshold arithmetic stays in ``[0, 2^63)`` — exactly
    representable in both uint64 and the JVM's signed int64, mirroring
    the native-Bloom family's ANSI-overflow-proof shift idiom.
    """

    __slots__ = ("k", "theta", "retained", "n_updates")

    def __init__(self, k: int = 4096):
        if not (16 <= k <= (1 << 26)):
            raise SketchConfigError(f"theta k must be in [16, 2^26], got {k}")
        self.k = int(k)
        self.theta = U64(THETA_MAX)
        self.retained = np.empty(0, dtype=U64)  # sorted, unique, all < theta
        self.n_updates = 0

    # -- updates ----------------------------------------------------------

    def update_hashes(self, hashes: np.ndarray) -> None:
        """Absorb a batch of raw 64-bit hashes (uint64 view of JVM
        ``xxhash64`` output is fine)."""
        if hashes.size == 0:
            return
        self.n_updates += int(hashes.size)
        h = hashes.astype(U64, copy=False) >> U64(1)
        h = h[h < self.theta]
        if h.size == 0:
            return
        self.retained = np.union1d(self.retained, h)
        self._trim()

    def _trim(self) -> None:
        if self.retained.size > self.k:
            # retained is sorted unique: element k is the (k+1)-th smallest
            self.theta = self.retained[self.k]
            self.retained = self.retained[: self.k]

    # -- merge (union) ----------------------------------------------------

    def merge(self, other: "ThetaSketch") -> None:
        if self.k != other.k:
            raise SketchConfigError(
                f"cannot merge theta sketches with different k: {self.k} vs {other.k}"
            )
        self.theta = min(self.theta, other.theta)
        pool = np.union1d(self.retained, other.retained)
        self.retained = pool[pool < self.theta]
        self._trim()
        self.n_updates += other.n_updates

    # -- estimates --------------------------------------------------------

    @property
    def is_exact(self) -> bool:
        return int(self.theta) == THETA_MAX

    def estimate(self) -> float:
        if self.is_exact:
            return float(self.retained.size)
        return self.retained.size / (int(self.theta) / THETA_MAX)

    def rse(self) -> float:
        """Published relative standard error of the estimate (0 in exact
        mode): ≈ 1/sqrt(k-2) once sampling has begun."""
        if self.is_exact:
            return 0.0
        return 1.0 / float(np.sqrt(self.k - 2))

    # -- serialization ----------------------------------------------------

    def to_bytes(self) -> bytes:
        return (
            pack_header(TYPE_THETA)
            + _META.pack(self.k, int(self.theta), self.n_updates)
            + self.retained.astype("<u8").tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "ThetaSketch":
        _, off = unpack_header(data, TYPE_THETA)
        k, theta, n_updates = unpack_meta(_META, data, off)
        off += _META.size
        payload = data[off:]
        if len(payload) % 8:
            raise SketchStateError(
                f"theta payload not 8-byte aligned: {len(payload)} bytes"
            )
        sk = cls(k=k)
        sk.theta = U64(theta)
        sk.retained = np.frombuffer(payload, dtype="<u8").astype(U64)
        sk.n_updates = n_updates
        if theta > THETA_MAX:
            raise SketchStateError(f"theta above domain max: {theta}")
        if theta == 0:
            # a zero theta passes the sorted-unique check vacuously but
            # makes estimate() divide by zero later — reject at the wire
            # boundary like the round-7 cuckoo/KLL guards (ADVICE r7)
            raise SketchStateError("theta must be positive")
        if sk.retained.size and (
            sk.retained[-1] >= sk.theta or np.any(np.diff(sk.retained.view(np.int64)) <= 0)
        ):
            raise SketchStateError("theta retained set not sorted-unique below theta")
        if sk.retained.size > k:
            raise SketchStateError(
                f"theta retained {sk.retained.size} exceeds k={k}"
            )
        return sk

    # -- stats ------------------------------------------------------------

    def stats(self) -> dict:
        return {
            "k": self.k,
            "retained": int(self.retained.size),
            "theta": int(self.theta),
            "exact": self.is_exact,
            "n_updates": self.n_updates,
            "memory_bytes": int(self.retained.nbytes) + _META.size + 8,
        }


# ---------------------------------------------------------------------------
# set algebra (Dasgupta et al. §3: estimate on the common threshold)
# ---------------------------------------------------------------------------


def _common(a: ThetaSketch, b: ThetaSketch) -> tuple[U64, np.ndarray, np.ndarray]:
    if a.k != b.k:
        raise SketchConfigError(
            f"set ops need equal k: {a.k} vs {b.k}"
        )
    theta = min(a.theta, b.theta)
    return theta, a.retained[a.retained < theta], b.retained[b.retained < theta]


def _result(k: int, theta: U64, retained: np.ndarray) -> ThetaSketch:
    out = ThetaSketch(k=k)
    out.theta = U64(theta)
    out.retained = retained
    return out


def theta_union(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """Pure-function union (same as :meth:`ThetaSketch.merge`, but
    non-destructive)."""
    theta, ra, rb = _common(a, b)
    out = _result(a.k, theta, np.union1d(ra, rb))
    out._trim()
    out.n_updates = a.n_updates + b.n_updates
    return out


def theta_intersect(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """``|A ∩ B|`` estimator: both retained sets are uniform samples of
    their base sets below the common θ, so their intersection is a
    uniform sample of ``A ∩ B`` below θ."""
    theta, ra, rb = _common(a, b)
    return _result(a.k, theta, np.intersect1d(ra, rb))


def theta_a_not_b(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """``|A \\ B|`` estimator (e.g. "users seen this week but never
    before" retention queries)."""
    theta, ra, rb = _common(a, b)
    return _result(a.k, theta, np.setdiff1d(ra, rb))


def theta_jaccard(a: ThetaSketch, b: ThetaSketch) -> float:
    """Jaccard similarity estimate ``|A ∩ B| / |A ∪ B|`` on the
    coordinated samples (both estimates share θ, so the ratio cancels
    the threshold)."""
    theta, ra, rb = _common(a, b)
    n_union = np.union1d(ra, rb).size
    if n_union == 0:
        return 0.0
    return float(np.intersect1d(ra, rb).size / n_union)
