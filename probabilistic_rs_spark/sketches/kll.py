"""KLL quantile sketch — paper-derived `[papers]` (Karnin–Lang–Liberty
2016; rank-error framing per "Relative Error Streaming Quantiles",
PODS 2021 — see PAPERS.md).

* state: a hierarchy of compactors; items at level ``h`` carry weight
  ``2^h``. Level capacities decay geometrically (``k·c^(depth)``, c=2/3)
  so total space is O(k).
* compaction: sort the level, promote every other item to the level above,
  discard the rest. The even/odd offset is **deterministic** — derived from
  a per-sketch compaction counter, not an RNG (SURVEY.md §7 "hard parts"
  #2) — so identical update sequences produce bit-identical states; across
  shuffled merge orders only the rank-error bound is invariant
  (SURVEY.md §2.8 caveat).
* merge: levelwise concatenation followed by standard compaction.
* rank error: ε ≈ O(1/k) with the geometric-capacity schedule.
"""

from __future__ import annotations

import struct

import numpy as np

from probabilistic_rs_spark.errors import SketchConfigError, SketchStateError
from probabilistic_rs_spark.sketches.base import TYPE_KLL, pack_header, unpack_header, unpack_meta

_C = 2.0 / 3.0

_META = struct.Struct("<qqqq")  # k, n, compact_counter, n_levels


class KLLSketch:
    __slots__ = ("k", "levels", "n", "compact_counter")

    def __init__(self, k: int = 200):
        if k < 8:
            raise SketchConfigError("KLL k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.compact_counter = 0

    def _capacity(self, h: int) -> int:
        """Capacity of level h when there are H levels: top level gets k,
        lower levels decay by c per step down."""
        depth = len(self.levels) - 1 - h
        return max(2, int(np.ceil(self.k * (_C ** depth))))

    # -- update -----------------------------------------------------------

    def update_values(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], values])
        self.n += len(values)
        self._compact_all()

    def _compact_all(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) > self._capacity(h):
                self._compact_level(h)
                # capacities shift when a new top level appears; restart scan
                h = 0
            else:
                h += 1

    def _compact_level(self, h: int) -> None:
        buf = np.sort(self.levels[h], kind="stable")
        if len(buf) % 2 == 1:
            # hold back one item to keep pairs even (keep the last/max)
            keep, buf = buf[-1:], buf[:-1]
        else:
            keep = np.empty(0, dtype=np.float64)
        offset = self.compact_counter & 1
        self.compact_counter += 1
        promoted = buf[offset::2]
        self.levels[h] = keep
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    # -- merge ------------------------------------------------------------

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if self.k != other.k:
            raise SketchStateError(f"KLL k mismatch: {self.k} vs {other.k}")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lvl in enumerate(other.levels):
            if len(lvl):
                self.levels[h] = np.concatenate([self.levels[h], lvl])
        self.n += other.n
        self.compact_counter += other.compact_counter
        self._compact_all()
        return self

    # -- estimate -----------------------------------------------------------

    def rank(self, x: float) -> int:
        """Estimated number of items <= x."""
        r = 0
        for h, lvl in enumerate(self.levels):
            if len(lvl):
                r += (1 << h) * int(np.count_nonzero(lvl <= x))
        return r

    def _weighted_sorted(self) -> tuple[np.ndarray, np.ndarray]:
        items = []
        weights = []
        for h, lvl in enumerate(self.levels):
            if len(lvl):
                items.append(lvl)
                weights.append(np.full(len(lvl), 1 << h, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        items = np.concatenate(items)
        weights = np.concatenate(weights)
        order = np.argsort(items, kind="stable")
        return items[order], weights[order]

    def quantile(self, q: float | np.ndarray) -> np.ndarray:
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        items, weights = self._weighted_sorted()
        if len(items) == 0:
            return np.full(qs.shape, np.nan)
        cum = np.cumsum(weights)
        total = cum[-1]
        targets = np.clip(qs * total, 1, total)
        idx = np.searchsorted(cum, targets, side="left")
        return items[np.minimum(idx, len(items) - 1)]

    def cdf_batch(self, values: np.ndarray) -> np.ndarray:
        """Vectorized estimated rank fraction P(X <= v) for a batch — the
        inverse of :meth:`quantile`, one ``searchsorted`` over the
        weighted sorted retained items (the same estimator as
        :meth:`rank`, normalized by total weight; compaction preserves
        total weight = n). NaN for an empty sketch; NaN inputs map to
        NaN (→ null through the pandas probe) rather than silently
        sorting past the last item as cdf=1.0 — keeps :func:`kll_cdf_probe`
        and :func:`native_kll_cdf_probe` interchangeable on null input
        and matches the t-digest family (``np.interp`` propagates NaN)."""
        values = np.asarray(values, dtype=np.float64)
        items, weights = self._weighted_sorted()
        if len(items) == 0:
            return np.full(values.shape, np.nan)
        cum = np.cumsum(weights)
        total = cum[-1]
        idx = np.searchsorted(items, values, side="right")
        ranks = np.where(idx > 0, cum[np.maximum(idx - 1, 0)], 0)
        return np.where(np.isnan(values), np.nan, ranks / float(total))

    @property
    def item_min(self) -> float:
        """Smallest retained item (≈ the true min up to rank error)."""
        return float(min(lvl.min() for lvl in self.levels if len(lvl)))

    @property
    def item_max(self) -> float:
        return float(max(lvl.max() for lvl in self.levels if len(lvl)))

    def rank_error_bound(self) -> float:
        """Empirical-grade bound ~ 2/k for the geometric schedule (the
        asymptotic bound is O((1/ε)·√log(1/δ)) space, i.e. ε ≈ c/k)."""
        return 2.0 / self.k

    @property
    def n_retained(self) -> int:
        return sum(len(lvl) for lvl in self.levels)

    # -- serialization -----------------------------------------------------

    def to_bytes(self) -> bytes:
        meta = _META.pack(self.k, self.n, self.compact_counter, len(self.levels))
        lens = struct.pack(f"<{len(self.levels)}q", *[len(lv) for lv in self.levels])
        body = b"".join(lv.tobytes() for lv in self.levels)
        return pack_header(TYPE_KLL) + meta + lens + body

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLLSketch":
        _, off = unpack_header(data, TYPE_KLL)
        k, n, counter, n_levels = unpack_meta(_META, data, off)
        off += _META.size
        # level-count / length-table sanity BEFORE any unpack: a corrupt
        # count must become a typed error, not a raw struct.error or a
        # negative-count frombuffer (wire-fuzz sweep finding)
        if not (0 <= n_levels <= 64):
            raise SketchStateError(f"corrupt KLL level count: {n_levels}")
        if len(data) < off + 8 * n_levels:
            raise SketchStateError("KLL state truncated in level-length table")
        lens = struct.unpack_from(f"<{n_levels}q", data, off)
        off += 8 * n_levels
        need = off + 8 * sum(lens)
        if any(ln < 0 for ln in lens) or len(data) < need:
            raise SketchStateError(
                f"KLL state truncated: need {need} bytes, have {len(data)}"
            )
        sk = cls(k=k)
        sk.n = n
        sk.compact_counter = counter
        sk.levels = []
        for ln in lens:
            sk.levels.append(np.frombuffer(data, dtype=np.float64, offset=off, count=ln).copy())
            off += 8 * ln
        return sk
