"""t-digest (merging variant) — paper-derived `[papers]` (Dunning &
Ertl, "Computing extremely accurate quantiles using t-digests").

Planned-but-unimplemented in the reference; built with its idioms:
config → compression δ, mergeable binary state, batch updates.

* state: centroid list (mean float64, weight float64) sorted by mean,
  plus (min, max, total weight).
* scale function: k1 — ``k(q) = δ/(2π)·asin(2q−1)`` — which concentrates
  centroid resolution at the extreme quantiles.
* compression: **vectorized unit-interval binning** — centroids whose
  ``floor(k(q_mid))`` coincide are merged (one ``np.add.reduceat`` pass
  instead of a per-centroid Python loop). Yields ≤ δ/2 + 2 centroids and
  preserves the k1 tail-resolution property; deterministic for a given
  input multiset order (sort is stable).
* merge: concatenate centroid lists + compress. Associative/commutative at
  the *bound* level (estimates stay within the rank-error bound under any
  merge order; not bit-identical — SURVEY.md §2.8 caveat).
"""

from __future__ import annotations

import struct

import numpy as np

from probabilistic_rs_spark.errors import SketchConfigError, SketchStateError
from probabilistic_rs_spark.sketches.base import TYPE_TDIGEST, pack_header, unpack_header, unpack_meta

# delta, min, max, total_weight, n_centroids
_META = struct.Struct("<ddddq")


class TDigest:
    __slots__ = ("delta", "means", "weights", "vmin", "vmax", "total_weight")

    def __init__(self, delta: float = 200.0):
        if delta < 10:
            raise SketchConfigError("t-digest compression delta must be >= 10")
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.vmin = np.inf
        self.vmax = -np.inf
        self.total_weight = 0.0

    # -- scale function --------------------------------------------------------

    def _k(self, q: np.ndarray) -> np.ndarray:
        x = np.clip(2.0 * q - 1.0, -1.0, 1.0)
        return (self.delta / (2.0 * np.pi)) * np.arcsin(x)

    # -- compression -----------------------------------------------------------

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        if len(means) == 0:
            self.means = means
            self.weights = weights
            return
        order = np.argsort(means, kind="stable")
        means = means[order]
        weights = weights[order]
        w_total = weights.sum()
        cum = np.cumsum(weights)
        q_mid = (cum - weights / 2.0) / w_total
        bins = np.floor(self._k(q_mid)).astype(np.int64)
        # boundaries where the bin id changes
        starts = np.flatnonzero(np.diff(bins, prepend=bins[0] - 1))
        wsum = np.add.reduceat(weights, starts)
        msum = np.add.reduceat(weights * means, starts)
        self.means = msum / wsum
        self.weights = wsum
        self.total_weight = float(w_total)

    # -- update / merge ----------------------------------------------------------

    def update_values(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self.vmin = min(self.vmin, float(values.min()))
        self.vmax = max(self.vmax, float(values.max()))
        self._compress(
            np.concatenate([self.means, values]),
            np.concatenate([self.weights, np.ones(len(values))]),
        )

    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise SketchStateError(
                f"t-digest compression mismatch: {self.delta} vs {other.delta}"
            )
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
        )
        return self

    # -- estimate ------------------------------------------------------------------

    def quantile(self, q: float | np.ndarray) -> np.ndarray:
        """Interpolated quantile(s); centroids anchor at their mid cumulative
        weight, with (min, max) as hard endpoints."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if len(self.means) == 0:
            return np.full(qs.shape, np.nan)
        cum = np.cumsum(self.weights)
        centers = cum - self.weights / 2.0
        xs = np.concatenate([[0.0], centers, [self.total_weight]])
        ys = np.concatenate([[self.vmin], self.means, [self.vmax]])
        return np.interp(qs * self.total_weight, xs, ys)

    def cdf(self, x: float) -> float:
        """Approximate rank fraction of x."""
        return float(self.cdf_batch(np.array([x]))[0])

    def cdf_batch(self, xs_in: np.ndarray) -> np.ndarray:
        """Vectorized approximate rank fractions for a batch of values
        (the inverse of :meth:`quantile`; one interp per Arrow batch)."""
        xs_in = np.asarray(xs_in, dtype=np.float64)
        if len(self.means) == 0:
            return np.full(xs_in.shape, np.nan)
        cum = np.cumsum(self.weights)
        centers = cum - self.weights / 2.0
        xs = np.concatenate([[self.vmin], self.means, [self.vmax]])
        ps = np.concatenate([[0.0], centers, [self.total_weight]])
        return np.interp(xs_in, xs, ps) / self.total_weight

    @property
    def n_centroids(self) -> int:
        return len(self.means)

    # -- serialization ----------------------------------------------------------------

    def to_bytes(self) -> bytes:
        meta = _META.pack(self.delta, self.vmin, self.vmax, self.total_weight, len(self.means))
        return (
            pack_header(TYPE_TDIGEST)
            + meta
            + self.means.tobytes()
            + self.weights.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        _, off = unpack_header(data, TYPE_TDIGEST)
        delta, vmin, vmax, total_w, n = unpack_meta(_META, data, off)
        sk = cls(delta=delta)
        sk.vmin = vmin
        sk.vmax = vmax
        sk.total_weight = total_w
        body = off + _META.size
        sk.means = np.frombuffer(data, dtype=np.float64, offset=body, count=n).copy()
        sk.weights = np.frombuffer(
            data, dtype=np.float64, offset=body + 8 * n, count=n
        ).copy()
        return sk
