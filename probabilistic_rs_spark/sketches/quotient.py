"""Quotient filter — the last structure on the reference's planned list
(``/root/reference/specs/overview.md:20-24`` "Cuckoo filters, HyperLogLog,
Count-min sketch, Quotient filters"; "Next Up" ``:63-66``).

A quotient filter stores, for each key, a p-bit fingerprint split into a
q-bit *quotient* (home slot) and an r-bit *remainder* (stored value)
[Bender et al., "Don't Thrash: How to Cache Your Hash on Flash", 2012].
Its two properties the reference wants it for over cuckoo:

* **deletion** — like cuckoo, a stored fingerprint can be removed;
* **true associative merge** — a quotient filter is informationally a
  SORTED MULTISET of p-bit fingerprints, and two filters merge by a
  sorted-run union (the standard QF/CQF merge algorithm). That is an
  associative + commutative + deterministic fold, so unlike cuckoo this
  structure drops straight into ``sketch_aggregate``'s partial/merge
  machinery (grouped or global) with bit-identical results under any
  shuffle order or parallelism.

Spark-native layout choice: the canonical state here IS the sorted
fingerprint run (uint32 when p ≤ 32, else uint64) rather than the
bit-packed 3-metadata-bit probing table — the packed table is an in-RAM
point-query optimization; for a distributed engine the merge/ship/scan
format is the sorted run (probes are vectorized ``searchsorted`` over a
whole Arrow batch, which is the batch analog of slot probing). Slot
semantics are preserved: capacity is 2^q slots, inserts beyond the 0.95
load factor raise (the same explicit-overflow contract as the cuckoo
shard build), and the FPR bound is the textbook ``n · 2^-p`` hard-
collision probability, ≈ load_factor · 2^-r.

Hash family: JVM-side ``xxhash64`` (the engine's "hash" value kind, same
as HLL/CMS) — the top p bits form the fingerprint, so build, probe, and
delete agree without any Python-side hashing.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from probabilistic_rs_spark.errors import SketchConfigError, SketchStateError
from probabilistic_rs_spark.sketches.base import (
    TYPE_QUOTIENT,
    pack_header,
    unpack_header,
    unpack_meta,
)

_META = struct.Struct("<qdqqqq")  # capacity, fpr, q, r, n_updates, n_items

_MAX_LOAD = 0.95

# Driver-side state-size budget (bytes) checked at CONSTRUCTION time, the
# reference's validate-before-work idiom (``src/bloom/config.rs:31-44``):
# a fingerprint filter's state is O(n_items · fp_width) BY NATURE — unlike
# Bloom/HLL/CMS there is no fixed-size compression — so a capacity that
# implies a multi-GB broadcast/driver blob should fail before any job
# launches, not OOM an executor mid-probe (VERDICT r3 #9). Override per
# filter via ``max_state_bytes``; ``None`` disables (used by from_bytes —
# persisted states are trusted, persisted-config-wins).
DEFAULT_MAX_STATE_BYTES = 256 * 1024 * 1024


def quotient_params(capacity: int, false_positive_rate: float) -> tuple[int, int]:
    """(q, r): 2^q slots covering capacity at ≤0.95 load; r remainder bits
    sized so load·2^-r ≤ target fpr at full load."""
    if capacity <= 0:
        raise SketchConfigError("Capacity must be greater than 0")
    if not (0.0 < false_positive_rate < 1.0):
        raise SketchConfigError("False positive rate must be between 0 and 1")
    q = max(4, math.ceil(math.log2(capacity / _MAX_LOAD)))
    r = max(1, math.ceil(math.log2(_MAX_LOAD / false_positive_rate)))
    if q + r > 64:
        raise SketchConfigError("capacity/fpr need more than 64 fingerprint bits")
    return q, r


class QuotientFilter:
    """Mergeable, deletable fingerprint filter (sorted-run state).

    Contract matches the other sketch cores: ``update_hashes`` /
    ``contains_hashes`` / ``delete_hashes`` absorb whole numpy batches;
    ``merge`` / ``merge_bytes`` are the associative sorted-run union;
    ``to_bytes`` / ``from_bytes`` is the versioned wire format.
    """

    __slots__ = ("capacity", "fpr", "q", "r", "fps", "_pending", "n_updates")

    # Partial states are O(rows) (every partition ships its full sorted
    # fingerprint run), unlike the bounded Bloom/HLL/CMS partials —
    # build_global_state keys its driver-fold-vs-bucketed-pre-merge
    # strategy off this flag (VERDICT r3 #4).
    PARTIALS_UNBOUNDED = True

    def __init__(
        self,
        capacity: int,
        false_positive_rate: float = 0.01,
        max_state_bytes: int | None = DEFAULT_MAX_STATE_BYTES,
    ):
        self.q, self.r = quotient_params(capacity, false_positive_rate)
        self.capacity = int(capacity)
        self.fpr = float(false_positive_rate)
        if max_state_bytes is not None:
            need = self.capacity * np.dtype(self._dtype).itemsize
            if need > max_state_bytes:
                raise SketchConfigError(
                    f"quotient filter state would be {need} bytes at capacity "
                    f"{self.capacity} ({np.dtype(self._dtype).itemsize}-byte "
                    f"fingerprints) > max_state_bytes={max_state_bytes}; "
                    "fingerprint filters hold O(n) state — partition the "
                    "keyspace or raise max_state_bytes explicitly"
                )
        self.fps = np.empty(0, dtype=self._dtype)
        self._pending: list[np.ndarray] = []  # unsorted runs, folded lazily
        self.n_updates = 0

    # -- derived -------------------------------------------------------------

    @property
    def p(self) -> int:
        return self.q + self.r

    @property
    def _dtype(self):
        return np.uint32 if (self.q + self.r) <= 32 else np.uint64

    def _fingerprints(self, hashes: np.ndarray) -> np.ndarray:
        """Top p bits of the 64-bit hash."""
        h = hashes.astype(np.uint64, copy=False)
        return (h >> np.uint64(64 - self.p)).astype(self._dtype)

    def _consolidate(self) -> None:
        if not self._pending:
            return
        allfps = np.concatenate([self.fps] + self._pending)
        allfps.sort(kind="stable")
        self.fps = allfps
        self._pending = []

    @property
    def n_items(self) -> int:
        return len(self.fps) + sum(len(a) for a in self._pending)

    def load_factor(self) -> float:
        return self.n_items / float(1 << self.q)

    def false_positive_rate(self) -> float:
        """Current hard-collision FPR bound: n · 2^-p (≈ load · 2^-r)."""
        return self.n_items * (2.0 ** -self.p)

    # -- update / probe / delete ----------------------------------------------

    def update_hashes(self, hashes: np.ndarray) -> None:
        """Absorb a batch of 64-bit hashes. Raises on slot overflow (the
        explicit contract — a silently over-full filter would quietly
        void the FPR bound)."""
        if len(hashes) == 0:
            return
        if self.n_items + len(hashes) > _MAX_LOAD * (1 << self.q):
            raise SketchStateError(
                f"quotient filter overflow: {self.n_items + len(hashes)} items "
                f"> {_MAX_LOAD:.2f} load of 2^{self.q} slots"
            )
        self._pending.append(self._fingerprints(np.asarray(hashes)))
        self.n_updates += len(hashes)

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership for a whole batch: one searchsorted pass
        (the batch analog of per-slot probing). Zero false negatives;
        false positives ≤ n·2^-p."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        self._consolidate()
        fp = self._fingerprints(np.asarray(hashes))
        idx = np.searchsorted(self.fps, fp)
        idx = np.minimum(idx, max(0, len(self.fps) - 1))
        return (self.fps[idx] == fp) if len(self.fps) else np.zeros(len(fp), dtype=bool)

    def delete_hashes(self, hashes: np.ndarray) -> int:
        """Remove ONE stored occurrence per given hash (multiset delete —
        same contract as cuckoo ``delete_hashes``). Deleting a key that
        was never inserted can, with probability ≤ FPR, remove a
        colliding fingerprint — the documented QF/cuckoo deletion hazard.
        Returns the number of occurrences removed."""
        if len(hashes) == 0:
            return 0
        self._consolidate()
        fp = self._fingerprints(np.asarray(hashes))
        return self._subtract_multiset(fp)

    def _subtract_multiset(self, fp: np.ndarray) -> int:
        """Multiset subtraction on the sorted run: each distinct value in
        ``fp`` removes min(count_in_filter, count_in_fp) occurrences."""
        if len(self.fps) == 0:
            return 0
        del_vals, del_counts = np.unique(fp, return_counts=True)
        have_vals, have_counts = np.unique(self.fps, return_counts=True)
        pos = np.searchsorted(have_vals, del_vals)
        pos_c = np.minimum(pos, len(have_vals) - 1)
        present = have_vals[pos_c] == del_vals
        removed = np.minimum(del_counts[present], have_counts[pos_c[present]])
        n_removed = int(removed.sum())
        if n_removed:
            have_counts[pos_c[present]] -= removed
            keep = have_counts > 0
            self.fps = np.repeat(have_vals[keep], have_counts[keep])
        return n_removed

    def remove_all(self, fp_values: np.ndarray) -> int:
        """Remove EVERY occurrence of the given fingerprint values
        (set-style deletion: used when the engine deletes keys rather
        than occurrences). Returns occurrences removed."""
        if len(fp_values) == 0:
            return 0
        self._consolidate()
        if len(self.fps) == 0:
            return 0
        fp = np.unique(np.asarray(fp_values).astype(self.fps.dtype, copy=False))
        idx = np.searchsorted(fp, self.fps)
        idx_c = np.minimum(idx, len(fp) - 1)
        doomed = fp[idx_c] == self.fps
        n_removed = int(doomed.sum())
        if n_removed:
            self.fps = self.fps[~doomed]
        return n_removed

    # -- merge ----------------------------------------------------------------

    def merge(self, other: "QuotientFilter") -> "QuotientFilter":
        """Sorted-run union — associative, commutative, deterministic.
        Requires identical (q, r); raises on overflow like update."""
        if (self.q, self.r) != (other.q, other.r):
            raise SketchStateError(
                f"incompatible quotient states: (q,r)=({self.q},{self.r}) vs "
                f"({other.q},{other.r})"
            )
        other._consolidate()
        if self.n_items + other.n_items > _MAX_LOAD * (1 << self.q):
            raise SketchStateError("quotient filter overflow on merge")
        self._pending.append(other.fps)
        self.n_updates += other.n_updates
        return self

    def merge_bytes(self, data: bytes) -> "QuotientFilter":
        """Fold a serialized state directly (payload is already a sorted
        run — appended lazily, one global sort at finalization)."""
        other = QuotientFilter.from_bytes(data)
        return self.merge(other)

    def clear(self) -> None:
        self.fps = np.empty(0, dtype=self._dtype)
        self._pending = []
        self.n_updates = 0

    # -- stats ----------------------------------------------------------------

    @property
    def insert_count(self) -> int:
        return self.n_updates

    def approx_memory_bits(self) -> int:
        """Bits of the packed on-disk form: the sorted run at dtype width
        (the bit-packed slot table would be 2^q · (r+3) bits)."""
        return self.n_items * self.fps.itemsize * 8 if self.n_items else 0

    # -- serialization ---------------------------------------------------------

    def to_bytes(self) -> bytes:
        self._consolidate()
        meta = _META.pack(
            self.capacity, self.fpr, self.q, self.r, self.n_updates, len(self.fps)
        )
        return pack_header(TYPE_QUOTIENT, version=1) + meta + self.fps.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "QuotientFilter":
        version, off = unpack_header(data, TYPE_QUOTIENT)
        capacity, fpr, q, r, n_updates, n_items = unpack_meta(_META, data, off)
        # persisted-config-wins: a state legitimately built under a larger
        # budget must deserialize (the budget guards NEW builds)
        sk = cls(capacity, fpr, max_state_bytes=None)
        if (sk.q, sk.r) != (q, r):
            raise SketchStateError("derived (q,r) mismatch on deserialize")
        payload_off = off + _META.size
        try:
            fps = np.frombuffer(data, dtype=sk._dtype, offset=payload_off)
        except ValueError as e:  # truncated / non-multiple payload
            raise SketchStateError(f"corrupt quotient state: {e}") from e
        if len(fps) != n_items:
            raise SketchStateError(
                f"corrupt quotient state: payload has {len(fps)} items, "
                f"meta says {n_items}"
            )
        if len(fps) > 1 and (fps[1:] < fps[:-1]).any():
            raise SketchStateError("corrupt quotient state: run not sorted")
        sk.fps = fps.copy()
        sk.n_updates = n_updates
        return sk
