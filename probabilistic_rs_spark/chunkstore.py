"""Chunk-addressed Bloom persistence with incremental (dirty-only) snapshots.

This is the Spark-side restatement of the reference's headline persistence
feature — the only thing its live benchmark measures
(``benches/bloom_fjall_benchmarks.rs:26-63``): a snapshot rewrites ONLY the
chunks touched since the previous snapshot.

Reference parity map:

* chunk rows keyed by id, re-sorted on load —
  ``src/bloom/storage.rs:50-100`` (sort at ``:97``) → one Parquet file per
  snapshot *generation* with ``(chunk_id, data)`` rows written in
  chunk-id order; load folds generations oldest→newest so the latest
  write of each chunk wins, then applies chunks sorted by id.
* dirty-chunk extraction — ``src/bloom/filter.rs:221-243`` →
  ``BloomSketch.extract_dirty_chunks``; ``save_snapshot`` clears the
  dirty set exactly like the reference's snapshot path.
* config persisted first, persisted config wins on load —
  ``src/bloom/filter.rs:90-122`` (``:103``), missing config is an explicit
  error (``BloomError::ConfigNotFound``, ``src/bloom/error.rs:25-26``).
* ``create`` wipes any existing store (``src/bloom/filter.rs:54-66``);
  ``create_or_load`` branches on existence (``:127-147``).

Untouched chunks are all-zero, so a store that has only ever written
dirty chunks still reconstructs bit-identically into a zeroed filter —
which is why the incremental path needs no initial full snapshot.

Scale note: chunk rows bound both row size (``chunk_size_bytes``, default
4 KB) and rewrite volume (dirty count × chunk size) no matter how large
``m`` grows — a 2³²-bit filter is 512 MB dense, but absorbing one more
unit rewrites only the chunks that unit touched.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from probabilistic_rs_spark.errors import SketchConfigError, SketchStateError
from probabilistic_rs_spark.sketches.bloom import BloomConfig, BloomSketch


def _family_classes() -> dict[int, type]:
    """Wire-tag → sketch class for the families a chunk store can hold.
    The family is persisted in the store meta so ``load`` reconstructs
    the right hash family (a parity store probed as native — or vice
    versa — would be silently wrong); stores written before the field
    existed are parity Bloom."""
    from probabilistic_rs_spark.sketches.base import TYPE_BLOOM, TYPE_NBLOOM
    from probabilistic_rs_spark.sketches.native_bloom import NativeBloomSketch

    return {TYPE_BLOOM: BloomSketch, TYPE_NBLOOM: NativeBloomSketch}


class BloomChunkStore:
    """Driver-side chunk-addressed store for one Bloom filter state."""

    # fold generations into one full snapshot once this many gen files
    # accumulate (instance-overridable); keeps load()/recovery O(filter
    # size), not O(snapshots ever taken)
    compact_every: int = 16

    def __init__(self, path: str, compact_every: int | None = None):
        self.path = path
        if compact_every is not None:
            if compact_every < 2:
                raise SketchConfigError("compact_every must be >= 2")
            self.compact_every = int(compact_every)

    # -- layout ---------------------------------------------------------------

    @property
    def meta_path(self) -> str:
        return os.path.join(self.path, "bloom_config.json")

    @property
    def chunks_dir(self) -> str:
        return os.path.join(self.path, "chunks")

    def _write_meta(self, meta: dict) -> None:
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self.meta_path)

    def _read_meta(self) -> dict:
        if not os.path.exists(self.meta_path):
            # reference: BloomError::ConfigNotFound (src/bloom/error.rs:25-26)
            raise SketchConfigError(f"bloom config not found at {self.meta_path}")
        with open(self.meta_path) as f:
            return json.load(f)

    # -- lifecycle (create / load / create_or_load) ----------------------------

    @classmethod
    def create(
        cls, path: str, config: BloomConfig, sketch_cls: type = BloomSketch
    ) -> "BloomChunkStore":
        """Fresh store; wipes any existing one (reference create deletes a
        pre-existing DB, ``src/bloom/filter.rs:54-66``). ``sketch_cls``
        picks the hash family (parity ``BloomSketch`` default, or
        ``NativeBloomSketch``); it is persisted in the meta so load
        reconstructs the same family."""
        config.validate()
        if os.path.exists(path):
            shutil.rmtree(path)
        store = cls(path)
        os.makedirs(store.chunks_dir, exist_ok=True)
        store._write_meta(
            {
                "capacity": config.capacity,
                "false_positive_rate": config.false_positive_rate,
                "chunk_size_bytes": config.chunk_size_bytes,
                "family": int(sketch_cls._TYPE),
                "n_updates": 0,
                "generation": 0,
            }
        )
        return store

    @classmethod
    def load(cls, path: str) -> tuple["BloomChunkStore", BloomSketch]:
        """Open an existing store and reconstruct the filter from its chunk
        rows. The persisted config wins — caller parameters don't exist on
        this path at all (reference ``src/bloom/filter.rs:103``)."""
        import pyarrow.parquet as pq

        store = cls(path)
        meta = store._read_meta()
        from probabilistic_rs_spark.sketches.base import TYPE_BLOOM

        families = _family_classes()
        fam = int(meta.get("family", TYPE_BLOOM))  # pre-field stores: parity
        if fam not in families:
            raise SketchStateError(f"unknown chunk-store sketch family {fam}")
        sk = families[fam](
            BloomConfig(
                capacity=int(meta["capacity"]),
                false_positive_rate=float(meta["false_positive_rate"]),
                chunk_size_bytes=int(meta["chunk_size_bytes"]),
            )
        )
        latest: dict[int, bytes] = {}
        for fn in sorted(os.listdir(store.chunks_dir)):
            if not fn.endswith(".parquet"):
                continue
            tbl = pq.read_table(os.path.join(store.chunks_dir, fn))
            for cid, data in zip(
                tbl.column("chunk_id").to_pylist(), tbl.column("data").to_pylist()
            ):
                latest[int(cid)] = data  # newer generation overwrites older
        # applied sorted by chunk id (reference sorts on load, storage.rs:97)
        sk.load_chunks(sorted(latest.items()))
        sk.n_updates = int(meta["n_updates"])
        sk.clear_dirty()
        return store, sk

    @classmethod
    def create_or_load(
        cls, path: str, config: BloomConfig, sketch_cls: type = BloomSketch
    ) -> tuple["BloomChunkStore", BloomSketch]:
        if os.path.exists(os.path.join(path, "bloom_config.json")):
            return cls.load(path)  # persisted config AND family win
        store = cls.create(path, config, sketch_cls)
        return store, sketch_cls(config)

    # -- snapshots --------------------------------------------------------------

    def save_snapshot(self, sk: BloomSketch, incremental: bool = True) -> dict:
        """Persist the filter: only dirty chunks by default (the
        reference's incremental snapshot, ``src/ebloom/filter.rs:344-375``
        idiom), or every chunk with ``incremental=False`` (full snapshot,
        ``src/bloom/filter.rs:186-195``). Clears the dirty tracker.
        Returns write metrics ``{generation, chunks_written, bytes_written}``.
        """
        import pyarrow as pa
        import pyarrow.parquet as pq

        meta = self._read_meta()
        if (
            int(meta["capacity"]) != sk.config.capacity
            or float(meta["false_positive_rate"]) != sk.config.false_positive_rate
            or int(meta["chunk_size_bytes"]) != sk.config.chunk_size_bytes
        ):
            # chunk size is part of the addressing scheme: ids written in
            # different units would silently land at wrong byte offsets
            raise SketchStateError(
                "snapshot config mismatch: store was created with "
                f"capacity={meta['capacity']} fpr={meta['false_positive_rate']} "
                f"chunk_size_bytes={meta['chunk_size_bytes']}"
            )
        chunks = sk.extract_dirty_chunks() if incremental else sk.extract_all_chunks()
        gen = int(meta["generation"]) + 1
        n_bytes = 0
        if chunks:
            cids = [c for c, _ in chunks]
            blobs = [b for _, b in chunks]
            n_bytes = sum(len(b) for b in blobs)
            tbl = pa.table(
                {
                    "chunk_id": pa.array(cids, type=pa.int64()),
                    "data": pa.array(blobs, type=pa.binary()),
                }
            )
            out = os.path.join(self.chunks_dir, f"gen-{gen:08d}.parquet")
            pq.write_table(tbl, out + ".tmp")
            os.rename(out + ".tmp", out)
        meta.update({"generation": gen, "n_updates": sk.n_updates})
        self._write_meta(meta)
        sk.clear_dirty()
        # periodic compaction (ADVICE r2): without it a long-running
        # incremental job appends one gen-*.parquet per snapshot forever
        # and load()/recovery cost grows without bound — the reference's
        # LSM backend compacts; this is the restatement's equivalent
        if self._gen_file_count() >= self.compact_every:
            self.compact(sk)
        return {
            "generation": gen,
            "chunks_written": len(chunks),
            "bytes_written": n_bytes,
        }

    def _gen_files(self) -> list[str]:
        if not os.path.isdir(self.chunks_dir):
            return []
        return sorted(
            fn
            for fn in os.listdir(self.chunks_dir)
            if fn.startswith("gen-") and fn.endswith(".parquet")
        )

    def _gen_file_count(self) -> int:
        return len(self._gen_files())

    def compact(self, sk: BloomSketch) -> dict:
        """Fold every generation into ONE full-snapshot generation and
        delete the older files. Crash-safe at every step: the full file is
        written tmp+rename (the atomicity idiom used throughout this
        module), and it supersedes the older generations under load()'s
        latest-wins fold — so a crash between the rename and the deletes
        only leaves redundant files, never a torn state."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        old = self._gen_files()
        meta = self._read_meta()
        gen = int(meta["generation"]) + 1
        chunks = sk.extract_all_chunks()
        tbl = pa.table(
            {
                "chunk_id": pa.array([c for c, _ in chunks], type=pa.int64()),
                "data": pa.array([b for _, b in chunks], type=pa.binary()),
            }
        )
        out = os.path.join(self.chunks_dir, f"gen-{gen:08d}.parquet")
        pq.write_table(tbl, out + ".tmp")
        os.rename(out + ".tmp", out)
        meta["generation"] = gen
        self._write_meta(meta)
        for fn in old:
            os.remove(os.path.join(self.chunks_dir, fn))
        return {"generation": gen, "compacted_files": len(old)}

    def total_chunks(self) -> int:
        meta = self._read_meta()
        sk = BloomSketch(
            BloomConfig(
                capacity=int(meta["capacity"]),
                false_positive_rate=float(meta["false_positive_rate"]),
                chunk_size_bytes=int(meta["chunk_size_bytes"]),
            )
        )
        cs = sk.config.chunk_size_bytes
        return (len(sk.bits) + cs - 1) // cs


class WindowedBloomChunkStores:
    """Per-window chunk stores — the expiring filter's persistence layout.

    Reference parity (``src/ebloom/storage.rs``): each level gets its own
    chunk partition (``level_{n}_chunks``, ``:210-243``); only the level
    currently receiving inserts is rewritten, and incrementally (dirty
    chunks of the current level only, ``src/ebloom/filter.rs:344-375``);
    frozen levels are never re-persisted (``:378-403`` full snapshot runs
    once, on rotation); expired levels are deleted wholesale
    (``delete_level``). Here a *window* (sortable string key, e.g. the
    ISO window start) plays the level role: absorbing data into a window
    rewrites only that window's dirty chunks; retention deletes whole
    window directories beyond ``num_levels``.
    """

    def __init__(
        self,
        root: str,
        config: BloomConfig,
        num_levels: int = 3,
        sketch_cls: type = BloomSketch,
    ):
        if not (0 < num_levels <= 255):
            # reference cap: level count fits one byte (src/ebloom/config.rs:53-57)
            raise SketchConfigError("num_levels must be in 1..=255")
        self.root = root
        self.config = config
        self.num_levels = int(num_levels)
        self.sketch_cls = sketch_cls
        self._live: dict[str, tuple[BloomChunkStore, BloomSketch]] = {}

    def _wdir(self, window_key: str) -> str:
        if "/" in window_key or window_key.startswith("."):
            raise SketchConfigError(f"invalid window key {window_key!r}")
        return os.path.join(self.root, f"window={window_key}")

    def windows(self) -> list[str]:
        """Persisted window keys, oldest first (sorted on load — same
        re-sort-on-read discipline as chunk ids)."""
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d.split("=", 1)[1] for d in os.listdir(self.root) if d.startswith("window=")
        )

    def absorb(self, window_key: str, state_blob: bytes, full_state: bool = False) -> dict:
        """Fold a serialized partial into the window's live filter and
        snapshot ONLY the chunks whose bits actually CHANGED.

        ``full_state=True`` declares the blob to be the window's full
        authoritative state (the streaming operator's emission) rather
        than a disjoint partial: bits still fold by OR (idempotent), but
        ``n_updates`` is SET from the blob instead of accumulated, so
        re-absorbing a window's state every micro-batch cannot inflate
        the counter.

        The change check matters for the streaming sink, which absorbs
        the window's FULL state every micro-batch (that is what the
        stateful operator emits): ``merge_bytes`` alone would mark every
        chunk the blob touches, so each batch would rewrite the window's
        whole history instead of the batch's new bits. Comparing the
        candidate chunks against the pre-merge image keeps the write
        volume proportional to what the batch added — the reference's
        dirty-chunk contract (``src/ebloom/filter.rs:344-375``).
        Dirt carried over from a previously failed snapshot is preserved
        (union, not replacement)."""
        import numpy as np

        entry = self._live.get(window_key)
        if entry is None:
            entry = BloomChunkStore.create_or_load(
                self._wdir(window_key), self.config, self.sketch_cls
            )
            self._live[window_key] = entry
        store, sk = entry
        prev_dirty = set(sk.dirty_chunks)
        pre = sk.bits.copy()
        pre_updates = sk.n_updates
        sk.merge_bytes(state_blob)
        if full_state:
            sk.n_updates = sk.n_updates - pre_updates  # blob's own counter
        cs = sk.config.chunk_size_bytes
        changed = {
            cid
            for cid in sk.dirty_chunks
            if not np.array_equal(
                pre[cid * cs : (cid + 1) * cs], sk.bits[cid * cs : (cid + 1) * cs]
            )
        }
        sk.dirty_chunks = changed | prev_dirty
        return store.save_snapshot(sk, incremental=True)

    def load(self, window_key: str) -> BloomSketch:
        _, sk = BloomChunkStore.load(self._wdir(window_key))
        return sk

    def active_level_states(self, as_of_key: str | None = None) -> list[tuple[str, bytes]]:
        """(window_key, state_bytes) for the ``num_levels`` most recent
        windows at/before ``as_of_key`` — probe with cross-level OR via
        ``operators.windowed_bloom.probe_recent`` semantics."""
        keys = [
            w for w in self.windows() if as_of_key is None or w <= as_of_key
        ][-self.num_levels :]
        return [(w, self.load(w).to_bytes()) for w in keys]

    def enforce_retention(self, as_of_key: str | None = None) -> list[str]:
        """``delete_level`` analog: drop every window older than the
        ``num_levels`` most recent. Returns deleted keys."""
        keys = [w for w in self.windows() if as_of_key is None or w <= as_of_key]
        doomed = keys[: -self.num_levels] if len(keys) > self.num_levels else []
        for w in doomed:
            shutil.rmtree(self._wdir(w), ignore_errors=True)
            self._live.pop(w, None)
        return doomed


class IncrementalBloomCheckpoint:
    """Resumable global-Bloom build over input *units* with per-unit
    lineage AND chunk-addressed incremental state snapshots.

    Per unit: one Spark job builds the unit's merged partial filter
    (partial per partition → OR-merge), the driver folds it into the live
    filter via ``merge_bytes`` (which marks exactly the touched chunks
    dirty), and the chunk store rewrites ONLY those chunks — the
    distributed analog of the reference's accumulate-then-incremental-
    snapshot loop (``benches/bloom_fjall_benchmarks.rs:26-63``). A killed
    job resumes by reloading the filter from chunk rows and skipping every
    unit whose lineage record exists.
    """

    def __init__(self, ckpt_dir: str, item_col: str, config: BloomConfig):
        self.dir = ckpt_dir
        self.item_col = item_col
        self.config = config
        self.store_path = os.path.join(ckpt_dir, "state")
        self.lineage_dir = os.path.join(ckpt_dir, "lineage")

    def completed_units(self) -> dict[str, dict]:
        out = {}
        if os.path.isdir(self.lineage_dir):
            for fn in sorted(os.listdir(self.lineage_dir)):
                if fn.endswith(".json"):
                    with open(os.path.join(self.lineage_dir, fn)) as f:
                        rec = json.load(f)
                    out[rec["unit"]] = rec
        return out

    def _record_lineage(self, rec: dict) -> None:
        import hashlib

        os.makedirs(self.lineage_dir, exist_ok=True)
        uid = hashlib.sha256(rec["unit"].encode()).hexdigest()[:16]
        path = os.path.join(self.lineage_dir, f"{uid}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    def run_units(
        self, spark, units: list[str], reader=None, on_unit_done=None
    ) -> tuple[BloomSketch, dict]:
        """Absorb every not-yet-done unit; returns (live filter, report).

        Crash window analysis: lineage is written AFTER the snapshot, so a
        crash between them re-runs the unit — merge_bytes is an OR, so
        re-absorbing the same unit is idempotent on the bits. The update
        counter is derived from lineage records (not the store meta), so a
        re-run of the crashed unit cannot double-count its rows either.
        """
        from probabilistic_rs_spark.operators.sketch_agg import (
            SketchSpec,
            sketch_aggregate,
        )

        reader = reader or (lambda s, u: s.read.parquet(u))
        store, live = BloomChunkStore.create_or_load(self.store_path, self.config)
        done = self.completed_units()
        live.n_updates = sum(int(r["n_rows"]) for r in done.values())
        ran, skipped = [], []
        spec = SketchSpec(
            "bloom",
            "bloom",
            self.item_col,
            {
                "capacity": self.config.capacity,
                "false_positive_rate": self.config.false_positive_rate,
            },
        )
        for unit in units:
            if unit in done:
                skipped.append(unit)
                continue
            t0 = time.perf_counter()
            df = reader(spark, unit)
            merged = sketch_aggregate(df, [], [spec])
            row = merged.select("bloom_state", "n_updates").head()
            if row is not None:  # a legitimately empty unit absorbs nothing
                live.merge_bytes(bytes(row["bloom_state"]))
            snap = store.save_snapshot(live, incremental=True)
            rec = {
                "unit": unit,
                "n_rows": int(row["n_updates"]) if row is not None else 0,
                "wall_s": round(time.perf_counter() - t0, 3),
                "finished_at": time.time(),
                **snap,
            }
            self._record_lineage(rec)
            ran.append(unit)
            if on_unit_done is not None:
                on_unit_done(unit, rec)
        return live, {"ran": ran, "skipped": skipped}
