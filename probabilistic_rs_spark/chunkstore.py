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


class BloomChunkStore:
    """Driver-side chunk-addressed store for one Bloom filter state."""

    def __init__(self, path: str):
        self.path = path

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
    def create(cls, path: str, config: BloomConfig) -> "BloomChunkStore":
        """Fresh store; wipes any existing one (reference create deletes a
        pre-existing DB, ``src/bloom/filter.rs:54-66``)."""
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
        sk = BloomSketch(
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
        cls, path: str, config: BloomConfig
    ) -> tuple["BloomChunkStore", BloomSketch]:
        if os.path.exists(os.path.join(path, "bloom_config.json")):
            return cls.load(path)
        store = cls.create(path, config)
        return store, BloomSketch(config)

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
        ):
            raise SketchStateError(
                "snapshot config mismatch: store was created with "
                f"capacity={meta['capacity']} fpr={meta['false_positive_rate']}"
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
        return {
            "generation": gen,
            "chunks_written": len(chunks),
            "bytes_written": n_bytes,
        }

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
            live.merge_bytes(bytes(row["bloom_state"]))
            snap = store.save_snapshot(live, incremental=True)
            rec = {
                "unit": unit,
                "n_rows": int(row["n_updates"]),
                "wall_s": round(time.perf_counter() - t0, 3),
                "finished_at": time.time(),
                **snap,
            }
            self._record_lineage(rec)
            ran.append(unit)
            if on_unit_done is not None:
                on_unit_done(unit, rec)
        return live, {"ran": ran, "skipped": skipped}
