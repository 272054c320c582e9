"""Checkpointed, resumable sketch aggregation with per-unit lineage.

Spark restatement of the reference's persistence lifecycle
(``src/bloom/filter.rs:39-147`` create / load / create_or_load;
``src/bloom/storage.rs:50-100`` chunked snapshots; SURVEY.md §3.2):

* the **unit of lineage** is an input *unit* (one Parquet file / Iceberg
  snapshot / partition directory). A killed job resumes by skipping every
  unit whose lineage record exists — completed inputs are never re-read
  (north_rule: "resumable from checkpoint with per-partition lineage +
  metrics").
* per unit we persist the *partial sketch states* (tiny: one row per
  group key) plus a lineage record ``(unit, n_rows, n_partials, wall_s,
  state_bytes, finished_at)``.
* the final merge re-reads only partial states — never input data.

Layout under ``ckpt_dir`` (all plain files — works on any DFS):

    manifest.json            frozen job config; loaded config wins on
                             resume, mismatched re-create raises
                             (reference: persisted config beats caller
                             params, src/bloom/filter.rs:103 /
                             tests/core_bloom_fjall_tests.rs:206-239)
    partials/unit=<uid>/     parquet: group cols + state blobs + n_updates
    lineage/<uid>.json       metrics record; its existence == unit done
    _tmp/                    in-flight writes (rename-committed)

Write protocol per unit: write partials parquet → fsync'd lineage file.
A crash between the two leaves a partials dir without lineage; the unit
re-runs and overwrites it (idempotent — same input, same states).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession

from probabilistic_rs_spark.errors import SketchConfigError
from probabilistic_rs_spark.operators.sketch_agg import (
    SketchSpec,
    sketch_merge,
    sketch_partials,
)


def _manifest_of(group_cols: list[str], specs: list[SketchSpec]) -> dict:
    return {
        "version": 1,
        "group_cols": list(group_cols),
        "specs": [asdict(s) for s in specs],
    }


def _unit_id(path: str) -> str:
    """Filesystem-safe stable id for an input unit path."""
    import hashlib

    base = os.path.basename(path.rstrip("/")) or "unit"
    return f"{base}-{hashlib.sha256(path.encode()).hexdigest()[:12]}"


class SketchCheckpoint:
    """create / load / create_or_load over a checkpoint directory."""

    def __init__(self, ckpt_dir: str, group_cols: list[str], specs: list[SketchSpec]):
        self.dir = ckpt_dir
        self.group_cols = list(group_cols)
        self.specs = list(specs)

    # -- lifecycle (reference create/load/create_or_load) -------------------

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.dir, "manifest.json")

    @classmethod
    def create(
        cls, ckpt_dir: str, group_cols: list[str], specs: list[SketchSpec]
    ) -> "SketchCheckpoint":
        """Fresh checkpoint; wipes any existing one (reference create
        deletes a pre-existing DB, src/bloom/filter.rs:54-66)."""
        import shutil

        if os.path.exists(ckpt_dir):
            shutil.rmtree(ckpt_dir)
        os.makedirs(os.path.join(ckpt_dir, "lineage"), exist_ok=True)
        os.makedirs(os.path.join(ckpt_dir, "partials"), exist_ok=True)
        self = cls(ckpt_dir, group_cols, specs)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(_manifest_of(group_cols, specs), f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self.manifest_path)
        return self

    @classmethod
    def load(cls, ckpt_dir: str) -> "SketchCheckpoint":
        """Open an existing checkpoint; the persisted config wins — caller
        parameters are ignored entirely (reference load semantics)."""
        mp = os.path.join(ckpt_dir, "manifest.json")
        if not os.path.exists(mp):
            raise SketchConfigError(f"no checkpoint manifest at {mp}")
        with open(mp) as f:
            m = json.load(f)
        specs = [SketchSpec(**s) for s in m["specs"]]
        return cls(ckpt_dir, m["group_cols"], specs)

    @classmethod
    def create_or_load(
        cls, ckpt_dir: str, group_cols: list[str], specs: list[SketchSpec]
    ) -> "SketchCheckpoint":
        if os.path.exists(os.path.join(ckpt_dir, "manifest.json")):
            return cls.load(ckpt_dir)
        return cls.create(ckpt_dir, group_cols, specs)

    # -- lineage -------------------------------------------------------------

    def completed_units(self) -> dict[str, dict]:
        ldir = os.path.join(self.dir, "lineage")
        out = {}
        if os.path.isdir(ldir):
            for fn in os.listdir(ldir):
                if fn.endswith(".json"):
                    with open(os.path.join(ldir, fn)) as f:
                        rec = json.load(f)
                    out[rec["unit"]] = rec
        return out

    def _record_lineage(self, rec: dict) -> None:
        path = os.path.join(self.dir, "lineage", f"{_unit_id(rec['unit'])}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    # -- the resumable run ----------------------------------------------------

    def run_units(
        self,
        spark: SparkSession,
        units: list[str],
        reader=None,
        on_unit_done=None,
    ) -> dict:
        """Process every not-yet-done unit: build partial states, persist
        them, record lineage. ``reader(spark, unit) -> DataFrame`` defaults
        to ``spark.read.parquet(unit)``. ``on_unit_done(unit, rec)`` is a
        test hook (raise inside it to simulate a kill *after* a unit
        commits). Returns ``{"ran": [...], "skipped": [...]}``.
        """
        reader = reader or (lambda s, u: s.read.parquet(u))
        done = self.completed_units()
        ran, skipped = [], []
        for unit in units:
            if unit in done:
                skipped.append(unit)
                continue
            t0 = time.perf_counter()
            df = reader(spark, unit)
            partials = sketch_partials(df, self.group_cols, self.specs)
            out = os.path.join(self.dir, "partials", f"unit={_unit_id(unit)}")
            partials.write.mode("overwrite").parquet(out)
            # metrics from the written partials (no second pass over input)
            import pyarrow.dataset as ds

            tbl = ds.dataset(out).to_table()
            n_updates = sum(tbl.column("n_updates").to_pylist()) if tbl.num_rows else 0
            state_bytes = sum(
                sum(len(b) for b in tbl.column(s.state_col).to_pylist() if b is not None)
                for s in self.specs
            )
            rec = {
                "unit": unit,
                "n_rows": int(n_updates),
                "n_partials": int(tbl.num_rows),
                "state_bytes": int(state_bytes),
                "wall_s": round(time.perf_counter() - t0, 3),
                "finished_at": time.time(),
            }
            self._record_lineage(rec)
            ran.append(unit)
            if on_unit_done is not None:
                on_unit_done(unit, rec)
        return {"ran": ran, "skipped": skipped}

    def merged_states(self, spark: SparkSession, tree_fanin: int | None = None) -> DataFrame:
        """Final states from the LINEAGE-COMPLETE partials (reads only
        sketch blobs — input data is never touched on this path).

        Only units whose lineage record exists participate: a crash
        between the partials write and the lineage fsync leaves an
        orphan ``unit=...`` directory (possibly missing part files), and
        merging it before the unit re-runs would silently fold a
        half-written unit into the states. Lineage IS the commit point —
        the same contract the generation log uses."""
        pdir = os.path.join(self.dir, "partials")
        done = self.completed_units()
        parts = []
        for u in sorted(done):
            p = os.path.join(pdir, f"unit={_unit_id(u)}")
            if not os.path.isdir(p):
                # A lineage record without its partials directory is
                # impossible-by-protocol (lineage is written AFTER the
                # partials, and is the commit point) — it means external
                # deletion or corruption. Folding the remaining units
                # would return a silently incomplete state (ADVICE r6).
                raise SketchConfigError(
                    f"unit {u!r} has a lineage record but its partials "
                    f"directory {p} is missing — the checkpoint is "
                    "corrupted (externally deleted partials?); refusing "
                    "to merge an incomplete state. Delete the lineage "
                    "record to force the unit to re-run."
                )
            parts.append(p)
        if not parts:
            raise SketchConfigError(
                f"no lineage-complete partials under {pdir} — run_units first"
            )
        df = spark.read.parquet(*parts)
        return sketch_merge(df, self.group_cols, self.specs, tree_fanin=tree_fanin)

    def metrics(self) -> dict:
        recs = list(self.completed_units().values())
        return {
            "units_done": len(recs),
            "rows_absorbed": sum(r["n_rows"] for r in recs),
            "state_bytes": sum(r["state_bytes"] for r in recs),
            "wall_s": round(sum(r["wall_s"] for r in recs), 3),
        }


def resumable_sketch_aggregate(
    spark: SparkSession,
    units: list[str],
    ckpt_dir: str,
    group_cols: list[str],
    specs: list[SketchSpec],
    reader=None,
    tree_fanin: int | None = None,
) -> DataFrame:
    """One-call convenience: create-or-load → run remaining units → merged
    final states. Safe to call again after a crash at any point."""
    ck = SketchCheckpoint.create_or_load(ckpt_dir, group_cols, specs)
    if ck.group_cols != list(group_cols) or [s.name for s in ck.specs] != [
        s.name for s in specs
    ]:
        raise SketchConfigError(
            "checkpoint config mismatch: persisted manifest wins — delete "
            f"{ckpt_dir} to start over (reference create/load semantics)"
        )
    ck.run_units(spark, units, reader=reader)
    return ck.merged_states(spark, tree_fanin=tree_fanin)
