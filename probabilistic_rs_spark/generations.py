"""Durable, resumable ops-log generations — the GDPR-purge primitive
with lineage (VERDICT r5 next-round #5).

``cuckoo_apply_ops_df`` / ``quotient_apply_ops_df`` fold one generation
of an insert/delete feed into a distributed ``(shard, state, n_items,
n_shards)`` table; within one session the generations chain through
``persist()``. This module makes the chain DURABLE, mirroring the
checkpoint layer's lifecycle (``checkpoint.py``; reference persistence
semantics ``src/bloom/filter.rs:39-147`` create / load /
create_or_load — persisted config wins, re-create wipes):

    gen_dir/
        manifest.json           frozen fold config (family + geometry)
        states/gen=<g>/         parquet: the shard table AFTER folding
                                generation g (versioned — old
                                generations stay queryable)
        lineage/gen-<g>.json    (gen, n_ops, n_shards, wall_s,
                                finished_at); existence == generation
                                durably applied
        _tmp/                   in-flight writes (rename-committed)

Write protocol per generation: write the folded states parquet to
``_tmp`` → rename into ``states/gen=<g>`` → fsync'd lineage file. A
crash between states and lineage leaves a states dir without lineage;
the generation re-runs and overwrites it — idempotent because the fold
is a pure deterministic function of (previous states, ops): distinct-
sorted inserts then distinct-sorted deletes per shard, shard routing a
pure function of the key hash. Resume therefore reproduces BIT-IDENTICAL
state bytes (asserted in ``tests/test_generations.py``).

Scale shape: state bytes move executor→parquet→executor, never through
the driver; each fold shuffles only the ops (8-byte hash + tag per op).

Round 7 adds the ``cs`` family (count sketch, ``operators/moments.py``):
the TURNSTILE member of the chain — deletion is native (negative
weights) so the fold needs no shard routing or tombstones, the states
table is one mergeable blob row, and ``probe`` returns the unbiased net
count instead of a boolean. One deliberate exception to the
"never through the driver" rule above: the cs state is a single
driver-held blob by design (it is what callers broadcast for probing),
bounded by the config guard in ``sketches/countsketch.py`` — only the
shard-table families keep states executor-side end to end.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from probabilistic_rs_spark.errors import SketchConfigError

_FAMILIES = ("cuckoo", "quotient", "cs")


class GenerationLog:
    """Versioned ops-log state chain for one membership filter."""

    def __init__(self, gen_dir: str, family: str, item_col: str, params: dict):
        if family not in _FAMILIES:
            raise SketchConfigError(f"unknown ops-log family {family!r}")
        self.dir = gen_dir
        self.family = family
        self.item_col = item_col
        self.params = dict(params)

    # -- lifecycle (reference create/load/create_or_load) -------------------

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.dir, "manifest.json")

    @classmethod
    def create(
        cls, gen_dir: str, family: str, item_col: str, **params
    ) -> "GenerationLog":
        if os.path.exists(gen_dir):
            # Destructive-recreate guard (ADVICE r6): only wipe a
            # directory that is recognizably a generation log (has a
            # manifest.json) or is empty. A typo'd path pointing at
            # unrelated data must not be rmtree'd.
            is_log = os.path.exists(os.path.join(gen_dir, "manifest.json"))
            if not is_log and os.listdir(gen_dir):
                raise SketchConfigError(
                    f"refusing to wipe {gen_dir}: it exists, is non-empty, "
                    "and has no manifest.json — it does not look like a "
                    "generation log. Remove it yourself if the path is "
                    "really intended."
                )
            shutil.rmtree(gen_dir)
        os.makedirs(os.path.join(gen_dir, "lineage"), exist_ok=True)
        os.makedirs(os.path.join(gen_dir, "states"), exist_ok=True)
        self = cls(gen_dir, family, item_col, params)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": 1,
                    "family": family,
                    "item_col": item_col,
                    "params": self.params,
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self.manifest_path)
        return self

    @classmethod
    def load(cls, gen_dir: str) -> "GenerationLog":
        mp = os.path.join(gen_dir, "manifest.json")
        if not os.path.exists(mp):
            raise SketchConfigError(f"no generation-log manifest at {mp}")
        with open(mp) as f:
            m = json.load(f)
        return cls(gen_dir, m["family"], m["item_col"], m["params"])

    @classmethod
    def create_or_load(
        cls, gen_dir: str, family: str, item_col: str, **params
    ) -> "GenerationLog":
        if os.path.exists(os.path.join(gen_dir, "manifest.json")):
            return cls.load(gen_dir)
        return cls.create(gen_dir, family, item_col, **params)

    # -- lineage -------------------------------------------------------------

    def completed_generations(self) -> dict[int, dict]:
        ldir = os.path.join(self.dir, "lineage")
        out = {}
        if os.path.isdir(ldir):
            for fn in os.listdir(ldir):
                if fn.endswith(".json"):
                    with open(os.path.join(ldir, fn)) as f:
                        rec = json.load(f)
                    out[int(rec["gen"])] = rec
        return out

    def last_generation(self) -> int | None:
        done = self.completed_generations()
        return max(done) if done else None

    def _states_path(self, gen: int) -> str:
        return os.path.join(self.dir, "states", f"gen={int(gen)}")

    def states_df(self, spark: SparkSession, gen: int | None = None) -> DataFrame | None:
        """The shard table as of generation ``gen`` (default: latest
        durable). ``None`` if no generation has been applied."""
        if gen is None:
            gen = self.last_generation()
            if gen is None:
                return None
        if gen not in self.completed_generations():
            raise SketchConfigError(
                f"generation {gen} has no lineage record under {self.dir}"
            )
        return spark.read.parquet(self._states_path(gen))

    # -- the fold -------------------------------------------------------------

    def apply_generation(
        self, spark: SparkSession, ops_df: DataFrame, gen: int, op_col: str = "op"
    ) -> DataFrame:
        """Durably fold generation ``gen`` (a DataFrame of ``op`` +
        item rows). Generations must be applied in order: ``gen`` must be
        exactly ``last_generation() + 1`` (or 1 from empty). A generation
        whose lineage record already exists is skipped (idempotent
        resume). Returns the states as of ``gen``."""
        gen = int(gen)
        done = self.completed_generations()
        if gen in done:
            return self.states_df(spark, gen)
        last = max(done) if done else 0
        if gen != last + 1:
            raise SketchConfigError(
                f"generations apply in order: next is {last + 1}, got {gen}"
            )
        prev = self.states_df(spark, last) if last else None
        t0 = time.perf_counter()
        if self.family == "cs":
            from probabilistic_rs_spark.operators.moments import cs_apply_ops_df

            # the count sketch is a single mergeable blob, not a shard
            # table: the generation states table is ONE row (state
            # binary, n_total). Linearity makes the fold order-free and
            # idempotent-by-rerun like the membership families.
            prev_state = (
                bytes(prev.select("cs_state").head()["cs_state"])
                if prev is not None
                else None
            )
            blob = cs_apply_ops_df(
                ops_df, self.item_col, op_col=op_col, state=prev_state, **self.params
            )
            from probabilistic_rs_spark.sketches.countsketch import CountSketch

            n_total = CountSketch.from_bytes(blob).n_total
            folded = spark.createDataFrame(
                [(blob, int(n_total))], "cs_state binary, n_total long"
            )
        elif self.family == "cuckoo":
            from probabilistic_rs_spark.operators.cuckoo import cuckoo_apply_ops_df

            # capacity/fingerprint geometry applies to every fold (new
            # shards may appear in any generation); n_shards only seeds
            # the empty state — later folds read the self-describing
            # column (and would raise on a conflicting explicit value)
            p = dict(self.params)
            if prev is not None:
                p.pop("n_shards", None)
            folded = cuckoo_apply_ops_df(
                prev, ops_df, self.item_col, op_col=op_col, **p
            )
        else:
            from probabilistic_rs_spark.operators.quotient import (
                quotient_apply_ops_df,
            )

            # capacity/fpr are per-shard allocation geometry, needed on
            # every fold (new shards may appear); shard_bits only from
            # empty state — later folds read the self-describing column
            p = dict(self.params)
            if prev is not None:
                p.pop("shard_bits", None)
            folded = quotient_apply_ops_df(
                prev, ops_df, self.item_col, op_col=op_col, **p
            )
        n_ops = ops_df.count()
        tmp = os.path.join(self.dir, "_tmp", f"gen-{gen}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        folded.write.mode("overwrite").parquet(tmp)
        final = self._states_path(gen)
        if os.path.exists(final):
            shutil.rmtree(final)  # crashed earlier attempt — overwrite
        os.rename(tmp, final)
        states = spark.read.parquet(final)
        if self.family == "cs":
            row = states.selectExpr(
                "max(n_total) AS ni", "count(*) AS nsh"
            ).head()
            ns = 1
        else:
            row = states.selectExpr(
                "max(n_shards) AS ns", "sum(n_items) AS ni", "count(*) AS nsh"
            ).head()
            ns = int(row["ns"]) if row["ns"] is not None else 0
        rec = {
            "gen": gen,
            "n_ops": int(n_ops),
            "n_shards": ns,
            "n_items": int(row["ni"]) if row["ni"] is not None else 0,
            "shard_rows": int(row["nsh"]),
            "wall_s": round(time.perf_counter() - t0, 3),
            "finished_at": time.time(),
        }
        path = os.path.join(self.dir, "lineage", f"gen-{gen}.json")
        tmpp = path + ".tmp"
        with open(tmpp, "w") as f:
            json.dump(rec, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmpp, path)
        return states

    # -- probe ----------------------------------------------------------------

    def probe(
        self,
        probe_df: DataFrame,
        item_col: str,
        gen: int | None = None,
        out_col: str = "is_member",
    ) -> DataFrame:
        """Partitioned membership probe against a durable generation.

        Family ``cs`` returns the UNBIASED net-count estimate instead of
        a boolean (the turnstile family's membership notion is the net
        count itself; pass ``out_col="est_count"`` for clarity)."""
        spark = probe_df.sparkSession
        states = self.states_df(spark, gen)
        if states is None:
            from pyspark.sql import functions as F

            if self.family == "cs":
                return probe_df.withColumn(out_col, F.lit(0).cast("long"))
            return probe_df.withColumn(out_col, F.lit(False))
        if self.family == "cs":
            from probabilistic_rs_spark.operators.moments import cs_probe

            blob = bytes(states.select("cs_state").head()["cs_state"])
            return cs_probe(probe_df, item_col, blob, out_col=out_col)
        if self.family == "cuckoo":
            from probabilistic_rs_spark.operators.cuckoo import (
                cuckoo_partitioned_probe,
            )

            return cuckoo_partitioned_probe(probe_df, item_col, states, out_col=out_col)
        from probabilistic_rs_spark.operators.quotient import (
            quotient_partitioned_probe,
        )

        return quotient_partitioned_probe(probe_df, item_col, states, out_col=out_col)

    def metrics(self) -> dict:
        recs = sorted(self.completed_generations().values(), key=lambda r: r["gen"])
        return {
            "generations": len(recs),
            "ops_applied": sum(r["n_ops"] for r in recs),
            "n_items": recs[-1]["n_items"] if recs else 0,
            "wall_s": round(sum(r["wall_s"] for r in recs), 3),
        }
