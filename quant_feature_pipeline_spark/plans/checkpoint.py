"""Per-stage snapshot checkpointing + warm-start resume (W15/S2).

Reference semantics: each step persists its table; incremental runs read
the last persisted timestamp and recompute only from
``last_ts - warmup_window`` onward, then merge+dedup
(`/root/reference/step2_resample.py:370-397`, `tools/incremental.py:6-40`,
5-bar backtrack `step1_data.py:864-872`).

Spark-first realization: per-stage parquet snapshot directories with a
JSON manifest (schema hash + per-partition lineage: row counts and
max-ts per entity bucket). ``resume_plan`` computes the warm-up replay
window from the snapshot's own metadata (a footer-stats max(ts) scan —
near metadata-only), and ``merge_increment`` is the
union+dedup-keep-last publish. On a real cluster the same contract maps
to Iceberg snapshot commits + MERGE INTO; parquet-dir snapshots keep the
sandbox dependency-free.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.scan import dedup_keep_last
from .schema_contract import schema_sha


@dataclass
class ResumePlan:
    last_ts: object  # datetime | None
    recompute_from: object  # datetime | None — last_ts minus warm-up
    full_rebuild: bool


class Checkpointer:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def exists(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_manifest.json"))

    def write(
        self,
        df: DataFrame,
        stage: str,
        by: str = "entity",
        ts_col: str = "ts",
    ) -> str:
        import time

        path = self._path(stage)
        t0 = time.time()
        df.write.mode("overwrite").parquet(path)
        write_s = time.time() - t0
        snap = self.spark.read.parquet(path)
        lineage_rows = (
            snap.groupBy(by)
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.max(ts_col).cast("string").alias("max_ts"),
            )
            .collect()
        )
        total_rows = sum(r["rows"] for r in lineage_rows)
        manifest = {
            "stage": stage,
            "columns": snap.columns,
            "schema_sha": schema_sha(snap.columns),
            "metrics": {
                "write_wall_s": round(write_s, 3),
                "total_rows": total_rows,
                "rows_per_sec": round(total_rows / write_s, 1) if write_s > 0 else None,
                "n_partitions": snap.rdd.getNumPartitions(),
            },
            "lineage": {r[by]: {"rows": r["rows"], "max_ts": r["max_ts"]} for r in lineage_rows},
        }
        with open(os.path.join(path, "_manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=2, default=str)
        return path

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def manifest(self, stage: str) -> dict:
        with open(os.path.join(self._path(stage), "_manifest.json")) as fh:
            return json.load(fh)

    def resume_plan(self, stage: str, warmup_s: float, ts_col: str = "ts") -> ResumePlan:
        """recompute_from = snapshot max(ts) − warmup (global min across
        entities so every entity replays a full warm-up tail).

        Watermark contract (ADVICE r5, documented limitation): last_ts is
        a single GLOBAL max(ts) — incremental publish assumes all
        entities advance in lockstep (true for the synchronized bar
        feeds this engine ingests). An entity whose new rows lag behind
        the global watermark by more than the publish backtrack
        (jobs.py) would not republish them; feeds with per-entity lag
        should resume per entity from the manifest's per-entity max_ts
        lineage (entity_lineage) instead."""
        if not self.exists(stage):
            return ResumePlan(None, None, True)
        snap = self.read(stage)
        last = snap.agg(F.max(ts_col)).first()[0]
        if last is None:
            return ResumePlan(None, None, True)
        import datetime

        return ResumePlan(last, last - datetime.timedelta(seconds=warmup_s), False)

    def merge_increment(
        self,
        stage: str,
        increment: DataFrame,
        keys: tuple[str, ...] = ("entity", "ts"),
    ) -> DataFrame:
        """history ∪ increment with keep-last on key — J3 + P4. Publishing
        the result back is an atomic snapshot rewrite (Iceberg MERGE INTO
        on a real catalog)."""
        if not self.exists(stage):
            return increment
        hist = self.read(stage).withColumn("_gen", F.lit(0))
        inc = increment.withColumn("_gen", F.lit(1))
        merged = hist.unionByName(inc, allowMissingColumns=True)
        return dedup_keep_last(merged, keys=keys, order_col="_gen").drop("_gen")
