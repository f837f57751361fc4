"""Stage checkpoints + resume over parquet stage directories.

The reference materializes every layer as a warehouse table (CTAS,
/root/reference/modeling/datasets/base.py:74-76) and caches fetched
datasets as parquet for iteration (/root/reference/modeling/actions/
train.py:144-180). The engine's equivalent unit of resumability is the
*stage snapshot*: each pipeline stage writes its output to
``<root>/<stage>/`` as parquet and commits an entry (rows, schema,
timestamp) to ``<root>/_manifest.json``; a relaunch skips every committed
stage and reads its snapshot instead (SURVEY.md §7 stage 10).

On a cluster with an Iceberg catalog the same class maps to
``writeTo(...).createOrReplace()`` + snapshot ids; the manifest is the
sandbox stand-in (the Iceberg runtime jar is not available here). Commit
protocol: parquet write is atomic-by-directory (_SUCCESS marker), and the
manifest is written after the data — a crash between the two re-runs the
stage, never reads a partial one.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


class StageCheckpoint:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "_manifest.json")

    def _manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"stages": {}}

    def _commit(self, manifest: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, self._manifest_path)

    def is_done(self, stage: str) -> bool:
        m = self._manifest()["stages"].get(stage)
        if not m:
            return False
        return os.path.exists(os.path.join(self.root, stage, "_SUCCESS"))

    def run(self, stage: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Return the stage output, building + snapshotting only if not
        already committed. Completed stages resume from their snapshot."""
        path = os.path.join(self.root, stage)
        if self.is_done(stage):
            return self.spark.read.parquet(path)
        df = build()
        # row count observed ON the write action itself (AggregatingAccumulator
        # riding the job) — at 100 TB a separate count() would re-scan the
        # snapshot; at toy scale it still costs one scheduled job per stage
        obs = Observation(f"cp_{stage}_{time.time_ns()}")
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).parquet(path)
        out = self.spark.read.parquet(path)
        rows = obs.get["rows"]
        manifest = self._manifest()
        manifest["stages"][stage] = {
            "rows": rows,
            "schema": out.schema.simpleString(),
            "committed_at": time.time(),
            "path": path,
        }
        self._commit(manifest)
        return out

    def invalidate(self, stage: str) -> None:
        manifest = self._manifest()
        manifest["stages"].pop(stage, None)
        self._commit(manifest)

    def stages(self) -> dict:
        return self._manifest()["stages"]

    def chain(self) -> list[dict]:
        """The ordered stage chain (name + params) recorded by the last
        run, or [] for pre-chain manifests."""
        return self._manifest().get("chain", [])

    def reconcile_chain(self, configured: list[tuple[str, dict]]) -> list[str]:
        """Record ``configured`` as the run's stage chain and invalidate
        every committed snapshot at or after the first stage whose name
        OR params differ from the previously recorded chain.

        Stage identity is (name, params), not name alone: resuming a
        checkpoint root where an optional stage was re-parameterized
        (e.g. --span-scrub-w 8 -> 16), disabled, or inserted would
        otherwise silently reuse snapshots built under the old chain.
        A manifest that has committed stages but no recorded chain is
        treated as fully divergent (unknown provenance). Returns the
        invalidated stage names (for logging/tests)."""
        recorded = self.chain()
        if not recorded and self.stages():
            # committed stages but no recorded chain: unknown provenance,
            # fully divergent BY DECREE — every committed stage is stale.
            # (Synthesizing a recorded chain with params=None here would
            # spuriously MATCH a configured stage whose params are also
            # None, resuming a snapshot of unknown configuration; and the
            # synthesized order would be manifest-dict insertion order,
            # not chain order.)
            stale = list(self.stages())
        else:
            div = len(configured)
            for i, (name, params) in enumerate(configured):
                if (
                    i >= len(recorded)
                    or recorded[i].get("name") != name
                    or recorded[i].get("params") != params
                ):
                    div = i
                    break
            stale = [
                e["name"] for e in recorded[div:] if e["name"] in self.stages()
            ]
        for name in stale:
            self.invalidate(name)
        manifest = self._manifest()
        manifest["chain"] = [
            {"name": n, "params": p} for n, p in configured
        ]
        self._commit(manifest)
        return stale
