"""Snapshot-checkpointed multi-stage pipelines (north_rule resumability).

The reference's crude resume mechanism is "skip the insert when the DB
row count already equals the frame's" (``dao/data_handlers.py:470-476``).
The engine's version is a manifest-driven checkpoint per pipeline stage:

- every stage materializes to ``<root>/<stage>/data`` (parquet here;
  Iceberg snapshot in production — same contract: an atomic, replayable
  table state) and writes ``manifest.json`` with the stage fingerprint,
  row count, wall time, and per-partition lineage rows;
- a re-run recomputes a stage only when it has no manifest or its
  fingerprint (stage name + code-version token + upstream fingerprints)
  changed — so a killed job resumes at the first incomplete stage;
- lineage rows (cell range / input rows / match counts per bucket,
  plans/lineage.py) land next to the data in ``lineage`` so partition
  completeness is auditable per north_rule.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def _fingerprint(*parts: str) -> str:
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


@dataclass
class Stage:
    name: str
    build: Callable[[SparkSession, dict[str, DataFrame]], DataFrame]
    version: str = "1"  # bump to invalidate the checkpoint
    lineage: Callable[[DataFrame], DataFrame] | None = None


@dataclass
class CheckpointedPipeline:
    root: str
    stages: list[Stage] = field(default_factory=list)

    def stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.stage_dir(name), "manifest.json")

    def read_manifest(self, name: str) -> dict | None:
        try:
            with open(self._manifest_path(name)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def run(self, spark: SparkSession) -> dict[str, DataFrame]:
        """Execute all stages, resuming from valid checkpoints.

        Returns {stage_name: DataFrame} of checkpointed outputs; also
        records ``self.executed`` — the stage names actually computed this
        run (empty on a fully warm resume).
        """
        outputs: dict[str, DataFrame] = {}
        fingerprints: dict[str, str] = {}
        self.executed: list[str] = []
        for i, st in enumerate(self.stages):
            # downstream fingerprints chain over upstream ones, so editing
            # stage k invalidates k and everything after it
            fp = _fingerprint(
                st.name, st.version, *[fingerprints[p.name] for p in self.stages[:i]]
            )
            manifest = self.read_manifest(st.name)
            data_dir = os.path.join(self.stage_dir(st.name), "data")
            if manifest is not None and manifest.get("fingerprint") == fp:
                outputs[st.name] = spark.read.parquet(data_dir)
                fingerprints[st.name] = fp
                continue
            t0 = time.time()
            df = st.build(spark, outputs)
            df.write.mode("overwrite").parquet(data_dir)
            out = spark.read.parquet(data_dir)
            n = out.count()
            if st.lineage is not None:
                st.lineage(out).write.mode("overwrite").parquet(
                    os.path.join(self.stage_dir(st.name), "lineage")
                )
            with open(self._manifest_path(st.name), "w") as f:
                json.dump(
                    {
                        "stage": st.name,
                        "fingerprint": fp,
                        "rows": n,
                        "elapsed_sec": round(time.time() - t0, 3),
                        "completed_at_epoch": int(time.time()),
                    },
                    f,
                )
            outputs[st.name] = out
            fingerprints[st.name] = fp
            self.executed.append(st.name)
        return outputs
