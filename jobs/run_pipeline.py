#!/usr/bin/env python3
"""spark-submit entry point for the checkpointed POI pipeline.

Deployment shape per BASELINE.json north_rule:

    zip -r opm_spark.zip osm_poi_matchmaker_spark/
    spark-submit --py-files opm_spark.zip jobs/run_pipeline.py \
        --sf-dir /data/pages_sf --checkpoint-root /data/ckpt

On a cluster, master/executor sizing comes from spark-submit; locally this
falls back to local[*]. The pipeline resumes from the last completed
checkpoint (see plans/checkpoint.py) — re-running after a failure only
recomputes incomplete stages.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    parser.add_argument("--checkpoint-root", default="/tmp/opm_pipeline_ckpt")
    parser.add_argument("--cpus", type=int, default=None)
    args = parser.parse_args()

    sys.path.insert(0, ".")
    from osm_poi_matchmaker_spark.plans.pipeline import build_poi_pipeline
    from osm_poi_matchmaker_spark.session import get_spark

    spark = get_spark("opm-pipeline", cpus=args.cpus)
    t0 = time.time()
    pipe = build_poi_pipeline(args.checkpoint_root, args.sf_dir)
    outputs = pipe.run(spark)
    summary = {
        "executed_stages": pipe.executed,
        "resumed_stages": [s.name for s in pipe.stages if s.name not in pipe.executed],
        "match_rows": outputs["match"].count(),
        "elapsed_sec": round(time.time() - t0, 2),
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
