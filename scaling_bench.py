#!/usr/bin/env python3
"""Two-parallelism scaling evidence (BASELINE.json north_rule).

The N vs 4N executor criterion is evidenced in this sandbox by running the
IDENTICAL job at local[N] and local[4N] on the same input and reporting
throughput at both plus scaling efficiency:

    efficiency = (throughput_4N / throughput_N) / 4

Each level runs in a fresh Spark context (sequential, same JVM host).
Writes results to stdout as one JSON line; paste into BASELINE.md.

Usage: python3 scaling_bench.py [N] [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_level(cpus: int, sf_dir: str, amplify: int = 16) -> dict:
    """Run the flagship match pipeline at one parallelism level in a fresh
    subprocess (clean JVM → no leftover executor state between levels).

    ``amplify`` replicates the page side A× (remapped page ids, identical
    coordinates) so the measured job is compute-bound rather than
    scheduling-bound — the sandbox proxy for the 100 TB-scale job the
    N-vs-4N criterion actually targets. Match semantics per replica are
    unchanged.
    """
    code = f"""
import sys, time, json
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
import __spark_entry__ as m
from osm_poi_matchmaker_spark import synth
from osm_poi_matchmaker_spark.session import get_spark
from osm_poi_matchmaker_spark.extract.geotag import geotag_pages
from osm_poi_matchmaker_spark.operators.match import match_pages
from pyspark.sql import functions as F
spark = get_spark("scaling", cpus={cpus}, shuffle_partitions={cpus})
pages_geo = geotag_pages(synth.pages(spark, {sf_dir!r}))
pois = synth.osm_pois(spark, {sf_dir!r})
common = synth.poi_common_df(spark)
amp = spark.range({amplify}).withColumnRenamed("id", "rep")
big = (pages_geo.crossJoin(amp)
       .withColumn("page_id", F.col("page_id") * {amplify} + F.col("rep"))
       .drop("rep"))
n_pages = big.count()
pois.count()
def job():
    df = match_pages(big, pois, common)
    df.select(F.count(F.lit(1)), F.bit_xor(F.xxhash64(*df.columns))).collect()
job()  # warmup: plan compile + code cache
t0 = time.time()
job()
sec = time.time() - t0
print("RESULT " + json.dumps({{"cpus": {cpus}, "sec": sec, "pages": n_pages}}))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1200
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"level {cpus} failed:\n{out.stderr[-2000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    amplify = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    levels = {}
    for cpus in (n, 4 * n):
        best = min(run_level(cpus, sf_dir, amplify)["sec"] for _ in range(repeats))
        levels[cpus] = best
    thr_n = 1.0 / levels[n]
    thr_4n = 1.0 / levels[4 * n]
    eff = (thr_4n / thr_n) / 4.0
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "amplify": amplify,
                "N": n,
                "sec_N": round(levels[n], 3),
                "sec_4N": round(levels[4 * n], 3),
                "speedup": round(levels[n] / levels[4 * n], 3),
                "scaling_efficiency": round(eff, 3),
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
        )
    )


if __name__ == "__main__":
    main()
