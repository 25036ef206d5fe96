#!/usr/bin/env python3
"""Phase-decomposed scaling profile: which phase of the headline job fails
to scale from N to 4N cores?

Phases (each timed separately, same amplified input as scaling_bench.py):
  read     — parquet scan + count (JVM columnar scan)
  extract  — geotag_pages_from_html + count, no persist (Python/Arrow path)
  persist  — extract -> persist() -> count (block-manager write)
  match    — match_pages over the persisted extract + checksum (JVM joins)

Usage: python3 profile_scaling.py <cpus> [sf_dir] [amplify]
Prints one JSON line per phase. Run under taskset externally or rely on the
internal taskset wrapper in scaling_bench.run_level (this script pins itself).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    cpus = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    amplify = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    sys.path.insert(0, _REPO)
    from scaling_bench import build_amplified_input

    path = build_amplified_input(sf_dir, amplify)
    code = f"""
import sys, time, json
sys.path.insert(0, {_REPO!r})
from osm_poi_matchmaker_spark import synth
from osm_poi_matchmaker_spark.session import get_spark
from osm_poi_matchmaker_spark.extract.geotag import geotag_pages_from_html
from osm_poi_matchmaker_spark.operators.match import match_pages
from pyspark.sql import functions as F
spark = get_spark("profile", cpus={cpus}, shuffle_partitions={cpus},
    extra_conf={{
        "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(128 * 1024),
    }})
pois = synth.osm_pois(spark, {sf_dir!r})
common = synth.poi_common_df(spark)
pois.count()

def t(name, fn, warm=True):
    if warm:
        fn()
    t0 = time.time()
    fn()
    print("PHASE " + json.dumps({{"phase": name, "cpus": {cpus},
        "sec": round(time.time() - t0, 2)}}), flush=True)

big = spark.read.parquet({path!r})
t("read", lambda: big.count())
t("extract", lambda: geotag_pages_from_html(big).count())

# persist once (warm the cache), then time match alone on the warm cache
pg = geotag_pages_from_html(big).persist()
t0 = time.time(); pg.count()
print("PHASE " + json.dumps({{"phase": "extract+persist", "cpus": {cpus},
    "sec": round(time.time() - t0, 2)}}), flush=True)

def match_job():
    df = match_pages(pg, pois, common, brand_rows=synth.BRAND_ROWS)
    df.select(F.count(F.lit(1)), F.bit_xor(F.xxhash64(*df.columns))).collect()
t("match_warm_cache", match_job)
spark.stop()
"""
    env = dict(os.environ, SPARK_DRIVER_MEM="48g")
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, timeout=2400, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("PHASE "):
            print(line[6:])
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
