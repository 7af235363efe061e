#!/usr/bin/env python3
"""Production job: geotag + encode pages, exact PIP join, resumable sink.

Designed for `ray job submit -- python jobs/geotag_pip_job.py ...` on a
multi-node cluster; runs identically under local Ray. Re-submitting with the
same --out and inputs skips finished partitions via the per-partition
lineage manifests (h3ray.io.sink), so a preempted 10^12-document run
resumes where it stopped.

Prints one JSON metrics line at the end (rows, partitions, skipped, wall).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="pages parquet dir (url column required)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--res", type=int, default=9)
    ap.add_argument("--parent-res", type=int, default=3,
                    help="partition key resolution for the sink")
    ap.add_argument("--polygons", type=int, default=16,
                    help="number of city polygons to join against")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU cap (omit on a real cluster)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)

    import ray.data as rd

    from h3ray.io import sink
    from h3ray.ops import stages
    from h3ray.pipelines import pip

    t0 = time.time()
    pages = rd.read_parquet(args.input, columns=["url"])
    geoms = pip.city_polygons(args.polygons)
    joined = pip.pip_join(pages, geoms, res=args.res, exact=True)
    keyed = joined.map_batches(
        stages.parent_stage(args.parent_res, cell_col="cell"),
        batch_format="pyarrow")

    signature = (f"geotag_pip:res={args.res}:parent={args.parent_res}"
                 f":polygons={args.polygons}:input={args.input}")
    job = sink.write_partitioned(keyed, args.out,
                                 f"parent_r{args.parent_res}", signature)
    job["wall_total_s"] = round(time.time() - t0, 3)
    job["job"] = "geotag_pip"
    print(json.dumps(job))
    ray.shutdown()


if __name__ == "__main__":
    main()
