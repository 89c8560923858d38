"""Cluster entrypoint for the flagship pipeline — designed for
``ray job submit`` (north rule: runs submitted to a fixed-size
multi-node cluster), runnable locally the same way:

    ray job submit --working-dir . -- python scripts/run_flagship.py \
        --pages-dir /data/pages --out-dir /data/tiles

    # or locally:
    python scripts/run_flagship.py --sf-dir /root/testdata/sf0.001 \
        --out-dir /tmp/tiles_out

Resumable: re-running with the same --out-dir skips completed
partitions via the lineage manifest (stages/tiles.py); metrics are
appended to <out-dir>/_manifest.parquet and printed as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=None,
                    help="testdata dir (synthesizes pages from documents)")
    ap.add_argument("--pages-dir", default=None,
                    help="materialized pages parquet dir (production shape)")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--target-rows", type=int, default=50_000)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="auto" if "--address" in sys.argv else "local",
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from mapshaper_ray.pipelines.flagship import (build_pipeline,
                                                  build_pipeline_from_parquet)
    from mapshaper_ray.stages.tiles import write_tiles

    t0 = time.time()
    if args.pages_dir:
        ds = build_pipeline_from_parquet(args.pages_dir, light=False)
    else:
        ds = build_pipeline(args.sf_dir, replicate=args.replicate)
    manifest = write_tiles(ds, args.out_dir,
                           target_rows=args.target_rows,
                           resume=not args.no_resume)
    wall = time.time() - t0
    done = manifest[manifest["status"] == "done"] if manifest is not None \
        else []
    print(json.dumps({
        "out_dir": args.out_dir,
        "wall_sec": round(wall, 2),
        "partitions_done": int(len(done)),
        "rows_written": int(manifest["rows"].sum())
        if manifest is not None else 0,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
