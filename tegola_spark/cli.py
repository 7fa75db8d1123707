"""spark-submit entry point — the `tegola cache seed` analog.

The reference's batch mode enumerates every tile in a bounds x zoom
range and renders it under a worker pool
(cmd/tegola/cmd/cache/seed_purge.go:206-266, cache.go:118-234); this is
the same job as one spark-submit invocation:

    spark-submit --py-files tegola_spark.zip -m tegola_spark.cli \\
        seed --input /data/corpus --out /sinks/tiles \\
        --min-zoom 0 --max-zoom 10 [--hierarchical] [--cpus N]

or locally:  python -m tegola_spark.cli seed --input ... --out ...

Semantics carried over from the reference CLI:
  * --min-zoom/--max-zoom bound the fan-out (seed_purge.go:73-76)
  * resume: re-invoking with the same --out completes only missing
    tiles (skip-if-cached, worker.go:50-77) via the sink anti-join
  * --overwrite re-seeds from scratch (the `purge` + seed flow)
  * per-(z,x,y,layer) lineage metrics land in the sink's _metrics table

Scale knobs: --hierarchical (single anchor shuffle for deep zooms),
--max-features (per-tile-layer budget; default 'auto'), --anchor-z.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tegola_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    seed = sub.add_parser("seed", help="batch-render tiles into a sink")
    seed.add_argument("--input", required=True,
                      help="corpus directory holding documents.parquet etc.")
    seed.add_argument("--out", required=True, help="tile sink directory")
    seed.add_argument("--min-zoom", type=int, default=0)
    seed.add_argument("--max-zoom", type=int, default=5)
    seed.add_argument("--cpus", type=int, default=None,
                      help="local[N] cores (default: let spark-submit decide)")
    seed.add_argument("--batch-zooms", type=int, default=2,
                      help="zoom levels per write batch (resume granularity)")
    seed.add_argument("--hierarchical", action="store_true",
                      help="single-anchor-shuffle deep-zoom build")
    seed.add_argument("--anchor-z", type=int, default=None)
    seed.add_argument("--max-features", default="auto",
                      help="'auto', an int budget, or 'none'")
    seed.add_argument("--overwrite", action="store_true",
                      help="purge the sink before seeding")
    seed.add_argument("--tile-list", default=None,
                      help="file of z/x/y tile names: render ONLY these "
                           "tiles, expanded across the zoom range unless "
                           "--tile-list-explicit (the reference's `cache "
                           "seed tile-list` mode, cmd/tegola/cmd/cache/"
                           "tile_list.go)")
    seed.add_argument("--tile-list-explicit", action="store_true",
                      help="render listed tiles exactly as given, no "
                           "zoom expansion")
    return p


def cmd_seed(args, spark=None) -> int:
    from .plans import pipeline
    from .plans.session import get_spark
    from .sources import sinks

    if args.overwrite:
        shutil.rmtree(args.out, ignore_errors=True)

    own_session = spark is None
    if own_session:
        spark = get_spark("tegola_spark_seed", cpus=args.cpus)
        spark.sparkContext.setLogLevel("WARN")
    zooms = list(range(args.min_zoom, args.max_zoom + 1))
    cap = args.max_features
    if cap == "none":
        cap = None
    elif cap != "auto":
        cap = int(cap)

    tile_filter = None
    if args.tile_list:
        from .operators import tiling

        # the listed-tile work set is built ONCE (distributed span
        # expansion); per-batch semi-joins prune to each batch's zooms
        tile_filter = tiling.tile_list_from_file(
            spark, args.tile_list, zooms,
            explicit=args.tile_list_explicit).cache()

    recs = []
    for i in range(0, len(zooms), args.batch_zooms):
        batch = zooms[i:i + args.batch_zooms]
        # tile-list mode pins the standard build: the hierarchical
        # anchor kernel derives every descendant, which wastes work
        # when only a listed subset is wanted
        build = (pipeline.build_tiles_hierarchical
                 if args.hierarchical and tile_filter is None
                 else pipeline.build_tiles)
        kwargs = {"max_features_per_tile": cap}
        if tile_filter is not None:
            kwargs["tile_filter"] = tile_filter
        if build is pipeline.build_tiles_hierarchical \
                and args.anchor_z is not None:
            kwargs["anchor_z"] = args.anchor_z
        metrics, tiles = build(spark, args.input, zooms=batch, **kwargs)
        from pyspark.sql import functions as F
        done = sinks.existing_keys(spark, args.out)
        if done is not None:
            tiles = tiles.join(F.broadcast(done), ["z", "x", "y"], "left_anti")
            metrics = metrics.join(F.broadcast(done), ["z", "x", "y"], "left_anti")
        if tiles.isEmpty():
            continue
        recs.append(sinks.write_tiles(tiles, metrics, args.out))
    print(json.dumps({"batches_written": len(recs), "records": recs}))
    if own_session:
        spark.stop()
    return 0


def main(argv=None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "seed":
        return cmd_seed(args, spark=spark)
    return 2


if __name__ == "__main__":
    sys.exit(main())
