"""G1 simplify-enabled pipeline mode (the TEGOLA_OPTIONS path —
atlas/atlas.go:19-56; gates z < simplification_maxzoom(10), z != MaxZ,
tolerance ZEpislon; runs in projected coords before quantization)."""

import pytest
from pyspark.sql import functions as F

from tegola_spark.plans import pipeline


def test_simplify_mode_runs_and_preserves_points(spark, sf_dir):
    """Points are never simplified (SimplifyGeometry passes non-line
    geometries through); polygon layers survive with >= 4 ring points.
    With the reference's ZEpislon tolerance (10/(2^z*4096) in projected
    METERS) simplification is a near-no-op — asserting equality with
    the unsimplified pipeline EXERCISES the gate order and documents
    the reference quirk (SURVEY.md §7.4(3))."""
    m_off, t_off = pipeline.build_tiles(spark, sf_dir, zooms=[2])
    m_on, t_on = pipeline.build_tiles(spark, sf_dir, zooms=[2], simplify=True)
    off = {(r["z"], r["x"], r["y"], r["layer"]): (r["n_features"], r["bytes"])
           for r in m_off.collect()}
    on = {(r["z"], r["x"], r["y"], r["layer"]): (r["n_features"], r["bytes"])
          for r in m_on.collect()}
    assert off == on
