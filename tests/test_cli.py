"""spark-submit CLI entry (the `tegola cache seed` analog)."""

import json
import os

from tegola_spark import cli
from tegola_spark.operators import mvt
from tegola_spark.sources import sinks


def test_cli_seed_and_resume(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "sink")
    rc = cli.main(["seed", "--input", sf_dir, "--out", out,
                   "--min-zoom", "0", "--max-zoom", "2",
                   "--hierarchical", "--anchor-z", "1"], spark=spark)
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["batches_written"] == 2
    assert sinks.existing_keys(spark, out).count() == 21
    # tiles decode and carry the expected layers
    row = spark.read.parquet(os.path.join(out, "tiles")).where("z = 0").first()
    assert "pages" in mvt.decode_tile(bytes(row["tile_bytes"]))
    # resume is a no-op
    rc = cli.main(["seed", "--input", sf_dir, "--out", out,
                   "--min-zoom", "0", "--max-zoom", "2"], spark=spark)
    assert rc == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["batches_written"] == 0
    # --overwrite reseeds
    rc = cli.main(["seed", "--input", sf_dir, "--out", out,
                   "--min-zoom", "0", "--max-zoom", "0", "--overwrite"],
                  spark=spark)
    assert rc == 0
    assert sinks.existing_keys(spark, out).count() == 1
