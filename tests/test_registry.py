"""Provider/sink registries (§2.13)."""

import pytest

from tegola_spark.sources import registry


def test_builtins_listed():
    provs = registry.registered_providers()
    assert {"corpus_pages", "corpus_points", "nation_polygons",
            "region_polygons", "debug", "token_sql"} <= set(provs)
    assert "parquet_tiles" in registry.registered_sinks()


def test_duplicate_registration_rejected():
    with pytest.raises(registry.AlreadyRegistered):
        registry.register_provider("debug", lambda *a, **k: None)
    registry.register_provider("debug", registry._debug, replace=True)


def test_unknown_name_lists_registered():
    with pytest.raises(registry.UnknownName) as ei:
        registry.provider_for("nope")
    assert "corpus_pages" in str(ei.value)


def test_provider_factories_run(spark, sf_dir):
    pages = registry.provider_for("corpus_pages")(spark, sf_dir)
    assert pages.limit(1).count() == 1
    dbg = registry.provider_for("debug")(spark, zooms=[1])
    assert dbg.count() == 8  # 4 tiles x (outline + center)


def test_token_sql_provider(spark, sf_dir):
    from tegola_spark.sources import corpus
    import pyspark.sql.functions as F

    corpus.documents(spark, sf_dir).select(
        "doc_id",
        corpus.col_lon(F.col("doc_id")).alias("lon"),
        corpus.col_lat(F.col("doc_id")).alias("lat"),
    ).createOrReplaceTempView("points")
    out = registry.provider_for("token_sql")(
        spark, sql="SELECT doc_id FROM points WHERE !BBOX!", z=0, x=0, y=0)
    assert out.count() > 0
    with pytest.raises(Exception):
        registry.provider_for("token_sql")(spark, sql="SELECT 1", z=0, x=0, y=0)
