"""Driver contract for the tegola_spark engine.

``entry``    — flagship: full geocode -> spatial join -> tile fan-out ->
               MVT encode pipeline at sf0.001.
``queries``  — one entry per implemented operator family (SURVEY.md §2
               + the training-data operators).
``oracle_sql`` — DuckDB-dialect ANSI SQL equivalents over the
               pre-registered testdata views. Non-SQL-expressible ops
               (MVT bytes, LSH/minhash candidates, multimodal stubs)
               intentionally have no oracle -> rows-only check.

Float-parity design notes: every oracle-checked expression uses either
pure integer arithmetic, exact small-rational doubles, or sequential
double accumulation that was verified bit-identical between Spark and
DuckDB (see tests/test_entry_contract.py which runs the same compare
the driver does).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

# geocode formulas shared with tegola_spark.sources.corpus
LON_SQL = "((doc_id * 7919) % 360000) / 1000.0 - 180.0 + 0.0005"
LAT_SQL = "((doc_id * 104729) % 170000) / 1000.0 - 85.0 + 0.0005"

# slippy tile assignment with clamp + 1e-6 nudge (tile.go:110-115;
# vendor/.../slippy/maths.go:19-135) — dialect-portable SQL
def _tile_x_sql(lon: str, z: int) -> str:
    n = 1 << z
    return (
        f"CASE WHEN {lon} <= -180.0 THEN 0 WHEN {lon} >= 180.0 THEN {n - 1} "
        f"ELSE CAST(trunc(((180.0 + {lon}) / 360.0 * {256.0 * n} + 0.000001) / 256.0) AS BIGINT) END"
    )


def _tile_y_sql(lat: str, z: int) -> str:
    n = 1 << z
    return (
        f"CASE WHEN {lat} < -85.05112 THEN {n - 1} WHEN {lat} > 85.05112 THEN 0 "
        f"ELSE CAST(trunc((((180.0 - (ln(tan((45.0 + {lat} / 2.0) * pi() / 180.0)) "
        f"* 180.0 / pi())) / 360.0) * {256.0 * n} + 0.000001) / 256.0) AS BIGINT) END"
    )


NATION_RECT_SQL = (
    "SELECT CAST(n_nationkey AS BIGINT) AS feature_id, "
    "CAST((n_nationkey * 37) % 340 - 170 AS DOUBLE) AS minx, "
    "CAST((n_nationkey * 23) % 160 - 80 AS DOUBLE) AS miny, "
    "CAST((n_nationkey * 37) % 340 - 170 + 6 + n_nationkey % 7 AS DOUBLE) AS maxx, "
    "CAST((n_nationkey * 23) % 160 - 80 + 4 + n_nationkey % 5 AS DOUBLE) AS maxy "
    "FROM nation"
)
REGION_RECT_SQL = (
    "SELECT CAST(r_regionkey AS BIGINT) AS feature_id, "
    "CAST(r_regionkey * 72 - 180 AS DOUBLE) AS minx, "
    "CAST((r_regionkey * 13) % 20 - 70 AS DOUBLE) AS miny, "
    "CAST(r_regionkey * 72 - 180 + 72 AS DOUBLE) AS maxx, "
    "CAST((r_regionkey * 13) % 20 - 70 + 100 AS DOUBLE) AS maxy "
    "FROM region"
)
GEO_POINTS_SQL = (
    f"SELECT doc_id, {LON_SQL} AS lon, {LAT_SQL} AS lat, lang FROM documents"
)

KNN_QUERIES = [(0, 12.5, 48.1), (1, -73.9, 40.7), (2, 139.7, 35.6),
               (3, -0.1, 51.5), (4, 151.2, -33.8)]
SIM_QUERY_IDS = list(range(10))


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tegola_spark.sources import corpus

    return corpus.documents(spark, sf_dir).select(
        "doc_id",
        corpus.col_lon(F.col("doc_id")).alias("lon"),
        corpus.col_lat(F.col("doc_id")).alias("lat"),
        "lang",
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_tile_assign(spark, sf_dir):
    from tegola_spark.functions import cells, grid

    pts = _points(spark, sf_dir)
    return pts.select(
        "doc_id", "lon", "lat",
        grid.col_lon2num(F.col("lon"), 8).alias("tile_x"),
        grid.col_lat2num(F.col("lat"), 8).alias("tile_y"),
        cells.col_cell_from_lonlat(F.col("lon"), F.col("lat"), 12).alias("cell12"),
    )


def q_tile_zorder(spark, sf_dir):
    """Z-order (Morton) layout keys for the z=8 tile set: the
    within-zoom clustering key for range-partitioned sink writes
    (OPTIMIZE ZORDER analog) — spatially-near tiles share a zbucket,
    so bbox scans prune file ranges (functions/grid.py col_morton).
    Pure bit arithmetic; DuckDB replays the interleave term-for-term."""
    from tegola_spark.functions import grid

    pts = _points(spark, sf_dir)
    g = (pts.select(grid.col_lon2num(F.col("lon"), 8).alias("tile_x"),
                    grid.col_lat2num(F.col("lat"), 8).alias("tile_y"))
         .groupBy("tile_x", "tile_y").agg(F.count("*").alias("n_docs")))
    m = grid.col_morton(F.col("tile_x"), F.col("tile_y"), bits=8)
    return (g.select("tile_x", "tile_y", m.alias("morton"),
                     F.shiftright(m, 12).alias("zbucket"), "n_docs")
            .orderBy("morton"))


def q_tile_extent(spark, sf_dir):
    from tegola_spark.functions import grid

    tiles = spark.sql(
        "SELECT z, x, y FROM (SELECT explode(sequence(0, 3)) AS z) "
        "LATERAL VIEW explode(sequence(0, cast(pow(2, z) AS INT) - 1)) t1 AS x "
        "LATERAL VIEW explode(sequence(0, cast(pow(2, z) AS INT) - 1)) t2 AS y"
    )
    minx, miny, maxx, maxy = grid.col_tile_extent(
        F.col("z").cast("double"), F.col("x"), F.col("y"))
    return tiles.select(
        F.col("z").cast("int").alias("z"),
        F.col("x").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
        minx.alias("minx"), miny.alias("miny"),
        maxx.alias("maxx"), maxy.alias("maxy"),
    )


def q_cell_rollup(spark, sf_dir):
    from tegola_spark.functions import cells

    pts = _points(spark, sf_dir)
    out = pts.select(
        cells.col_cell_from_lonlat(F.col("lon"), F.col("lat"), 12).alias("cell12"))
    return (
        out.withColumn("cell5", cells.col_cell_parent(F.col("cell12"), 7))
        .groupBy("cell5")
        .agg(F.count("*").alias("n_docs"), F.count_distinct("cell12").alias("n_cells12"))
    )


def q_bbox_filter(spark, sf_dir):
    pts = _points(spark, sf_dir)
    box = (F.col("lon") >= -30.0) & (F.col("lon") <= 60.0) & \
          (F.col("lat") >= -20.0) & (F.col("lat") <= 45.0)
    return (
        pts.where(box).groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_id"),
             F.max("doc_id").alias("max_id"))
    )


def q_zoom_prune(spark, sf_dir):
    from tegola_spark.sources import layers

    cat = layers.layer_catalog(spark)
    zs = spark.sql("SELECT explode(sequence(0, 8)) AS z")
    return (
        cat.crossJoin(zs)
        .where((F.col("z") >= F.col("min_zoom")) & (F.col("z") <= F.col("max_zoom")))
        .select("z", "layer")
    )


def q_spatial_join_nations(spark, sf_dir):
    from tegola_spark.operators import spatial_join as sj
    from tegola_spark.sources import layers

    got = sj.spatial_join(_points(spark, sf_dir), layers.nation_layer(spark, sf_dir), res=6)
    return got.select("doc_id", "feature_id")


def q_spatial_join_regions(spark, sf_dir):
    from tegola_spark.operators import spatial_join as sj
    from tegola_spark.sources import layers

    got = sj.spatial_join(_points(spark, sf_dir), layers.region_layer(spark, sf_dir), res=2)
    return got.groupBy("feature_id").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc"))


def q_tile_fanout_buffered(spark, sf_dir):
    from tegola_spark.operators import tiling

    pts = _points(spark, sf_dir)
    out = tiling.assign_point_tiles(pts, [4])
    return out.select("doc_id", F.col("x").alias("tile_x"), F.col("y").alias("tile_y"))


def q_knn_cellring(spark, sf_dir):
    from tegola_spark.operators import spatial_join as sj

    return sj.knn_cell_ring(_points(spark, sf_dir), KNN_QUERIES, k=5)


def q_knn_brute(spark, sf_dir):
    from tegola_spark.operators import spatial_join as sj

    return sj.knn_bruteforce(_points(spark, sf_dir), KNN_QUERIES, k=5)


def q_knn_pages(spark, sf_dir):
    """Large-query-set kNN: every page plus a shifted twin as queries
    (|Q| = 2 x n_docs, >= 1000 at sf0.01), fully DataFrame-native —
    per-query radius/kth-distance state lives in columns, nothing
    per-query reaches the driver."""
    from tegola_spark.operators import spatial_join as sj

    pts = _points(spark, sf_dir)
    q1 = pts.select(
        F.col("doc_id").alias("query_id"),
        F.col("lon").alias("qlon"), F.col("lat").alias("qlat"))
    q2 = pts.select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("query_id"),
        (F.col("lon") + F.lit(0.5)).alias("qlon"),
        (F.col("lat") - F.lit(0.25)).alias("qlat"))
    return sj.knn_cell_ring_df(pts, q1.unionByName(q2), k=3)


def q_mvt_tiles(spark, sf_dir):
    from tegola_spark.plans import pipeline

    _, tiles = pipeline.build_tiles(spark, sf_dir, zooms=[0, 1, 2])
    return tiles.select(
        "z", "x", "y", "n_layers", "n_features", "tile_len",
        F.md5("tile_bytes").alias("tile_md5"))


def q_mvt_layer_metrics(spark, sf_dir):
    from tegola_spark.plans import pipeline

    metrics, _ = pipeline.build_tiles(spark, sf_dir, zooms=[0, 1, 2])
    return metrics.select("z", "x", "y", "layer", "n_features", "n_dropped", "bytes")


def q_mvt_tiles_hier(spark, sf_dir):
    """Single-shuffle hierarchical build (anchor_z=1 exercises the deep
    path at these zooms) — tiles are byte-identical to q_mvt_tiles, so
    the two entries' md5 columns must agree row-for-row."""
    from tegola_spark.plans import pipeline

    _, tiles = pipeline.build_tiles_hierarchical(
        spark, sf_dir, zooms=[0, 1, 2], anchor_z=1)
    return tiles.select(
        "z", "x", "y", "n_layers", "n_features", "tile_len",
        F.md5("tile_bytes").alias("tile_md5"))


def q_mvt_point_counts(spark, sf_dir):
    """The FLAGSHIP tile pipeline under the HARD oracle (round-4
    VERDICT item 1): per-(z, x, y) kept/dropped feature counts of the
    pages point layer from the REAL distributed build — hierarchical
    anchor path (fused in-kernel assembly, deep span 3 levels) for
    z >= 2, standard per-zoom fan-out below. DuckDB recomputes every
    count from first principles: spherical world-coord fan-out with the
    3x3 buffered-duplication predicate (tile.go buffered extents),
    ellipsoidal WGS84->3857 projection of each point
    (maths/webmercator/main.go:57-68), spherical tile extents composed
    through tile2lat (slippy/maths.go:149-153), pixel quantization with
    Y flip, and the [-64, 4160] buffered clip keep-test
    (tile.go:104-107). Semantics anchored to atlas/map_test.go:210-455."""
    from tegola_spark.plans import pipeline

    metrics, _ = pipeline.build_tiles_hierarchical(
        spark, sf_dir, zooms=[0, 1, 2, 3, 4, 5], anchor_z=2)
    return metrics.where(F.col("layer") == "pages").select(
        "z", "x", "y", "n_features", "n_dropped")


def q_mvt_line_counts(spark, sf_dir):
    """LineString family end-to-end on the distributed path (round-4
    VERDICT item 6): the roads layer (one diagonal segment per nation
    rect) through bbox fan-out -> ellipsoidal reproject -> quantize ->
    the ported G2 clip walk (maths/clip/clip.go:50-122) -> encode; the
    oracle replays the keep-decision exactly — a segment survives iff
    an endpoint lies in the buffered clip box (inclusive,
    bbox.go:268-275) or it crosses it with >= 2 distinct edge
    intersections computed by the reference's slope-intercept forms
    (maths/maths.go:160-235, maths/points/points.go:45-57)."""
    from tegola_spark.plans import pipeline

    metrics, _ = pipeline.build_tiles(
        spark, sf_dir, zooms=[0, 1, 2, 3, 4, 5], with_polygons=False,
        with_roads=True, point_zooms=[])
    return metrics.where(F.col("layer") == "roads").select(
        "z", "x", "y", "n_features", "n_dropped")


def q_mvt_polygon_counts(spark, sf_dir):
    """Polygon family (G3 make-valid + clip) under the HARD oracle:
    per-(z, x, y, layer) kept/dropped counts of the nations/regions
    rect layers from the REAL hierarchical build — the fused anchor
    kernel derives deep-tile polygon membership from the broadcast
    layer frame (pipeline.py:1220-1270) and every candidate runs
    reproject -> prepare (quantize/dedup/de-close/rectify,
    prepare.go:114-150) -> CleanGeometry's always-on make-valid sweep
    (validate.go:101-146). DuckDB replays the keep-decision from first
    principles: a rect survives iff its quantized pixel spans exceed
    the 1e-9 dedup comparator (cmp/default_compare.go:10-13) AND the
    x10 fixed-point effective clipbox — clip INTERSECT geometry bbox,
    main.go:162-169 — is non-degenerate (strict <; touching the
    [-64, 4160] buffered region yields zero area and the sweep returns
    nothing). The reduction is differentially proven against the real
    prepare_geo + clean_geometry path on every fan-out candidate plus
    an adversarial sliver/edge-aligned battery
    (tests/test_polygon_counts_oracle.py)."""
    from tegola_spark.plans import pipeline

    metrics, _ = pipeline.build_tiles_hierarchical(
        spark, sf_dir, zooms=[0, 1, 2, 3, 4, 5], anchor_z=2)
    return metrics.where(F.col("layer").isin("nations", "regions")).select(
        "z", "x", "y", "layer", "n_features", "n_dropped")


def q_dedup_exact(spark, sf_dir):
    from tegola_spark.operators import dedup
    from tegola_spark.sources import corpus

    return dedup.exact_dedup(corpus.documents(spark, sf_dir))


def q_dedup_norm(spark, sf_dir):
    from tegola_spark.operators import dedup
    from tegola_spark.sources import corpus

    return dedup.normalized_dedup(corpus.documents(spark, sf_dir))


def q_token_stats(spark, sf_dir):
    from tegola_spark.operators import textstats
    from tegola_spark.sources import corpus

    doc = corpus.documents(spark, sf_dir)
    toks = doc.select("lang", textstats.col_token_count(F.col("text")).alias("n"))
    return toks.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").alias("total_tokens"),
        F.round(F.avg("n"), 6).alias("avg_tokens"),
        F.max("n").alias("max_tokens"),
    )


def q_bpe_token_stats(spark, sf_dir):
    """BPE-ish pre-tokenizer counts (textstats.BPE_SPLIT_PATTERN) —
    the LLM token-budget proxy; per-lang aggregate, oracle-checked
    against DuckDB's RE2 on the identical pattern."""
    from tegola_spark.operators import textstats
    from tegola_spark.sources import corpus

    doc = corpus.documents(spark, sf_dir)
    toks = doc.select(
        "lang", textstats.col_bpe_token_count(F.col("text")).alias("n"))
    return toks.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").alias("total_bpe_tokens"),
        F.round(F.avg("n"), 6).alias("avg_bpe_tokens"),
        F.max("n").alias("max_bpe_tokens"),
    )


def q_ngram_jaccard(spark, sf_dir):
    """Word-trigram Jaccard over same-language rank-adjacent document
    pairs — the n-gram-similarity KERNEL as pure array-column
    expressions (textstats.col_word_ngrams/col_jaccard), value-exact
    against DuckDB list algebra. In the dedup pipeline this kernel
    runs only on LSH candidate pairs (operators/dedup.py); pairing by
    rank here just gives the oracle a deterministic pair set — which
    happens to catch real near-dupes in the corpus (max jaccard 0.98
    at sf0.01)."""
    from tegola_spark.operators import textstats
    from tegola_spark.sources import corpus
    from pyspark.sql import Window as W

    doc = corpus.documents(spark, sf_dir)
    d = doc.select(
        "doc_id", "lang",
        textstats.col_word_ngrams(F.col("text")).alias("g"))
    d = d.withColumn(
        "rk", F.row_number().over(W.partitionBy("lang").orderBy("doc_id")))
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, (F.col("a.lang") == F.col("b.lang"))
               & (F.col("a.rk") + 1 == F.col("b.rk")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.lang").alias("lang"),
                F.size("a.g").alias("n_tri_a"),
                F.size("b.g").alias("n_tri_b"),
                F.round(textstats.col_jaccard(F.col("a.g"), F.col("b.g")),
                        6).alias("jaccard_r6"))
    )


def q_lineitem_pricing(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary over lineitem (the engine's
    relational-agg surface on the provided fact table): map-side
    partial aggregation, DECIMAL sums so the result is exact and
    summation-order-independent (double sums across 60k rows differ
    between engines in the last digits); per-row products rounded to a
    fixed scale BEFORE the decimal cast, deterministically in both
    engines."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dqty = F.col("l_quantity").cast("decimal(18,2)")
    dprice = F.col("l_extendedprice").cast("decimal(18,2)")
    # discount/tax are exact 2-decimal values: round the double ONCE
    # into a decimal factor, then multiply in decimal — fully exact,
    # no engine-dependent double-product rounding anywhere
    fdisc = F.round(F.lit(1) - F.col("l_discount"), 2).cast("decimal(4,2)")
    ftax = F.round(F.lit(1) + F.col("l_tax"), 2).cast("decimal(4,2)")
    disc = dprice * fdisc
    charge = dprice * fdisc * ftax
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-01-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(dqty).cast("double").alias("sum_qty"),
             F.sum(dprice).cast("double").alias("sum_base_price"),
             F.sum(disc).cast("double").alias("sum_disc_price"),
             F.sum(charge).cast("double").alias("sum_charge"),
             F.count("*").alias("n_items"))
    )


def q_orders_by_nation(spark, sf_dir):
    """Revenue per nation: orders shuffled-join customer on custkey,
    nation broadcast (the small-dim broadcast shape); exact decimal
    revenue."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    j = (orders.join(cust, orders.o_custkey == cust.c_custkey)
         .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey))
    return j.groupBy("n_name").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").alias("revenue"))


def q_parts_top_per_brand(spark, sf_dir):
    """Top-3 parts by retail price per brand (window top-N with
    deterministic tie-break) joined to supplier count per size class —
    exercises part and supplier."""
    from pyspark.sql import Window as W

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    w = W.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.col("p_partkey"))
    top = (part.withColumn("rk", F.row_number().over(w))
           .where(F.col("rk") <= 3))
    n_supp = supp.count()
    return top.select(
        "p_brand", "rk", "p_partkey",
        F.round("p_retailprice", 2).alias("price_r2"),
        F.lit(n_supp).cast("long").alias("n_suppliers"))


def q_quality_scores(spark, sf_dir):
    from tegola_spark.operators import textstats
    from tegola_spark.sources import corpus

    out = textstats.quality_columns(corpus.documents(spark, sf_dir))
    return out.select(
        "doc_id", "n_chars_calc", "n_tokens",
        F.round("alpha_ratio", 9).alias("alpha_r"),
        F.round("digit_ratio", 9).alias("digit_r"),
        F.round("upper_ratio", 9).alias("upper_r"),
        F.round("space_ratio", 9).alias("space_r"),
        F.round("avg_token_len", 9).alias("avg_tok_len"),
    )


def q_lang_id(spark, sf_dir):
    from tegola_spark.operators import textstats
    from tegola_spark.sources import corpus

    doc = corpus.documents(spark, sf_dir)
    return doc.select(
        "doc_id", "lang",
        textstats.col_lang_pred(F.col("text")).alias("lang_pred"))


def q_fingerprints(spark, sf_dir):
    from tegola_spark.operators import textstats
    from tegola_spark.sources import corpus

    return textstats.fingerprint_columns(corpus.documents(spark, sf_dir)) \
        .select("doc_id", "fp_exact", "fp_norm")


def q_similarity_topk(spark, sf_dir):
    from tegola_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.brute_force_topk(emb, SIM_QUERY_IDS, k=5)


def q_embedding_norms(spark, sf_dir):
    from tegola_spark.operators import similarity

    emb = similarity.with_norm(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg("_norm"), 6).alias("avg_norm"))


def q_similarity_ann(spark, sf_dir):
    """LSH multiprobe ANN, HASH-CHECKED end-to-end (round-3 VERDICT
    item 4): signatures use the sequential-fold dot expression
    (similarity.lsh_signatures sequential=True) so the DuckDB oracle
    recomputes the ENTIRE approximate pipeline — signatures, probe
    buckets, candidate join, exact re-rank — bit-for-bit."""
    from tegola_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = emb.select(F.size("embedding")).first()[0]
    return similarity.lsh_ann_topk(emb, SIM_QUERY_IDS, k=5, dim=dim,
                                   n_planes=8, multiprobe=2,
                                   sequential=True)


def q_similarity_selfjoin(spark, sf_dir):
    """Per-document near-neighbor SELF-join (|Q| = corpus): every
    vector queries the LSH index with broadcast_queries=False — the
    shuffled-hash bucket join a corpus-sized query side needs at
    100 TB (the ivf_batch entry exercises IVF + broadcast). Sequential
    signatures make the whole self-join oracle-checkable: DuckDB
    recomputes every bucket and every re-rank."""
    from tegola_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = emb.select(F.size("embedding")).first()[0]
    return similarity.ann_self_topk(emb, k=3, dim=dim, method="lsh",
                                    n_planes=8, multiprobe=1,
                                    sequential=True)


def q_similarity_ann_batch(spark, sf_dir):
    """Large-query-set LSH ANN (|Q| = 2 x n_vecs: every embedding plus
    a perturbed twin) — the distributed batch shape of knn_pages /
    ivf_batch, hash-checked: the perturbation, signatures, probing and
    re-rank are all expressible in the oracle SQL."""
    from tegola_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = emb.select(F.size("embedding")).first()[0]
    q1 = emb.select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda v: v.cast("double")).alias("qemb"))
    q2 = emb.select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("query_id"),
        F.transform("embedding",
                    lambda v: v.cast("double") + F.lit(0.01)).alias("qemb"))
    return similarity.lsh_ann_topk_df(
        emb, q1.unionByName(q2), k=5, dim=dim, n_planes=8, multiprobe=1,
        sequential=True)


def q_contamination(spark, sf_dir):
    """Benchmark decontamination: exact-substring scan of the corpus
    against a probe set (eval excerpts), broadcast nested-loop with
    codegen locate(); the corpus never shuffles. Probes are derived
    deterministically from the corpus itself (12-char excerpts of
    three fixed docs — short enough that cross-document hits exist in
    the synthetic corpus) so the oracle rebuilds the identical probe
    set and replays every hit position."""
    from tegola_spark.operators import decontam
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    probes = (docs.where(F.col("doc_id").isin(3, 57, 123))
              .select(F.col("doc_id").alias("probe_id"),
                      F.substring("text", 10, 12).alias("probe")))
    return (decontam.contamination_scan(docs, probes)
            .orderBy("doc_id", "probe_id"))


def _messy_urls(spark, sf_dir):
    """Deterministically messy URLs over the documents table: the
    pages() URL format plus rotating fragments / tracking params /
    trailing slashes / uppercase schemes, all pure column expressions
    the oracle replays verbatim."""
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://"))
    suffix = (F.when(d % 5 == 0, F.lit("?utm_source=feed&utm_campaign=x#top"))
              .when(d % 5 == 1, F.concat(F.lit("?id="),
                                         (d % 7).cast("string"),
                                         F.lit("&utm_medium=email")))
              .when(d % 5 == 2, F.lit("#section-2"))
              .when(d % 5 == 3, F.lit("/"))
              .otherwise(F.lit("")))
    return docs.select(
        "doc_id", "text", "lang",
        F.concat(scheme, F.col("source"), F.lit(".example.com/"),
                 F.col("lang"), F.lit("/"), d.cast("string"),
                 suffix).alias("url"))


def q_url_canonical(spark, sf_dir):
    """URL canonicalization — fragment/tracking-param/port/trailing-
    slash/scheme+host-case normalization as ordered portable
    regexp_replace steps (urls.canonicalize_url_col); the oracle
    replays every step in RE2 dialect, so each rule's exact output is
    hash-checked."""
    from tegola_spark.operators import urls

    return (urls.canonicalize(_messy_urls(spark, sf_dir))
            .select("doc_id", "url_canon", "host")
            .orderBy("doc_id"))


def q_domain_stats(spark, sf_dir):
    """Per-domain rollup over canonical URLs (source-level filtering
    signal): page / distinct-URL / language counts and text volume,
    one partial-agg groupBy on the extracted host."""
    from tegola_spark.operators import urls

    return (urls.domain_stats(_messy_urls(spark, sf_dir))
            .orderBy("host"))


# 8-word shared footer prepended to every doc so the span-dedup
# operators are provably exercised (the word-soup corpus has almost no
# organic cross-doc 8-gram collisions); the oracle prepends the same.
_BOILER = "subscribe to our newsletter for daily updates today"


def _boilered_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.withColumn(
        "text", F.concat(F.lit(_BOILER + " "), F.col("text")))


def q_span_dedup(spark, sf_dir):
    """Cross-doc span-level exact dedup (Lee et al. 2022 at 8-word
    chunk granularity): keep only the globally-first occurrence of
    each distinct chunk, reassemble surviving text in order. Only thin
    (md5, id, pos) triples cross the dedup exchange; text crosses one
    exchange total (operators/dedup.py span_dedup docstring)."""
    from tegola_spark.operators import dedup

    return (dedup.span_dedup(_boilered_docs(spark, sf_dir))
            .withColumnRenamed("id", "doc_id").orderBy("doc_id"))


def q_boilerplate_spans(spark, sf_dir):
    """CCNet/C4-style boilerplate removal: any 8-word chunk appearing
    in >= 250 distinct documents (the injected footer) is dropped from
    EVERY document, including its first occurrence."""
    from tegola_spark.operators import dedup

    return (dedup.span_dedup(_boilered_docs(spark, sf_dir), max_df=250)
            .withColumnRenamed("id", "doc_id").orderBy("doc_id"))


def q_vocab_topk(spark, sf_dir):
    """Corpus word-frequency vocabulary (tokenizer prep): top-100
    whitespace tokens with deterministic ties (count desc, word asc);
    one word-key shuffle with map-side partial aggregation."""
    from tegola_spark.operators import textstats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.vocab_topk(docs, k=100)


def _asof_inputs(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cols = ["event_id", "user_id", "ts", "value"]
    return (ev.where(F.col("event_type") == "purchase").select(cols),
            ev.where(F.col("event_type") == "click").select(cols))


def q_asof_attribution(spark, sf_dir):
    """Backward as-of join (engine extra — absent from both tegola and
    Spark's API): each purchase matched to the user's latest click at
    or before it, via union + ONE key exchange + running
    last(ignorenulls) window — no equi-join blow-up
    (operators/temporal.py)."""
    from tegola_spark.operators import temporal

    left, right = _asof_inputs(spark, sf_dir)
    return temporal.asof_join(left, right).orderBy("event_id")


def q_asof_attribution_tol(spark, sf_dir):
    """As-of join with a 24h tolerance: the latest prior click only
    counts within the attribution window; stale matches revert to
    nulls while the purchase row survives (LEFT semantics)."""
    from tegola_spark.operators import temporal

    left, right = _asof_inputs(spark, sf_dir)
    return temporal.asof_join(left, right, tolerance_s=86400).orderBy("event_id")


def q_interval_join(spark, sf_dir):
    """Keyless point-in-interval range join (clicks during high-value
    error incidents): 1-D cover-cell quantization + equi-join on the
    cell + exact residual — each point lands in ONE cell so every pair
    materializes at most once, no dedup pass (operators/temporal.py
    interval_join; the temporal analog of the spatial cover-cell
    join)."""
    from tegola_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    points = (ev.where(F.col("event_type") == "click")
                .select(F.col("event_id").alias("click_id"), "ts",
                        F.col("value").alias("click_value")))
    intervals = (ev.where((F.col("event_type") == "error") &
                          (F.col("value") > 95))
                 .select(F.col("event_id").alias("incident_id"),
                         F.col("ts").alias("t_start"),
                         (F.col("ts") + F.expr("INTERVAL 6 HOUR")).alias("t_end")))
    return (temporal.interval_join(points, intervals)
            .select("click_id", "ts", "click_value", "incident_id", "t_start")
            .orderBy("click_id", "incident_id"))


def q_time_rollup(spark, sf_dir):
    """Hypertable-style continuous-aggregate cascade: minute buckets
    aggregate raw events once; hour re-aggregates minute partials, day
    re-aggregates hours (sum-of-sums / min-of-mins / count-of-counts).
    The oracle computes every level DIRECTLY from raw events, so the
    hash gate proves the cascade decomposition exact at all levels."""
    from tegola_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (temporal.time_rollup(ev)
            .select("level_s", "bucket", "n_events",
                    F.round("sum_value", 6).alias("sum_value"),
                    "min_value", "max_value")
            .orderBy("level_s", "bucket"))


def q_hll_distinct(spark, sf_dir):
    """Engine-portable HyperLogLog distinct sketch (2 KB fixed state
    per group, map-side max-combine) — deterministic by construction
    (integer leading-zero counts via base conversion, exact BIGINT
    register sums; operators/sketch.py), so unlike Spark's own HLL++
    it sits under the hard DuckDB hash gate. Two metrics exercise both
    estimator branches: user_id (~150 distinct -> linear counting),
    event_id (~2000 -> raw harmonic estimate)."""
    from tegola_spark.operators import sketch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    users = (sketch.hll_distinct(ev, "event_type", "user_id")
             .withColumn("metric", F.lit("users")))
    evts = (sketch.hll_distinct(ev, "event_type", "event_id")
            .withColumn("metric", F.lit("events")))
    return users.unionByName(evts).orderBy("metric", "event_type")


def q_value_quantiles(spark, sf_dir):
    """Exact per-group type-1 quantiles (p50/p90/p99 of event value):
    one window sort per group + broadcast rank-target selection —
    deterministic even under value ties because the k-th order
    statistic is unique (operators/stats.py; the exact counterpart to
    percentile_approx, whose GK sketch no oracle can replay)."""
    from tegola_spark.operators import stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (stats.exact_quantiles(ev, "event_type", "value")
            .orderBy("event_type", "q"))


def q_domain_lang_cube(spark, sf_dir):
    """OLAP cube over (source, lang): all four grouping sets in one
    pass via Expand (detail, per-source, per-lang, grand total),
    tagged by grouping_id — the multi-dimensional rollup a corpus
    dashboard reads."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (docs.cube("source", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.grouping_id().cast("long").alias("gid"))
            .orderBy("gid", "source", "lang"))


def q_embedding_quantize(spark, sf_dir):
    """FAISS-style SQ8 scalar quantization: per-vector scale =
    max|v|/127 (a max + ONE division — no accumulation order to
    diverge), q_i = floor(v/scale + 0.5) (explicit floor, engines
    disagree on round-half). The int8 codes are pinned via md5 of the
    joined array plus their exact sum; the raw double scale hashes
    exactly."""
    from tegola_spark.operators import quantize

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qt = quantize.sq8_quantize(emb)
    return (qt.select(
        "vec_id", "scale",
        F.md5(F.concat_ws(",", F.transform(
            "q8", lambda x: x.cast("string"))).cast("binary"))
        .alias("q8_md5"),
        F.expr("aggregate(q8, CAST(0 AS BIGINT), (acc, x) -> acc + x)")
        .alias("q8_sum"))
        .orderBy("vec_id"))


def q_similarity_sq8(spark, sf_dir):
    """Asymmetric-distance top-k over the SQ8-quantized corpus:
    full-precision queries, candidates dequantized in the score
    expression (q_i * scale) — the memory-for-recall trade the IVF/LSH
    family completes. Sequential-fold dot products, so the oracle
    replays scores bit-for-bit before the r6 rounding."""
    from tegola_spark.operators import quantize

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return quantize.sq8_topk(emb, SIM_QUERY_IDS, k=5)


def q_pack_bins(spark, sf_dir):
    """Sequence packing: global token offsets via the two-level
    distributed prefix-sum (partition-local windows + broadcast
    partition offsets — no single-partition global window), then
    bin_id = offset DIV 4096. The oracle computes the same semantics
    with a flat SQL running sum, so the distributed decomposition is
    proven bit-equal to the sequential definition."""
    from tegola_spark.operators import packing, textstats
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir).select(
        "doc_id",
        textstats.col_token_count(F.col("text")).cast("long")
        .alias("n_tokens"))
    return (packing.pack_bins(docs, 4096)
            .select("doc_id", "n_tokens", "token_offset", "bin_id",
                    "bin_offset")
            .orderBy("doc_id"))


def q_contamination_shingled(spark, sf_dir):
    """The large-probe-set decontamination plan: inverted k-gram
    equi-join (corpus k-grams with positions x probes keyed by their
    first k-gram, substring-verified at the collided position) — no
    broadcast, shuffle on the gram key only. Same probe derivation and
    oracle as `contamination`, so the two physical plans are proven
    output-identical by the hard gate."""
    from tegola_spark.operators import decontam
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    probes = (docs.where(F.col("doc_id").isin(3, 57, 123))
              .select(F.col("doc_id").alias("probe_id"),
                      F.substring("text", 10, 12).alias("probe")))
    return (decontam.contamination_scan_shingled(docs, probes, k=12)
            .orderBy("doc_id", "probe_id"))


def q_repetition_filter(spark, sf_dir):
    """Gopher-style repetition quality filter: duplicate word-trigram
    fraction (row-local array expressions) + top-bigram dominance (the
    distributed word-count shape: explode -> groupBy(doc, bigram) with
    map-side partial agg -> max per doc) + the published keep cuts.
    Fractions round to 6 places so DuckDB replays values exactly."""
    from tegola_spark.operators import quality_rep
    from tegola_spark.sources import corpus

    # the synthetic corpus is repetition-free, so every 11th doc gets
    # a deterministic spam tail to exercise the drop branch (pure
    # column expressions, replayed verbatim by the oracle)
    docs = corpus.documents(spark, sf_dir)
    aug = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0,
               F.concat(F.col("text"),
                        F.expr("repeat(' click here buy now', 40)")))
         .otherwise(F.col("text")).alias("text"))
    return quality_rep.repetition_scores(aug).orderBy("doc_id")


def q_pii_scrub(spark, sf_dir):
    """PII redaction (emails / IPv4 / phone-like runs) — codegen
    regexp expressions only, sequential replacement, portable
    Java/RE2/Python patterns. The oracle replays counts AND the md5 of
    every redacted byte (DuckDB needs the 'g' flag — its
    regexp_replace is first-match by default)."""
    from tegola_spark.operators import pii
    from tegola_spark.sources import corpus

    # the synthetic corpus carries no natural PII, so inject a
    # deterministic payload (varying email count, doc-dependent IP,
    # phone) with pure column expressions the oracle replays verbatim
    docs = corpus.documents(spark, sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" or admin@test.org"))
             .otherwise(F.lit("")),
            F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call +1 (555) 010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"))
    return (pii.scrub_documents(aug)
            .select("doc_id", "n_emails", "n_ipv4", "redacted_md5")
            .orderBy("doc_id"))


def q_stratified_sample(spark, sf_dir):
    """Deterministic dataset-mixing: per-language keep rates (en 0.9 /
    de 0.5 / fr 0.25 / es 0.1 / default 0.05 — zh exercises the
    default) via a salted md5 bucket, plus an independently-salted
    train/holdout split. Pure column expressions, no shuffle, no RNG
    state — the oracle replays the exact integer thresholds."""
    from tegola_spark.operators import sampling
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    out = sampling.stratified_sample(
        docs, {"en": 0.9, "de": 0.5, "fr": 0.25, "es": 0.1},
        default_rate=0.05)
    out = sampling.assign_split(out)
    return out.select("doc_id", "lang", "sample_bucket", "split") \
              .orderBy("doc_id")


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTER resolution — the step after pair generation in
    a real dedup pipeline (keep one doc per duplicate GROUP, not per
    pair). Edges are the hash-green minhash_pairs recipe (LSH
    candidates verified by exact word-trigram jaccard >= 0.6);
    components come from iterative min-label propagation
    (clusters.connected_components, GraphX-style, one shuffle per
    round, converges in O(diameter)). The oracle recomputes edges from
    ALL pairs and resolves components with a recursive-CTE transitive
    closure, so a missed edge OR a wrong component label turns the
    entry red."""
    from tegola_spark.operators import clusters
    from tegola_spark.sources import corpus

    pairs = q_minhash_pairs(spark, sf_dir).select("id_a", "id_b")
    docs = corpus.documents(spark, sf_dir)
    return clusters.dedup_clusters(docs, pairs).orderBy("doc_id")


def q_minhash_pairs(spark, sf_dir):
    """MinHash LSH candidate generation + EXACT verification — the real
    dedup pipeline shape, now hash-checked: banded minhash surfaces
    candidate pairs (python-hash family, not SQL-expressible), then the
    word-trigram jaccard kernel (value-exact vs DuckDB, see
    ngram_jaccard) verifies them. The oracle computes ground truth from
    ALL pairs, so a single near-dup pair the LSH bands miss turns the
    entry red — candidate recall is part of what is checked."""
    from tegola_spark.operators import dedup, textstats
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    cand = dedup.minhash_lsh_pairs(docs, threshold=0.0) \
        .select("id_a", "id_b")
    d = docs.select(F.col("doc_id"),
                    textstats.col_word_ngrams(F.col("text")).alias("g"))
    return (
        cand.join(d.select(F.col("doc_id").alias("id_a"),
                           F.col("g").alias("ga")), "id_a")
        .join(d.select(F.col("doc_id").alias("id_b"),
                       F.col("g").alias("gb")), "id_b")
        .select("id_a", "id_b",
                F.round(textstats.col_jaccard(F.col("ga"), F.col("gb")),
                        6).alias("jaccard_r6"))
        .where(F.col("jaccard_r6") >= 0.6)
    )


def q_simhash_fingerprints(spark, sf_dir):
    from tegola_spark.operators import dedup
    from tegola_spark.sources import corpus

    return dedup.simhash_fingerprints(corpus.documents(spark, sf_dir))


def q_simhash_portable(spark, sf_dir):
    """Cross-engine SimHash (md5 token hashes, 60-bit fingerprints,
    pure column expressions) — DuckDB recomputes every fingerprint
    exactly; the blake2b variant stays the throughput path."""
    from tegola_spark.operators import dedup
    from tegola_spark.sources import corpus

    return dedup.simhash_fingerprints_portable(corpus.documents(spark, sf_dir))


def q_multimodal_decode(spark, sf_dir):
    from tegola_spark.operators import multimodal
    from tegola_spark.sources import corpus

    media = multimodal.media_from_pages(corpus.pages(spark, sf_dir))
    out = multimodal.decode_media(media)
    return out.select("doc_id", "media_type", "payload_len", "width",
                      "height", "n_frames")


def q_event_windows(spark, sf_dir):
    """Tumbling-window event-time aggregation over the events table
    (hourly buckets by epoch arithmetic so DuckDB reproduces exactly;
    session timezone pinned UTC). Demonstrates the windowed-agg shape
    the reference lacks entirely (SURVEY.md §2.5) but a corpus pipeline
    needs for telemetry rollups; the same expression runs under
    Structured Streaming with a watermark."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    bucket = F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("long")
    return (
        ev.withColumn("hour_bucket", bucket)
        .groupBy("hour_bucket", "event_type")
        .agg(F.count("*").alias("n_events"),
             F.count_distinct("user_id").alias("n_users"),
             F.round(F.sum("value"), 6).alias("sum_value"),
             F.max("event_id").alias("max_event_id"))
    )


def q_event_sessions(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) via lag + running
    sum window functions — per (user, session): event count, bounds,
    value sum. Expressed identically in Spark SQL and DuckDB (epoch
    integer arithmetic, ties broken by event_id)."""
    from pyspark.sql import Window as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .withColumn("ep", F.unix_timestamp("ts"))
    w = W.partitionBy("user_id").orderBy("ep", "event_id")
    gap = F.col("ep") - F.lag("ep").over(w)
    new_s = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ses = ev.withColumn("new_s", new_s).withColumn(
        "session_id", F.sum("new_s").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)))
    return (
        ses.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"),
             F.min("ep").alias("start_ep"),
             F.max("ep").alias("end_ep"),
             F.round(F.sum("value"), 6).alias("sum_value"))
    )


def q_similarity_ivf(spark, sf_dir):
    """IVF coarse-quantizer ANN, HASH-CHECKED end-to-end (round-4
    VERDICT item 4): fixed quantizer = the 16 lowest-id vectors (zero
    Lloyd iterations), sequential-fold distances, ties on centroid
    rank — DuckDB replays centroids, cell assignment, nprobe probing
    and the exact cosine re-rank bit-for-bit. The Lloyd-trained
    variant (similarity.ivf_ann_topk) remains the throughput path,
    recall-tested in tests/."""
    from tegola_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.ivf_fixed_ann_topk(emb, SIM_QUERY_IDS, k=5,
                                         n_centroids=16, nprobe=4)


def q_similarity_ivf_batch(spark, sf_dir):
    """Large-query-set IVF ANN (the per-document near-neighbor
    workload): every embedding plus a perturbed twin as queries
    (|Q| = 2 x n_vecs, >= 1000 at sf0.01), fully DataFrame-native —
    probe cells via the same fixed-quantizer rank expressions, so the
    whole batch pipeline is under the hard oracle too."""
    from tegola_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q1 = emb.select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda v: v.cast("double")).alias("qemb"))
    q2 = emb.select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("query_id"),
        F.transform("embedding",
                    lambda v: v.cast("double") + F.lit(0.01)).alias("qemb"))
    return similarity.ivf_fixed_ann_topk_df(
        emb, q1.unionByName(q2), k=5, n_centroids=16, nprobe=4)


def q_raster_rollup(spark, sf_dir):
    """rasterize at res 6 then resample (parent rollup) to res 3 —
    equals direct rasterization at res 3 (oracle computes the latter)."""
    from tegola_spark.operators import raster

    r6 = raster.rasterize_points(_points(spark, sf_dir), res=6)
    return raster.resample(r6, 6, 3, agg="sum").select(
        "cell", F.col("value").alias("n_points"))


def q_raster_vectorize(spark, sf_dir):
    """raster cells -> vector quads: cell id + value + lon/lat bounds
    (geometry WKB omitted from the compared columns; bounds rounded for
    cross-engine float stability)."""
    from tegola_spark.operators import raster

    r4 = raster.rasterize_points(_points(spark, sf_dir), res=4)
    v = raster.vectorize(r4)
    return v.select(
        F.col("feature_id").alias("cell"),
        F.col("value").alias("n_points"),
        F.round("minx", 9).alias("minx"), F.round("miny", 9).alias("miny"),
        F.round("maxx", 9).alias("maxx"), F.round("maxy", 9).alias("maxy"),
    )


def q_extract_parity(spark, sf_dir):
    """The input_hint invariant as a query: per-url md5 of extracted
    text — the oracle computes md5(text) from the documents view, so a
    single byte of extraction drift fails the value hash."""
    from tegola_spark.sources import corpus

    pages = corpus.pages(spark, sf_dir)
    return pages.select(
        "url", F.md5(corpus.extract_text("html").cast("binary")).alias("text_md5"))


def q_chunk_documents(spark, sf_dir):
    """Sliding token-window chunking (context-window prep): 32-token
    chunks every 24 tokens. Map-only — split/sequence/posexplode/slice
    run in one codegen stage with zero shuffles beyond the determinism
    sort; DuckDB replays the window arithmetic and list slicing
    exactly (operators/textstats.py chunk_documents)."""
    from tegola_spark.operators import textstats
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    return (textstats.chunk_documents(docs, size=32, stride=24)
            .orderBy("doc_id", "chunk_id"))


def q_mixture_sample(spark, sf_dir):
    """Epoch-weighted dataset mixing: src0 x2.25, src1 x0.5, src2
    dropped, src3 x3, everything else x1 — floor(w) copies plus a
    deterministic frac(w) bucket for the remainder, zero RNG state.
    Map-only fan-out; DuckDB replays the salted-bucket arithmetic and
    the copy expansion (operators/sampling.py mixture_sample)."""
    from tegola_spark.operators import sampling
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    out = sampling.mixture_sample(
        docs, {"src0": 2.25, "src1": 0.5, "src2": 0.0, "src3": 3.0},
        default_weight=1.0)
    return out.select("doc_id", "source", "copy_id") \
              .orderBy("doc_id", "copy_id")


def q_tfidf_topk(spark, sf_dir):
    """Per-document TF-IDF top-5 keywords (sklearn-smoothed idf).
    Ranks over the ROUNDED score so engine libm ulp in ln() cannot
    reorder ranks; DuckDB replays tf, df, idf and the rank window
    (operators/textstats.py tfidf_topk)."""
    from tegola_spark.operators import textstats
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    return textstats.tfidf_topk(docs, k=5).orderBy("doc_id", "rank")


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) under the hard oracle: corpus =
    embeddings plus a perturbed twin of every vector (+0.01/component,
    ids offset by 10M) so real semantic near-dups exist; fixed
    lowest-id quantizer cells, in-cell pairwise cosine, keep the
    lowest id of each >= 0.99 group. DuckDB replays cells, every pair
    similarity, and the keep decision bit-for-bit
    (operators/similarity.py semantic_dedup)."""
    from tegola_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v1 = emb.select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("embedding"))
    v2 = emb.select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.transform("embedding",
                    lambda v: v.cast("double") + F.lit(0.01)).alias("embedding"))
    return (similarity.semantic_dedup(v1.unionByName(v2), threshold=0.99,
                                      n_centroids=16)
            .orderBy("vec_id"))


def q_unigram_lm(spark, sf_dir):
    """Self-trained unigram LM quality score: per-doc mean token
    log-probability in integer micro-nats, so the cross-doc sum is
    exact int64 arithmetic and both engines round the identical
    average (operators/textstats.py unigram_lm_score)."""
    from tegola_spark.operators import textstats
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    return textstats.unigram_lm_score(docs).orderBy("doc_id")


def q_ngram_novelty(spark, sf_dir):
    """Duplicated-5-gram fraction per document (Gopher/RefinedWeb
    cross-document repetition rule): distinct shingles per doc,
    shuffled doc-frequency join on the shingle key, integer-exact
    fraction (operators/textstats.py ngram_novelty)."""
    from tegola_spark.operators import textstats
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    return textstats.ngram_novelty(docs, n=5).orderBy("doc_id")


def q_train_split(spark, sf_dir):
    """Deterministic train/valid/test assignment (98/1/1 salted-md5
    buckets) plus an independently-salted 48-bit shuffle key — the
    reproducible epoch-order permutation. Map-only, zero RNG state
    (operators/sampling.py split_and_shuffle)."""
    from tegola_spark.operators import sampling
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    return sampling.split_and_shuffle(docs).orderBy("doc_id")


def q_jl_projection(spark, sf_dir):
    """Johnson-Lindenstrauss +/-1 sign projection of the 64-d
    embeddings to 16-d. The matrix is md5-parity-derived (no RNG) and
    every output coordinate is the proven sequential fold, so DuckDB
    reproduces BIT-IDENTICAL doubles — no rounding anywhere
    (operators/projection.py jl_project)."""
    from tegola_spark.operators import projection

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return projection.jl_project(emb, in_dim=64, out_dim=16).orderBy("vec_id")


def q_cms_topk(spark, sf_dir):
    """Count-min-sketch heavy hitters (depth 4 x width 1024): the
    frequency sibling of the HLL entry — md5 row-salted buckets,
    integer counter sums, min over depth, all engine-portable so
    DuckDB replays the sketch and every estimate exactly
    (operators/sketch.py cms_heavy_hitters)."""
    from tegola_spark.operators import sketch
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    return sketch.cms_heavy_hitters(docs, k=20).orderBy("rank")


def q_exact_k_sample(spark, sf_dir):
    """Deterministic exact-k-per-stratum sample (k=25 per lang) by
    salted-hash priority — the partitioning-independent replacement
    for reservoir sampling; WindowGroupLimit keeps the exchange to
    <=k rows per stratum per partition
    (operators/sampling.py exact_k_per_stratum)."""
    from tegola_spark.operators import sampling
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    return (sampling.exact_k_per_stratum(docs, k=25)
            .orderBy("lang", "doc_id"))


def q_pack_sequences(spark, sf_dir):
    """Packed training sequences materialized: per-bin doc
    concatenation in id order with an EOD separator, verified by md5
    so bin-sized strings never ship. The oracle replays the flat
    running sum, the bin grouping, and every concatenated byte
    (operators/packing.py pack_sequences)."""
    from tegola_spark.operators import packing, textstats
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir).select(
        "doc_id", "text",
        textstats.col_token_count(F.col("text")).cast("long")
        .alias("n_tokens"))
    return packing.pack_sequences(docs, 4096).orderBy("bin_id")


def q_quality_cut(spark, sf_dir):
    """Percentile quality filter: keep docs at or above the corpus P10
    unigram-LM score — composes two oracle-proven operators
    (unigram_lm_score -> exact type-1 quantile threshold), so the
    whole drop decision replays in DuckDB
    (operators/textstats.py quality_cut)."""
    from tegola_spark.operators import textstats
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    return textstats.quality_cut(docs, q=0.1).orderBy("doc_id")


def q_domain_pagerank(spark, sf_dir):
    """Iterative graph centrality: integer-exact PageRank (5 sweeps,
    damping 0.85, dangling mass redistributed) over the deterministic
    domain link graph derived from the corpus — the Common-Crawl
    host-rank operation. All mass lives in int64 micro-units with
    floored division, so DuckDB replays every sweep exactly
    (operators/graph.py)."""
    from tegola_spark.operators import graph
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    return graph.domain_pagerank(spark, docs, iters=5).orderBy("domain")


def q_domain_trustrank(spark, sf_dir):
    """TrustRank (Gyöngyi et al. 2004): personalized PageRank whose
    teleport + dangling mass land only on trusted seed domains
    (deterministic top-4-most-English rule), so trust decays with link
    distance — the web-spam demotion operator. Same integer micro-unit
    recurrence as domain_pagerank (operators/graph.py)."""
    from tegola_spark.operators import graph
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    return graph.domain_trustrank(spark, docs, iters=5).orderBy("domain")


def q_latest_snapshot(spark, sf_dir):
    """CDX-style crawl-snapshot collapse: keep the latest capture per
    URL via one max_by aggregation (map-side partial, no window). The
    snapshot table is the pages corpus re-keyed onto 128 recrawl URLs
    so each logical URL carries several captures
    (operators/dedup.py latest_snapshot)."""
    from tegola_spark.operators import dedup
    from tegola_spark.sources import corpus

    snaps = corpus.pages(spark, sf_dir).select(
        F.concat(F.lit("https://recrawl.example.com/p"),
                 (F.col("doc_id") % 128).cast("string")).alias("url"),
        "doc_id",
        F.col("warc_ts").cast("long").alias("ts_epoch"))
    return dedup.latest_snapshot(
        snaps, key_col="url", ts_col="ts_epoch").orderBy("url")


def q_edit_distance_verify(spark, sf_dir):
    """Cascade fuzzy-dedup verification: LSH candidates -> exact
    trigram-jaccard filter (the minhash_pairs contract) -> exact
    Levenshtein distance with an all-integer similarity decision
    (5*dist <= 2*max_len, i.e. edit similarity >= 0.6). The oracle
    recomputes the candidate set from ALL pairs, so missed candidates
    still turn the entry red (operators/dedup.py edit_distance_verify)."""
    from tegola_spark.operators import dedup, textstats
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    cand = dedup.minhash_lsh_pairs(docs, threshold=0.0) \
        .select("id_a", "id_b")
    d = docs.select(F.col("doc_id"),
                    textstats.col_word_ngrams(F.col("text")).alias("g"))
    verified = (
        cand.join(d.select(F.col("doc_id").alias("id_a"),
                           F.col("g").alias("ga")), "id_a")
        .join(d.select(F.col("doc_id").alias("id_b"),
                       F.col("g").alias("gb")), "id_b")
        .where(F.round(textstats.col_jaccard(F.col("ga"), F.col("gb")),
                       6) >= 0.6)
        .select("id_a", "id_b"))
    return dedup.edit_distance_verify(docs, verified) \
        .orderBy("id_a", "id_b")


def q_rolling_window(spark, sf_dir):
    """Trailing 1-hour per-user event count + value sum via a RANGE
    window frame over epoch seconds — time-distance frames are
    row-order independent (co-timestamped events are peers) and the
    value rides in exact micro-unit int64
    (operators/temporal.py rolling_user_stats)."""
    from tegola_spark.operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.rolling_user_stats(ev).orderBy("event_id")


def q_inverted_index(spark, sf_dir):
    """Term posting lists (df, total tf, sorted doc:tf string) over the
    corpus — the retrieval-index artifact; deterministic via sort_array
    over collected (doc, tf) structs
    (operators/textstats.py inverted_index)."""
    from tegola_spark.operators import textstats
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    return textstats.inverted_index(docs, min_df=2).orderBy("term")


def q_bigram_lm(spark, sf_dir):
    """Stupid-Backoff bigram LM scoring (Brants et al. 2007): model
    trained on the even-id half, scoring every document so held-out
    docs exercise the backoff path; per-token micro-nat quantization
    makes the doc sums exact int64
    (operators/textstats.py bigram_lm_score)."""
    from tegola_spark.operators import textstats
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    return textstats.bigram_lm_score(docs).orderBy("doc_id")


def q_dsir_select(spark, sf_dir):
    """DSIR importance selection (Xie et al. 2023): hashed-unigram
    importance weights of target (lang='en') vs raw distribution,
    per-bucket micro-nat quantization, deterministic top-k
    (operators/sampling.py dsir_select)."""
    from tegola_spark.operators import sampling
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    return sampling.dsir_select(docs, k=100).orderBy(
        F.col("lw_micro_sum").desc(), F.col("doc_id"))


def q_pmi_collocations(spark, sf_dir):
    """Top-20 bigram collocations by pointwise mutual information
    (min joint count 5) — phrase-vocabulary / tokenizer-merge
    candidate mining; micro-nat integer ranking key
    (operators/textstats.py pmi_collocations)."""
    from tegola_spark.operators import textstats
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    return textstats.pmi_collocations(docs, min_count=5, k=20) \
        .orderBy(F.col("pmi_micro").desc(), "w1", "w2")


def q_domain_quota(spark, sf_dir):
    """Exact proportional sampling-budget allocation across domains
    (largest-remainder / Hamilton apportionment): integer base + the
    leftover distributed to the largest remainders, so quotas sum to
    the budget EXACTLY (operators/sampling.py proportional_quota)."""
    from tegola_spark.operators import sampling
    from tegola_spark.sources import corpus

    docs = corpus.documents(spark, sf_dir)
    return sampling.proportional_quota(docs, total=1000).orderBy("source")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pipeline at sf0.001 -> per-tile summary rows."""
    from tegola_spark.plans import pipeline

    _, tiles = pipeline.build_tiles(spark, "/root/testdata/sf0.001", zooms=[0, 1, 2])
    return tiles.select("z", "x", "y", "n_layers", "n_features", "tile_len")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tile_assign": q_tile_assign,
        "tile_zorder": q_tile_zorder,
        "tile_extent": q_tile_extent,
        "cell_rollup": q_cell_rollup,
        "bbox_filter": q_bbox_filter,
        "zoom_prune": q_zoom_prune,
        "spatial_join_nations": q_spatial_join_nations,
        "spatial_join_regions": q_spatial_join_regions,
        "tile_fanout_buffered": q_tile_fanout_buffered,
        "knn_cellring": q_knn_cellring,
        "knn_brute": q_knn_brute,
        "knn_pages": q_knn_pages,
        "mvt_tiles": q_mvt_tiles,
        "mvt_layer_metrics": q_mvt_layer_metrics,
        "mvt_tiles_hier": q_mvt_tiles_hier,
        "mvt_point_counts": q_mvt_point_counts,
        "mvt_line_counts": q_mvt_line_counts,
        "mvt_polygon_counts": q_mvt_polygon_counts,
        "dedup_exact": q_dedup_exact,
        "dedup_norm": q_dedup_norm,
        "token_stats": q_token_stats,
        "bpe_token_stats": q_bpe_token_stats,
        "ngram_jaccard": q_ngram_jaccard,
        "lineitem_pricing": q_lineitem_pricing,
        "orders_by_nation": q_orders_by_nation,
        "parts_top_per_brand": q_parts_top_per_brand,
        "quality_scores": q_quality_scores,
        "lang_id": q_lang_id,
        "fingerprints": q_fingerprints,
        "similarity_topk": q_similarity_topk,
        "embedding_norms": q_embedding_norms,
        "similarity_ann": q_similarity_ann,
        "similarity_ann_batch": q_similarity_ann_batch,
        "similarity_ivf": q_similarity_ivf,
        "similarity_ivf_batch": q_similarity_ivf_batch,
        "similarity_selfjoin": q_similarity_selfjoin,
        "event_windows": q_event_windows,
        "event_sessions": q_event_sessions,
        "raster_rollup": q_raster_rollup,
        "raster_vectorize": q_raster_vectorize,
        "minhash_pairs": q_minhash_pairs,
        "dedup_clusters": q_dedup_clusters,
        "stratified_sample": q_stratified_sample,
        "pii_scrub": q_pii_scrub,
        "repetition_filter": q_repetition_filter,
        "contamination": q_contamination,
        "contamination_shingled": q_contamination_shingled,
        "url_canonical": q_url_canonical,
        "domain_stats": q_domain_stats,
        "span_dedup": q_span_dedup,
        "boilerplate_spans": q_boilerplate_spans,
        "vocab_topk": q_vocab_topk,
        "asof_attribution": q_asof_attribution,
        "asof_attribution_tol": q_asof_attribution_tol,
        "interval_join": q_interval_join,
        "time_rollup": q_time_rollup,
        "hll_distinct": q_hll_distinct,
        "value_quantiles": q_value_quantiles,
        "domain_lang_cube": q_domain_lang_cube,
        "pack_bins": q_pack_bins,
        "embedding_quantize": q_embedding_quantize,
        "similarity_sq8": q_similarity_sq8,
        "simhash_fingerprints": q_simhash_fingerprints,
        "simhash_portable": q_simhash_portable,
        "multimodal_decode": q_multimodal_decode,
        "extract_parity": q_extract_parity,
        "chunk_documents": q_chunk_documents,
        "semantic_dedup": q_semantic_dedup,
        "tfidf_topk": q_tfidf_topk,
        "mixture_sample": q_mixture_sample,
        "unigram_lm": q_unigram_lm,
        "ngram_novelty": q_ngram_novelty,
        "train_split": q_train_split,
        "jl_projection": q_jl_projection,
        "cms_topk": q_cms_topk,
        "exact_k_sample": q_exact_k_sample,
        "pack_sequences": q_pack_sequences,
        "quality_cut": q_quality_cut,
        "domain_pagerank": q_domain_pagerank,
        "domain_trustrank": q_domain_trustrank,
        "latest_snapshot": q_latest_snapshot,
        "edit_distance_verify": q_edit_distance_verify,
        "rolling_window": q_rolling_window,
        "inverted_index": q_inverted_index,
        "bigram_lm": q_bigram_lm,
        "dsir_select": q_dsir_select,
        "domain_quota": q_domain_quota,
        "pmi_collocations": q_pmi_collocations,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB dialect)
# ---------------------------------------------------------------------------

_LANG_SCORE_SQL = {
    "en": "((length(p) - length(replace(p, ' the ', ''))) / 5.0 + (length(p) - length(replace(p, ' and ', ''))) / 5.0 + (length(p) - length(replace(p, ' of ', ''))) / 4.0)",
    "de": "((length(p) - length(replace(p, ' der ', ''))) / 5.0 + (length(p) - length(replace(p, ' und ', ''))) / 5.0 + (length(p) - length(replace(p, ' die ', ''))) / 5.0)",
    "fr": "((length(p) - length(replace(p, ' le ', ''))) / 4.0 + (length(p) - length(replace(p, ' la ', ''))) / 4.0 + (length(p) - length(replace(p, ' et ', ''))) / 4.0)",
    "es": "((length(p) - length(replace(p, ' el ', ''))) / 4.0 + (length(p) - length(replace(p, ' que ', ''))) / 5.0 + (length(p) - length(replace(p, ' los ', ''))) / 5.0)",
}


def oracle_sql() -> dict[str, str]:
    tile_x8 = _tile_x_sql("lon", 8)
    tile_y8 = _tile_y_sql("lat", 8)
    tile_x12 = _tile_x_sql("lon", 12)
    tile_y12 = _tile_y_sql("lat", 12)

    # tokens: empty/blank text -> 0
    tok = ("CASE WHEN length(trim(text)) = 0 THEN 0 "
           "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END")
    # BPE-ish pre-tokenizer match count; identical pattern to
    # textstats.BPE_SPLIT_PATTERN ('' escapes the quote for SQL)
    bpe_tok = ("len(regexp_extract_all(text, "
               "'''(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
               "| ?[^A-Za-z0-9 \t\n]+'))")

    s = _LANG_SCORE_SQL
    lang_pred = (
        f"CASE "
        f"WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en' "
        f"WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_es THEN 'de' "
        f"WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr' "
        f"WHEN s_es > 0 THEN 'es' ELSE 'und' END"
    )

    dot = ("list_aggregate(list_transform(list_zip(a.embedding, b.embedding), "
           "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')")
    norm = ("sqrt(list_aggregate(list_transform({t}.embedding, "
            "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))")

    return {
        "tile_assign": f"""
            SELECT doc_id, {LON_SQL} AS lon, {LAT_SQL} AS lat,
                   {tile_x8} AS tile_x, {tile_y8} AS tile_y,
                   12 * 4503599627370496 + ({tile_x12}) * 67108864 + ({tile_y12}) AS cell12
            FROM (SELECT doc_id, {LON_SQL} AS lon, {LAT_SQL} AS lat FROM documents)
        """,
        "tile_zorder": f"""
            WITH t AS (
              SELECT {tile_x8} AS tile_x, {tile_y8} AS tile_y,
                     CAST(COUNT(*) AS BIGINT) AS n_docs
              FROM (SELECT {LON_SQL} AS lon, {LAT_SQL} AS lat FROM documents)
              GROUP BY 1, 2
            )
            SELECT tile_x, tile_y,
                   CAST({" + ".join(
                       f"(((tile_x >> {i}) & 1) << {2 * i})"
                       f" + (((tile_y >> {i}) & 1) << {2 * i + 1})"
                       for i in range(8))} AS BIGINT) AS morton,
                   CAST(({" + ".join(
                       f"(((tile_x >> {i}) & 1) << {2 * i})"
                       f" + (((tile_y >> {i}) & 1) << {2 * i + 1})"
                       for i in range(8))}) >> 12 AS BIGINT) AS zbucket,
                   n_docs
            FROM t ORDER BY morton
        """,
        "tile_extent": """
            SELECT CAST(z AS INTEGER) AS z, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
                   -20037508.34 + x * (20037508.34 * 2 / pow(2, z)) AS minx,
                   20037508.34 - y * (20037508.34 * 2 / pow(2, z)) - (20037508.34 * 2 / pow(2, z)) AS miny,
                   -20037508.34 + x * (20037508.34 * 2 / pow(2, z)) + (20037508.34 * 2 / pow(2, z)) AS maxx,
                   20037508.34 - y * (20037508.34 * 2 / pow(2, z)) AS maxy
            FROM generate_series(0, 3) t(z),
                 generate_series(0, 7) tx(x),
                 generate_series(0, 7) ty(y)
            WHERE x < CAST(pow(2, z) AS BIGINT) AND y < CAST(pow(2, z) AS BIGINT)
        """,
        "cell_rollup": f"""
            WITH c AS (
              SELECT 12 * 4503599627370496 + ({tile_x12}) * 67108864 + ({tile_y12}) AS cell12
              FROM (SELECT {LON_SQL} AS lon, {LAT_SQL} AS lat FROM documents)
            )
            SELECT (12 - 7) * 4503599627370496
                   + (((cell12 // 67108864) % 67108864) // 128) * 67108864
                   + ((cell12 % 67108864) // 128) AS cell5,
                   COUNT(*) AS n_docs, COUNT(DISTINCT cell12) AS n_cells12
            FROM c GROUP BY 1
        """,
        "bbox_filter": f"""
            SELECT lang, COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
            FROM ({GEO_POINTS_SQL})
            WHERE lon >= -30.0 AND lon <= 60.0 AND lat >= -20.0 AND lat <= 45.0
            GROUP BY lang
        """,
        "zoom_prune": """
            WITH cat(layer, min_zoom, max_zoom) AS (
              VALUES ('pages', 0, 22), ('nations', 0, 22), ('regions', 0, 6),
                     ('roads', 0, 22))
            SELECT CAST(z AS INTEGER) AS z, layer
            FROM cat, generate_series(0, 8) t(z)
            WHERE z >= min_zoom AND z <= max_zoom
        """,
        "spatial_join_nations": f"""
            SELECT p.doc_id, n.feature_id
            FROM ({GEO_POINTS_SQL}) p JOIN ({NATION_RECT_SQL}) n
              ON p.lon >= n.minx AND p.lon <= n.maxx
             AND p.lat >= n.miny AND p.lat <= n.maxy
        """,
        "spatial_join_regions": f"""
            SELECT r.feature_id, COUNT(*) AS n_docs, MIN(p.doc_id) AS min_doc
            FROM ({GEO_POINTS_SQL}) p JOIN ({REGION_RECT_SQL}) r
              ON p.lon >= r.minx AND p.lon <= r.maxx
             AND p.lat >= r.miny AND p.lat <= r.maxy
            GROUP BY r.feature_id
        """,
        "tile_fanout_buffered": f"""
            WITH p AS (
              SELECT doc_id,
                     (lon + 180.0) / 360.0 * 16 AS wx,
                     (0.5 - ln(tan(pi() / 4.0 + lat * pi() / 180.0 / 2.0)) / (2 * pi())) * 16 AS wy
              FROM ({GEO_POINTS_SQL})
            )
            SELECT doc_id, x AS tile_x, y AS tile_y
            FROM p, generate_series(0, 15) tx(x), generate_series(0, 15) ty(y)
            WHERE wx >= x - 0.015625 AND wx <= x + 1 + 0.015625
              AND wy >= y - 0.015625 AND wy <= y + 1 + 0.015625
              AND CAST(floor(wx) AS BIGINT) - x BETWEEN -1 AND 1
              AND CAST(floor(wy) AS BIGINT) - y BETWEEN -1 AND 1
        """,
        "event_windows": """
            SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
                   event_type,
                   COUNT(*) AS n_events,
                   COUNT(DISTINCT user_id) AS n_users,
                   ROUND(SUM(value), 6) AS sum_value,
                   MAX(event_id) AS max_event_id
            FROM events GROUP BY 1, 2
        """,
        "event_sessions": """
            WITH e AS (
              SELECT user_id, event_id, value,
                     CAST(floor(epoch(ts)) AS BIGINT) AS ep
              FROM events
            ), flagged AS (
              SELECT user_id, event_id, value, ep,
                     CASE WHEN ep - LAG(ep) OVER
                            (PARTITION BY user_id ORDER BY ep, event_id)
                          IS NULL THEN 1
                          WHEN ep - LAG(ep) OVER
                            (PARTITION BY user_id ORDER BY ep, event_id)
                          > 1800 THEN 1 ELSE 0 END AS new_s
              FROM e
            ), ses AS (
              SELECT user_id, value, ep,
                     SUM(new_s) OVER (PARTITION BY user_id
                                      ORDER BY ep, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
              FROM flagged
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   COUNT(*) AS n_events,
                   MIN(ep) AS start_ep, MAX(ep) AS end_ep,
                   ROUND(SUM(value), 6) AS sum_value
            FROM ses GROUP BY 1, 2
        """,
        "knn_cellring": _knn_oracle(),
        "knn_brute": _knn_oracle(),
        "knn_pages": f"""
            WITH p AS ({GEO_POINTS_SQL}),
            q AS (
              SELECT doc_id AS query_id, lon AS qlon, lat AS qlat FROM p
              UNION ALL
              SELECT doc_id + 10000000 AS query_id, lon + 0.5 AS qlon,
                     lat - 0.25 AS qlat FROM p
            ), scored AS (
              SELECT q.query_id, p.doc_id,
                     (p.lon - q.qlon) * (p.lon - q.qlon)
                     + (p.lat - q.qlat) * (p.lat - q.qlat) AS dist_sq
              FROM p, q
            ), ranked AS (
              SELECT query_id, doc_id, dist_sq,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY dist_sq, doc_id) AS rank
              FROM scored
            )
            SELECT CAST(query_id AS BIGINT) AS query_id,
                   CAST(rank AS INTEGER) AS rank, doc_id, dist_sq
            FROM ranked WHERE rank <= 3
        """,
        "raster_rollup": f"""
            SELECT 3 * 4503599627370496 + ({_tile_x_sql('lon', 3)}) * 67108864
                   + ({_tile_y_sql('lat', 3)}) AS cell,
                   CAST(COUNT(*) AS DOUBLE) AS n_points
            FROM ({GEO_POINTS_SQL}) GROUP BY 1
        """,
        "raster_vectorize": f"""
            WITH cells4 AS (
              SELECT ({_tile_x_sql('lon', 4)}) AS cx, ({_tile_y_sql('lat', 4)}) AS cy,
                     COUNT(*) AS n
              FROM ({GEO_POINTS_SQL}) GROUP BY 1, 2
            )
            SELECT 4 * 4503599627370496 + cx * 67108864 + cy AS cell,
                   CAST(n AS DOUBLE) AS n_points,
                   ROUND(cx / 16.0 * 360.0 - 180.0, 9) AS minx,
                   ROUND(180.0 / pi() * atan(0.5 * (exp(pi() - 2 * pi() * (cy + 1) / 16.0)
                         - exp(-(pi() - 2 * pi() * (cy + 1) / 16.0)))), 9) AS miny,
                   ROUND((cx + 1) / 16.0 * 360.0 - 180.0, 9) AS maxx,
                   ROUND(180.0 / pi() * atan(0.5 * (exp(pi() - 2 * pi() * cy / 16.0)
                         - exp(-(pi() - 2 * pi() * cy / 16.0)))), 9) AS maxy
            FROM cells4
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "dedup_norm": """
            SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS text_hash,
                   MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "token_stats": f"""
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM({tok}) AS BIGINT) AS total_tokens,
                   ROUND(AVG({tok}), 6) AS avg_tokens,
                   CAST(MAX({tok}) AS BIGINT) AS max_tokens
            FROM documents GROUP BY lang
        """,
        "bpe_token_stats": f"""
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM({bpe_tok}) AS BIGINT) AS total_bpe_tokens,
                   ROUND(AVG({bpe_tok}), 6) AS avg_bpe_tokens,
                   CAST(MAX({bpe_tok}) AS BIGINT) AS max_bpe_tokens
            FROM documents GROUP BY lang
        """,
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(ROUND(1 - l_discount, 2) AS DECIMAL(4,2)))
                        AS DOUBLE) AS sum_disc_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(ROUND(1 - l_discount, 2) AS DECIMAL(4,2))
                            * CAST(ROUND(1 + l_tax, 2) AS DECIMAL(4,2)))
                        AS DOUBLE) AS sum_charge,
                   COUNT(*) AS n_items
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2001-01-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "orders_by_nation": """
            SELECT n_name, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "parts_top_per_brand": """
            WITH ranked AS (
              SELECT p_brand,
                     row_number() OVER (PARTITION BY p_brand
                                        ORDER BY p_retailprice DESC,
                                                 p_partkey) AS rk,
                     p_partkey, p_retailprice
              FROM part
            )
            SELECT p_brand, rk, p_partkey,
                   ROUND(p_retailprice, 2) AS price_r2,
                   (SELECT COUNT(*) FROM supplier) AS n_suppliers
            FROM ranked WHERE rk <= 3
        """,
        "ngram_jaccard": r"""
            WITH toks AS (
              SELECT doc_id, lang,
                     regexp_split_to_array(trim(text), '\s+') AS t
              FROM documents
            ), tris AS (
              SELECT doc_id, lang,
                     list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                    for i in range(1, greatest(len(t)-1, 1))]) AS g
              FROM toks
            ), ranked AS (
              SELECT *, row_number() OVER (PARTITION BY lang
                                           ORDER BY doc_id) AS rk
              FROM tris
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
                   len(a.g) AS n_tri_a, len(b.g) AS n_tri_b,
                   ROUND(len(list_intersect(a.g, b.g))::DOUBLE /
                         greatest(len(list_distinct(a.g || b.g)), 1),
                         6) AS jaccard_r6
            FROM ranked a JOIN ranked b
              ON a.lang = b.lang AND a.rk + 1 = b.rk
        """,
        "quality_scores": f"""
            SELECT doc_id,
                   length(text) AS n_chars_calc,
                   CAST({tok} AS BIGINT) AS n_tokens,
                   ROUND((length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
                     / (CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END * 1.0), 9) AS alpha_r,
                   ROUND((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                     / (CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END * 1.0), 9) AS digit_r,
                   ROUND((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
                     / (CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END * 1.0), 9) AS upper_r,
                   ROUND((length(text) - length(regexp_replace(text, '[ \t\n]', '', 'g')))
                     / (CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END * 1.0), 9) AS space_r,
                   ROUND(length(regexp_replace(text, '\\s+', '', 'g'))
                     / (CASE WHEN {tok} = 0 THEN 1 ELSE {tok} END * 1.0), 9) AS avg_tok_len
            FROM documents
        """,
        "lang_id": f"""
            WITH padded AS (
              SELECT doc_id, lang, ' ' || lower(text) || ' ' AS p FROM documents
            ), scores AS (
              SELECT doc_id, lang,
                     {s['en']} AS s_en, {s['de']} AS s_de,
                     {s['fr']} AS s_fr, {s['es']} AS s_es
              FROM padded
            )
            SELECT doc_id, lang, {lang_pred} AS lang_pred FROM scores
        """,
        "fingerprints": """
            SELECT doc_id, md5(text) AS fp_exact,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp_norm
            FROM documents
        """,
        "similarity_topk": f"""
            WITH q AS (SELECT * FROM embeddings WHERE vec_id IN ({','.join(map(str, SIM_QUERY_IDS))})),
            scored AS (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     {dot} / ({norm.format(t='a')} * {norm.format(t='b')}) AS score
              FROM q a JOIN embeddings b ON a.vec_id <> b.vec_id
            ), ranked AS (
              SELECT query_id, neighbor_id, score,
                     ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
              FROM scored
            )
            SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
                   ROUND(score, 6) AS score_r6
            FROM ranked WHERE rank <= 5
        """,
        "embedding_norms": f"""
            SELECT label, COUNT(*) AS n,
                   ROUND(AVG({norm.format(t='embeddings')}), 6) AS avg_norm
            FROM embeddings GROUP BY label
        """,
        "extract_parity": """
            SELECT 'https://' || source || '.example.com/' || lang || '/' || doc_id AS url,
                   md5(text) AS text_md5
            FROM documents
        """,
        "similarity_ann": _lsh_ann_oracle(
            5, 8, 2,
            "SELECT vec_id AS query_id, embedding AS qemb FROM embeddings "
            f"WHERE vec_id IN ({','.join(map(str, SIM_QUERY_IDS))})"),
        "similarity_selfjoin": _lsh_ann_oracle(
            3, 8, 1,
            "SELECT vec_id AS query_id, embedding AS qemb FROM embeddings"),
        "similarity_ann_batch": _lsh_ann_oracle(
            5, 8, 1,
            "SELECT vec_id AS query_id, "
            "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qemb "
            "FROM embeddings "
            "UNION ALL "
            "SELECT vec_id + 10000000 AS query_id, "
            "list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.01) AS qemb "
            "FROM embeddings"),
        "minhash_pairs": _TRIGRAM_JACCARD_SQL,
        "dedup_clusters": _DEDUP_CLUSTERS_SQL,
        "stratified_sample": _STRATIFIED_SAMPLE_SQL,
        "pii_scrub": _PII_SCRUB_SQL,
        "repetition_filter": _REPETITION_FILTER_SQL,
        "contamination": _CONTAMINATION_SQL,
        "contamination_shingled": _CONTAMINATION_SQL,
        "url_canonical": _URL_CANONICAL_SQL,
        "domain_stats": _DOMAIN_STATS_SQL,
        "span_dedup": _SPAN_DEDUP_SQL,
        "boilerplate_spans": _BOILERPLATE_SPANS_SQL,
        "vocab_topk": _VOCAB_TOPK_SQL,
        "asof_attribution": _ASOF_SQL,
        "asof_attribution_tol": _ASOF_TOL_SQL,
        "interval_join": _INTERVAL_JOIN_SQL,
        "time_rollup": _TIME_ROLLUP_SQL,
        "hll_distinct": _HLL_DISTINCT_SQL,
        "value_quantiles": _VALUE_QUANTILES_SQL,
        "domain_lang_cube": _DOMAIN_LANG_CUBE_SQL,
        "pack_bins": _PACK_BINS_SQL,
        "embedding_quantize": _SQ8_QUANTIZE_SQL,
        "similarity_sq8": _sq8_topk_oracle(),
        "simhash_portable": _simhash_portable_oracle(),
        "mvt_point_counts": _mvt_point_counts_oracle(range(0, 6)),
        "mvt_line_counts": _mvt_line_counts_oracle(range(0, 6)),
        "mvt_polygon_counts": _mvt_polygon_counts_oracle(range(0, 6)),
        "similarity_ivf": _ivf_fixed_oracle(
            5, 16, 4,
            "SELECT vec_id AS query_id, embedding AS qemb FROM embeddings "
            f"WHERE vec_id IN ({','.join(map(str, SIM_QUERY_IDS))})"),
        "similarity_ivf_batch": _ivf_fixed_oracle(
            5, 16, 4,
            "SELECT vec_id AS query_id, "
            "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qemb "
            "FROM embeddings "
            "UNION ALL "
            "SELECT vec_id + 10000000 AS query_id, "
            "list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.01) AS qemb "
            "FROM embeddings"),
        "chunk_documents": _CHUNK_DOCUMENTS_SQL,
        "tfidf_topk": _TFIDF_TOPK_SQL,
        "mixture_sample": _MIXTURE_SAMPLE_SQL,
        "semantic_dedup": _semantic_dedup_oracle(
            threshold=0.99, n_centroids=16),
        "unigram_lm": _UNIGRAM_LM_SQL,
        "ngram_novelty": _NGRAM_NOVELTY_SQL,
        "train_split": _TRAIN_SPLIT_SQL,
        "jl_projection": _jl_projection_oracle(),
        "cms_topk": _CMS_TOPK_SQL,
        "exact_k_sample": _EXACT_K_SAMPLE_SQL,
        "pack_sequences": _PACK_SEQUENCES_SQL,
        "quality_cut": _QUALITY_CUT_SQL,
        "domain_pagerank": _pagerank_oracle(5),
        "domain_trustrank": _trustrank_oracle(5),
        "latest_snapshot": _LATEST_SNAPSHOT_SQL,
        "edit_distance_verify": _EDIT_DISTANCE_VERIFY_SQL,
        "rolling_window": _ROLLING_WINDOW_SQL,
        "inverted_index": _INVERTED_INDEX_SQL,
        "bigram_lm": _BIGRAM_LM_SQL,
        "dsir_select": _DSIR_SELECT_SQL,
        "domain_quota": _DOMAIN_QUOTA_SQL,
        "pmi_collocations": _PMI_COLLOCATIONS_SQL,
        # mvt_tiles / mvt_layer_metrics / mvt_tiles_hier /
        # simhash_fingerprints / multimodal_decode: no SQL equivalent
        # (binary tile encode, blake2b hashes, stub decode) ->
        # rows-only. The pipeline's counts ARE hash-checked via
        # mvt_point_counts / mvt_line_counts above.
    }


# ---------------------------------------------------------------------------
# MVT pipeline oracle builders (round-5): DuckDB recomputes the tile
# pipeline's keep/drop decisions from first principles. Every fragment
# replicates the EXACT float operation order of the engine code it
# mirrors (associativity matters for bit-parity); constants are inlined
# as shortest-round-trip reprs of the Python doubles.
# ---------------------------------------------------------------------------

_ECC = "0.08181919092890692"     # mercator.ECCENT
_COM_E = "0.04090959546445346"   # mercator.COM
_HALF_PI = "1.5707963267948966"  # math.pi * 0.5
_DEG = "57.29577951308232"       # 180.0 / math.pi
_QPI = "0.7853981633974483"      # math.pi / 4.0
_TWO_PI = "6.283185307179586"    # 2.0 * math.pi
_RAD = "0.017453292519943295"    # math.pi / 180.0
_BUF = "0.015625"                # 64 / 4096


def _ell_x_sql(lon: str) -> str:
    """mercator.lon_to_x: R * ((lon * pi) / 180)."""
    return f"(6378137.0 * ((({lon}) * pi()) / 180.0))"


def _ell_y_sql(lat: str) -> str:
    """mercator.lat_to_y (ellipsoidal, no clamp needed: corpus |lat| <
    85): phi = (lat*pi)/180; con = ((1-e sin)/(1+e sin))^(e/2);
    y = -R * ln(tan(0.5*(pi/2 - phi)) / con)."""
    phi = f"((({lat}) * pi()) / 180.0)"
    v = f"({_ECC} * sin({phi}))"
    con = f"pow((1.0 - {v}) / (1.0 + {v}), {_COM_E})"
    return (f"(0.0 - 6378137.0 * ln(tan(0.5 * ({_HALF_PI} - {phi}))"
            f" / {con}))")


def _wx_sql(lon: str, nd: str) -> str:
    """tiling.col_world_x: ((lon + 180) / 360) * n."""
    return f"(((({lon}) + 180.0) / 360.0) * {nd})"


def _wy_sql(lat: str, nd: str) -> str:
    """tiling.col_world_y: (0.5 - ln(tan(pi/4 + (lat*(pi/180))/2)) /
    (2 pi)) * n."""
    ymerc = f"ln(tan({_QPI} + (({lat}) * {_RAD}) / 2.0))"
    return f"((0.5 - {ymerc} / {_TWO_PI}) * {nd})"


def _tile_ext_sql(x: str, y: str, nd: str):
    """grid.tile_extent_3857: spherical mercator of the tile corner
    lon/lats composed through tile2lat_slippy — returns (minx, miny,
    maxx, maxy) SQL."""
    lon0 = f"((({x}) / {nd}) * 360.0 - 180.0)"
    lon1 = f"(((({x}) + 1.0) / {nd}) * 360.0 - 180.0)"

    def slat(yy):
        nn = f"(pi() - (({_TWO_PI} * ({yy})) / {nd}))"
        return f"({_DEG} * atan(0.5 * (exp({nn}) - exp(-({nn})))))"

    lat_top = slat(y)
    lat_bot = slat(f"(({y}) + 1.0)")

    def mx(lon):
        return f"(((6378137.0 * ({lon})) * pi()) / 180.0)"

    def my(lat):
        return f"(6378137.0 * ln(tan({_QPI} + ((({lat}) * pi()) / 360.0))))"

    return mx(lon0), my(lat_bot), mx(lon1), my(lat_top)


def _mvt_point_counts_oracle(zooms) -> str:
    """Replays the pages layer of the tile pipeline at counts level:
    spherical buffered fan-out (assign_point_tiles / the anchor
    kernel's identical predicate), ellipsoidal projection, spherical
    tile extents, pixel quantization + [-64, 4160] clip keep."""
    zlist = ", ".join(map(str, zooms))
    tminx, tminy, tmaxx, tmaxy = _tile_ext_sql(
        "CAST(x AS DOUBLE)", "CAST(y AS DOUBLE)", "nd")
    keep = (f"qx >= -64.0 AND qx <= 4160.0 "
            f"AND qy >= -64.0 AND qy <= 4160.0")
    return f"""
        WITH p AS (
          SELECT doc_id, {LON_SQL} AS lon, {LAT_SQL} AS lat FROM documents
        ), pr AS (
          SELECT doc_id, lon, lat,
                 {_ell_x_sql('lon')} AS px, {_ell_y_sql('lat')} AS py
          FROM p
        ), zs AS (
          SELECT z, pow(2.0, z) AS nd
          FROM (SELECT unnest([{zlist}]) AS z)
        ), w AS (
          SELECT doc_id, px, py, z, nd,
                 {_wx_sql('lon', 'nd')} AS wx, {_wy_sql('lat', 'nd')} AS wy
          FROM pr, zs
        ), cand AS (
          SELECT px, py, z, nd, wx, wy,
                 CAST(floor(wx) AS BIGINT) + dx AS x,
                 CAST(floor(wy) AS BIGINT) + dy AS y
          FROM w,
               (SELECT unnest([-1, 0, 1]) AS dx) dxs,
               (SELECT unnest([-1, 0, 1]) AS dy) dys
        ), assigned AS (
          SELECT * FROM cand
          WHERE x >= 0 AND x < CAST(nd AS BIGINT)
            AND y >= 0 AND y < CAST(nd AS BIGINT)
            AND wx >= CAST(x AS DOUBLE) - {_BUF}
            AND wx <= CAST(x AS DOUBLE) + 1 + {_BUF}
            AND wy >= CAST(y AS DOUBLE) - {_BUF}
            AND wy <= CAST(y AS DOUBLE) + 1 + {_BUF}
        ), q AS (
          SELECT z, x, y,
                 (px - {tminx}) / ({tmaxx} - {tminx}) * 4096.0 AS qx,
                 ({tmaxy} - py) / ({tmaxy} - {tminy}) * 4096.0 AS qy
          FROM assigned
        )
        SELECT CAST(z AS INTEGER) AS z, CAST(x AS BIGINT) AS x,
               CAST(y AS BIGINT) AS y,
               CAST(SUM(CASE WHEN {keep} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_features,
               CAST(SUM(CASE WHEN {keep} THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_dropped
        FROM q GROUP BY 1, 2, 3
    """


def _mvt_line_counts_oracle(zooms) -> str:
    """Replays the roads LineString layer at counts level: bbox fan-out
    (assign_bbox_tiles), ellipsoidal endpoint projection, quantization,
    then the clip keep-decision — an endpoint inside the inclusive
    buffered box, or >= 2 DISTINCT on-segment intersections with the
    box edges computed by the reference's slope-intercept arithmetic
    (maths/maths.go:160-235: vertical edge -> (ex, m*ex + c),
    horizontal edge -> ((ey - c)/m, ey))."""
    zlist = ", ".join(map(str, zooms))
    tminx, tminy, tmaxx, tmaxy = _tile_ext_sql(
        "CAST(x AS DOUBLE)", "CAST(y AS DOUBLE)", "nd")

    def inbox(px, py):
        return (f"({px} >= -64.0 AND {px} <= 4160.0 "
                f"AND {py} >= -64.0 AND {py} <= 4160.0)")

    # candidate intersection + validity per box edge: on the edge's
    # inclusive bbox AND the segment's inclusive bbox (_in_between x2)
    # dedup key: shortest-round-trip VARCHAR of the double pair —
    # injective on doubles, so string equality == the reference's exact
    # float equality (clip.go:25-48 skips a repeated intersection point)
    def hcand(ey):  # horizontal edge y = ey
        px = f"(({ey} - c) / m)"
        v = (f"({px} >= -64.0 AND {px} <= 4160.0 "
             f"AND least(qax, qbx) <= {px} AND {px} <= greatest(qax, qbx) "
             f"AND least(qay, qby) <= {ey} AND {ey} <= greatest(qay, qby))")
        return (f"CASE WHEN {v} THEN CAST({px} AS VARCHAR) || ',' || "
                f"CAST({ey} AS VARCHAR) ELSE NULL END")

    def vcand(ex):  # vertical edge x = ex
        py = f"(m * {ex} + c)"
        v = (f"({py} >= -64.0 AND {py} <= 4160.0 "
             f"AND least(qax, qbx) <= {ex} AND {ex} <= greatest(qax, qbx) "
             f"AND least(qay, qby) <= {py} AND {py} <= greatest(qay, qby))")
        return (f"CASE WHEN {v} THEN CAST({ex} AS VARCHAR) || ',' || "
                f"CAST({py} AS VARCHAR) ELSE NULL END")

    cands = ", ".join([hcand("-64.0"), vcand("4160.0"),
                       hcand("4160.0"), vcand("-64.0")])
    kept = (f"CASE WHEN {inbox('qax', 'qay')} OR {inbox('qbx', 'qby')} "
            f"THEN 1 WHEN len(list_distinct(list_filter([{cands}], "
            f"e -> e IS NOT NULL))) >= 2 THEN 1 ELSE 0 END")
    return f"""
        WITH r AS (
          SELECT CAST(n_nationkey AS BIGINT) AS fid,
                 CAST((n_nationkey * 37) % 340 - 170 AS DOUBLE) + 0.3 AS ax,
                 CAST((n_nationkey * 23) % 160 - 80 AS DOUBLE) + 0.2 AS ay,
                 CAST((n_nationkey * 37) % 340 - 170 + 6 + n_nationkey % 7
                      AS DOUBLE) - 0.3 AS bx,
                 CAST((n_nationkey * 23) % 160 - 80 + 4 + n_nationkey % 5
                      AS DOUBLE) - 0.2 AS by
          FROM nation
        ), pr AS (
          SELECT fid, ax, ay, bx, by,
                 {_ell_x_sql('ax')} AS pax, {_ell_y_sql('ay')} AS pay,
                 {_ell_x_sql('bx')} AS pbx, {_ell_y_sql('by')} AS pby
          FROM r
        ), zs AS (
          SELECT z, pow(2.0, z) AS nd
          FROM (SELECT unnest([{zlist}]) AS z)
        ), fan AS (
          SELECT pr.*, zs.z, zs.nd,
                 CAST(floor({_wx_sql('ax', 'nd')} - {_BUF}) AS BIGINT) AS x0,
                 CAST(floor({_wx_sql('bx', 'nd')} + {_BUF}) AS BIGINT) AS x1,
                 CAST(floor({_wy_sql('by', 'nd')} - {_BUF}) AS BIGINT) AS y0,
                 CAST(floor({_wy_sql('ay', 'nd')} + {_BUF}) AS BIGINT) AS y1
          FROM pr, zs
        ), assigned AS (
          SELECT f.*, gx.x AS x, gy.y AS y
          FROM fan f, generate_series(0, 63) gx(x),
               generate_series(0, 63) gy(y)
          WHERE gx.x >= greatest(x0, 0)
            AND gx.x <= least(x1, CAST(nd AS BIGINT) - 1)
            AND gy.y >= greatest(y0, 0)
            AND gy.y <= least(y1, CAST(nd AS BIGINT) - 1)
        ), q AS (
          SELECT fid, z, x, y,
                 (pax - {tminx}) / ({tmaxx} - {tminx}) * 4096.0 AS qax,
                 ({tmaxy} - pay) / ({tmaxy} - {tminy}) * 4096.0 AS qay,
                 (pbx - {tminx}) / ({tmaxx} - {tminx}) * 4096.0 AS qbx,
                 ({tmaxy} - pby) / ({tmaxy} - {tminy}) * 4096.0 AS qby
          FROM assigned
        ), qc AS (
          SELECT fid, z, x, y, qax, qay, qbx, qby, m, qay - m * qax AS c
          FROM (SELECT *, (qby - qay) / (qbx - qax) AS m FROM q)
        ), k AS (
          SELECT fid, z, x, y, {kept} AS kept FROM qc
        )
        SELECT CAST(z AS INTEGER) AS z, CAST(x AS BIGINT) AS x,
               CAST(y AS BIGINT) AS y,
               CAST(SUM(kept) AS BIGINT) AS n_features,
               CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_dropped
        FROM k GROUP BY 1, 2, 3
    """


def _mvt_polygon_counts_oracle(zooms) -> str:
    """Replays the nations/regions polygon layers at counts level:
    bbox fan-out (assign_bbox_tiles / the fused kernel's identical
    span arithmetic), ellipsoidal corner projection, spherical tile
    extents, pixel quantization — then the polygon keep-decision in
    its reduced form for axis-aligned rects (differentially proven
    against prepare_geo + clean_geometry, see q_mvt_polygon_counts):

      kept iff |qx1-qx0| > 1e-9 AND |qyb-qyt| > 1e-9     (dedup tol)
           AND max(-640, 10*qxmin) < min(41600, 10*qxmax) (x10 clipbox
           AND max(-640, 10*qymin) < min(41600, 10*qymax)  main.go:162)
    """
    zlist = ", ".join(map(str, zooms))
    tminx, tminy, tmaxx, tmaxy = _tile_ext_sql(
        "CAST(x AS DOUBLE)", "CAST(y AS DOUBLE)", "nd")
    kept = ("CASE WHEN abs(qx1 - qx0) > 1e-9 AND abs(qyb - qyt) > 1e-9 "
            "AND greatest(-640.0, 10.0 * least(qx0, qx1))"
            " < least(41600.0, 10.0 * greatest(qx0, qx1)) "
            "AND greatest(-640.0, 10.0 * least(qyt, qyb))"
            " < least(41600.0, 10.0 * greatest(qyt, qyb)) "
            "THEN 1 ELSE 0 END")
    return f"""
        WITH rect AS (
          SELECT 'nations' AS layer,
                 CAST((n_nationkey * 37) % 340 - 170 AS DOUBLE) AS minx,
                 CAST((n_nationkey * 23) % 160 - 80 AS DOUBLE) AS miny,
                 CAST((n_nationkey * 37) % 340 - 170 + 6 + n_nationkey % 7
                      AS DOUBLE) AS maxx,
                 CAST((n_nationkey * 23) % 160 - 80 + 4 + n_nationkey % 5
                      AS DOUBLE) AS maxy
          FROM nation
          UNION ALL
          SELECT 'regions',
                 CAST(r_regionkey * 72 - 180 AS DOUBLE),
                 CAST((r_regionkey * 13) % 20 - 70 AS DOUBLE),
                 CAST(r_regionkey * 72 - 180 + 72 AS DOUBLE),
                 CAST((r_regionkey * 13) % 20 - 70 + 100 AS DOUBLE)
          FROM region
        ), pr AS (
          SELECT layer, minx, miny, maxx, maxy,
                 {_ell_x_sql('minx')} AS pax, {_ell_x_sql('maxx')} AS pbx,
                 {_ell_y_sql('miny')} AS pay, {_ell_y_sql('maxy')} AS pby
          FROM rect
        ), zs AS (
          SELECT z, pow(2.0, z) AS nd
          FROM (SELECT unnest([{zlist}]) AS z)
        ), fan AS (
          SELECT pr.*, zs.z, zs.nd,
                 CAST(floor({_wx_sql('minx', 'nd')} - {_BUF}) AS BIGINT) AS x0,
                 CAST(floor({_wx_sql('maxx', 'nd')} + {_BUF}) AS BIGINT) AS x1,
                 CAST(floor({_wy_sql('maxy', 'nd')} - {_BUF}) AS BIGINT) AS y0,
                 CAST(floor({_wy_sql('miny', 'nd')} + {_BUF}) AS BIGINT) AS y1
          FROM pr, zs
        ), assigned AS (
          SELECT f.*, gx.x AS x, gy.y AS y
          FROM fan f, generate_series(0, 63) gx(x),
               generate_series(0, 63) gy(y)
          WHERE gx.x >= greatest(x0, 0)
            AND gx.x <= least(x1, CAST(nd AS BIGINT) - 1)
            AND gy.y >= greatest(y0, 0)
            AND gy.y <= least(y1, CAST(nd AS BIGINT) - 1)
        ), q AS (
          SELECT layer, z, x, y,
                 (pax - {tminx}) / ({tmaxx} - {tminx}) * 4096.0 AS qx0,
                 (pbx - {tminx}) / ({tmaxx} - {tminx}) * 4096.0 AS qx1,
                 ({tmaxy} - pay) / ({tmaxy} - {tminy}) * 4096.0 AS qyb,
                 ({tmaxy} - pby) / ({tmaxy} - {tminy}) * 4096.0 AS qyt
          FROM assigned
        )
        SELECT CAST(z AS INTEGER) AS z, CAST(x AS BIGINT) AS x,
               CAST(y AS BIGINT) AS y, layer,
               CAST(SUM({kept}) AS BIGINT) AS n_features,
               CAST(COUNT(*) - SUM({kept}) AS BIGINT) AS n_dropped
        FROM q GROUP BY 1, 2, 3, 4
    """


def _ivf_fixed_oracle(k: int, n_centroids: int, nprobe: int,
                      query_sql: str) -> str:
    """Replays similarity.ivf_fixed_ann_topk_df: fixed lowest-id
    centroids, sequential-fold distances, rank ties on centroid index,
    inverted equi-join, exact cosine re-rank."""
    def dotseq(a, b):
        return (f"list_aggregate(list_transform(list_zip({a}, {b}), "
                "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')")

    return f"""
        WITH cents0 AS (
          SELECT vec_id, embedding FROM embeddings
          ORDER BY vec_id LIMIT {n_centroids}
        ), cents AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx,
                 embedding AS cemb,
                 {dotseq('embedding', 'embedding')} AS dcc
          FROM cents0
        ), base AS (
          SELECT vec_id AS nid, embedding AS nemb,
                 {_l2_sql('embedding')} AS nnorm
          FROM embeddings
        ), assign AS (
          SELECT nid, nemb, nnorm, cidx,
                 row_number() OVER (PARTITION BY nid
                     ORDER BY dcc - 2.0 * {dotseq('nemb', 'cemb')}, cidx)
                     AS crk
          FROM base, cents
        ), inv AS (
          SELECT nid, nemb, nnorm, cidx AS ncid FROM assign WHERE crk = 1
        ), q AS ({query_sql}),
        qn AS (
          SELECT query_id, qemb, {_l2_sql('qemb')} AS qnorm FROM q
        ), qa AS (
          SELECT query_id, qemb, qnorm, cidx,
                 row_number() OVER (PARTITION BY query_id
                     ORDER BY dcc - 2.0 * {dotseq('qemb', 'cemb')}, cidx)
                     AS crk
          FROM qn, cents
        ), probes AS (
          SELECT query_id, qemb, qnorm, cidx AS ncid
          FROM qa WHERE crk <= {nprobe}
        ), cand AS (
          SELECT p.query_id, b.nid AS neighbor_id,
                 {dotseq('p.qemb', 'b.nemb')} / (p.qnorm * b.nnorm) AS score
          FROM probes p JOIN inv b
            ON b.ncid = p.ncid AND b.nid <> p.query_id
        ), ranked AS (
          SELECT query_id, neighbor_id, score,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, neighbor_id) AS rank
          FROM cand
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
               ROUND(score, 6) AS score_r6
        FROM ranked WHERE rank <= {k}
    """


# Mirrors operators/textstats.py chunk_documents (size=32, stride=24):
# sliding token windows, n_chunks = 1 + ceil(max(0, n-32)/24) via exact
# integer arithmetic; DuckDB's 1-based inclusive list slice equals
# F.slice(words, start+1, 32) including past-the-end truncation.
_CHUNK_DOCUMENTS_SQL = """
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS words FROM documents
        ), c AS (
          SELECT doc_id, words, len(words) AS n,
                 1 + CAST(floor((greatest(len(words) - 32, 0) + 23) / 24)
                          AS BIGINT) AS n_chunks
          FROM w
        )
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, n_chunks,
               CAST(least(32, n - i * 24) AS BIGINT) AS chunk_tokens,
               array_to_string(words[i*24+1 : i*24+32], ' ') AS chunk_text
        FROM c, unnest(range(0, n_chunks)) AS t(i)
        ORDER BY doc_id, chunk_id
"""


# Mirrors operators/sampling.py mixture_sample (q_mixture_sample's
# weights): n_copies = floor(w) + [bucket < frac(w)*RESOLUTION], same
# salted-md5 bucket as the stratified oracle; range(0) drops the row.
_MIXTURE_SAMPLE_SQL = r"""
        WITH b AS (
          SELECT doc_id, source,
                 CAST(concat('0x', substr(md5(concat('mixture-v1',
                      CAST(doc_id AS VARCHAR))), 1, 12)) AS BIGINT)
                   % 1000000 AS bucket
          FROM documents
        ), n AS (
          SELECT doc_id, source,
                 (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
                              WHEN 'src2' THEN 0 WHEN 'src3' THEN 3
                              ELSE 1 END)
                 + (CASE WHEN bucket < (CASE source
                        WHEN 'src0' THEN 250000 WHEN 'src1' THEN 500000
                        WHEN 'src2' THEN 0 WHEN 'src3' THEN 0
                        ELSE 0 END) THEN 1 ELSE 0 END) AS n_copies
          FROM b
        )
        SELECT doc_id, source, CAST(i AS INTEGER) AS copy_id
        FROM n, unnest(range(0, n_copies)) AS t(i)
        ORDER BY doc_id, copy_id
"""


# Mirrors operators/textstats.py tfidf_topk (k=5): tf = word counts
# per (doc, word); df = docs per word; idf = ln((N+1)/(df+1)) + 1
# (sklearn smoothing); rank over ROUND(tf*idf, 6) then word so libm
# ulp in ln cannot flip an ordering either engine sees.
_TFIDF_TOPK_SQL = """
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents
        ), tf AS (
          SELECT doc_id, word, COUNT(*) AS tf
          FROM w WHERE word <> '' GROUP BY doc_id, word
        ), n AS (
          SELECT COUNT(*) AS n_docs FROM documents
        ), idf AS (
          SELECT word,
                 ln((n.n_docs + 1.0) / (COUNT(*) + 1.0)) + 1.0 AS idf
          FROM tf, n GROUP BY word, n.n_docs
        ), scored AS (
          SELECT tf.doc_id, tf.word, tf.tf,
                 ROUND(tf.tf * idf.idf, 6) AS score_r6
          FROM tf JOIN idf ON tf.word = idf.word
        ), ranked AS (
          SELECT doc_id, word, tf, score_r6,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY score_r6 DESC, word) AS rank
          FROM scored
        )
        SELECT doc_id, CAST(rank AS INTEGER) AS rank, word, tf, score_r6
        FROM ranked WHERE rank <= 5
        ORDER BY doc_id, rank
"""


# Mirrors operators/textstats.py unigram_lm_score: MLE word log-probs
# quantized to integer micro-nats via floor(x*1e6 + 0.5) (floor, not
# round — engines disagree on round-half), summed as exact int64, so
# the average divides identical integers on both engines.
_UNIGRAM_LM_SQL = """
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents
        ), wf AS (
          SELECT doc_id, word FROM w WHERE word <> ''
        ), c AS (
          SELECT word, COUNT(*) AS n FROM wf GROUP BY word
        ), tot AS (
          SELECT CAST(SUM(n) AS DOUBLE) AS total FROM c
        ), lp AS (
          SELECT word,
                 CAST(floor(ln(CAST(n AS DOUBLE) / tot.total) * 1e6 + 0.5)
                      AS BIGINT) AS lp_micro
          FROM c, tot
        ), agg AS (
          SELECT wf.doc_id, COUNT(*) AS n_tokens, SUM(lp.lp_micro) AS s
          FROM wf JOIN lp USING (word) GROUP BY wf.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(a.s, 0) AS BIGINT) AS lp_micro_sum,
               CASE WHEN COALESCE(a.n_tokens, 0) > 0
                    THEN ROUND(CAST(a.s AS BIGINT)
                               / (a.n_tokens * 1e6), 6)
                    ELSE 0.0 END AS avg_logprob_r6
        FROM documents d LEFT JOIN agg a USING (doc_id)
        ORDER BY doc_id
"""


# Mirrors operators/textstats.py ngram_novelty (n=5): distinct word
# 5-grams per doc, cross-document frequency join, integer-exact
# duplicated fraction. Slice t[i:i+4] is 1-based INCLUSIVE (5 words);
# range(1, m+1) yields i = 1..len(t)-4.
_NGRAM_NOVELTY_SQL = r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
          FROM documents
        ), sh AS (
          SELECT doc_id,
                 list_distinct([array_to_string(t[i:i+4], ' ')
                                for i in range(1, greatest(len(t)-3, 1))]) AS g
          FROM toks
        ), ex AS (
          SELECT doc_id, unnest(g) AS s FROM sh
        ), dfreq AS (
          SELECT s, COUNT(*) AS df FROM ex GROUP BY s
        ), agg AS (
          SELECT ex.doc_id, COUNT(*) AS n_shingles,
                 SUM(CASE WHEN dfreq.df > 1 THEN 1 ELSE 0 END) AS n_dup
          FROM ex JOIN dfreq USING (s) GROUP BY ex.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(a.n_shingles, 0) AS BIGINT) AS n_shingles,
               CAST(COALESCE(a.n_dup, 0) AS BIGINT) AS n_dup,
               ROUND(CAST(COALESCE(a.n_dup, 0) AS BIGINT)
                     / greatest(CAST(COALESCE(a.n_shingles, 0) AS BIGINT), 1),
                     6) AS dup_frac_r6
        FROM documents d LEFT JOIN agg a USING (doc_id)
        ORDER BY doc_id
"""


# Mirrors operators/sampling.py split_and_shuffle: cumulative salted
# md5 bucket thresholds (98/1/1) + the independent full-48-bit
# shuffle key. Same hex->BIGINT trick as the mixture oracle.
_TRAIN_SPLIT_SQL = """
        WITH b AS (
          SELECT doc_id,
                 CAST(concat('0x', substr(md5(concat('split3-v1',
                      CAST(doc_id AS VARCHAR))), 1, 12)) AS BIGINT)
                   % 1000000 AS split_bucket,
                 CAST(concat('0x', substr(md5(concat('shuffle-v1',
                      CAST(doc_id AS VARCHAR))), 1, 12)) AS BIGINT)
                   AS shuffle_key
          FROM documents
        )
        SELECT doc_id, split_bucket,
               CASE WHEN split_bucket < 980000 THEN 'train'
                    WHEN split_bucket < 990000 THEN 'valid'
                    ELSE 'test' END AS split,
               shuffle_key
        FROM b ORDER BY doc_id
"""


# Mirrors operators/textstats.py quality_cut (q=0.1): the unigram-LM
# micro-nat scoring CTEs, then the exact type-1 P10 threshold (value
# at rank ceil(0.1*n) over the ROUNDED scores) and the keep filter.
_QUALITY_CUT_SQL = """
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents
        ), wf AS (
          SELECT doc_id, word FROM w WHERE word <> ''
        ), c AS (
          SELECT word, COUNT(*) AS n FROM wf GROUP BY word
        ), tot AS (
          SELECT CAST(SUM(n) AS DOUBLE) AS total FROM c
        ), lp AS (
          SELECT word,
                 CAST(floor(ln(CAST(n AS DOUBLE) / tot.total) * 1e6 + 0.5)
                      AS BIGINT) AS lp_micro
          FROM c, tot
        ), agg AS (
          SELECT wf.doc_id, COUNT(*) AS n_tokens, SUM(lp.lp_micro) AS s
          FROM wf JOIN lp USING (word) GROUP BY wf.doc_id
        ), scored AS (
          SELECT doc_id,
                 ROUND(CAST(s AS BIGINT) / (n_tokens * 1e6), 6)
                   AS avg_logprob_r6
          FROM agg WHERE n_tokens > 0
        ), ranked AS (
          SELECT doc_id, avg_logprob_r6,
                 ROW_NUMBER() OVER (ORDER BY avg_logprob_r6) AS rn,
                 COUNT(*) OVER () AS n
          FROM scored
        ), thr AS (
          SELECT avg_logprob_r6 AS threshold_r6 FROM ranked
          WHERE rn = CAST(ceil(0.1 * n) AS INT)
        )
        SELECT s.doc_id, s.avg_logprob_r6, t.threshold_r6
        FROM scored s, thr t
        WHERE s.avg_logprob_r6 >= t.threshold_r6
        ORDER BY s.doc_id
"""


# Mirrors operators/sketch.py cms_heavy_hitters: depth-4 x width-1024
# counter grid from md5('cms-v1{r}:{word}') buckets, min over rows,
# exact vocab counts riding along, rank ties (est desc, word asc).
_CMS_TOPK_SQL = """
        WITH w AS (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ), wf AS (
          SELECT word FROM w WHERE word <> ''
        ), wr AS (
          SELECT word, i AS r,
                 CAST(concat('0x', substr(md5(concat('cms-v1',
                      CAST(i AS VARCHAR), ':', word)), 1, 8)) AS BIGINT)
                   % 1024 AS b
          FROM wf, unnest(range(0, 4)) AS t(i)
        ), sk AS (
          SELECT r, b, COUNT(*) AS cnt FROM wr GROUP BY r, b
        ), vocab AS (
          SELECT word, COUNT(*) AS exact_n FROM wf GROUP BY word
        ), cand_b AS (
          SELECT v.word, v.exact_n, i AS r,
                 CAST(concat('0x', substr(md5(concat('cms-v1',
                      CAST(i AS VARCHAR), ':', v.word)), 1, 8)) AS BIGINT)
                   % 1024 AS b
          FROM vocab v, unnest(range(0, 4)) AS t(i)
        ), cand AS (
          SELECT c.word, c.exact_n, MIN(sk.cnt) AS cms_est
          FROM cand_b c JOIN sk USING (r, b)
          GROUP BY c.word, c.exact_n
        ), ranked AS (
          SELECT word, cms_est, exact_n,
                 ROW_NUMBER() OVER (ORDER BY cms_est DESC, word) AS rank
          FROM cand
        )
        SELECT CAST(rank AS INTEGER) AS rank, word,
               CAST(cms_est AS BIGINT) AS cms_est,
               CAST(exact_n AS BIGINT) AS exact_n
        FROM ranked WHERE rank <= 20 ORDER BY rank
"""


# Mirrors operators/sampling.py exact_k_per_stratum (k=25 per lang):
# full-48-bit salted priority, rank window, ties by doc_id.
_EXACT_K_SAMPLE_SQL = """
        WITH p AS (
          SELECT lang, doc_id,
                 CAST(concat('0x', substr(md5(concat('exactk-v1',
                      CAST(doc_id AS VARCHAR))), 1, 12)) AS BIGINT) AS pri
          FROM documents
        ), r AS (
          SELECT lang, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY pri, doc_id) AS sample_rank
          FROM p
        )
        SELECT lang, doc_id, CAST(sample_rank AS INTEGER) AS sample_rank
        FROM r WHERE sample_rank <= 25 ORDER BY lang, doc_id
"""


# Mirrors operators/packing.py pack_sequences (budget 4096, EOD
# '<|eod|>'): the _PACK_BINS_SQL running sum, then per-bin ordered
# concatenation hashed with md5 so the gate checks every byte.
_PACK_SEQUENCES_SQL = r"""
        WITH t AS (
          SELECT doc_id, text,
                 CAST(CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+'))
                      END AS BIGINT) AS n_tokens
          FROM documents
        ), c AS (
          SELECT doc_id, text, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (
                      ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS token_offset
          FROM t
        ), g AS (
          SELECT doc_id, text, n_tokens,
                 token_offset // 4096 AS bin_id
          FROM c
        )
        SELECT bin_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
               md5(string_agg(text, '<|eod|>' ORDER BY doc_id)) AS seq_md5
        FROM g GROUP BY bin_id ORDER BY bin_id
"""


def _jl_projection_oracle(out_dim: int = 16, in_dim: int = 64) -> str:
    """Rebuilds the md5-parity sign matrix (projection.sign_matrix)
    and replays every coordinate with the proven sequential fold —
    outputs are BIT-IDENTICAL doubles, no rounding."""
    from tegola_spark.operators.projection import sign_matrix

    mat = sign_matrix(out_dim, in_dim)
    cols = ",\n               ".join(
        "list_aggregate(list_transform(list_zip(ed, ["
        + ",".join(f"{s:.1f}" for s in row)
        + f"]::DOUBLE[]), x -> x[1] * x[2]), 'sum') AS p{j}"
        for j, row in enumerate(mat))
    return f"""
        WITH e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
          FROM embeddings
        )
        SELECT vec_id,
               {cols}
        FROM e ORDER BY vec_id
    """


def _semantic_dedup_oracle(threshold: float, n_centroids: int) -> str:
    """Replays similarity.semantic_dedup over embeddings + perturbed
    twins (q_semantic_dedup's corpus): fixed lowest-id quantizer cell
    assignment, in-cell pairwise sequential-fold cosines, keep = no
    lower-id member at/above threshold."""
    def dotseq(a, b):
        return (f"list_aggregate(list_transform(list_zip({a}, {b}), "
                "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')")

    return f"""
        WITH allv AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
          FROM embeddings
          UNION ALL
          SELECT vec_id + 10000000 AS vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.01)
                   AS embedding
          FROM embeddings
        ), cents0 AS (
          SELECT vec_id, embedding FROM allv
          ORDER BY vec_id LIMIT {n_centroids}
        ), cents AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx,
                 embedding AS cemb,
                 {dotseq('embedding', 'embedding')} AS dcc
          FROM cents0
        ), base AS (
          SELECT vec_id AS nid, embedding AS nemb,
                 {_l2_sql('embedding')} AS nnorm
          FROM allv
        ), assign AS (
          SELECT nid, nemb, nnorm, cidx,
                 row_number() OVER (PARTITION BY nid
                     ORDER BY dcc - 2.0 * {dotseq('nemb', 'cemb')}, cidx)
                     AS crk
          FROM base, cents
        ), inv AS (
          SELECT nid, nemb, nnorm, cidx AS ncid FROM assign WHERE crk = 1
        ), pairs AS (
          SELECT b.nid AS bid, a.nid AS aid,
                 {dotseq('a.nemb', 'b.nemb')} / (a.nnorm * b.nnorm) AS sim
          FROM inv a JOIN inv b
            ON a.ncid = b.ncid AND a.nid < b.nid
        ), agg AS (
          SELECT bid, max(sim) AS max_sim,
                 min(CASE WHEN sim >= {threshold!r} THEN aid END) AS dup_of
          FROM pairs GROUP BY bid
        )
        SELECT i.nid AS vec_id, CAST(i.ncid AS INTEGER) AS cell,
               agg.dup_of IS NULL AS keep, agg.dup_of,
               ROUND(agg.max_sim, 6) AS max_sim_r6
        FROM inv i LEFT JOIN agg ON i.nid = agg.bid
        ORDER BY vec_id
    """


# ---------------------------------------------------------------------------
# LSH / simhash oracle builders (round-4): DuckDB recomputes the FULL
# approximate pipelines — same plane constants, same sequential-fold
# dot products, same probe masks, same re-rank — so the ANN entries are
# hash-checked end-to-end instead of rows-only.
# ---------------------------------------------------------------------------

def _l2_sql(e: str) -> str:
    return (f"sqrt(list_aggregate(list_transform({e}, "
            "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))")


def _lsh_sig_sql(emb_expr: str, n_planes: int, dim: int = 64) -> str:
    """Signature expression with the plane constants inlined (the same
    _planes(seed) array the Spark side uses; testdata embeddings are
    dim=64 at every sf)."""
    from tegola_spark.operators.similarity import _planes

    planes = _planes(dim, n_planes)
    terms = []
    for i in range(n_planes):
        lit = "[" + ", ".join(repr(float(v)) for v in planes[i]) + "]::DOUBLE[]"
        dot = (f"list_aggregate(list_transform(list_zip({emb_expr}, {lit}), "
               "x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')")
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _lsh_masks(n_planes: int, multiprobe: int) -> str:
    masks = [0]
    if multiprobe >= 1:
        masks += [1 << i for i in range(n_planes)]
    if multiprobe >= 2:
        masks += [(1 << i) | (1 << j)
                  for i in range(n_planes) for j in range(i + 1, n_planes)]
    return ", ".join(map(str, masks))


def _lsh_ann_oracle(k: int, n_planes: int, multiprobe: int,
                    query_sql: str) -> str:
    return f"""
        WITH base AS (
          SELECT vec_id, embedding, {_l2_sql('embedding')} AS nnorm,
                 {_lsh_sig_sql('embedding', n_planes)} AS nsig
          FROM embeddings
        ), q AS ({query_sql}),
        qs AS (
          SELECT query_id, qemb, {_l2_sql('qemb')} AS qnorm,
                 {_lsh_sig_sql('qemb', n_planes)} AS qsig
          FROM q
        ), probes AS (
          SELECT query_id, qemb, qnorm, xor(qsig, m) AS psig
          FROM qs, (SELECT unnest([{_lsh_masks(n_planes, multiprobe)}]) AS m)
        ), cand AS (
          SELECT p.query_id, b.vec_id AS neighbor_id,
                 list_aggregate(list_transform(list_zip(p.qemb, b.embedding),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
                 / (p.qnorm * b.nnorm) AS score
          FROM probes p JOIN base b
            ON b.nsig = p.psig AND b.vec_id <> p.query_id
        ), ranked AS (
          SELECT query_id, neighbor_id, score,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, neighbor_id) AS rank
          FROM cand
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
               ROUND(score, 6) AS score_r6
        FROM ranked WHERE rank <= {k}
    """


_TRIGRAM_JACCARD_SQL = r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
          FROM documents
        ), tris AS (
          SELECT doc_id,
                 list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                for i in range(1, greatest(len(t)-1, 1))]) AS g
          FROM toks
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(len(list_intersect(a.g, b.g))::DOUBLE /
                     greatest(len(list_distinct(a.g || b.g)), 1),
                     6) AS jaccard_r6
        FROM tris a JOIN tris b ON a.doc_id < b.doc_id
        WHERE ROUND(len(list_intersect(a.g, b.g))::DOUBLE /
                    greatest(len(list_distinct(a.g || b.g)), 1), 6) >= 0.6
"""

# Mirrors operators/quantize.py exactly: max+divide scale,
# floor(x+0.5) codes, explicit int->double promotion, the proven
# list_aggregate('sum') sequential fold for ADC scores.
_SQ8_BASE_CTE = r"""
        e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings
        ), s AS (
          SELECT vec_id, e,
                 list_aggregate(list_transform(e, x -> abs(x)), 'max')
                   / 127.0 AS scale
          FROM e
        ), qz AS (
          SELECT vec_id, scale,
                 CASE WHEN scale > 0 THEN
                   list_transform(e, x -> CAST(floor(x / scale + 0.5)
                                               AS INTEGER))
                 ELSE list_transform(e, x -> 0) END AS q8
          FROM s
        )
"""

_SQ8_QUANTIZE_SQL = rf"""
        WITH {_SQ8_BASE_CTE}
        SELECT vec_id, scale,
               md5(array_to_string(q8, ',')) AS q8_md5,
               CAST(list_aggregate(q8, 'sum') AS BIGINT) AS q8_sum
        FROM qz
        ORDER BY vec_id
"""


def _sq8_topk_oracle(k: int = 5) -> str:
    ids = ",".join(map(str, SIM_QUERY_IDS))
    dot = ("list_aggregate(list_transform(list_zip({a}, {b}), "
           "x -> x[1] * x[2]), 'sum')")
    return rf"""
        WITH {_SQ8_BASE_CTE}, dq AS (
          SELECT vec_id,
                 list_transform(q8, qi -> CAST(qi AS DOUBLE) * scale) AS dq
          FROM qz
        ), qry AS (
          SELECT vec_id AS query_id, e AS qemb,
                 sqrt({dot.format(a='e', b='e')}) AS qnorm
          FROM e WHERE vec_id IN ({ids})
        ), scored AS (
          SELECT qry.query_id, d.vec_id AS neighbor_id,
                 {dot.format(a='d.dq', b='qry.qemb')}
                   / (qry.qnorm * sqrt({dot.format(a='d.dq', b='d.dq')}))
                   AS score
          FROM dq d, qry WHERE d.vec_id <> qry.query_id
        ), ranked AS (
          SELECT query_id, neighbor_id, score,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
               ROUND(score, 6) AS score_r6
        FROM ranked WHERE rank <= {k}
    """


# The sequential definition of operators/packing.py's distributed
# prefix-sum: one flat running sum in doc_id order (token-count expr
# identical to the token_stats oracle).
_PACK_BINS_SQL = r"""
        WITH t AS (
          SELECT doc_id,
                 CAST(CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+'))
                      END AS BIGINT) AS n_tokens
          FROM documents
        ), c AS (
          SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (
                      ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS token_offset
          FROM t
        )
        SELECT doc_id, n_tokens, token_offset,
               token_offset // 4096 AS bin_id,
               token_offset % 4096 AS bin_offset
        FROM c
        ORDER BY doc_id
"""

# Mirrors operators/urls.py step for step in RE2 dialect ('g' flag =
# Spark's replace-all; \1 backrefs = Java's $1). The messy CTE is the
# _messy_urls derivation verbatim.
_MESSY_URLS_CTE = r"""
        messy AS (
          SELECT doc_id, text, lang,
                 (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://'
                       ELSE 'https://' END)
                 || source || '.example.com/' || lang || '/'
                 || CAST(doc_id AS VARCHAR)
                 || (CASE doc_id % 5
                     WHEN 0 THEN '?utm_source=feed&utm_campaign=x#top'
                     WHEN 1 THEN '?id=' || CAST(doc_id % 7 AS VARCHAR)
                                 || '&utm_medium=email'
                     WHEN 2 THEN '#section-2'
                     WHEN 3 THEN '/'
                     ELSE '' END) AS url
          FROM documents
        ), c1 AS (
          SELECT doc_id, text, lang,
                 regexp_replace(regexp_replace(regexp_replace(
                 regexp_replace(regexp_replace(regexp_replace(url,
                   '#.*$', '', 'g'),
                   '(utm_[A-Za-z0-9_]+|fbclid|gclid|ref)=[^&]*&', '', 'g'),
                   '[?&](utm_[A-Za-z0-9_]+|fbclid|gclid|ref)=[^&]*$', '', 'g'),
                   '\?&', '?', 'g'),
                   '^([A-Za-z]+://[^/:]*):(?:80|443)(/|$)', '\1\2', 'g'),
                   '([^/])/$', '\1', 'g') AS c
          FROM messy
        ), canon AS (
          SELECT doc_id, text, lang,
                 lower(regexp_extract(c, '^[A-Za-z]+://[^/]*'))
                   || substr(c, length(regexp_extract(
                        c, '^[A-Za-z]+://[^/]*')) + 1) AS url_canon
          FROM c1
        ), hosted AS (
          SELECT doc_id, text, lang, url_canon,
                 lower(regexp_extract(url_canon,
                       '^[A-Za-z]+://(?:[^/@]*@)?([^/:]*)', 1)) AS host
          FROM canon
        )
"""

_URL_CANONICAL_SQL = rf"""
        WITH {_MESSY_URLS_CTE}
        SELECT doc_id, url_canon, host FROM hosted ORDER BY doc_id
"""

_DOMAIN_STATS_SQL = rf"""
        WITH {_MESSY_URLS_CTE}
        SELECT host,
               CAST(COUNT(*) AS BIGINT) AS n_pages,
               CAST(COUNT(DISTINCT url_canon) AS BIGINT) AS n_urls,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars
        FROM hosted
        GROUP BY host
        ORDER BY host
"""

# Mirrors operators/dedup.py span_dedup: 8-word non-overlapping chunks
# over footer-prepended text; DuckDB zips parallel unnests to recover
# (pos, span) since WITH ORDINALITY is unavailable. string_split keeps
# empty tokens exactly like Spark's F.split, and list_slice past the
# list end truncates exactly like F.slice.
_SPAN_CTE = """
        WITH d AS (
          SELECT doc_id,
                 'subscribe to our newsletter for daily updates today '
                   || text AS text
          FROM documents
        ), wl AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM d
        ), sl AS (
          SELECT doc_id,
                 list_transform(
                   range(CAST(ceil(len(ws)/8.0) AS BIGINT)),
                   i -> array_to_string(
                          list_slice(ws, CAST(i*8+1 AS BIGINT),
                                     CAST(i*8+8 AS BIGINT)), ' ')) AS spans
          FROM wl
        ), ex AS (
          SELECT doc_id,
                 CAST(unnest(range(len(spans))) AS INT) AS pos,
                 unnest(spans) AS span
          FROM sl
        )
"""

_SPAN_DEDUP_SQL = f"""
        {_SPAN_CTE},
        marked AS (
          SELECT doc_id, pos, span,
                 (ROW_NUMBER() OVER (PARTITION BY md5(span)
                                     ORDER BY doc_id, pos) = 1) AS keep
          FROM ex
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               COALESCE(string_agg(CASE WHEN keep THEN span END,
                                   ' ' ORDER BY pos), '') AS text_dedup
        FROM marked GROUP BY doc_id ORDER BY doc_id
"""

_BOILERPLATE_SPANS_SQL = f"""
        {_SPAN_CTE},
        dfreq AS (
          SELECT md5(span) AS h, COUNT(DISTINCT doc_id) AS df
          FROM ex GROUP BY 1
        ),
        marked AS (
          SELECT e.doc_id, e.pos, e.span, (f.df < 250) AS keep
          FROM ex e JOIN dfreq f ON md5(e.span) = f.h
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               COALESCE(string_agg(CASE WHEN keep THEN span END,
                                   ' ' ORDER BY pos), '') AS text_dedup
        FROM marked GROUP BY doc_id ORDER BY doc_id
"""

# Mirrors operators/temporal.py asof_join tie semantics: inclusive
# (r.ts <= l.ts), greatest (ts, event_id) wins. The tolerance variant's
# window predicate lives in the ON clause so unmatched left rows keep
# LEFT-join nulls; since all prior clicks are older than the latest
# one, in-ON filtering equals the engine's match-then-null-out.
_ASOF_SQL_TMPL = """
        WITH l AS (SELECT event_id, user_id, ts, value FROM events
                   WHERE event_type = 'purchase'),
             r AS (SELECT event_id, user_id, ts, value FROM events
                   WHERE event_type = 'click')
        SELECT l.event_id, l.user_id, l.ts, l.value,
               r.ts AS r_ts, r.event_id AS r_event_id, r.value AS r_value
        FROM l LEFT JOIN r
          ON l.user_id = r.user_id AND r.ts <= l.ts{tol_pred}
        QUALIFY ROW_NUMBER() OVER (PARTITION BY l.event_id
                                   ORDER BY r.ts DESC, r.event_id DESC) = 1
        ORDER BY l.event_id
"""

_ASOF_SQL = _ASOF_SQL_TMPL.format(tol_pred="")
_ASOF_TOL_SQL = _ASOF_SQL_TMPL.format(
    tol_pred=" AND r.ts >= l.ts - INTERVAL 86400 SECOND")

_INTERVAL_JOIN_SQL = """
        WITH p AS (SELECT event_id AS click_id, ts, value AS click_value
                   FROM events WHERE event_type = 'click'),
             iv AS (SELECT event_id AS incident_id, ts AS t_start,
                           ts + INTERVAL 6 HOUR AS t_end
                    FROM events WHERE event_type = 'error' AND value > 95)
        SELECT p.click_id, p.ts, p.click_value, iv.incident_id, iv.t_start
        FROM p JOIN iv ON p.ts >= iv.t_start AND p.ts < iv.t_end
        ORDER BY p.click_id, iv.incident_id
"""

# Every level computed DIRECTLY from raw events — the engine's cascade
# (minute partials -> hour -> day) must reproduce these exactly.
_TIME_ROLLUP_SQL = """
        SELECT * FROM (
          SELECT 60 AS level_s,
                 CAST(FLOOR(epoch(ts) / 60) AS BIGINT) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 ROUND(SUM(value), 6) AS sum_value,
                 MIN(value) AS min_value, MAX(value) AS max_value
          FROM events GROUP BY 2
          UNION ALL
          SELECT 3600, CAST(FLOOR(epoch(ts) / 3600) AS BIGINT),
                 CAST(COUNT(*) AS BIGINT), ROUND(SUM(value), 6),
                 MIN(value), MAX(value)
          FROM events GROUP BY 2
          UNION ALL
          SELECT 86400, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT),
                 CAST(COUNT(*) AS BIGINT), ROUND(SUM(value), 6),
                 MIN(value), MAX(value)
          FROM events GROUP BY 2
        ) ORDER BY level_s, bucket
"""

# Mirrors operators/sketch.py hll_distinct: md5 bucket byte, integer
# leading-zero rho via bin() length (never floor(log2)), exact BIGINT
# harmonic sums with empty registers contributing 2^53 each, identical
# literal arithmetic for alpha/raw estimate, linear-counting fallback.
def _hll_oracle_one(value_expr: str, metric: str) -> str:
    return f"""
          SELECT event_type, n_registers,
                 ROUND(CASE WHEN raw_e <= 640.0 AND n_registers < 256
                            THEN 256.0 * ln(256.0 /
                                   CAST(256 - n_registers AS DOUBLE))
                            ELSE raw_e END, 6) AS hll_est,
                 '{metric}' AS metric
          FROM (
            SELECT event_type, n_registers,
                   (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
                     * 9007199254740992.0
                     / CAST(sum_inv + (256 - n_registers)
                            * (1::BIGINT << 53) AS DOUBLE) AS raw_e
            FROM (
              SELECT event_type,
                     CAST(COUNT(*) AS BIGINT) AS n_registers,
                     SUM(1::BIGINT << (53 - r)) AS sum_inv
              FROM (
                SELECT event_type, bucket, MAX(rho) AS r
                FROM (
                  SELECT event_type,
                         CAST(CONCAT('0x', substr(hh, 1, 2)) AS INTEGER)
                           AS bucket,
                         CASE WHEN CAST(CONCAT('0x', substr(hh, 3, 13))
                                        AS BIGINT) = 0 THEN 53
                              ELSE 53 - length(bin(CAST(CONCAT('0x',
                                     substr(hh, 3, 13)) AS BIGINT)))
                         END AS rho
                  FROM (SELECT event_type,
                               md5(CAST({value_expr} AS VARCHAR)) AS hh
                        FROM events)
                ) GROUP BY 1, 2
              ) GROUP BY 1
            )
          )
"""


_HLL_DISTINCT_SQL = (
    "SELECT * FROM (" + _hll_oracle_one("user_id", "users")
    + " UNION ALL " + _hll_oracle_one("event_id", "events")
    + ") ORDER BY metric, event_type")

_VALUE_QUANTILES_SQL = """
        WITH ranked AS (
          SELECT event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM events
        ), qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
        SELECT r.event_type, q.q, CAST(r.n AS BIGINT) AS n, r.value
        FROM ranked r JOIN qs q ON r.rn = CAST(ceil(q.q * r.n) AS INT)
        ORDER BY r.event_type, q.q
"""

_DOMAIN_LANG_CUBE_SQL = """
        SELECT source, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(GROUPING(source, lang) AS BIGINT) AS gid
        FROM documents GROUP BY CUBE (source, lang)
        ORDER BY gid, source, lang
"""

_VOCAB_TOPK_SQL = """
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents)
        WHERE word <> ''
        GROUP BY word ORDER BY n DESC, word LIMIT 100
"""

# Mirrors operators/decontam.py: identical probe derivation, 1-based
# first-hit positions (DuckDB strpos == Spark locate semantics).
_CONTAMINATION_SQL = r"""
        WITH probes AS (
          SELECT doc_id AS probe_id, substr(text, 10, 12) AS probe
          FROM documents WHERE doc_id IN (3, 57, 123)
        )
        SELECT d.doc_id,
               p.probe_id,
               CAST(strpos(d.text, p.probe) AS BIGINT) AS first_pos
        FROM documents d, probes p
        WHERE strpos(d.text, p.probe) > 0
        ORDER BY d.doc_id, p.probe_id
"""

# Mirrors operators/quality_rep.py: duplicate-trigram fraction from
# the non-distinct trigram list, top-bigram dominance via the same
# group-count-max plan, Gopher keep cuts (0.30 / 0.18).
_REPETITION_FILTER_SQL = r"""
        WITH aug AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 11 = 0
                      THEN text || repeat(' click here buy now', 40)
                      ELSE text END AS text
          FROM documents
        ), toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM aug
        ), tg AS (
          SELECT doc_id,
                 CASE WHEN len(w) >= 3 THEN
                   [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                    for i in range(1, len(w) - 1)]
                 ELSE [] END AS tri,
                 CASE WHEN len(w) >= 2 THEN
                   [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
                 ELSE [] END AS bi
          FROM toks
        ), base AS (
          SELECT doc_id,
                 CAST(len(tri) AS BIGINT) AS n_trigrams,
                 ROUND(CASE WHEN len(tri) > 0 THEN
                     1.0 - len(list_distinct(tri))::DOUBLE / len(tri)
                   ELSE 0.0 END, 6) AS dup_trigram_frac,
                 bi
          FROM tg
        ), counts AS (
          SELECT doc_id, unnest(bi) AS bg FROM base
        ), cg AS (
          SELECT doc_id, bg, COUNT(*) AS c FROM counts GROUP BY doc_id, bg
        ), top AS (
          SELECT doc_id, MAX(c) AS top_bigram_count FROM cg GROUP BY doc_id
        ), merged AS (
          SELECT b.doc_id, b.n_trigrams, b.dup_trigram_frac,
                 CAST(COALESCE(t.top_bigram_count, 0) AS BIGINT)
                   AS top_bigram_count,
                 ROUND(COALESCE(t.top_bigram_count, 0)::DOUBLE
                       / (b.n_trigrams + 1), 6) AS top_bigram_frac
          FROM base b LEFT JOIN top t USING (doc_id)
        )
        SELECT doc_id, n_trigrams, dup_trigram_frac, top_bigram_count,
               top_bigram_frac,
               (dup_trigram_frac <= 0.30 AND top_bigram_frac <= 0.18)
                 AS keep
        FROM merged
        ORDER BY doc_id
"""

# Same regex sources as operators/pii.py (portable Java/RE2/Python
# subset: no lookarounds/backrefs); DuckDB regexp_replace needs the
# 'g' flag to match Spark's replace-all semantics.
_PII_SCRUB_SQL = r"""
        WITH aug AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com'
                      || CASE WHEN doc_id % 3 = 0
                              THEN ' or admin@test.org' ELSE '' END
                      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.7 call +1 (555) 010-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 AS text
          FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                    AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text,
                    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
                    AS BIGINT) AS n_ipv4,
               md5(regexp_replace(regexp_replace(regexp_replace(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                    '<EMAIL>', 'g'),
                    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                    '<IP>', 'g'),
                    '\+?[0-9][0-9() -]{6,}[0-9]',
                    '<PHONE>', 'g')) AS redacted_md5
        FROM aug
        ORDER BY doc_id
"""

# Same 48-bit salted md5 buckets and integer thresholds as
# sampling.stratified_sample / assign_split (rates x RESOLUTION
# rounded driver-side, so both engines compare exact ints).
_STRATIFIED_SAMPLE_SQL = r"""
        WITH b AS (
          SELECT doc_id, lang,
                 CAST(concat('0x', substr(md5(concat('mix-v1',
                      CAST(doc_id AS VARCHAR))), 1, 12)) AS BIGINT)
                   % 1000000 AS sample_bucket,
                 CAST(concat('0x', substr(md5(concat('split-v1',
                      CAST(doc_id AS VARCHAR))), 1, 12)) AS BIGINT)
                   % 1000000 AS sb2
          FROM documents
        )
        SELECT doc_id, lang, sample_bucket,
               CASE WHEN sb2 < 100000 THEN 'holdout' ELSE 'train' END AS split
        FROM b
        WHERE sample_bucket < CASE lang
            WHEN 'de' THEN 500000 WHEN 'en' THEN 900000
            WHEN 'es' THEN 100000 WHEN 'fr' THEN 250000
            ELSE 50000 END
        ORDER BY doc_id
"""

# Transitive closure over the SAME edge set as minhash_pairs (the
# trigram SQL recomputes edges from ALL pairs, so LSH recall is still
# part of what is checked); MIN(reachable id) is the deterministic
# component representative, matching clusters.connected_components.
_DEDUP_CLUSTERS_SQL = rf"""
        WITH RECURSIVE pairs AS (
          {_TRIGRAM_JACCARD_SQL}
        ), edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL
          SELECT id_b AS src, id_a AS dst FROM pairs
        ), reach AS (
          SELECT doc_id AS id, doc_id AS root FROM documents
          UNION
          SELECT e.dst AS id, rc.root AS root
          FROM reach rc JOIN edges e ON e.src = rc.id
        ), cc AS (
          SELECT id, MIN(root) AS rep FROM reach GROUP BY id
        )
        SELECT id AS doc_id,
               CAST(rep AS BIGINT) AS cluster_rep,
               CAST(COUNT(*) OVER (PARTITION BY rep) AS BIGINT) AS cluster_size
        FROM cc
        ORDER BY doc_id
"""


def _simhash_portable_oracle(bits: int = 60) -> str:
    h = f"CAST(concat('0x', substr(md5(tok), 2, {bits // 4})) AS BIGINT)"
    sums = ", ".join(
        f"SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits))
    fp = " + ".join(f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)"
                    for b in range(bits))
    return rf"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
          FROM documents
        ), h AS (
          SELECT doc_id, {h} AS h FROM toks WHERE tok <> ''
        ), agg AS (
          SELECT doc_id, {sums} FROM h GROUP BY doc_id
        )
        SELECT d.doc_id AS id,
               CAST(COALESCE(f.fp, 0) AS BIGINT) AS simhash
        FROM documents d
        LEFT JOIN (SELECT doc_id, {fp} AS fp FROM agg) f
          ON d.doc_id = f.doc_id
    """


def _knn_oracle() -> str:
    qvals = ", ".join(f"({qid}, {qx}, {qy})" for qid, qx, qy in KNN_QUERIES)
    return f"""
        WITH q(query_id, qlon, qlat) AS (VALUES {qvals}),
        scored AS (
          SELECT q.query_id, p.doc_id,
                 (p.lon - q.qlon) * (p.lon - q.qlon)
                 + (p.lat - q.qlat) * (p.lat - q.qlat) AS dist_sq
          FROM ({GEO_POINTS_SQL}) p, q
        ), ranked AS (
          SELECT query_id, doc_id, dist_sq,
                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist_sq, doc_id) AS rank
          FROM scored
        )
        SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INTEGER) AS rank,
               doc_id, dist_sq
        FROM ranked WHERE rank <= 5
    """


# ---------------------------------------------------------------------------
# round-5 graph / crawl-collapse / edit-verify oracles
# ---------------------------------------------------------------------------

def _pagerank_oracle(iters: int = 5) -> str:
    """Unrolled integer PageRank replay (operators/graph.py): one
    contrib/dangling/pr CTE triple per sweep, all arithmetic int64
    micro-units with floored division so both engines agree exactly."""
    sql = ["""
        WITH docs AS (
          SELECT doc_id, source || '.example.com' AS domain FROM documents
        ), nd AS (SELECT COUNT(*) AS c FROM documents),
        links AS (
          SELECT domain AS src,
                 CAST(concat('0x', substr(md5('links-v1' ||
                      CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)
                   % (SELECT c FROM nd) AS tgt_id
          FROM docs
        ), raw AS (
          SELECT l.src, t.domain AS dst
          FROM links l JOIN docs t ON t.doc_id = l.tgt_id
        ), edges AS (
          SELECT src, dst, COUNT(*) AS w FROM raw
          WHERE src <> dst GROUP BY 1, 2
        ), nodes AS (SELECT DISTINCT domain FROM docs),
        nn AS (SELECT COUNT(*) AS c FROM nodes),
        outdeg AS (SELECT src AS domain, SUM(w) AS od FROM edges GROUP BY 1),
        pr0 AS (SELECT domain, CAST(1000000 AS BIGINT) AS pr FROM nodes)"""]
    for k in range(1, iters + 1):
        sql.append(f""",
        contrib{k} AS (
          SELECT e.dst AS domain, SUM(e.w * (p.pr // o.od)) AS inflow
          FROM edges e
          JOIN pr{k - 1} p ON p.domain = e.src
          JOIN outdeg o ON o.domain = e.src
          GROUP BY 1
        ), dang{k} AS (
          SELECT COALESCE(SUM(p.pr), 0) AS dm
          FROM pr{k - 1} p LEFT JOIN outdeg o ON o.domain = p.domain
          WHERE o.od IS NULL
        ), pr{k} AS (
          SELECT n.domain,
                 CAST(150000 + (85 * (COALESCE(c.inflow, 0)
                      + (SELECT dm FROM dang{k}) // (SELECT c FROM nn)))
                      // 100 AS BIGINT) AS pr
          FROM nodes n LEFT JOIN contrib{k} c ON c.domain = n.domain
        )""")
    sql.append(f"""
        SELECT p.domain, p.pr AS pr_micro,
               CAST(COALESCE(o.od, 0) AS BIGINT) AS out_weight
        FROM pr{iters} p LEFT JOIN outdeg o ON o.domain = p.domain
        ORDER BY p.domain""")
    return "".join(sql)


_LATEST_SNAPSHOT_SQL = """
        WITH snaps AS (
          SELECT 'https://recrawl.example.com/p' ||
                   CAST(doc_id % 128 AS VARCHAR) AS url,
                 doc_id,
                 CAST(1735689600 + doc_id % 31536000 AS BIGINT) AS ts_epoch
          FROM documents
        ), ranked AS (
          SELECT url, doc_id, ts_epoch,
                 ROW_NUMBER() OVER (PARTITION BY url
                     ORDER BY ts_epoch DESC, doc_id DESC) AS rn,
                 COUNT(*) OVER (PARTITION BY url) AS n_snapshots
          FROM snaps
        )
        SELECT url, doc_id, ts_epoch, CAST(n_snapshots AS BIGINT) AS n_snapshots
        FROM ranked WHERE rn = 1 ORDER BY url
"""

_EDIT_DISTANCE_VERIFY_SQL = f"""
        WITH pairs AS (
          {_TRIGRAM_JACCARD_SQL}
        )
        SELECT p.id_a, p.id_b,
               CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
               CAST(greatest(length(a.text), length(b.text)) AS BIGINT)
                 AS max_len,
               5 * levenshtein(a.text, b.text)
                 <= 2 * greatest(length(a.text), length(b.text)) AS is_editdup
        FROM pairs p
        JOIN documents a ON a.doc_id = p.id_a
        JOIN documents b ON b.doc_id = p.id_b
        ORDER BY p.id_a, p.id_b
"""


_ROLLING_WINDOW_SQL = """
        WITH e AS (
          SELECT event_id, user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) AS ep,
                 CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm
          FROM events
        )
        SELECT event_id, user_id, ep,
               CAST(COUNT(*) OVER w AS BIGINT) AS roll_n,
               CAST(SUM(vm) OVER w AS BIGINT) AS roll_sum_micro
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ep
                     RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
"""

_INVERTED_INDEX_SQL = r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS term
          FROM documents
        ), tf AS (
          SELECT term, doc_id, COUNT(*) AS tf
          FROM toks WHERE term <> '' GROUP BY 1, 2
        )
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(tf) AS BIGINT) AS tf_total,
               string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id)
                 AS postings
        FROM tf GROUP BY term HAVING COUNT(*) >= 2
        ORDER BY term
"""


# Mirrors operators/textstats.py bigram_lm_score: train-half counts,
# MLE bigram vs Stupid-Backoff (ln 0.4 inlined as the exact double
# literal), add-1 smoothed unigram, per-token micro-nat floors.
_BIGRAM_LM_SQL = """
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS t
          FROM documents
        ), train AS (
          SELECT * FROM d WHERE doc_id % 2 = 0
        ), c1 AS (
          SELECT w, COUNT(*) AS n1
          FROM (SELECT unnest(t) AS w FROM train) GROUP BY w
        ), tv AS (
          SELECT CAST(SUM(n1) + COUNT(*) + 1 AS DOUBLE) AS denom FROM c1
        ), c2 AS (
          SELECT w1, w2, COUNT(*) AS n2 FROM (
            SELECT t[i] AS w1, t[i + 1] AS w2
            FROM train, unnest(range(1, greatest(len(t), 1))) AS u(i)
          ) GROUP BY w1, w2
        ), firsts AS (
          SELECT d.doc_id,
                 CAST(floor(ln(CAST(COALESCE(c.n1, 0) + 1 AS DOUBLE)
                               / tv.denom) * 1e6 + 0.5) AS BIGINT) AS lp
          FROM d LEFT JOIN c1 c ON c.w = d.t[1], tv
          WHERE len(d.t) > 0
        ), ab AS (
          SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
          FROM d, unnest(range(1, greatest(len(t), 1))) AS u(i)
        ), sb AS (
          SELECT ab.doc_id,
                 CAST(floor(
                   CASE WHEN c2.n2 IS NOT NULL
                        THEN ln(CAST(c2.n2 AS DOUBLE)
                                / CAST(ctx.n1 AS DOUBLE))
                        ELSE -0.916290731874155
                             + ln(CAST(COALESCE(u2.n1, 0) + 1 AS DOUBLE)
                                  / tv.denom)
                   END * 1e6 + 0.5) AS BIGINT) AS lp
          FROM ab
          LEFT JOIN c2 ON c2.w1 = ab.w1 AND c2.w2 = ab.w2
          LEFT JOIN c1 ctx ON ctx.w = ab.w1
          LEFT JOIN c1 u2 ON u2.w = ab.w2, tv
        ), agg AS (
          SELECT doc_id, COUNT(*) AS n_tokens, SUM(lp) AS s
          FROM (SELECT * FROM firsts UNION ALL SELECT * FROM sb)
          GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(a.s, 0) AS BIGINT) AS lp_micro_sum,
               CASE WHEN COALESCE(a.n_tokens, 0) > 0
                    THEN ROUND(CAST(a.s AS BIGINT)
                               / (a.n_tokens * 1e6), 6)
                    ELSE 0.0 END AS avg_logprob_r6
        FROM d LEFT JOIN agg a ON a.doc_id = d.doc_id
        ORDER BY d.doc_id
"""

# Mirrors operators/sampling.py dsir_select (k=100, 8192 buckets,
# salt 'dsir-v1', target lang='en'); bucket = (md5_48 % 1e6) % 8192
# because the hash recipe reuses sample_bucket_col's RESOLUTION mod.
_DSIR_SELECT_SQL = """
        WITH toks AS (
          SELECT doc_id,
                 (CAST(concat('0x', substr(md5('dsir-v1' || w), 1, 12))
                       AS BIGINT) % 1000000) % 8192 AS b,
                 lang = 'en' AS is_tgt
          FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
                FROM documents)
          WHERE w <> ''
        ), cr AS (
          SELECT b, COUNT(*) AS nr FROM toks GROUP BY b
        ), ct AS (
          SELECT b, COUNT(*) AS nt FROM toks WHERE is_tgt GROUP BY b
        ), tb AS (
          SELECT cr.b, cr.nr, COALESCE(ct.nt, 0) AS nt
          FROM cr LEFT JOIN ct ON ct.b = cr.b
        ), tot AS (
          SELECT SUM(nr) AS nr_tot, SUM(nt) AS nt_tot FROM tb
        ), lw AS (
          SELECT b,
                 CAST(floor((ln(CAST(nt + 1 AS DOUBLE)
                                / CAST(nt_tot + 8192 AS DOUBLE))
                           - ln(CAST(nr + 1 AS DOUBLE)
                                / CAST(nr_tot + 8192 AS DOUBLE)))
                           * 1e6 + 0.5) AS BIGINT) AS lw_micro
          FROM tb, tot
        ), per_doc AS (
          SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(l.lw_micro) AS s
          FROM toks t JOIN lw l ON l.b = t.b GROUP BY t.doc_id
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(s AS BIGINT) AS lw_micro_sum
        FROM per_doc ORDER BY s DESC, doc_id LIMIT 100
"""


def _trustrank_oracle(iters: int = 5) -> str:
    """Seeded (personalized) variant of _pagerank_oracle mirroring
    operators/graph.py pagerank(seeds=...): teleport + dangling mass
    land only on the majority-English seed domains."""
    per_seed = ("(15 * (SELECT c FROM nn) * 1000000 // 100)"
                " // (SELECT c FROM ns)")
    sql = ["""
        WITH docs AS (
          SELECT doc_id, source || '.example.com' AS domain FROM documents
        ), nd AS (SELECT COUNT(*) AS c FROM documents),
        links AS (
          SELECT domain AS src,
                 CAST(concat('0x', substr(md5('links-v1' ||
                      CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)
                   % (SELECT c FROM nd) AS tgt_id
          FROM docs
        ), raw AS (
          SELECT l.src, t.domain AS dst
          FROM links l JOIN docs t ON t.doc_id = l.tgt_id
        ), edges AS (
          SELECT src, dst, COUNT(*) AS w FROM raw
          WHERE src <> dst GROUP BY 1, 2
        ), nodes AS (SELECT DISTINCT domain FROM docs),
        nn AS (SELECT COUNT(*) AS c FROM nodes),
        outdeg AS (SELECT src AS domain, SUM(w) AS od FROM edges GROUP BY 1),
        seeds AS (
          SELECT source || '.example.com' AS domain FROM (
            SELECT source,
                   ROW_NUMBER() OVER (
                     ORDER BY SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                       DESC, source) AS rnk
            FROM documents GROUP BY source
          ) WHERE rnk <= 4
        ), ns AS (SELECT COUNT(*) AS c FROM seeds),
        pr0 AS (SELECT domain, CAST(1000000 AS BIGINT) AS pr FROM nodes)"""]
    for k in range(1, iters + 1):
        sql.append(f""",
        contrib{k} AS (
          SELECT e.dst AS domain, SUM(e.w * (p.pr // o.od)) AS inflow
          FROM edges e
          JOIN pr{k - 1} p ON p.domain = e.src
          JOIN outdeg o ON o.domain = e.src
          GROUP BY 1
        ), dang{k} AS (
          SELECT COALESCE(SUM(p.pr), 0) AS dm
          FROM pr{k - 1} p LEFT JOIN outdeg o ON o.domain = p.domain
          WHERE o.od IS NULL
        ), pr{k} AS (
          SELECT n.domain,
                 CAST(CASE WHEN s.domain IS NOT NULL THEN {per_seed}
                           ELSE 0 END
                      + (85 * (COALESCE(c.inflow, 0)
                         + CASE WHEN s.domain IS NOT NULL
                                THEN (SELECT dm FROM dang{k})
                                     // (SELECT c FROM ns)
                                ELSE 0 END)) // 100 AS BIGINT) AS pr
          FROM nodes n
          LEFT JOIN seeds s ON s.domain = n.domain
          LEFT JOIN contrib{k} c ON c.domain = n.domain
        )""")
    sql.append(f"""
        SELECT p.domain, p.pr AS tr_micro,
               s.domain IS NOT NULL AS is_seed
        FROM pr{iters} p LEFT JOIN seeds s ON s.domain = p.domain
        ORDER BY p.domain""")
    return "".join(sql)


_DOMAIN_QUOTA_SQL = """
        WITH c AS (
          SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        ), t AS (SELECT SUM(n_docs) AS N FROM c),
        b AS (
          SELECT source, n_docs,
                 (1000 * n_docs) // (SELECT N FROM t) AS base,
                 (1000 * n_docs) % (SELECT N FROM t) AS rem
          FROM c
        ), r AS (SELECT 1000 - SUM(base) AS R FROM b),
        rk AS (
          SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rnk
          FROM b
        )
        SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(base + CASE WHEN rnk <= (SELECT R FROM r)
                                THEN 1 ELSE 0 END AS BIGINT) AS quota
        FROM rk ORDER BY source
"""


# Mirrors operators/textstats.py pmi_collocations: identical division
# order inside ln so both engines compute the same double before the
# micro-nat floor.
_PMI_COLLOCATIONS_SQL = """
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS t
          FROM documents
        ), c1 AS (
          SELECT w, COUNT(*) AS n1
          FROM (SELECT unnest(t) AS w FROM d) GROUP BY w
        ), ab AS (
          SELECT t[i] AS w1, t[i + 1] AS w2
          FROM d, unnest(range(1, greatest(len(t), 1))) AS u(i)
        ), c2 AS (
          SELECT w1, w2, COUNT(*) AS n2 FROM ab GROUP BY 1, 2
        ), tot AS (
          SELECT (SELECT CAST(SUM(n1) AS DOUBLE) FROM c1) AS T,
                 (SELECT CAST(SUM(n2) AS DOUBLE) FROM c2) AS B
        ), scored AS (
          SELECT c2.w1, c2.w2, c2.n2 AS pair_count,
                 CAST(floor(ln((CAST(c2.n2 AS DOUBLE) / tot.B)
                      / ((CAST(a.n1 AS DOUBLE) / tot.T)
                         * (CAST(b.n1 AS DOUBLE) / tot.T)))
                      * 1e6 + 0.5) AS BIGINT) AS pmi_micro
          FROM c2
          JOIN c1 a ON a.w = c2.w1
          JOIN c1 b ON b.w = c2.w2, tot
          WHERE c2.n2 >= 5
        )
        SELECT w1, w2, CAST(pair_count AS BIGINT) AS pair_count, pmi_micro
        FROM scored ORDER BY pmi_micro DESC, w1, w2 LIMIT 20
"""
