package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ImageOps

/** One row of the graft input table — schema exactly as BASELINE.json
  * `input_hint`: (image_id string, bytes binary, w int32, h int32,
  * fmt string, caption string, phash int64). */
case class ImageRow(image_id: String, bytes: Array[Byte], w: Int, h: Int,
                    fmt: String, caption: String, phash: Long)

/** Deterministic synthetic image+caption table (no external data; fixed
  * arithmetic, no RNG state). Generation runs distributed via mapPartitions
  * over spark.range — each executor synthesizes and encodes its own shard
  * with the real JDK PNG/JPEG codecs.
  *
  * Planted structure (all pure functions of the row number `k`):
  *  - visual pattern = k % `patterns` → images sharing a pattern are
  *    byte-identical (exact/near-dup ground truth for phash dedup);
  *  - fmt: pattern % 4 == 0 → jpeg (lossy), else png;
  *  - geotag: modular lat/lng grid — mirrored in SQL by
  *    [[Images.lngSql]]/[[latSql]] so DuckDB oracles can reproduce the
  *    geography from the numeric id;
  *  - skewed variant: `hot` fraction of images collapse onto 5 urban
  *    hotspot cells (power-law-ish) for skew-join benchmarks.
  */
object Images {

  val DefaultPatterns = 512

  private val adjectives = Array("quiet", "busy", "old", "modern", "green",
    "sunny", "rainy", "crowded", "empty", "narrow")
  private val nouns = Array("street", "plaza", "bridge", "market", "park",
    "station", "harbor", "tower", "museum", "garden")
  private val places = Array("wroclaw", "poznan", "krakow", "warsaw", "lodz",
    "gdansk", "szczecin", "lublin", "katowice", "bialystok")

  def caption(k: Long): String = {
    val a = adjectives((k % 10).toInt)
    val n = nouns(((k / 10) % 10).toInt)
    val p = places(((k / 100) % 10).toInt)
    s"image $k shows a $a $n near $p"
  }

  def row(k: Long, patterns: Int): ImageRow = {
    require(k >= 0, s"image key must be non-negative, got $k")
    val pat = k % patterns
    val w = 32 + (pat % 3).toInt * 16
    val h = 32
    val fmt = if (pat % 4 == 0) "jpeg" else "png"
    val colorPx = ImageOps.synthPixels(pat, w, h)
    val px = if (fmt == "jpeg") ImageOps.toGray(colorPx) else colorPx
    ImageRow(f"img_$k%09d", ImageOps.encode(px, w, h, fmt), w, h, fmt,
      caption(k), ImageOps.phashOfPixels(px, w, h))
  }

  /** The input table at size `n`. */
  def synthesize(spark: SparkSession, n: Long,
                 patterns: Int = DefaultPatterns): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions(_.map(row(_, patterns)))
  }

  /** Input table keyed by an explicit key column `k` (so a SQL oracle can
    * regenerate the same key set from the source tables). */
  def synthesizeKeys(keys: DataFrame, patterns: Int = DefaultPatterns): Dataset[ImageRow] = {
    import keys.sparkSession.implicits._
    // The key table is typically one tiny parquet split; without this the
    // whole encode pipeline would run in ONE task. Shuffling bare longs is
    // free next to per-row image encoding — always spread across all cores.
    val slices = keys.sparkSession.sparkContext.defaultParallelism
    keys.select(col("k").cast("long")).as[Long]
      .repartition(slices)
      .mapPartitions(_.map(row(_, patterns)))
  }

  /** Standard derived image set for the driver testdata: 4 images per part
    * row, keys = p_partkey*4 + i (SQL mirror in [[keysSql]]). */
  def forTestdata(spark: SparkSession, sfDir: String): Dataset[ImageRow] = {
    val keys = spark.read.parquet(s"$sfDir/part.parquet")
      .select(explode(array(lit(0), lit(1), lit(2), lit(3))).as("i"), col("p_partkey"))
      .select((col("p_partkey") * 4 + col("i")).as("k"))
    synthesizeKeys(keys)
  }

  val keysSql: String =
    "SELECT p_partkey * 4 + v AS k FROM part, (VALUES (0), (1), (2), (3)) t(v)"

  /** Numeric key back out of the id (for geotag derivation in both engines).
    * `img_%09d` does NOT truncate above 10⁹-1, so take the whole digit tail
    * (up to Long.MaxValue's 19 digits) instead of a fixed 9-char slice. */
  def key(imageId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(imageId, 5, 19).cast("long")

  /** Uniform geotag columns (SQL mirrors below). */
  def lng(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (k * 13 % 3600) / 10.0 - 180.0 + 0.05
  def lat(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ((k * 29) % 1200) / 10.0 - 60.0 + 0.05
  def lngSql(k: String): String = s"($k * 13 % 3600) / 10.0 - 180.0 + 0.05"
  def latSql(k: String): String = s"(($k * 29) % 1200) / 10.0 - 60.0 + 0.05"

  /** Skewed geotags: `hotPermille`/1000 of rows collapse onto 5 hotspots
    * ("dense urban tiles", BASELINE.json north_star) with a small jitter;
    * the rest stay uniform. */
  def skewLng(k: org.apache.spark.sql.Column, hotPermille: Int): org.apache.spark.sql.Column =
    when(k % 1000 < hotPermille, (k % 5) * 30.0 - 60.0 + (k % 97) / 1000.0)
      .otherwise(lng(k))
  def skewLat(k: org.apache.spark.sql.Column, hotPermille: Int): org.apache.spark.sql.Column =
    when(k % 1000 < hotPermille, (k % 5) * 10.0 - 20.0 + (k % 89) / 1000.0)
      .otherwise(lat(k))
  def skewLngSql(k: String, hotPermille: Int): String =
    s"CASE WHEN $k % 1000 < $hotPermille THEN ($k % 5) * 30.0 - 60.0 + ($k % 97) / 1000.0 ELSE ${lngSql(k)} END"
  def skewLatSql(k: String, hotPermille: Int): String =
    s"CASE WHEN $k % 1000 < $hotPermille THEN ($k % 5) * 10.0 - 20.0 + ($k % 89) / 1000.0 ELSE ${latSql(k)} END"

  /** Images with geotag + WKB footprint box (half-extent in degrees) —
    * the raster footprint for the polygon join path. */
  def withFootprint(images: DataFrame, halfExtent: Double = 0.02,
                    skewHotPermille: Int = 0): DataFrame = {
    import graft.functions.Gf
    val k = key(col("image_id"))
    val lngC = if (skewHotPermille > 0) skewLng(k, skewHotPermille) else lng(k)
    val latC = if (skewHotPermille > 0) skewLat(k, skewHotPermille) else lat(k)
    images
      .withColumn("lng", lngC)
      .withColumn("lat", latC)
      .withColumn(graft.operators.Tables.Geometry,
        Gf.stBox(col("lng") - halfExtent, col("lat") - halfExtent,
          col("lng") + halfExtent, col("lat") + halfExtent))
  }
}
