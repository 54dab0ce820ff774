package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Gf

/** Hex2Vec contrastive triplets (reference:
  * srai/embedders/hex2vec/neighbour_dataset.py:100-162 — anchor, positive =
  * direct neighbour, negative sampled from regions at least excludeK+1 hops
  * away; exclusion set = grid_disk(anchor, excludeK) :115-121).
  *
  * The reference draws negatives with unseeded numpy; here sampling is
  * seeded (deterministic hash ranking) for reproducibility — SURVEY.md §4.
  *
  * Spark shape: positives are a ring-1 generator. Negatives come from
  * BOUNDED hash-pick sampling — `oversample` deterministic picks per anchor
  * indexed into the region set, with the disk exclusion applied by
  * anti-join — so the candidate space is O(n·oversample), never the
  * O(n²) anchor×region cross join (a scale-killer beyond city-sized region
  * sets). The only global step is the one-pass dense index over the REGION
  * DIMENSION (bounded by the embedding vocabulary, not the data volume). */
object Triplets {

  def hex2vec(regions: DataFrame, excludeK: Int = 2,
              negativesPerAnchor: Int = 2, seed: Long = 42L,
              oversample: Int = 16): DataFrame = {
    require(oversample >= negativesPerAnchor, "oversample too small")
    val ids = regions.select(col(Tables.RegionsIndex)).distinct()

    val positives = Neighbourhoods.h3Closure(ids, 1)
      .select(col("region_id").as("anchor"), col("neighbour_id").as("positive"))

    val excluded = ids.select(
      col(Tables.RegionsIndex).as("anchor"),
      explode(Gf.h3GridDisk(Gf.h3FromStr(col(Tables.RegionsIndex)), excludeK)).as("cell"))
      .select(col("anchor"), Gf.h3Str(col("cell")).as("candidate"))

    // dense index over the region vocabulary (one pass over n region ids)
    val n = ids.count()
    val indexed = ids.withColumn("idx",
      row_number().over(Window.orderBy(Tables.RegionsIndex)) - 1)

    val picks = ids.select(col(Tables.RegionsIndex).as("anchor"))
      .select(col("anchor"),
        explode(sequence(lit(0), lit(oversample - 1))).as("i"))
      .withColumn("idx", pmod(xxhash64(lit(seed), col("anchor"), col("i")), lit(n)))
      .join(indexed.select(col("idx"),
        col(Tables.RegionsIndex).as("candidate")), Seq("idx"))
      .where(col("candidate") =!= col("anchor"))
      .dropDuplicates("anchor", "candidate")
      .join(excluded, Seq("anchor", "candidate"), "left_anti")

    val w = Window.partitionBy("anchor").orderBy("i", "candidate")
    val negatives = picks
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= negativesPerAnchor)
      .select(col("anchor"), col("candidate").as("negative"))

    positives.join(negatives, Seq("anchor"))
      .select("anchor", "positive", "negative")
  }
}
