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
  * Spark shape: positives are a ring-1 generator; the exclusion is a
  * left-anti join of the (anchor × region) candidate space against the
  * exploded disk; per-anchor negatives picked by a hash-ranked window. */
object Triplets {

  def hex2vec(regions: DataFrame, excludeK: Int = 2,
              negativesPerAnchor: Int = 2, seed: Long = 42L): DataFrame = {
    val ids = regions.select(col(Tables.RegionsIndex)).distinct()

    val positives = Neighbourhoods.h3Closure(ids, 1)
      .select(col("region_id").as("anchor"), col("neighbour_id").as("positive"))

    val excluded = ids.select(
      col(Tables.RegionsIndex).as("anchor"),
      explode(Gf.h3GridDisk(Gf.h3FromStr(col(Tables.RegionsIndex)), excludeK)).as("cell"))
      .select(col("anchor"), Gf.h3Str(col("cell")).as("candidate"))

    val candidates = ids.select(col(Tables.RegionsIndex).as("anchor"))
      .crossJoin(ids.select(col(Tables.RegionsIndex).as("candidate")))
      .join(excluded, Seq("anchor", "candidate"), "left_anti")

    val w = Window.partitionBy("anchor")
      .orderBy(xxhash64(lit(seed), col("anchor"), col("candidate")))
    val negatives = candidates
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= negativesPerAnchor)
      .select(col("anchor"), col("candidate").as("negative"),
        (col("rn") - 1).as("neg_idx"))

    positives.join(negatives, Seq("anchor"))
      .select("anchor", "positive", "negative")
  }
}
