package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Gf

/** Hex2Vec contrastive triplets (reference:
  * srai/embedders/hex2vec/neighbour_dataset.py:100-162 — anchor, positive =
  * direct neighbour, negative sampled from regions at least excludeK+1 hops
  * away; exclusion set = grid_disk(anchor, excludeK) :115-121).
  *
  * The reference draws negatives with unseeded numpy; here sampling is
  * seeded and every random choice is plain 64-bit modular arithmetic over
  * the anchor's numeric H3 id (Lehmer-style multipliers mod the Mersenne
  * prime P = 2³¹−1), so an external SQL engine can replay the exact triplet
  * set (driver certificate q46) — SURVEY.md §4.
  *
  * Spark shape: positives are a ring-1 generator. Negatives come from
  * BOUNDED hash-pick sampling — `oversample` deterministic picks per anchor
  * indexed into the region set, with the disk exclusion applied by
  * anti-join — so the candidate space is O(n·oversample), never the
  * O(n²) anchor×region cross join (a scale-killer beyond city-sized region
  * sets). The dense region index equals
  * `row_number() OVER (ORDER BY a64 % 64, region_id) − 1` but is computed
  * WITHOUT a global single-task window: a 64-bucket partitioned window plus
  * broadcast bucket offsets (round 2 sorted the whole vocabulary in one
  * task). Anchors the bounded picks leave short of `negativesPerAnchor`
  * (hash collisions + self-match + disk exclusion) top up from the
  * exhaustive candidate set, ranked by the same hash family — bounded by
  * |under-filled anchors| × vocabulary and normally empty, still fully
  * deterministic. */
object Triplets {

  private val P = 2147483647L // 2^31 - 1

  /** SQL-expressible pick hash: ((a64 % P)·48271 + (i+1)·16807 + seed) % P.
    * All intermediates stay below 2⁴⁸ — no 64-bit overflow in any engine. */
  private def pickHash(a64: Column, i: Column, seed: Long): Column =
    ((a64 % P) * 48271L + (i + 1) * 16807L + seed) % P

  def hex2vec(regions: DataFrame, excludeK: Int = 2,
              negativesPerAnchor: Int = 2, seed: Long = 42L,
              oversample: Int = 16): DataFrame = {
    require(oversample >= negativesPerAnchor, "oversample too small")
    // materialized once (localCheckpoint): the vocabulary feeds
    // positives/excluded/index/picks and two driver actions (count + bucket
    // sizes) — without it the distinct re-shuffles once per branch. Unlike
    // persist(), the checkpointed blocks are freed by the ContextCleaner as
    // soon as the result frame is unreachable. Deliberate trade: on
    // executor loss the truncated lineage fails the JOB (retry re-runs it)
    // instead of recomputing — acceptable for a batch triplet generator,
    // and it can never be silently wrong. Bounded by the vocabulary.
    val ids = regions.select(col(Tables.RegionsIndex)).distinct()
      .withColumn("a64", conv(col(Tables.RegionsIndex), 16, 10).cast("long"))
      .localCheckpoint(true)
    val n = ids.count()

    val positives = Neighbourhoods.h3Closure(ids, 1)
      .select(col("region_id").as("anchor"), col("neighbour_id").as("positive"))

    val excluded = ids.select(
      col(Tables.RegionsIndex).as("anchor"),
      explode(Gf.h3GridDisk(Gf.h3FromStr(col(Tables.RegionsIndex)), excludeK)).as("cell"))
      .select(col("anchor"), Gf.h3Str(col("cell")).as("candidate"))

    // dense vocabulary index: per-bucket windows + broadcast offsets
    val B = 64L
    val withB = ids.withColumn("b", (col("a64") % B).cast("int"))
    val sizes = withB.groupBy("b").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Seq[Long] = (0 until B.toInt)
      .scanLeft(0L)((acc, b) => acc + sizes.getOrElse(b, 0L)).dropRight(1)
    val indexed = withB.withColumn("idx",
      element_at(typedLit(offsets), col("b") + 1) +
        row_number().over(Window.partitionBy("b").orderBy(Tables.RegionsIndex)) - 1)
      .select(col("idx"), col(Tables.RegionsIndex).as("candidate"))

    val picks = ids.select(col(Tables.RegionsIndex).as("anchor"), col("a64"),
      explode(sequence(lit(0), lit(oversample - 1))).as("i"))
      .withColumn("idx", pickHash(col("a64"), col("i"), seed) % n)
      .join(indexed, Seq("idx"))
      .where(col("candidate") =!= col("anchor"))
      .groupBy("anchor", "candidate").agg(min("i").as("i"))
      .join(excluded, Seq("anchor", "candidate"), "left_anti")

    val w = Window.partitionBy("anchor").orderBy("i", "candidate")
    // materialized once: evaluated by the have-count, the top-up anti-join
    // and the final union — O(n · negativesPerAnchor) rows, self-freeing
    val primary = picks
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= negativesPerAnchor)
      .select(col("anchor"), col("candidate"))
      .localCheckpoint(true)

    // guarantee pass: anchors the bounded picks under-filled (normally none)
    val have = primary.groupBy("anchor").agg(count(lit(1)).as("have"))
    val under = ids.select(col(Tables.RegionsIndex).as("anchor"), col("a64"))
      .join(have, Seq("anchor"), "left").na.fill(0L, Seq("have"))
      .where(col("have") < negativesPerAnchor)
    val topUp = indexed.join(broadcast(under))
      .where(col("candidate") =!= col("anchor"))
      .join(excluded, Seq("anchor", "candidate"), "left_anti")
      .join(primary, Seq("anchor", "candidate"), "left_anti")
      .withColumn("h", pickHash(col("a64"), lit(oversample.toLong) + col("idx"), seed))
      .withColumn("rn", row_number().over(
        Window.partitionBy("anchor").orderBy(col("h"), col("candidate"))))
      .where(col("rn") <= lit(negativesPerAnchor) - col("have"))
      .select(col("anchor"), col("candidate"))

    val negatives = primary.unionAll(topUp)
      .select(col("anchor"), col("candidate").as("negative"))

    positives.join(negatives, Seq("anchor"))
      .select("anchor", "positive", "negative")
  }
}
