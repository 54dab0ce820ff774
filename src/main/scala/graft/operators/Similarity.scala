package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Gf

/** Similarity search over an embedding column (array<float>).
  *
  * Brute-force top-k is the exactness baseline: broadcast the (small) query
  * set against the corpus — one pass, no shuffle on the corpus side, rank by
  * window per query. The LSH path is the 100-TB shape: hyperplane-signature
  * buckets bound candidate generation; identical/near-identical directions
  * always share a bucket, so recall degrades smoothly with distance while
  * cost stays ~linear. */
object Similarity {

  /** Exact top-k cosine neighbours for each query row.
    * Output: (query_id, neighbor_id, cosine, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", Gf.vecCosine(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** LSH-bucketed approximate top-k: candidates limited to rows sharing the
    * query's hyperplane-signature bucket (multi-probe via `tables`
    * independent signatures unioned). Same output shape as brute force. */
  /** Plane/table counts trade selectivity vs recall: P(bucket match per
    * table) = (1 - θ/π)^planes. Strong near-dups (cos ≥ 0.9) tolerate 12-16
    * planes; weak top-k regimes (cos ≈ 0.4, like random embeddings) need few
    * planes and more tables. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 6, tables: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sigs = (0 until tables).map(t =>
      (t, (c: org.apache.spark.sql.Column) => Gf.hyperplaneSig(c, planes, 1000L + t)))
    val corpusSig = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v"))
      .select(col("neighbor_id"), col("v"),
        explode(array(sigs.map { case (t, f) =>
          struct(lit(t).as("t"), f(col("v")).as("sig")) }: _*)).as("b"))
      .select(col("neighbor_id"), col("v"), col("b.t").as("t"), col("b.sig").as("sig"))
    val querySig = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(array(sigs.map { case (t, f) =>
          struct(lit(t).as("t"), f(col("qv")).as("sig")) }: _*)).as("b"))
      .select(col("query_id"), col("qv"), col("b.t").as("t"), col("b.sig").as("sig")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    corpusSig.join(querySig, Seq("t", "sig"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id", "v", "qv").dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", Gf.vecCosine(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding near-duplicate pairs via signature buckets + exact cosine
    * verification. Identical directions always collide (sign pattern equal),
    * so exact-dup recall is 1.0 by construction. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
                         planes: Int = 16, tables: Int = 4,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sigs = (0 until tables).map(t =>
      (t, (c: org.apache.spark.sql.Column) => Gf.hyperplaneSig(c, planes, 2000L + t)))
    val banded = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), col("v"),
        explode(array(sigs.map { case (t, f) =>
          struct(lit(t).as("t"), f(col("v")).as("sig")) }: _*)).as("b"))
      .select(col("id"), col("v"), col("b.t").as("t"), col("b.sig").as("sig"))
    val a = banded.select(col("t"), col("sig"), col("id").as("id_a"), col("v").as("v_a"))
    val b = banded.select(col("t"), col("sig"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("t", "sig"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "v_a", "v_b").dropDuplicates("id_a", "id_b")
      .withColumn("cosine", Gf.vecCosine(col("v_a"), col("v_b")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b")
  }
}
