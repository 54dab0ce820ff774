package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Gf, VecTextOps}
import graft.operators.Similarity

/** Round-5 IVF ANN (the second 100-TB ANN shape next to LSH): a
  * sample-trained spherical k-means coarse quantizer, a per-row codegen
  * cell-assignment kernel, and a probe-join search whose recall dial
  * (`nprobe`) walks a strict superset path to EXACT brute force at
  * `nprobe = nlist`. Mirrors the reference's similarity surface the way
  * lshTopK does (srai has no ANN; this is beyond-reference pipeline
  * surface per the brief). */
class IvfSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val Dim = 16

  private def vec(id: Long, salt: Long): Array[Float] =
    Array.tabulate(Dim) { i =>
      var x = id * 0x9E3779B97F4A7C15L + salt * 0xC2B2AE3D27D4EB4FL +
        i.toLong * 0x165667B19E3779F9L
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
      x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
      x ^= x >>> 33
      (x.toDouble / Long.MaxValue.toDouble).toFloat
    }

  private def toDf(rows: Seq[(Long, Array[Float])]) =
    rows.toDF("vec_id", "embedding")

  // clustered corpus: 8 direction clusters with small per-row jitter — the
  // shape where IVF cells align with real structure and recall@nprobe is a
  // meaningful curve (on uniform data every cell is equally likely)
  private def clusterVec(id: Long): Array[Float] = {
    val base = vec(id % 8, 99L)
    val jit = vec(id, 3L)
    Array.tabulate(Dim)(i => base(i) + 0.05f * jit(i))
  }

  lazy val corpus = toDf((0L until 600L).map(i => (i, clusterVec(i)))).cache()
  lazy val queries = toDf((0L until 24L).map(i => (1000L + i, clusterVec(i)))).cache()

  test("ivf_cells kernel: scale-invariant, deterministic, lower-index ties") {
    // 2 centroids in 2-D; a vector along +x must pick cell 0 first
    val cents = Array(1.0, 0.0, 0.0, 1.0)
    val a = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(3.0f, 1.0f))
    val a2 = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(12.0f, 4.0f)) // ×4 scaling — same direction
    assert(VecTextOps.ivfCells(a, cents, 2, 2).toIntArray.toSeq === Seq(0, 1))
    assert(VecTextOps.ivfCells(a2, cents, 2, 2).toIntArray.toSeq === Seq(0, 1))
    // exact tie (45°): both dots equal → lower index first
    val tie = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(1.0f, 1.0f))
    assert(VecTextOps.ivfCells(tie, cents, 2, 2).toIntArray.toSeq === Seq(0, 1))
    // nprobe caps at nlist
    assert(VecTextOps.ivfCells(a, cents, 2, 7).numElements() === 2)
    // dimension mismatch is a loud error, not a truncated dot
    val bad = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(1.0f, 2.0f, 3.0f))
    val e = intercept[IllegalArgumentException](
      VecTextOps.ivfCells(bad, cents, 2, 1))
    assert(e.getMessage.contains("!= trained model dim"))
    // EXACT dim check (round-6, ADVICE): a vector whose length merely
    // DIVIDES the matrix must fail too — dim-4 vector vs a 2x2 model
    val div = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(1.0f, 2.0f, 3.0f, 4.0f))
    val e2 = intercept[IllegalArgumentException](
      VecTextOps.ivfCells(div, cents, 2, 1))
    assert(e2.getMessage.contains("!= trained model dim"))
  }

  test("trainIvf: deterministic, unit-norm centroids, loud empty/ragged errors") {
    val m1 = Similarity.trainIvf(corpus, nlist = 8, iters = 5)
    val m2 = Similarity.trainIvf(corpus, nlist = 8, iters = 5)
    assert(m1.nlist === 8 && m1.dim === Dim)
    assert(m1.centroids.toSeq === m2.centroids.toSeq, "training not deterministic")
    for (j <- 0 until m1.nlist) {
      val n2 = (0 until m1.dim).map(d => math.pow(m1.centroids(j * m1.dim + d), 2)).sum
      assert(math.abs(n2 - 1.0) < 1e-9, s"centroid $j not unit norm: $n2")
    }
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(intercept[IllegalArgumentException](Similarity.trainIvf(empty))
      .getMessage.contains("empty corpus"))
    val zeros = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(intercept[IllegalArgumentException](Similarity.trainIvf(zeros))
      .getMessage.contains("empty corpus"))
    val ragged = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    assert(intercept[IllegalArgumentException](
      Similarity.trainIvf(ragged, sampleSize = 2)).getMessage.contains("ragged"))
  }

  test("nprobe = nlist degenerates to EXACT brute force (hash-equal result)") {
    val model = Similarity.trainIvf(corpus, nlist = 8, iters = 5)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 9).as("c"), col("rank"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val exact = key(Similarity.bruteForceTopK(corpus, queries, 5))
    val ivf = key(Similarity.ivfTopKWith(model, corpus, queries, 5, nprobe = 8))
    assert(ivf === exact, "nprobe=nlist must equal brute force exactly")
  }

  test("recall@nprobe is monotone non-decreasing and high at modest nprobe") {
    val model = Similarity.trainIvf(corpus, nlist = 8, iters = 5)
    val truth = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(np: Int): Double = {
      val got = Similarity.ivfTopKWith(model, corpus, queries, 5, nprobe = np)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val r1 = recall(1); val r2 = recall(2); val r4 = recall(4)
    assert(r1 <= r2 + 1e-12 && r2 <= r4 + 1e-12,
      s"recall not monotone in nprobe: $r1 / $r2 / $r4")
    // 8 true direction clusters, nlist=8 → probing half the cells must
    // recover the bulk of true neighbours on this clustered corpus
    assert(r4 >= 0.9, s"recall@nprobe=4 too low on clustered corpus: $r4")
  }

  test("planted twin (same direction ×2) is guaranteed at nprobe = 1") {
    // scale invariance → twin lands in ITS OWN query's top-1 cell; the
    // structural contract behind the q62 oracle, independent of training
    val aug = corpus.unionAll(corpus.where(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
    val qs = corpus.where(col("vec_id") % 5 === 0 && col("vec_id") < 50)
    val hits = Similarity.ivfTopK(aug, qs, 3, nlist = 8, nprobe = 1)
      .where(col("neighbor_id") === col("query_id") + 100000L)
      .collect()
    assert(hits.length === qs.count().toInt,
      s"missing planted twins at nprobe=1: ${hits.length}")
    assert(hits.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-6))
  }

  test("ivf plan: corpus side has no shuffle before the top-k aggregate") {
    val model = Similarity.trainIvf(corpus, nlist = 8, iters = 5)
    val df = Similarity.ivfTopKWith(model, corpus, queries, 5, nprobe = 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"probe join not broadcast:\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin"), "corpus side shuffled through a sort-merge join")
    assert(!p.contains("Window"), "bounded top-k must not plan a window")
  }

  test("reseeding keeps centroids distinct when clusters outnumber natural directions") {
    // only TWO natural directions but nlist = 6: most clusters empty every
    // Lloyd iteration, so the reseed path runs repeatedly — each empty
    // cluster must claim a DISTINCT worst-fit point, or duplicates become
    // permanently dead cells (ties assign to the lower index)
    val twoDirs = toDf((0L until 80L).map { i =>
      val base = vec(i % 2, 99L)
      val jit = vec(i, 3L)
      (i, Array.tabulate(Dim)(d => base(d) + 0.02f * jit(d)))
    })
    val m = Similarity.trainIvf(twoDirs, nlist = 6, iters = 6, sampleSize = 80)
    val rows = (0 until m.nlist).map(j =>
      m.centroids.slice(j * m.dim, (j + 1) * m.dim).toSeq)
    assert(rows.distinct.size === m.nlist,
      s"duplicate centroids after reseeding: ${rows.distinct.size}/${m.nlist}")
  }
}
