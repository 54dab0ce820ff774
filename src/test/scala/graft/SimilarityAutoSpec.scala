package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Round-5: [[Similarity.suggestLsh]] must size planes from sampled bucket
  * occupancy (cost) and tables from the analytic recall model — and make
  * SANE choices on the two corpus shapes that matter: uniform (occupancy
  * falls geometrically with planes → walk until under budget) and
  * clustered (an irreducible duplicate mass → plateau detection stops the
  * walk instead of cranking planes to the max and killing organic recall). */
class SimilarityAutoSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val Dim = 16

  /** Deterministic pseudo-random vector per id (murmur-finalized — a raw
    * linear hash leaves line structure that correlates every signature). */
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

  lazy val uniform = toDf((0L until 3000L).map(i => (i, vec(i, 7L)))).cache()
  // 30% of rows are byte-identical copies of one boilerplate vector — the
  // web-scale duplicate-mass shape
  lazy val clustered = toDf((0L until 3000L).map { i =>
    if (i % 10 < 3) (i, vec(-1L, 7L)) else (i, vec(i, 7L))
  }).cache()

  test("uniform corpus: planes walk until occupancy is under budget; deterministic") {
    val p = Similarity.suggestLsh(uniform, designCos = 0.97)
    assert(p.sampledOccupancy <= 0.01,
      s"uniform occupancy not under budget: $p")
    assert(p.planes >= 6 && p.planes <= 12, s"unexpected planes for uniform: $p")
    assert(p.tables >= 1 && p.tables <= 16)
    // deterministic: the sample is seeded
    assert(Similarity.suggestLsh(uniform, designCos = 0.97) === p)
  }

  test("clustered corpus: plateau stops the walk at the irreducible duplicate mass") {
    val p = Similarity.suggestLsh(clustered, designCos = 0.97)
    // ~30% duplicate rows → collision prob floor ≈ 0.09 that NO plane
    // count can split; the walk must stop early rather than run to 24
    assert(p.sampledOccupancy >= 0.05, s"clustered occupancy below floor? $p")
    assert(p.planes < 24, s"planes ran to the max despite the plateau: $p")
    val pu = Similarity.suggestLsh(uniform, designCos = 0.97)
    assert(p.planes <= pu.planes,
      s"clustered chose MORE planes than uniform: $p vs $pu")
  }

  test("tables solve the recall model: tighter design cosine needs fewer tables") {
    val loose = Similarity.suggestLsh(uniform, designCos = 0.90)
    val tight = Similarity.suggestLsh(uniform, designCos = 0.99)
    assert(tight.tables <= loose.tables,
      s"tighter pairs should need fewer tables: $tight vs $loose")
    // the model at the chosen point actually meets the target
    def recall(p: Similarity.LshParams, c: Double): Double = {
      val q = 1.0 - math.acos(c) / math.Pi
      1.0 - math.pow(1.0 - math.pow(q, p.planes), p.tables)
    }
    assert(recall(tight, 0.99) >= 0.95 - 1e-9)
    // loose may clamp at 16 tables; recall must still be the best the
    // clamp allows (monotonicity sanity, not an absolute bound)
    assert(recall(loose, 0.90) >= recall(Similarity.LshParams(
      loose.planes, loose.tables - 1, 0.0), 0.90))
  }

  // ---- round-6: suggestIvf (nlist by √n, nprobe by sampled recall) ----

  // 8 tight direction clusters — IVF cells align with real structure, so
  // few probes already reach the target
  lazy val ivfClustered = toDf((0L until 3000L).map { i =>
    val base = vec(i % 8, 99L)
    val jit = vec(i, 3L)
    (i, Array.tabulate(Dim)(d => base(d) + 0.05f * jit(d)))
  }).cache()

  test("suggestIvf: √n nlist, deterministic, clustered needs fewer probes than uniform") {
    val (mc, pc) = Similarity.suggestIvf(ivfClustered, recallTarget = 0.9,
      nHint = 3000L)
    // √3000 ≈ 55
    assert(pc.nlist === 55 && mc.nlist === 55, s"nlist off the √n rule: $pc")
    assert(pc.sampledRecall >= 0.9 || pc.nprobe === pc.nlist,
      s"walk stopped below target without exhausting probes: $pc")
    val (_, pu) = Similarity.suggestIvf(uniform, recallTarget = 0.9,
      nHint = 3000L)
    assert(pc.nprobe <= pu.nprobe,
      s"clustered should need <= probes than uniform: $pc vs $pu")
    // deterministic end to end
    val (mc2, pc2) = Similarity.suggestIvf(ivfClustered, recallTarget = 0.9,
      nHint = 3000L)
    assert(pc2 === pc && mc2.centroids.toSeq === mc.centroids.toSeq)
  }

  test("suggestIvf: tighter target never needs fewer probes; nprobe capped at nlist") {
    val (_, lo) = Similarity.suggestIvf(uniform, recallTarget = 0.5, nHint = 3000L)
    val (_, hi) = Similarity.suggestIvf(uniform, recallTarget = 0.99, nHint = 3000L)
    assert(hi.nprobe >= lo.nprobe, s"$hi vs $lo")
    assert(hi.nprobe <= hi.nlist && lo.nprobe >= 1)
  }

  test("suggestIvf parameters drive ivfTopKWith: planted twin found at the auto nprobe") {
    val aug = ivfClustered.unionAll(
      ivfClustered.where(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
    val queries = ivfClustered.where(col("vec_id") % 7 === 0 && col("vec_id") < 70)
    val (model, params) = Similarity.suggestIvf(ivfClustered,
      recallTarget = 0.9, nHint = 3000L)
    val hits = Similarity.ivfTopKWith(model, aug, queries, 5,
        nprobe = params.nprobe)
      .where(col("neighbor_id") === col("query_id") + 100000L).count()
    assert(hits === queries.count(),
      "every planted twin must surface at any nprobe >= 1")
  }

  test("suggested parameters drive the existing operators unchanged") {
    val p = Similarity.suggestLsh(clustered, designCos = 0.97)
    val pairs = Similarity.cosineNearDupPairs(clustered, threshold = 0.999,
      planes = p.planes, tables = p.tables)
    // every identical-copy pair is found (sign patterns equal in every
    // table → recall 1.0 by construction for exact dups)
    val dupIds = (0L until 3000L).filter(_ % 10 < 3)
    val wantPairs = (for { a <- dupIds; b <- dupIds if a < b } yield (a, b)).size
    assert(pairs.count() === wantPairs)
  }
}
