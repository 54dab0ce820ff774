package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity, TextOps}

class TextSimilaritySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
  lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()

  test("minhash finds planted tail-mutated near-dups (0.9 < j < 1)") {
    // append a 2-token tail: jaccard = n/(n+2) — above 0.9 for docs with
    // >= 19 shingles, i.e. >= 21 tokens
    val mutated = docs.where(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"),
        concat(col("text"), lit(" tailmarker endtoken")).as("text"))
    val aug = docs.select(col("doc_id"), col("text")).unionAll(mutated)
    val pairs = Dedup.minhashPairs(aug, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val planted = docs.where(col("doc_id") % 3 === 0)
      .select("doc_id", "text").collect()
      .filter(r => r.getString(1).split("\\s+").length >= 25) // safely above j=0.9
      .map(r => (r.getLong(0), r.getLong(0) + 500000L)).toSet
    val found = pairs.map(p => (p._1, p._2)).toSet
    val missed = planted -- found
    assert(missed.isEmpty, s"missed ${missed.size} planted near-dup pairs: ${missed.take(5)}")
    // every reported pair is exactly verified >= 0.9 by construction
    assert(pairs.forall(_._3 >= 0.9))
  }

  test("degenerate buckets are capped: a boilerplate cluster cannot square the join") {
    import spark.implicits._
    // 200 identical boilerplate docs (one giant bucket in every band) plus
    // a planted near-dup pair of distinct text
    val boiler = (0 until 200).map(i =>
      (i.toLong, "lorem ipsum dolor sit amet the quick brown fox jumps again"))
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val planted = Seq((1000L, base), (1001L, base + " extra tail"))
    val corpus = (boiler ++ planted).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(corpus, "doc_id", "text",
      threshold = 0.9, maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 200-doc cluster (19,900 identical pairs) is excluded by the cap —
    // exact dedup is the documented upstream collapse for it...
    assert(!pairs.exists { case (a, b) => a < 200 && b < 200 })
    // ...while genuine near-dups in normal-sized buckets are still found
    assert(pairs.contains((1000L, 1001L)))
  }

  test("simhash pairs include all exact duplicates and only verified-near pairs") {
    val dups = docs.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
    val aug = docs.select(col("doc_id"), col("text")).unionAll(dups)
    val pairs = Dedup.simhashPairs(aug, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = docs.where(col("doc_id") % 5 === 0).select("doc_id").as[Long]
      .collect().map(k => (k, k + 500000L)).toSet
    assert(planted.subsetOf(pairs.map(p => (p._1, p._2)).toSet))
    assert(pairs.forall(_._3 <= 3))
    // exact dups have hamming 0
    assert(pairs.filter(p => planted contains ((p._1, p._2))).forall(_._3 === 0))
  }

  test("LSH ANN recall vs brute force >= 0.5 at k=10, and cosines are exact") {
    val queries = emb.where(col("vec_id") < 8)
    val brute = Similarity.bruteForceTopK(emb, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, 10, planes = 3, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect approx).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall $recall too low")
  }

  test("word_shingles kernel == declarative transform/slice formula") {
    // tricky shapes: empty text, pure whitespace, < k tokens, duplicate
    // shingles, every ASCII whitespace separator, NBSP (must NOT split —
    // regex \s is ASCII), k = 1
    val texts = Seq(
      "", "   ", "\t\n\f\r", "one", "one two",
      "a b c d e f g", "x x x x x x", "a  b\tc\nde\ff\rg",
      "café naïve", "nb sp stays one token",
      "the quick brown fox jumps over the lazy dog the quick brown fox")
    for (k <- Seq(1, 3, 5)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "text")
      val got = df.select(col("i"), TextOps.shingles(col("text"), k).as("s"))
        .orderBy("i").collect().map(_.getSeq[String](1))
      val want = df.select(col("i"),
          TextOps.shinglesDeclarative(col("text"), k).as("s"))
        .orderBy("i").collect().map(_.getSeq[String](1))
      (got zip want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g === w, s"k=$k text='${texts(i)}'")
      }
    }
  }

  test("cosineNearDupPairs: first-collision-wins emits each pair once, NO dedup exchange") {
    // two exact dups (collide in every table) + decoys; exactly-once must
    // come from the plan, not a dropDuplicates. Embeddings are FLOAT arrays
    // (the kernel contract — getFloat over a double array reads garbage).
    val vecs = ((0 until 40).map(i =>
      (i.toLong, Array.tabulate(16)(d => math.sin(i * 16 + d + 1).toFloat))) ++
      Seq((100L, Array.tabulate(16)(d => math.cos(d + 1.0).toFloat)),
          (101L, Array.tabulate(16)(d => math.cos(d + 1.0).toFloat))))
      .toDF("vec_id", "embedding")
    val out = Similarity.cosineNearDupPairs(vecs, 0.999)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.count(p => p == ((100L, 101L))) === 1,
      "exact-dup pair must be emitted exactly once across the 4 tables")
    // plan shape: no Deduplicate node — checked on the ANALYZED plan (the
    // optimizer rewrites every batch Deduplicate to an Aggregate, so the
    // optimized plan is vacuously clean even for dropDuplicates code)
    def dedups(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case d: org.apache.spark.sql.catalyst.plans.logical.Deduplicate => d
      }
    assert(dedups(out).isEmpty, "pair dedup exchange crept back into the plan")
    // control: the assertion CAN fail — minhashPairs still deduplicates
    val ctrl = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    assert(dedups(Dedup.minhashPairs(ctrl, "doc_id", "text")).nonEmpty,
      "control lost its Deduplicate — the assertion is vacuous again")
  }

  test("cosineNearDupPairs: a pair whose EARLIEST shared bucket is capped is recovered later") {
    // the regression the survived-table bitmask exists for: a pair that
    // sits in a boilerplate cluster's (capped) bucket at table 0, but in
    // its own tiny bucket at tables 1-3, must still surface — the naive
    // first-collision veto would see the table-0 signature match and drop
    // it. At planes = 4 a table-0 signature collision is findable by a
    // deterministic search over candidate vectors.
    val dim = 16
    val boiler = Array.tabulate(dim)(d => if (d == 0) 1.0f else 0.0f)
    val cands = (0 until 400).map(i =>
      Array.tabulate(dim)(d => math.sin(i * 31 + d * 7 + 1).toFloat))
    val sigRows = (boiler +: cands).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      .select(col("vec_id") +: (0 until 4).map(t =>
        call_function("hyperplane_sig", col("embedding"), lit(4),
          lit(2000L + t)).as(s"s$t")): _*)
      .orderBy("vec_id").collect()
    val base = sigRows.head
    // need: table-0 bucket shared with the boilerplate (so it gets capped)
    // and at least one LATER table in a bucket of its own (so the pair can
    // be recovered there)
    val probe = sigRows.tail.find(r =>
      r.getLong(1) == base.getLong(1) && (r.getLong(2) != base.getLong(2) ||
        r.getLong(3) != base.getLong(3) || r.getLong(4) != base.getLong(4)))
    assert(probe.nonEmpty, "no table-0 collision in the candidate pool " +
      s"(deterministic data — base sigs ${(1 to 4).map(base.getLong)}, " +
      s"sample ${sigRows.tail.take(5).map(r => (1 to 4).map(r.getLong)).toList})")
    val pv = cands(probe.get.getLong(0).toInt - 1)

    val vecs = ((0 until 30).map(i => (i.toLong, boiler)) ++
      Seq((200L, pv), (201L, pv))).toDF("vec_id", "embedding")
    val out = Similarity.cosineNearDupPairs(vecs, 0.999, planes = 4,
      maxBucketSize = 20).collect().map(r => (r.getLong(0), r.getLong(1)))
    // the pair's table-0 bucket holds the 32-row capped cluster; tables 1-3
    // hold only the pair — it must be emitted exactly once regardless
    assert(out.count(_ == ((200L, 201L))) === 1,
      "pair lost to the capped early bucket (survived-mask veto broken)")
    assert(!out.exists { case (x, y) => x < 30 && y < 30 },
      "capped boilerplate cluster leaked pairs")
  }

  test("hyperplane signature is scale-invariant (identical directions collide)") {
    val sig = emb.select(col("vec_id"),
      graft.functions.Gf.hyperplaneSig(col("embedding"), 16, 42L).as("s1"),
      graft.functions.Gf.hyperplaneSig(
        transform(col("embedding"), x => x * lit(3.0f)), 16, 42L).as("s2"))
    assert(sig.where(col("s1") =!= col("s2")).count() === 0)
  }

  test("langid: english stopword text classifies en; unknown text is und") {
    val df = Seq(
      (1L, "the cat and the dog of the house is to be found in the garden"),
      (2L, "xyzzy qwerty plugh")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextOps.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "en")
    assert(got(2L) === "und")
  }
}
