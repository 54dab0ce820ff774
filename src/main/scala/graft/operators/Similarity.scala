package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Gf

/** Similarity search over an embedding column (array<float>).
  *
  * Brute-force top-k is the exactness baseline: broadcast the (small) query
  * set against the corpus — one pass, no shuffle on the corpus side. The
  * finisher is a BOUNDED distributed top-k aggregate ([[graft.functions.TopKAgg]]):
  * every partition ships at most k candidates per query to the final
  * hash-aggregate, so no single partition ever has to hold the whole
  * corpus×query candidate set (the round-1 `row_number` window did — a
  * scale-killer at 10⁹ vectors). The LSH path is the 100-TB shape:
  * hyperplane-signature buckets bound candidate generation; only
  * (bucket, id) pairs ride the bucket join — vectors are joined back once
  * per surviving candidate. */
object Similarity {

  /** Auto-tuned LSH parameters (see [[suggestLsh]]): `sampledOccupancy` is
    * the estimated probability that two random corpus rows share a
    * single-table bucket at `planes` planes — the direct driver of
    * candidate-join cost. */
  final case class LshParams(planes: Int, tables: Int, sampledOccupancy: Double)

  /** Pick (planes, tables) from the CORPUS, the way
    * [[IntersectionJoiner.auto]] picks the cell level from the region set:
    * sample signature-bucket occupancy to size `planes`, then solve the
    * standard hyperplane-LSH recall model for `tables`.
    *
    *  - planes — walk up through candidate counts until the sampled
    *    collision probability Σ(m_b/S)² drops under `maxOccupancy`
    *    (candidate volume ∝ occupancy × n² — the 100-TB cost knob), BUT
    *    stop early when an extra step stops helping (< 15% relative drop):
    *    a clustered corpus (boilerplate/duplicate embeddings — the
    *    realistic web case) has an IRREDUCIBLE collision mass that more
    *    planes can never split; cranking planes past it only destroys
    *    organic recall while the duplicate mass keeps colliding. The cap
    *    in [[cosineNearDupPairs]] is the tool for that mass, not planes.
    *  - tables — per-table collision prob for a pair at cosine c is
    *    q^planes with q = 1 − acos(c)/π; the smallest T with
    *    1−(1−q^planes)^T ≥ recallTarget (clamped to [1,16]).
    *
    * `designCos` is the cosine at which the recall target must hold — the
    * similarity of the pairs that MUST be found (e.g. 0.97 for near-exact
    * duplicates), usually above the verification threshold, which only
    * gates what survives. Sampling is seeded (deterministic across
    * retries) and plans as a per-partition top-K, never a global sort. */
  def suggestLsh(corpus: DataFrame, designCos: Double,
                 recallTarget: Double = 0.95, maxOccupancy: Double = 0.01,
                 sampleSize: Int = 2048,
                 vecCol: String = "embedding"): LshParams = {
    require(designCos > -1.0 && designCos < 1.0, s"designCos out of (-1,1): $designCos")
    require(recallTarget > 0.0 && recallTarget < 1.0, s"recallTarget out of (0,1)")
    // null embeddings (failed-embed rows, routine at scale) are skipped by
    // the operators' null-intolerant kernels — skip them in the sample too
    val rows = corpus.select(col(vecCol)).where(col(vecCol).isNotNull)
      .orderBy(rand(20260817L)).limit(sampleSize).collect()
    require(rows.nonEmpty, "suggestLsh: empty corpus (no non-null embeddings)")
    val vecs = rows.map(r => r.getSeq[Float](0).toArray)

    def occupancy(p: Int): Double = {
      val counts = new java.util.HashMap[java.lang.Long, Integer]()
      vecs.foreach { v =>
        val sig = graft.functions.VecTextOps.hyperplaneSig(
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v), p, 2000L)
        counts.merge(sig, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      }
      var s2 = 0.0
      counts.values.forEach(c => s2 += c.toDouble * c.toDouble)
      s2 / (vecs.length.toDouble * vecs.length)
    }

    val ladder = Seq(4, 6, 8, 10, 12, 16, 20, 24)
    var planes = ladder.head
    var occ = occupancy(planes)
    var i = 1
    var done = occ <= maxOccupancy
    while (!done && i < ladder.length) {
      val next = occupancy(ladder(i))
      if (next > occ * 0.85) done = true // plateau: irreducible cluster mass
      else {
        planes = ladder(i); occ = next
        done = occ <= maxOccupancy
        i += 1
      }
    }

    val q = 1.0 - math.acos(designCos) / math.Pi
    val perTable = math.pow(q, planes)
    val tables =
      if (perTable >= recallTarget) 1
      else math.min(16, math.max(1,
        math.ceil(math.log1p(-recallTarget) / math.log1p(-perTable)).toInt))
    LshParams(planes, tables, occ)
  }

  /** Rank rows of a bounded `topk_agg` result array: (query_id, neighbor_id,
    * cosine, rank) with rank 1..k by (cosine desc, neighbor_id asc). */
  private def explodeTopK(grouped: DataFrame): DataFrame =
    grouped.select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))

  /** Exact top-k cosine neighbours for each query row.
    * Output: (query_id, neighbor_id, cosine, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val grouped = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", Gf.vecCosine(col("v"), col("qv")))
      .groupBy("query_id")
      .agg(Gf.topKAgg(col("cosine"), col("neighbor_id"), k).as("top"))
    explodeTopK(grouped)
  }

  /** LSH-bucketed approximate top-k: candidates limited to rows sharing the
    * query's hyperplane-signature bucket (multi-probe via `tables`
    * independent signatures unioned). Same output shape as brute force.
    *
    * Plane/table counts trade selectivity vs recall: P(bucket match per
    * table) = (1 - θ/π)^planes. Strong near-dups (cos ≥ 0.9) tolerate 12-16
    * planes; weak top-k regimes (cos ≈ 0.4, like random embeddings) need few
    * planes and more tables.
    *
    * Scale shape: the bucket join carries (neighbor_id, t, sig) only —
    * 24 bytes/row instead of the embedding payload ×tables; embeddings are
    * joined back ONCE per unique surviving candidate, then the bounded
    * top-k aggregate finishes (no global window). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 6, tables: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sigs = (0 until tables).map(t =>
      (t, (c: org.apache.spark.sql.Column) => Gf.hyperplaneSig(c, planes, 1000L + t)))
    // bucket rows: ids only — the narrow shuffle
    val corpusSig = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v"))
      .select(col("neighbor_id"),
        explode(array(sigs.map { case (t, f) =>
          struct(lit(t).as("t"), f(col("v")).as("sig")) }: _*)).as("b"))
      .select(col("neighbor_id"), col("b.t").as("t"), col("b.sig").as("sig"))
    val querySig = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"),
        explode(array(sigs.map { case (t, f) =>
          struct(lit(t).as("t"), f(col("qv")).as("sig")) }: _*)).as("b"))
      .select(col("query_id"), col("b.t").as("t"), col("b.sig").as("sig")))
    val candidates = corpusSig.join(querySig, Seq("t", "sig"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    // join the payload back once per candidate
    val qv = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val grouped = candidates
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v")),
        Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .withColumn("cosine", Gf.vecCosine(col("v"), col("qv")))
      .groupBy("query_id")
      .agg(Gf.topKAgg(col("cosine"), col("neighbor_id"), k).as("top"))
    explodeTopK(grouped)
  }

  /** Embedding near-duplicate pairs via signature buckets + exact cosine
    * verification. Identical directions always collide (sign pattern equal),
    * so exact-dup recall is 1.0 by construction.
    *
    * Scale shape: bucket join on (t, sig, id, sigs) — the full per-table
    * signature vector rides the shuffle (8·tables extra bytes/row) so each
    * pair can be emitted from the FIRST table whose signatures agree and
    * only there: exactly-once by construction, which deletes the pair
    * dropDuplicates exchange entirely (on a clustered corpus — boilerplate
    * embeddings, the realistic web-scale case — the candidate set itself is
    * the dominant volume, and a whole extra exchange of it is pure waste:
    * the round-4 CosProbe measured the full op at 16.1 s before / 5-7 s
    * after on a 15.8M-candidate corpus at local[8]). Vectors are joined
    * back once per candidate. Capping composes exactly: each row carries a
    * bitmask of the tables whose bucket SURVIVED the cap (one narrow window
    * over the banded rows), and a pair is emitted at its earliest shared
    * table among the surviving ones — identical recall to the old
    * dropDuplicates form (a pair sharing a capped early bucket is still
    * recovered through an uncapped later table), still exactly-once. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
                         planes: Int = 16, tables: Int = 4,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         maxBucketSize: Int = 10000): DataFrame = {
    val ids = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val sigArr = array((0 until tables).map(t =>
      Gf.hyperplaneSig(col("v"), planes, 2000L + t)): _*)
    // oversized buckets (zero/duplicate vectors all share a signature)
    // would square in the self-join — same explicit cap as Dedup
    val capped = Dedup.capBuckets(ids
      .select(col("id"), sigArr.as("sigs"))
      .select(col("id"), col("sigs"), posexplode(col("sigs")))
      .select(col("id"), col("sigs"), col("pos").as("t"), col("col").as("sig")),
      Seq("t", "sig"), maxBucketSize)
    // bitmask of tables whose bucket survived the cap for THIS id. Two rows
    // with equal signatures at table t sit in the SAME bucket there, so one
    // side's bit answers "was that shared bucket capped" for both.
    val banded = capped.withColumn("mask",
      sum(expr("shiftleft(CAST(1 AS BIGINT), t)")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")))
    val a = banded.select(col("t"), col("sig"), col("id").as("id_a"),
      col("sigs").as("sigs_a"), col("mask").as("mask_a"))
    val b = banded.select(col("t"), col("sig"), col("id").as("id_b"),
      col("sigs").as("sigs_b"))
    // veto only when an EARLIER table both matches and survived capping —
    // a literal-index OR chain, NOT slice/zip_with/exists: higher-order
    // functions evaluate interpreted per row — measured 15.4 s vs 1.45 s
    // for this filter over a 15.8M-row candidate join (CosProbe, round 4)
    val earlierMatch =
      if (tables <= 1) lit(false)
      else (0 until tables - 1).map(tp =>
        col("t") > tp && col("sigs_a")(tp) === col("sigs_b")(tp) &&
          col("mask_a").bitwiseAND(lit(1L << tp)) =!= 0L)
        .reduce(_ || _)
    val candidates = a.join(b, Seq("t", "sig"))
      .where(col("id_a") < col("id_b") && !earlierMatch)
      .select("id_a", "id_b")
    candidates
      .join(ids.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(ids.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cosine", Gf.vecCosine(col("v_a"), col("v_b")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b")
  }
}
