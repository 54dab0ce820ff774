package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Gf

/** Document deduplication operators (training-data pipeline core).
  *
  * Scale shapes:
  *  - exact: one hash-aggregate on md5(normalized text) — same plan as any
  *    high-cardinality groupBy, no special handling needed;
  *  - MinHash+LSH: signature is a per-row projection; banding explodes each
  *    row into `bands` NARROW rows (id, band, band_hash) — no shingle/text
  *    payload rides the band shuffle. Candidate generation is a self-join on
  *    (band, band_hash) — only rows sharing a bucket meet, so the join is
  *    linear in bucket sizes, never all-pairs. Shingles are joined back ONCE
  *    per unique candidate pair, and exact Jaccard verification runs only on
  *    those pairs;
  *  - SimHash: same banding trick over 4×16-bit chunks of the 64-bit hash
  *    (two near-dup hashes with hamming ≤ 3 share ≥ 1 exact chunk by
  *    pigeonhole — recall 1.0 at the hamming threshold, not probabilistic).
  */
object Dedup {

  /** The signature computation is the expensive projection; a small
    * single-file input would otherwise run it in one task. Only widens —
    * never shrinks an already-parallel input (at real scale file splits
    * provide the parallelism and this is a no-op). The decision uses the
    * optimizer's size ESTIMATE (file-listing metadata) — no physical
    * planning of the query (the round-1 `df.rdd.getNumPartitions` forced a
    * full plan just to inspect partition count). */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < target.toLong * 4L * 1024 * 1024) df.repartition(target) else df
  }

  /** Exact duplicate groups by normalized-text hash: (content_hash,
    * group_size, keep_id = min id). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.fingerprint(col(textCol)).as("content_hash"))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("group_size"), min(col(idCol)).as("keep_id"))

  /** (id, shingles) projection shared by the LSH paths. */
  private def shingled(df: DataFrame, idCol: String, textCol: String,
                       shingleK: Int): DataFrame =
    spread(df).select(
      col(idCol).as("id"),
      TextOps.shingles(col(textCol), shingleK).as("sh"))

  /** Drop blocking buckets larger than `maxBucketSize` BEFORE the
    * self-join: a bucket of n identical-signature rows yields n²/2
    * candidate pairs, so one boilerplate/empty-document cluster of 10⁵
    * rows would already materialize 5·10⁹ join rows and sink the stage.
    * Such clusters are (near-)exact duplicates the exact-dedup pass
    * ([[Dedup.exact]]) collapses upstream — the documented pipeline order.
    * The cap is explicit (not silent): a parameter on every pair
    * generator, defaulted far above any genuine near-dup neighbourhood
    * (10⁴ rows ≈ 5·10⁷ pairs in ONE bucket is already pathological).
    * Implemented as a count window over the bucket keys — ONE evaluation
    * of the (expensive, signature-bearing) banded input and one exchange,
    * not a build/probe pair that would run the signature stage twice.
    *
    * UNCAPPED mode (`maxBucketSize <= 0`, the exhaustive-recall setting)
    * keeps every bucket but is no longer silent about degenerate ones:
    * when `warnTag` is set, the same count window feeds a pass-through
    * [[graft.functions.WarnLargeBucket]] on the id column, logging (once
    * per JVM per tag) any block over `warnOver` rows — the n² blowup of a
    * boilerplate cluster becomes diagnosable in the executor logs instead
    * of an anonymous stage sink. The window's (keys) exchange+sort is the
    * same shape the self-join needs next, so the added cost is one sorted
    * pass, not a new join. */
  private[operators] def capBuckets(banded: DataFrame, keys: Seq[String],
                                    maxBucketSize: Int,
                                    warnTag: String = null,
                                    warnOver: Int = 10000,
                                    warnOn: String = "id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    if (maxBucketSize <= 0) {
      if (warnTag == null || warnOver <= 0) return banded
      // the diagnostic must ride a column the downstream join consumes
      // (column pruning would drop a side-channel) — `warnOn` names it,
      // loudly, instead of assuming every caller's frame has an "id"
      require(banded.columns.contains(warnOn),
        s"capBuckets(warnTag=$warnTag): warn column '$warnOn' not in " +
          s"${banded.columns.mkString("[", ",", "]")}")
      return banded.withColumn("__bsz", count(lit(1)).over(w))
        .withColumn(warnOn, call_function("warn_large_bucket",
          col(warnOn), col("__bsz"), lit(warnOver.toLong), lit(warnTag)))
        .drop("__bsz")
    }
    banded.withColumn("__bsz", count(lit(1)).over(w))
      .where(col("__bsz") <= maxBucketSize)
      .drop("__bsz")
  }

  /** The LOSSLESS size prefilter: Jaccard(A, B) ≥ t implies |A∩B| ≤ min and
    * |A∪B| ≥ max, hence min(|A|,|B|) ≥ t·max(|A|,|B|) — so the filter can
    * never drop a pair the verification would keep. Applied on candidate
    * pairs BEFORE the shingle arrays are joined back: on a clustered corpus
    * the candidate stream dwarfs the true-pair count and every surviving
    * candidate drags two multi-KB arrays through the verify join (probe:
    * 6.56M → 1.18M candidates, verify 37 s → 8 s at local[8], identical
    * output). The sizes ride the band shuffle as one int per row. */
  private def sizeCompatible(threshold: Double): org.apache.spark.sql.Column =
    least(col("n_a"), col("n_b")).cast("double") >=
      lit(threshold) * greatest(col("n_a"), col("n_b"))

  /** Join shingle arrays back to (id_a, id_b) candidate pairs and verify
    * exact Jaccard ≥ threshold. The two id-keyed joins shuffle each shingle
    * array at most once — candidate pairs are tiny next to the corpus.
    * Shingle arrays are DISTINCT by construction, so |A∪B| = |A|+|B|−|A∩B|:
    * one intersect pass instead of intersect + union (identical values). */
  private def verifyJaccard(candidates: DataFrame, sh: DataFrame,
                            threshold: Double): DataFrame =
    candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("__i", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard",
        col("__i") / (size(col("sh_a")) + size(col("sh_b")) - col("__i")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** MinHash + LSH near-duplicate pairs with exact-Jaccard verification.
    * Returns (id_a, id_b, jaccard) for verified pairs ≥ threshold; id_a < id_b.
    *
    * With `numHashes = bands * rowsPerBand`, a pair with Jaccard j collides
    * in ≥1 band with prob 1-(1-j^r)^b — at 64/16×4 the curve passes 0.5 near
    * j≈0.5 and is ≈1 above j≈0.8. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
                   threshold: Double = 0.7,
                   maxBucketSize: Int = 10000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sh = shingled(df, idCol, textCol, shingleK)
    // band rows: (id, band, band_hash) — NO array payload in the shuffle
    // literal per-band hash columns, not transform(sequence(...)): the HOF
    // form evaluates interpreted per band per row (same values either way —
    // xxhash64 over the identical slice)
    val banded = sh
      .withColumn("sig", Gf.minhashSig(col("sh"), numHashes))
      .select(col("id"), size(col("sh")).as("n"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(lit(b), slice(col("sig"), lit(b * rows + 1), lit(rows)))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val capped = capBuckets(banded, Seq("band", "band_hash"), maxBucketSize)
    val a = capped.select(col("band"), col("band_hash"), col("id").as("id_a"),
      col("n").as("n_a"))
    val b = capped.select(col("band"), col("band_hash"), col("id").as("id_b"),
      col("n").as("n_b"))
    val candidates = a.join(b, Seq("band", "band_hash"))
      .where(col("id_a") < col("id_b") && sizeCompatible(threshold))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    verifyJaccard(candidates, sh, threshold)
  }

  /** Volume-aware simhash chunk count: the FINEST chunking (most bands —
    * strongest hamming sensitivity, since pigeonhole guarantees a shared
    * chunk at hamming < bands) whose RANDOM collision load stays flat —
    * expected random co-bucket partners per row, bands·n/2^(64/bands),
    * within `budgetPerRow`. The walk-down mirrors [[graft.operators.Similarity.suggestLsh]]'s
    * occupancy budget: 8-bit chunks only fit toy corpora (n ≤ 64),
    * 16-bit up to ~33k rows, 32-bit to ~4×10⁹, and past that only exact
    * simhash equality (bands = 1) blocks without a quadratic candidate
    * stage. Identical-copy recall — the only recall this family promises —
    * is width-independent: equal hashes share every chunk at every width. */
  def suggestSimhashBands(n: Long, budgetPerRow: Double = 2.0): Int =
    Seq(8, 4, 2, 1).find(b =>
      n.toDouble * b / math.pow(2.0, 64.0 / b) <= budgetPerRow).getOrElse(1)

  /** Explode a 64-bit hash column into `bands` equal-width (band, chunk)
    * blocking rows, carrying every other column of `hashed` through.
    * Pigeonhole: any pair with hamming < bands shares a chunk. The ONE
    * home of the chunk bit-math — both simhash pair generators band
    * through here. */
  private def bandChunks(hashed: DataFrame, hashCol: String,
                         bands: Int): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val chunks = array((0 until bands).map(b => struct(
      lit(b).as("band"),
      shiftrightunsigned(col(hashCol), b * width).bitwiseAND(lit(mask)).as("chunk"))): _*)
    val carried = hashed.columns.map(col)
    hashed.select(carried :+ explode(chunks).as("bc"): _*)
      .select(carried :+ col("bc.band").as("band") :+ col("bc.chunk").as("chunk"): _*)
  }

  /** Hamming-banded near-dup pairs over ANY precomputed 64-bit hash column:
    * the ONE home of chunk-block → self-join → hamming-verify (round-6 —
    * generalized out of [[simhashPairs]] so the image phash path shares the
    * exact layout instead of duplicating it). `hashed` must be (id, h).
    * Pigeonhole recall: a pair with hamming < bands shares ≥ 1 chunk, so
    * for the default 4×16-bit layout every pair at hamming ≤ 3 is a
    * candidate — recall 1.0 at the threshold, not probabilistic. Bands = 0
    * picks the volume-aware width ([[suggestSimhashBands]]); note finer
    * widths strengthen the pigeonhole bound while SHRINKING the chunk key
    * space (collision mass), the trade documented on
    * [[simhashJaccardPairs]]. The hash payload is one long — it rides the
    * band shuffle (8 bytes × bands, cheaper than a join back). */
  private def hammingPairs(hashed: DataFrame, maxHamming: Int, bands: Int,
                           maxBucketSize: Int, warnTag: String,
                           nHint: Long): DataFrame = {
    val chosenBands =
      if (bands > 0) bands
      else {
        val b = suggestSimhashBands(if (nHint > 0L) nHint else hashed.count())
        // volume-aware width changes the pigeonhole bound with corpus size
        // — observable, like simhashJaccardPairs' auto path (ADVICE round 5)
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"$warnTag: auto-selected $b band(s) of ${64 / b} bits" +
            (if (nHint > 0L) s" from nHint=$nHint" else " from df.count()"))
        b
      }
    // the pigeonhole guarantee holds only for maxHamming < bands (and
    // uncapped buckets); wider chunks are a legitimate volume-aware
    // degraded mode (identical-copy recall survives at every width) but
    // must be observable, never silent
    if (maxHamming >= chosenBands)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"hammingPairs: maxHamming=$maxHamming >= bands=$chosenBands — the " +
          "pigeonhole recall guarantee at this threshold is void; only " +
          "pairs sharing a full chunk (e.g. identical hashes) are candidates")
    val banded = capBuckets(bandChunks(hashed, "h", chosenBands),
      Seq("band", "chunk"), maxBucketSize, warnTag = warnTag)
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("h").as("h_a"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("h").as("h_b"))
    a.join(b, Seq("band", "chunk"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").dropDuplicates("id_a", "id_b")
      .withColumn("hamming", Gf.hamming64(col("h_a"), col("h_b")))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** SimHash near-duplicate pairs: 64-bit token-vote hash, 4×16-bit band
    * blocking, hamming ≤ maxHamming verification. The hash payload is one
    * long — it rides the band shuffle (8 bytes ×4, cheaper than a join
    * back). Recall is exact by pigeonhole for maxHamming ≤ 3 — BECAUSE this
    * variant defaults to an uncapped bucket size; a corpus with a legitimate
    * >`maxBucketSize` near-identical cluster costs n² pairs inside that
    * block, which is exactly what the hamming filter must see to stay
    * exhaustive. Pass `maxBucketSize > 0` to trade that guarantee for a
    * bound on degenerate blocks (boilerplate clusters), as
    * [[simhashJaccardPairs]] does by default. Uncapped blocks beyond the
    * old 10k bound log a loud executor-side warning (round-5, see
    * [[capBuckets]]) so the n² blowup is diagnosable, never silent. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   maxBucketSize: Int = 0): DataFrame =
    hammingPairs(
      spread(df).select(col(idCol).as("id"),
        Gf.simhash64(TextOps.tokens(col(textCol))).as("h")),
      maxHamming, bands = 4, maxBucketSize, warnTag = "simhashPairs",
      nHint = 0L)

  /** Image NEAR-duplicate pairs by perceptual-hash hamming banding — the
    * re-encoded / recompressed-copy detector the exact md5 pass
    * ([[exact]] / q13) structurally cannot catch: lossy re-encoding changes
    * every byte but barely moves the 64-bit average phash, so near-copies
    * sit within a few hamming bits. Same pigeonhole layout as
    * [[simhashPairs]] (4×16-bit chunks guarantee every pair at hamming ≤ 3
    * is a candidate), same volume-aware width option (`bands = 0` →
    * [[suggestSimhashBands]]), same explicit capping story. `hashCol` is a
    * precomputed int64 phash — the input contract ships one
    * (BASELINE.json input_hint `phash:int64`); use [[phashPairsFromBytes]]
    * when only bytes are at hand. Scale shape: blocking touches ONLY
    * (id, phash) — 16 bytes/row — never the image bytes; at 10¹² images the
    * band shuffle is the narrow one the 100-TB plan needs. */
  def phashPairs(df: DataFrame, idCol: String, hashCol: String,
                 maxHamming: Int = 3, bands: Int = 4,
                 maxBucketSize: Int = 0, nHint: Long = 0L): DataFrame =
    hammingPairs(
      df.select(col(idCol).as("id"), col(hashCol).cast("long").as("h")),
      maxHamming, bands, maxBucketSize, warnTag = "phashPairs", nHint = nHint)

  /** [[phashPairs]] computing the phash from an image-bytes column (one
    * codegen decode+hash projection — [[graft.functions.Gf.imgPhash]]);
    * [[spread]] widens a small single-file input so the decode kernel
    * parallelizes. */
  def phashPairsFromBytes(df: DataFrame, idCol: String, bytesCol: String,
                          maxHamming: Int = 3, bands: Int = 4,
                          maxBucketSize: Int = 0, nHint: Long = 0L): DataFrame =
    hammingPairs(
      spread(df).select(col(idCol).as("id"),
        Gf.imgPhash(col(bytesCol)).as("h")),
      maxHamming, bands, maxBucketSize, warnTag = "phashPairs", nHint = nHint)

  /** SimHash-blocked exact-Jaccard near-dup pairs: candidates from
    * 4×16-bit simhash chunk blocking (the classic web-dedup layout),
    * verified with exact shingle Jaccard. Same output contract as
    * [[minhashPairs]] — a cheaper blocking (one 64-bit hash instead of a
    * 64-long signature) for corpora where near-dups keep most token votes
    * intact.
    *
    * Band choice is a recall/scale dial: 16-bit chunks guarantee recall at
    * hamming ≤ 3 and keep buckets sparse (2¹⁶ values per band). Finer
    * chunks (bands = 8 → 8-bit) push the pigeonhole guarantee to hamming
    * ≤ 7 but shrink the key space to 256 values, so bucket occupancy — and
    * with it candidate-pair count — grows QUADRATICALLY with corpus size
    * (measured: 4× the corpus, ~5× the wall time, DedupScaleDrive round 3;
    * at 320k docs the 16-bit space saturates outright — 1,741 s at
    * local[2] vs minhash's 118 s, round 5). The default is therefore
    * VOLUME-AWARE ([[suggestSimhashBands]], bands = 0): it widens chunks
    * as the corpus grows so the RANDOM collision mass stays linear, at the
    * price of a weaker hamming sensitivity — which this variant never
    * promised: its recall contract is identical-copy pairs (identical
    * text → identical simhash → same chunk at EVERY width) plus whatever
    * the exact-Jaccard verify confirms among candidates. Pass an explicit
    * `bands` to pin the round-3/4 behavior. Use minhashPairs when organic
    * Jaccard recall matters at scale — its banding bounds the miss
    * probability analytically; chunk blocking never did. */
  def simhashJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          shingleK: Int = 3, threshold: Double = 0.9,
                          bands: Int = 0,
                          maxBucketSize: Int = 10000,
                          nHint: Long = 0L): DataFrame = {
    // bands = 0 needs the corpus size; counting `df` materializes its
    // upstream plan once more, so callers with an expensive derived input
    // should pass `nHint` (any rough row count — the band walk only cares
    // about order of magnitude) or an explicit `bands`
    val chosenBands =
      if (bands > 0) bands
      else {
        val b = suggestSimhashBands(if (nHint > 0L) nHint else df.count())
        // the auto choice changes blocking sensitivity with corpus size —
        // make it observable to callers (ADVICE round 5)
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"simhashJaccardPairs: auto-selected $b band(s) of ${64 / b} bits" +
            (if (nHint > 0L) s" from nHint=$nHint" else " from df.count()"))
        b
      }
    // one projection computes the simhash AND the shingle count, so the
    // lossless size prefilter can ride the band shuffle (one int per row)
    val proj = spread(df).select(col(idCol).as("id"),
      Gf.simhash64(TextOps.tokens(col(textCol))).as("hash"),
      TextOps.shingles(col(textCol), shingleK).as("sh"))
    val banded = capBuckets(
      bandChunks(proj.select(col("id"), col("hash"), size(col("sh")).as("n")),
        "hash", chosenBands).drop("hash"),
      Seq("band", "chunk"), maxBucketSize)
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"),
      col("n").as("n_a"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"),
      col("n").as("n_b"))
    val candidates = a.join(b, Seq("band", "chunk"))
      .where(col("id_a") < col("id_b") && sizeCompatible(threshold))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    verifyJaccard(candidates, proj.select(col("id"), col("sh")), threshold)
  }
}
