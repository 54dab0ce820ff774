package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Vector + text kernels (training-data pipeline ops: ANN similarity,
  * SimHash, MinHash banding). Static-call style like GeoOps. */
object VecTextOps {

  /** Cosine similarity in double precision, sequential accumulation (same
    * element order as the DuckDB oracle's list_cosine_similarity). */
  def cosineFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), "vector length mismatch")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Word k-gram shingles (distinct, first-occurrence order) in ONE pass —
    * value-identical to the declarative form
    * `array_distinct(transform(sequence(...), i => concat_ws(" ",
    * slice(regexp_extract_all(text, '\\S+'), i+1, k))))` but ~10× cheaper:
    * higher-order functions evaluate interpreted per ELEMENT (the round-4
    * CosProbe measured 15.4 s vs 1.45 s for an equivalent predicate), and
    * this projection runs per corpus row in every near-dup path.
    * Tokenization splits on exactly Java regex `\s` = the six ASCII
    * whitespace chars, matching the `\S+` extraction on both engines; a
    * text with fewer than k tokens yields ONE shingle of all its tokens
    * (the empty string for an empty text), matching the declarative
    * fallback branch. */
  def wordShingles(text: org.apache.spark.unsafe.types.UTF8String,
                   k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    require(k > 0, s"word_shingles: k must be positive, got $k")
    val s = text.toString
    val n = s.length
    def ws(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < n) {
      while (i < n && ws(s.charAt(i))) i += 1
      val start = i
      while (i < n && !ws(s.charAt(i))) i += 1
      if (i > start) toks += s.substring(start, i)
    }
    val out = new java.util.LinkedHashSet[String]()
    if (toks.length < k) out.add(toks.mkString(" "))
    else {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j + k <= toks.length) {
        sb.setLength(0)
        var q = 0
        while (q < k) {
          if (q > 0) sb.append(' ')
          sb.append(toks(j + q))
          q += 1
        }
        out.add(sb.toString)
        j += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) {
      arr(p) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      p += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  /** FNV-1a 64-bit — stable, dependency-free hash for tokens/planes. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  private def fnv64(seed: Long, x: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < 8) { h ^= (x >>> (i * 8)) & 0xff; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** SimHash over a token array: per-token 64-bit hash, signed bit voting. */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val h = fnv64(tokens.getUTF8String(t).toString)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** MinHash signature: for each of `numHashes` permutations, the minimum
    * of fnv64(seed=i, fnv64(shingle)) over the shingle set. */
  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val base = new Array[Long](shingles.numElements())
    var i = 0
    while (i < base.length) {
      base(i) = fnv64(shingles.getUTF8String(i).toString); i += 1
    }
    val sig = new Array[Long](numHashes)
    var h = 0
    while (h < numHashes) {
      var m = Long.MaxValue
      var j = 0
      while (j < base.length) {
        val v = fnv64(h.toLong, base(j))
        if (v < m) m = v
        j += 1
      }
      sig(h) = m
      h += 1
    }
    ArrayData.toArrayData(sig)
  }

  /** Random-hyperplane signature: bit j = sign(Σ_i g(j,i)·v_i) with
    * deterministic hash-derived plane components. Identical directions get
    * identical signatures (LSH bucket key for cosine near-dup / IVF-style
    * ANN candidate generation). */
  /** Memoized hyperplane components per (seed, planes, dim): the matrix
    * depends only on the configuration, so per-row recomputation of
    * planes×dim hashes (the dominant cost at 10⁹-row scale) is wasted —
    * one multiply-add kernel per row instead. A handful of configurations
    * exist per job; the cache is effectively constant-sized. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Double]]()

  private def planeMatrix(seed: Long, planes: Int, n: Int): Array[Double] = {
    // ragged-dimension corpora would otherwise retain one matrix per
    // distinct (seed, dim) for the JVM lifetime — bound and reset
    if (planeCache.size > 256) planeCache.clear()
    planeCache.computeIfAbsent((seed, planes, n), { key =>
      val (s, p, dim) = key
      val m = new Array[Double](p * dim)
      var j = 0
      while (j < p) {
        // golden-ratio mix so plane keys NEVER alias across table seeds:
        // round-2 used (seed + j), which made table t+1 reuse table t's
        // planes shifted by one — correlated tables collapse multi-table
        // recall (review finding, round 3)
        val planeKey = s * 0x9E3779B97F4A7C15L + j
        var i = 0
        while (i < dim) {
          // Entry key = planeKey + i·C (C large odd) through a murmur3
          // finalizer. The round-2..4 form fed (planeKey, i) through the
          // byte-walking FNV, whose seed and a small i interact ONLY in the
          // low byte — so fnv(S+j, i) == fnv(S+j', i ⊕ (j⊕j')) whenever
          // j⊕j' < dim: every plane row was an exact PERMUTATION of every
          // other (measured round 5: pairwise row cosines up to 0.82
          // depending only on j⊕j'; one table of a 128k-row corpus fell to
          // 6.6k distinct buckets, 148M candidate pairs vs 1.6M after this
          // fix — a 92× candidate blowup that turned the cosine near-dup
          // probe from minutes into hours). Post-mix finalizers cannot help
          // when the pre-mix inputs collide; the additive full-width key
          // makes (j, i) pairs collision-free for any dim < 2^32, and the
          // finalizer then decorrelates entries. Structural guarantees
          // (identical directions ⇒ identical signs) are plane-independent.
          var x = planeKey + i.toLong * 0xC2B2AE3D27D4EB4FL
          x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
          x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
          x ^= x >>> 33
          m(j * dim + i) = x.toDouble / Long.MaxValue.toDouble
          i += 1
        }
        j += 1
      }
      m
    })
  }

  /** Top-`nprobe` IVF centroid indices for `v` by dot product against a
    * flat row-major `centroids` matrix (unit rows — argmax dot == argmax
    * cosine, and the query vector itself needs NO normalization: a positive
    * scale multiplies every dot by the same exact power-of-two-safe factor,
    * so the ranking is scale-invariant). Ties keep the LOWER index
    * (deterministic). Loud error on a dimension mismatch — `dim` is the
    * TRAINED model dimension (a plan-time constant), checked EXACTLY per
    * row: the round-5 divisibility check silently mis-assigned any vector
    * whose length merely divided the matrix (e.g. a dim-64 vector against a
    * 32×128 model, 4096 % 64 == 0 — ADVICE round 5). */
  def ivfCells(v: ArrayData, centroids: Array[Double], dim: Int,
               nprobe: Int): ArrayData = {
    val n = v.numElements()
    require(n == dim,
      s"ivf_cells: vector dim $n != trained model dim $dim")
    val nlist = centroids.length / n
    val np = math.min(nprobe, nlist)
    require(np >= 1, s"ivf_cells: nprobe must be >= 1, got $nprobe")
    val bestIdx = new Array[Int](np)
    val bestDot = new Array[Double](np)
    var filled = 0
    var j = 0
    while (j < nlist) {
      var dot = 0.0
      var i = 0
      val base = j * n
      while (i < n) { dot += centroids(base + i) * v.getFloat(i); i += 1 }
      // descending insertion; strict < keeps equal-dot earlier indices first
      var pos = filled
      while (pos > 0 && bestDot(pos - 1) < dot) pos -= 1
      if (pos < np) {
        var m = math.min(filled, np - 1)
        while (m > pos) { bestDot(m) = bestDot(m - 1); bestIdx(m) = bestIdx(m - 1); m -= 1 }
        bestDot(pos) = dot; bestIdx(pos) = j
        if (filled < np) filled += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bestIdx, filled))
  }

  def hyperplaneSig(v: ArrayData, planes: Int, seed: Long): Long = {
    val n = v.numElements()
    val m = planeMatrix(seed, planes, n)
    var out = 0L
    var j = 0
    while (j < planes) {
      var dot = 0.0
      var i = 0
      val base = j * n
      while (i < n) {
        dot += m(base + i) * v.getFloat(i)
        i += 1
      }
      if (dot > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
