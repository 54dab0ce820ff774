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
          m(j * dim + i) = fnv64(planeKey, i.toLong).toDouble / Long.MaxValue.toDouble
          i += 1
        }
        j += 1
      }
      m
    })
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
