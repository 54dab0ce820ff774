package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantiles

/** Golden parity with real `pd.qcut(v, 4, labels=False, duplicates="drop")`
  * outputs (generated with pandas 2.x; reference call site:
  * srai/spatial_split.py:202-219). The skew/twoval cases force duplicate
  * quantile edges — the semantics ntile cannot reproduce. */
class QuantilesSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def codes(values: Seq[Int], nBins: Int = 4): Seq[Any] = {
    val df = values.zipWithIndex.map { case (v, i) => (i, v.toLong) }.toDF("id", "n")
    Quantiles.qcut(df, "n", nBins).orderBy("id").collect()
      .map(r => if (r.isNullAt(2)) null else r.getInt(2)).toSeq
  }

  test("skewed counts: duplicate edges merge, bins collapse (pd.qcut golden)") {
    // edges [1, 1, 1, 3.25, 30] → dedup [1, 3.25, 30] → 2 bins
    assert(codes(Seq(1, 1, 1, 1, 1, 1, 1, 1, 1, 10, 20, 30)) ===
      Seq(0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1))
  }

  test("distinct values: full 4-bin quantile coding (pd.qcut golden)") {
    // edges [1, 2.75, 4.5, 5.25, 9]
    assert(codes(Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8)) ===
      Seq(1, 0, 1, 0, 2, 3, 0, 3, 2, 1, 2, 3))
  }

  test("two distinct values: three duplicate edges at the bottom") {
    // edges [2, 2, 2, 5.75, 7] → dedup [2, 5.75, 7]
    assert(codes(Seq(2, 2, 2, 2, 7, 7)) === Seq(0, 0, 0, 0, 1, 1))
  }

  test("all-equal values: pandas emits null codes — reproduced") {
    assert(codes(Seq(5, 5, 5, 5)) === Seq(null, null, null, null))
  }

  test("empty input fails with a clear error like pd.qcut") {
    val empty = Seq.empty[(Int, Long)].toDF("id", "n")
    val e = intercept[IllegalArgumentException](Quantiles.qcut(empty, "n", 4))
    assert(e.getMessage.contains("no non-null"))
  }

  test("ntile disagrees with qcut on the skewed fixture (documented gap)") {
    val df = Seq(1, 1, 1, 1, 1, 1, 1, 1, 1, 10, 20, 30).zipWithIndex
      .map { case (v, i) => (i, v.toLong) }.toDF("id", "n")
    val nt = df.withColumn("b", ntile(4).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("n"), col("id"))))
      .orderBy("id").collect().map(_.getInt(2)).toSeq
    // ntile forces 4 equal row groups — splits the tied 1s across buckets
    assert(nt.distinct.size === 4)
    assert(codes(Seq(1, 1, 1, 1, 1, 1, 1, 1, 1, 10, 20, 30)).distinct.size === 2)
  }
}
