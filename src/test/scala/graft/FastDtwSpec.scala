package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GeoMetrics, Gf}

/** Parity of [[GeoMetrics.fastDtw]] with the reference's fastdtw
  * approximation (srai/benchmark/_custom_metrics.py:71-88 calls pypi
  * fastdtw with radius=1 and a geopy great_circle dist). Golden values come
  * from an INDEPENDENT transcription of the published algorithm in Python
  * (tools/gen_fastdtw_golden.py) performing the same FP operations — both
  * implementations must agree bit-for-bit. Includes the adversarial pair
  * where fastdtw provably diverges from the exact DP (the documented
  * deviation the exact `dtw_latlng` default carries). */
class FastDtwSpec extends AnyFunSuite {

  private val A = Array.tabulate(8)(i => (52.0 + 0.01 * i, 21.0 + 0.005 * i))
  private val B = Array.tabulate(8)(i => (52.0 + 0.01 * i, 21.0 + 0.005 * i + 0.002))
  private val C = Array(
    (52.00, 21.000), (52.08, 21.500), (52.01, 21.001), (52.02, 21.002),
    (52.03, 21.003), (52.90, 21.900), (52.05, 21.005), (52.06, 21.006),
    (52.07, 21.007), (52.08, 21.008), (52.09, 21.009), (52.10, 21.010),
    (52.11, 21.011), (52.12, 21.012), (52.13, 21.013), (52.14, 21.014))
  private val D = Array.tabulate(16)(i => (52.0 + 0.01 * i, 21.0))
  private val S = Array((52.0, 21.0), (52.1, 21.1))
  private val E = Array(
    (52.30103264110699, 21.67813697913109), (52.20257441340681, 21.16960715319046),
    (52.90572159992549, 21.659990004675848), (52.44193248076969, 21.891726920317737),
    (52.32696061882941, 21.665899062533672), (52.19850577886532, 21.4308952823558),
    (52.8059883993464, 21.914221198859003), (52.88026891808353, 21.384418682899902))
  private val F = Array(
    (52.58310718775394, 21.31648684449414), (52.1361763263833, 21.496467041602322),
    (52.83709561747054, 21.84872030497024), (52.71121776151761, 21.950000151845515),
    (52.27679599688841, 21.169128910547713), (52.45064945125097, 21.275162822944907),
    (52.21408037715328, 21.413984800745162), (52.62573355823737, 21.493875366986895),
    (52.31537164536324, 21.839118412449228), (52.98203650582415, 21.452477338316637),
    (52.074679216956554, 21.031485775695174), (52.8728290543523, 21.041488399194588),
    (52.7086309290012, 21.570581960336973), (52.30903035140996, 21.791513521701386),
    (52.019114014811706, 21.135881158748187), (52.4548324137175, 21.024726508328417),
    (52.829668434459066, 21.237409008884836), (52.140874525881166, 21.046942569196318),
    (52.629180305565185, 21.446480766751023))

  test("fastdtw matches the independent Python transcription to <= 2 ULP") {
    // identical FP operation order on both sides; the only residual is the
    // 1-ULP freedom libm sin/cos have across platforms (glibc vs JDK) —
    // 4 of 5 goldens, including the load-bearing adversarial case, are
    // bit-identical on this host
    def ulps(got: Double, want: Double): Unit =
      assert(math.abs(got - want) <= 2 * math.ulp(want), s"$got vs $want")
    ulps(GeoMetrics.fastDtw(A, B), 1094.4797640976406)
    ulps(GeoMetrics.fastDtw(C, D), 156839.79676474142)
    ulps(GeoMetrics.fastDtw(S, A), 29537.46624903698)
    assert(GeoMetrics.fastDtw(A, A) === 0.0)
    assert(GeoMetrics.fastDtw(E, F) === 716959.8783875669)
  }

  test("adversarial pair: fastdtw diverges from the exact DP as documented") {
    // radius-1 window misses the optimal warp → approximation overshoots
    val approx = GeoMetrics.fastDtw(E, F)
    assert(approx === 716959.8783875669)
    assert(approx > 714597.0 && approx - 714597.9231099833 > 2000.0)
    // short inputs (< radius+2) fall back to the full DP by definition
    assert(GeoMetrics.fastDtw(S, A) === GeoMetrics.fastDtw(S, A, radius = 5))
  }

  test("exact dtw agrees with fastdtw wherever the window holds the true path") {
    // same metric on benign paths (haversine vs atan2 forms agree to <1e-6 rel)
    for ((x, y) <- Seq((A, B), (C, D), (A, A))) {
      val ex = GeoMetrics.dtw(x, y); val fd = GeoMetrics.fastDtw(x, y)
      assert(math.abs(ex - fd) <= 1e-6 * math.max(1.0, ex.abs),
        s"exact $ex vs fastdtw $fd")
    }
  }

  test("fastdtw_latlng expression evaluates through the session") {
    import SparkTestSession.spark
    import spark.implicits._
    val df = Seq((A.map(p => Array(p._1, p._2)), B.map(p => Array(p._1, p._2))))
      .toDF("a", "b")
    val v = df.select(Gf.fastDtwLatLng(col("a"), col("b")).as("d"))
      .collect()(0).getDouble(0)
    assert(v === 1094.4797640976406)
  }
}
