package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Geo, Voronoi}

class VoronoiSpec extends AnyFunSuite {

  val seeds = Seq(
    (17.0, 51.1), (2.35, 48.85), (-0.13, 51.5), (13.4, 52.5),
    (21.0, 52.2), (4.9, 52.37), (-3.7, 40.4), (12.5, 41.9))

  test("every seed lies inside its own cell and outside all others") {
    val cells = Voronoi.cells(seeds)
    for (((lng, lat), i) <- seeds.zipWithIndex) {
      val p = Geo.point(lng, lat)
      assert(cells(i).covers(p), s"seed $i outside its cell")
      for ((c, j) <- cells.zipWithIndex if j != i)
        assert(!c.covers(p), s"seed $i inside cell $j")
    }
  }

  test("cells agree with nearest-seed assignment on a sample grid") {
    val cells = Voronoi.cells(seeds)
    def dist2(a: (Double, Double), b: (Double, Double)): Double = {
      // spherical chord distance
      def v(p: (Double, Double)) = {
        val la = math.toRadians(p._2); val lo = math.toRadians(p._1)
        (math.cos(lo) * math.cos(la), math.sin(lo) * math.cos(la), math.sin(la))
      }
      val x = v(a); val y = v(b)
      val dx = x._1 - y._1; val dy = x._2 - y._2; val dz = x._3 - y._3
      dx * dx + dy * dy + dz * dz
    }
    val rnd = new scala.util.Random(13L)
    var checked = 0
    for (_ <- 1 to 400) {
      val lng = rnd.nextDouble() * 40 - 10  // within the seeds' region
      val lat = rnd.nextDouble() * 20 + 38
      val ds = seeds.map(s => dist2((lng, lat), s))
      val nearest = ds.indexOf(ds.min)
      val margin = ds.sorted.tail.head - ds.min
      if (margin > 1e-4) { // skip near-bisector points (densification tolerance)
        checked += 1
        assert(cells(nearest).covers(Geo.point(lng, lat)),
          s"($lng, $lat) not in nearest cell $nearest")
      }
    }
    assert(checked > 300)
  }

  test("validation errors mirror the reference (<4 seeds, duplicates, bounds)") {
    intercept[IllegalArgumentException](Voronoi.cells(seeds.take(3)))
    intercept[IllegalArgumentException](Voronoi.cells(seeds :+ seeds.head))
    intercept[IllegalArgumentException](Voronoi.cells(seeds :+ ((200.0, 0.0))))
  }

  test("VoronoiRegionalizer operator over a seed table") {
    import SparkTestSession.spark
    import spark.implicits._
    val df = seeds.map { case (lng, lat) => Geo.toWkb(Geo.point(lng, lat)) }
      .toDF(graft.operators.Tables.Geometry)
    val out = new graft.operators.VoronoiRegionalizer().transform(df)
    assert(out.count() === seeds.size)
    assert(out.columns.toSeq === Seq(
      graft.operators.Tables.RegionsIndex, graft.operators.Tables.Geometry))
  }
}
