package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Geo
import graft.functions.Gf
import graft.operators.{IntersectionJoiner, Tables}

/** Auto index-level mode: suggestLevel picks sane S2 levels across region
  * scales, the auto joiner reproduces the fixed-level answer, and the
  * explode-vs-refine tradeoff the level controls is actually measured. */
class AutoLevelSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  /** n boxes of `extent` degrees scattered deterministically. */
  private def boxes(n: Int, extent: Double): DataFrame =
    (0 until n).map { i =>
      val cx = -150.0 + (i % 20) * 15.0 % 300
      val cy = -50.0 + (i * 7 % 100)
      (s"r$i", Geo.toWkb(Geo.box(cx, cy, cx + extent, cy + extent)))
    }.toDF(Tables.RegionsIndex, Tables.Geometry)

  test("suggestLevel: city ~14, country ~5, continent ~2 — monotone in extent") {
    val city = IntersectionJoiner.suggestLevel(boxes(64, 0.01))
    val country = IntersectionJoiner.suggestLevel(boxes(64, 5.0))
    val continent = IntersectionJoiner.suggestLevel(boxes(16, 40.0))
    assert(city === 14, s"city-scale level $city")
    assert(country === 5, s"country-scale level $country")
    assert(continent === 2, s"continent-scale level $continent")
    assert(city > country && country > continent)
    // targetCells dial: wanting more cells per region means a finer level
    assert(IntersectionJoiner.suggestLevel(boxes(64, 5.0), targetCells = 64) >
      country)
  }

  test("auto joiner == fixed joiner at the suggested level, == brute truth") {
    val regions = boxes(12, 2.0)
    val features = (0 until 300).map { i =>
      (i.toLong, Geo.toWkb(Geo.point(-160.0 + i * 1.1 % 320, -55.0 + i * 0.7 % 110)))
    }.toDF(Tables.FeaturesIndex, Tables.Geometry)

    val level = IntersectionJoiner.suggestLevel(regions)
    val auto = IntersectionJoiner.auto(pointFeatures = true)
      .transform(regions, features)
    val fixed = new IntersectionJoiner(cellLevel = level, pointFeatures = true)
      .transform(regions, features)
    assert(auto.exceptAll(fixed).count() === 0)
    assert(fixed.exceptAll(auto).count() === 0)

    // brute-force truth on the tiny fixture
    val truth = regions.crossJoin(
        features.select(col(Tables.FeaturesIndex),
          col(Tables.Geometry).as("fg")))
      .where(Gf.stIntersects(col(Tables.Geometry), col("fg")))
      .select(Tables.RegionsIndex, Tables.FeaturesIndex)
    assert(auto.exceptAll(truth).count() === 0)
    assert(truth.exceptAll(auto).count() === 0)
  }

  test("the explode-vs-refine tradeoff the suggested level balances") {
    val regions = boxes(32, 2.0)
    def avgCover(level: Int): Double = regions
      .select(size(Gf.s2Cover(col(Tables.Geometry), level)).as("k"))
      .agg(avg("k")).collect()(0).getDouble(0)
    val level = IntersectionJoiner.suggestLevel(regions) // targetCells = 4
    val atSuggested = avgCover(level)
    // suggested level: a handful of cells per region (the exploded build
    // side stays ~linear in the region count)
    assert(atSuggested >= 2.0 && atSuggested <= 10.0,
      s"suggested level $level covers $atSuggested cells/region")
    // three levels finer: the same regions explode ~quadratically (4× per
    // level on area) — this is the build-side blowup auto mode avoids
    assert(avgCover(level + 3) > atSuggested * 20,
      s"finer level should explode the cover (${avgCover(level + 3)})")
    // three levels coarser: everything collapses toward one shared cell —
    // the all-pairs refine hotspot on the other side of the dial
    assert(avgCover(level - 3) <= 2.0)
  }
}
