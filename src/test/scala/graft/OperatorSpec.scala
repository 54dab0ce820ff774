package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Geo
import graft.operators._

object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
}

/** Joiner fixture — tests/joiners/conftest.py:24-59 (see FIXTURES.md §3). */
object JoinerFixture {
  val regionWkts: Seq[(String, String)] = Seq(
    "0" -> "POLYGON((-1 0, -1 -1, 0 -1, 0 0, -1 0))",
    "1" -> "POLYGON((1 0, 1 1, 0 1, 0 0, 1 0))",
    "2" -> "POLYGON((-2 -1, -2 -2, -1 -2, -1 -1, -2 -1))",
    "3" -> "POLYGON((-2 0.5, -2 -0.5, -1 -0.5, -1 0.5, -2 0.5))")
  val featureWkts: Seq[(String, String)] = Seq(
    "0" -> "POLYGON((-1.5 0.5, -1.5 0, -0.5 0, -0.5 0.5, -1.5 0.5))",
    "1" -> "POLYGON((-1.5 -1.5, -1.5 -2.5, -0.5 -2.5, -0.5 -1.5, -1.5 -1.5))",
    "2" -> "POINT(0 0)",
    "3" -> "POINT(-0.5 -0.5)")
  // tests/joiners/test_intersection_joiner.py:47-71 (order-insensitive)
  val expectedPairs: Set[(String, String)] =
    Set("0" -> "2", "0" -> "3", "1" -> "2", "0" -> "0", "3" -> "0", "2" -> "1")
}

class IntersectionJoinerSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  def regions: DataFrame = JoinerFixture.regionWkts
    .map { case (id, wkt) => (id, Geo.wktToWkb(wkt)) }
    .toDF(Tables.RegionsIndex, Tables.Geometry)
  def features: DataFrame = JoinerFixture.featureWkts
    .map { case (id, wkt) => (id, Geo.wktToWkb(wkt)) }
    .toDF(Tables.FeaturesIndex, Tables.Geometry)

  test("matches reference pair set exactly (return_geom=false, zero payload cols)") {
    val joint = new IntersectionJoiner(cellLevel = 8).transform(regions, features)
    assert(joint.columns.toSeq === Seq(Tables.RegionsIndex, Tables.FeaturesIndex))
    val got = joint.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === JoinerFixture.expectedPairs)
  }

  test("same pairs with intersection geometry (return_geom=true)") {
    val joint = new IntersectionJoiner(cellLevel = 8)
      .transform(regions, features, returnGeom = true)
    val rows = joint.collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet === JoinerFixture.expectedPairs)
    // corner-touch point (0,0): intersection with region 0 is the point itself
    val inter = rows.find(r => r.getString(0) == "0" && r.getString(1) == "2").get
    assert(Geo.toWkt(Geo.fromWkb(inter.getAs[Array[Byte]](Tables.Geometry))) === "POINT (0 0)")
  }

  test("salting produces identical pairs") {
    val joint = new IntersectionJoiner(cellLevel = 8, salt = 4).transform(regions, features)
    val got = joint.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === JoinerFixture.expectedPairs)
  }

  test("broadcast region side produces identical pairs") {
    val joint = new IntersectionJoiner(cellLevel = 8, broadcastRegions = Some(true))
      .transform(regions, features)
    val got = joint.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === JoinerFixture.expectedPairs)
  }

  test("strict mode: empty input raises eagerly (intersection_joiner.py:43-51)") {
    intercept[IllegalArgumentException] {
      new IntersectionJoiner(strict = true).transform(regions.limit(0), features)
    }
    intercept[IllegalArgumentException] {
      new IntersectionJoiner(strict = true).transform(regions, features.limit(0))
    }
    // default mode: no eager jobs; empty input → empty (correct) join
    assert(new IntersectionJoiner().transform(regions.limit(0), features).count() === 0)
  }

  test("default transform schedules no validation pre-jobs (VERDICT r2 #6)") {
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    new IntersectionJoiner(cellLevel = 8).transform(regions, features) // plan only
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after === before, s"transform ran ${after - before} eager job(s)")
  }
}

class RegionalizerSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  def areas(g: org.locationtech.jts.geom.Geometry*): DataFrame =
    g.map(Geo.toWkb).toDF(Tables.Geometry)

  test("S2 regionalizer matches reference fixture (level 7, buffer=true)") {
    val out = new S2Regionalizer(7).transform(areas(Fixtures.p1, Fixtures.p2))
    val ids = out.select(Tables.RegionsIndex).as[String].collect().toSet
    assert(ids === Fixtures.expectedS2Tokens)
  }

  test("S2 regionalizer on multipolygon gives identical result (explode)") {
    val out = new S2Regionalizer(7).transform(areas(Fixtures.multi))
    val ids = out.select(Tables.RegionsIndex).as[String].collect().toSet
    assert(ids === Fixtures.expectedS2Tokens)
  }

  test("S2 buffer=false keeps only contained cells (subset)") {
    val all = new S2Regionalizer(10, buffer = true).transform(areas(Fixtures.p1))
      .select(Tables.RegionsIndex).as[String].collect().toSet
    val within = new S2Regionalizer(10, buffer = false).transform(areas(Fixtures.p1))
      .select(Tables.RegionsIndex).as[String].collect().toSet
    assert(within.subsetOf(all))
    assert(within.nonEmpty && within.size < all.size)
  }

  test("slippy regionalizer matches reference fixture (zoom 11, 6 tiles + xyz cols)") {
    val out = new SlippyMapRegionalizer(11).transform(areas(Fixtures.slippyPolygon))
    assert(out.columns.toSeq ===
      Seq(Tables.RegionsIndex, "x", "y", "z", Tables.Geometry))
    val rows = out.collect()
    val ids = rows.map(_.getString(0)).toSet
    assert(ids === Fixtures.expectedTiles.map { case (x, y) => s"${x}_${y}_11" })
    assert(rows.forall(_.getInt(3) == 11))
  }

  test("resolution guards + strict-mode empty input") {
    intercept[IllegalArgumentException](new S2Regionalizer(-1))
    intercept[IllegalArgumentException](new S2Regionalizer(31))
    intercept[IllegalArgumentException](new SlippyMapRegionalizer(20))
    intercept[IllegalArgumentException](
      new S2Regionalizer(7) { override protected def strictValidation = true }
        .transform(areas(Fixtures.p1).limit(0)))
    // default: metadata-only validation, empty in → empty out
    assert(new S2Regionalizer(7).transform(areas(Fixtures.p1).limit(0)).count() === 0)
  }
}

/** CountEmbedder fixtures — tests/embedders/conftest.py:132-335 and
  * tests/embedders/test_count_embedder.py:22-115. Region/feature ids are
  * opaque strings; geometry is irrelevant to the count semantics. */
class CountEmbedderSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  val regionIds = Seq("891e2040897ffff", "891e2040d4bffff", "891e2040d5bffff")
  def regions: DataFrame = regionIds.toDF(Tables.RegionsIndex)
  def features: DataFrame = Seq(
    ("way/312457804", Some("playground"), None: Option[String]),
    ("way/1533817161", None, Some("pub")),
    ("way/312457812", Some("adult_gaming_centre"), Some("pub")),
    ("way/312457834", None, None))
    .toDF(Tables.FeaturesIndex, "leisure", "amenity")
  def featuresBoolean: DataFrame = Seq(
    ("way/312457804", true, false),
    ("way/1533817161", false, true),
    ("way/312457812", true, true),
    ("way/312457834", false, false))
    .toDF(Tables.FeaturesIndex, "leisure", "amenity")
  def joint: DataFrame = Seq(
    ("891e2040d4bffff", "way/312457804"),
    ("891e2040897ffff", "way/1533817161"),
    ("891e2040897ffff", "way/312457834"),
    ("891e2040d5bffff", "way/312457812"))
    .toDF(Tables.RegionsIndex, Tables.FeaturesIndex)

  private def asMap(df: DataFrame): Map[String, Seq[Int]] = {
    val cols = df.columns.drop(1)
    val byId = df.collect().map(r => r.getString(0) -> r).toMap
    cols.zipWithIndex.map { case (c, i) =>
      c -> regionIds.map(id => byId(id).getInt(i + 1))
    }.toMap
  }

  test("top-level counts (expected_embedding_df)") {
    val out = new CountEmbedder().transform(regions, features, joint)
    assert(out.columns.toSeq === Seq(Tables.RegionsIndex, "amenity", "leisure"))
    assert(asMap(out) === Map("leisure" -> Seq(0, 1, 1), "amenity" -> Seq(1, 0, 1)))
  }

  test("boolean features count like ints") {
    val out = new CountEmbedder().transform(regions, featuresBoolean, joint)
    assert(asMap(out) === Map("leisure" -> Seq(0, 1, 1), "amenity" -> Seq(1, 0, 1)))
  }

  test("subcategories one-hot (expected_subcategories_embedding_df)") {
    val out = new CountEmbedder(countSubcategories = true)
      .transform(regions, features, joint)
    assert(asMap(out) === Map(
      "leisure_adult_gaming_centre" -> Seq(0, 0, 1),
      "leisure_playground" -> Seq(0, 1, 0),
      "amenity_pub" -> Seq(1, 0, 1)))
  }

  test("boolean + subcategories raises (count_embedder.py:104-106)") {
    intercept[IllegalArgumentException] {
      new CountEmbedder(countSubcategories = true)
        .transform(regions, featuresBoolean, joint)
    }
  }

  test("expected features: missing as zeros, order preserved, extras dropped") {
    val expected = Seq("amenity_parking", "leisure_park", "amenity_pub")
    val out = new CountEmbedder(expected, countSubcategories = true)
      .transform(regions, features, joint)
    assert(out.columns.toSeq === Tables.RegionsIndex +: expected)
    assert(asMap(out) === Map(
      "amenity_parking" -> Seq(0, 0, 0),
      "leisure_park" -> Seq(0, 0, 0),
      "amenity_pub" -> Seq(1, 0, 1)))
  }

  test("expected features top-level: all zeros (specified_features_expected_embedding_df)") {
    val expected = Seq("amenity_parking", "leisure_park", "amenity_pub")
    val out = new CountEmbedder(expected).transform(regions, features, joint)
    assert(asMap(out) === Map(
      "amenity_parking" -> Seq(0, 0, 0),
      "leisure_park" -> Seq(0, 0, 0),
      "amenity_pub" -> Seq(0, 0, 0)))
  }
}

class SuggestLevelSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("suggestLevel scales inversely with region size and joins correctly") {
    val big = graft.sources.DerivedGeo.rectRegions(spark, "/root/testdata/sf0.001")
    val lvlBig = IntersectionJoiner.suggestLevel(big)
    assert(lvlBig >= 1 && lvlBig <= 6, s"big-region level $lvlBig")
    import spark.implicits._
    val tiny = Seq(("a", Geo.toWkb(Geo.box(17.00, 51.00, 17.01, 51.01))))
      .toDF(Tables.RegionsIndex, Tables.Geometry)
    val lvlTiny = IntersectionJoiner.suggestLevel(tiny)
    assert(lvlTiny > lvlBig + 4, s"tiny-region level $lvlTiny vs $lvlBig")
    // the suggested level reproduces the fixture pair set
    val joint = new IntersectionJoiner(
      cellLevel = IntersectionJoiner.suggestLevel(
        JoinerFixture.regionWkts.map { case (id, wkt) => (id, Geo.wktToWkb(wkt)) }
          .toDF(Tables.RegionsIndex, Tables.Geometry)))
      .transform(
        JoinerFixture.regionWkts.map { case (id, wkt) => (id, Geo.wktToWkb(wkt)) }
          .toDF(Tables.RegionsIndex, Tables.Geometry),
        JoinerFixture.featureWkts.map { case (id, wkt) => (id, Geo.wktToWkb(wkt)) }
          .toDF(Tables.FeaturesIndex, Tables.Geometry))
    assert(joint.collect().map(r => (r.getString(0), r.getString(1))).toSet ===
      JoinerFixture.expectedPairs)
  }
}
