package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Geo
import graft.operators._

class H3SparkSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  def areas(g: org.locationtech.jts.geom.Geometry*) =
    g.map(Geo.toWkb).toDF(Tables.Geometry)

  test("H3Regionalizer buffer=true matches reference fixture (7 cells)") {
    val out = new H3Regionalizer(3).transform(areas(Fixtures.p1, Fixtures.p2))
    assert(out.select(Tables.RegionsIndex).as[String].collect().toSet === Set(
      "837559fffffffff", "83754efffffffff", "83754cfffffffff", "837541fffffffff",
      "83755dfffffffff", "837543fffffffff", "83754afffffffff"))
  }

  test("H3Regionalizer buffer=false matches reference fixture (1 cell)") {
    val out = new H3Regionalizer(3, buffer = false)
      .transform(areas(Fixtures.multi))
    assert(out.select(Tables.RegionsIndex).as[String].collect().toSet ===
      Set("83754efffffffff"))
  }

  test("resolution guards (-1, 16) like the reference") {
    intercept[IllegalArgumentException](new H3Regionalizer(-1))
    intercept[IllegalArgumentException](new H3Regionalizer(16))
  }

  test("H3 neighbourhood availability filter (5-of-6 fixture)") {
    // tests/neighbourhoods/h3/test_with_regions.py: regions = center + 5 of
    // its 6 neighbours; get_neighbours returns exactly the 5 available.
    val regions = Seq("811e3ffffffffff", "811f3ffffffffff", "811fbffffffffff",
      "811ebffffffffff", "811efffffffffff", "811e7ffffffffff")
      .toDF(Tables.RegionsIndex)
    val closure = Neighbourhoods.h3Closure(regions, 1)
    val got = closure.where(col("region_id") === "811e3ffffffffff")
      .select("neighbour_id").as[String].collect().toSet
    assert(got === Set("811f3ffffffffff", "811fbffffffffff", "811ebffffffffff",
      "811efffffffffff", "811e7ffffffffff"))
    // unchecked: the 6th (missing) neighbour appears too
    val unchecked = Neighbourhoods.h3Closure(regions, 1, unchecked = true)
      .where(col("region_id") === "811e3ffffffffff")
    assert(unchecked.count() === 6)
  }

  test("h3 closure distances match the two-ring fixture") {
    val regions = Seq("862bac507ffffff").toDF(Tables.RegionsIndex)
    val c = Neighbourhoods.h3Closure(regions, 2, unchecked = true)
    val byDist = c.collect().groupBy(_.getInt(2)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    assert(byDist(1) === Set("862bac50fffffff", "862bac517ffffff", "862bac51fffffff",
      "862bac527ffffff", "862bac52fffffff", "862bac537ffffff"))
    assert(byDist(2).size === 12)
    assert(byDist(2).contains("862ba124fffffff"))
  }

  test("ring buffer = disk union dedup (srai/h3.py:209-226)") {
    val regions = Seq("862bac507ffffff", "862bac50fffffff").toDF(Tables.RegionsIndex)
    val buffered = Neighbourhoods.h3RingBuffer(regions, 1)
    // union of two adjacent disks(1): 7 + 7 - 3 shared (the two centers are
    // in each other's disk, plus 2 common neighbours)
    val ids = buffered.select(Tables.RegionsIndex).as[String].collect().toSet
    assert(ids.contains("862bac507ffffff") && ids.contains("862bac50fffffff"))
    assert(ids.size > 7 && ids.size < 14)
  }

  test("ContextualCountEmbedder over an H3 k-ring closure") {
    val cells = Seq("862bac507ffffff", "862bac50fffffff", "862bac517ffffff")
      .toDF(Tables.RegionsIndex)
    val emb = Seq(("862bac507ffffff", 10), ("862bac50fffffff", 20),
      ("862bac517ffffff", 40)).toDF(Tables.RegionsIndex, "cnt")
    val closure = Neighbourhoods.h3Closure(cells, 1)
    val out = new ContextualCountEmbedder(closure, 1).transform(emb)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // 507's neighbours among available: 50f and 517 (both adjacent to it)
    assert(math.abs(out("862bac507ffffff") - (10 + 30.0 / 4)) < 1e-9)
  }
}

class HexTensorSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._
  import graft.operators.{Tables, Tiling}

  test("hex tensor: complete k-ring anchors only, target at [k,k], neighbours at [k+i,k-j]") {
    val center = "862bac507ffffff"
    val disk2 = graft.core.H3.gridDisk(graft.core.H3.fromHexString(center), 2)
      .map(graft.core.H3.toHexString)
    val cells = disk2.toDF(Tables.RegionsIndex)
    val values = disk2.zipWithIndex.map { case (id, i) => (id, (i + 1) * 10) }
      .toDF(Tables.RegionsIndex, "cnt")
    val out = Tiling.hexTensor(cells, values, 1, "cnt").cache()
    // only the center has a complete 1-ring WITH values inside disk2... all
    // disk1 members of the center do too; anchors on the rim lack neighbours
    val anchors = out.select(Tables.RegionsIndex).as[String].collect().toSet
    assert(anchors.contains(center))
    assert(anchors.forall(a => graft.core.H3.gridDisk(
      graft.core.H3.fromHexString(a), 1).map(graft.core.H3.toHexString)
      .forall(disk2.contains)))
    // grid shape (2k+2)^2 = 4x4; target value at [1,1]
    val row = out.where(col(Tables.RegionsIndex) === center).collect()(0)
    val rows = row.getSeq[scala.collection.Seq[Double]](1)
    assert(rows.length === 4 && rows.forall(_.length === 4))
    assert(rows(1)(1) === 10.0) // center has cnt 10 (first in disk order)
    // exactly 7 non-zero entries (center + 6 ring-1)
    assert(rows.flatten.count(_ != 0.0) === 7)
  }
}
