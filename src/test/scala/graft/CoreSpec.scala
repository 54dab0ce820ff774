package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Geo, S2, Slippy}

/** Fixture polygons copied from the reference's deterministic unit tests
  * (tests/regionalizers/conftest.py:35-96) — see FIXTURES.md. */
object Fixtures {
  // P1 has a hole; coordinates are (lng, lat).
  val p1: org.locationtech.jts.geom.Geometry = Geo.fromWkt(
    "POLYGON ((-1 0, 0 0.5, 1 0, 1 1, 0 1, -1 0), (0.8 0.9, 0.9 0.55, 0.8 0.3, 0.5 0.4, 0.8 0.9))")
  val p2: org.locationtech.jts.geom.Geometry = Geo.fromWkt(
    "POLYGON ((-0.25 0, 0.25 0, 0 0.2, -0.25 0))")
  val multi: org.locationtech.jts.geom.Geometry = Geo.fromWkt(
    "MULTIPOLYGON (((-1 0, 0 0.5, 1 0, 1 1, 0 1, -1 0), (0.8 0.9, 0.9 0.55, 0.8 0.3, 0.5 0.4, 0.8 0.9)), ((-0.25 0, 0.25 0, 0 0.2, -0.25 0)))")

  // tests/regionalizers/test_s2_regionalizer.py:19-34 (level 7, buffer=True)
  val expectedS2Tokens: Set[String] = Set(
    "0555c", "0ffe4", "0fff4", "0fffc", "10004", "1000c", "10014", "1001c",
    "1aaa4", "05554", "1aaac")

  // tests/regionalizers/test_slippy_map_regionalizer.py:16-48 (zoom 11)
  val slippyPolygon: org.locationtech.jts.geom.Geometry = Geo.polygon(Seq(
    (16.8073393, 51.1389477), (17.0278673, 51.0426754),
    (17.1762192, 51.1063195), (16.9580276, 51.2093551)))
  val expectedTiles: Set[(Int, Int)] = Set(
    (1120, 683), (1119, 684), (1120, 684), (1121, 684), (1120, 685), (1121, 685))

  /** Deterministic sample points for property-style sweeps (no scalacheck
    * bridge in the offline cache — seeded Random instead). */
  def randomPoints(n: Int, seed: Long = 42L,
                   latAbs: Double = 85.0): Seq[(Double, Double)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((rnd.nextDouble() * 360 - 180, (rnd.nextDouble() * 2 - 1) * latAbs))
  }
}

class SlippySpec extends AnyFunSuite {
  test("forward math matches reference: (lat 51, lon 16.8, zoom 10) -> (559, 342)") {
    assert(Slippy.lngLatToTile(16.8, 51.0, 10) === ((559, 342)))
  }

  test("cover matches reference fixture: exactly 6 tiles at zoom 11") {
    val tiles = Slippy.cover(Fixtures.slippyPolygon, 11).toSet
    assert(tiles === Fixtures.expectedTiles)
  }

  test("x/y -> latlng -> x/y identity (test_slippy_map_regionalizer.py:80-93)") {
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 500) {
      val z = rnd.nextInt(20)
      val n = 1 << z
      val x = rnd.nextInt(n); val y = rnd.nextInt(n)
      val (lng, lat) = Slippy.tileToLngLat(x, y, z)
      // NW corner belongs to the tile itself
      assert(Slippy.lngLatToTile(lng + 1e-12, lat - 1e-12, z) === ((x, y)))
    }
  }

  test("zoom guard") {
    intercept[IllegalArgumentException](Slippy.checkZoom(-1))
    intercept[IllegalArgumentException](Slippy.checkZoom(20))
    Slippy.checkZoom(0); Slippy.checkZoom(19)
  }
}

class S2Spec extends AnyFunSuite {
  test("cover at level 7 matches reference fixture (11 tokens)") {
    val cells = (S2.cover(Fixtures.p1, 7) ++ S2.cover(Fixtures.p2, 7)).distinct
    assert(cells.map(S2.toToken).toSet === Fixtures.expectedS2Tokens)
  }

  test("multipolygon gives identical cover (explode semantics)") {
    val cells = Geo.dump(Fixtures.multi).flatMap(S2.cover(_, 7)).distinct
    assert(cells.map(S2.toToken).toSet === Fixtures.expectedS2Tokens)
  }

  test("token round-trip + level") {
    val rnd = new scala.util.Random(1L)
    for ((lng, lat) <- Fixtures.randomPoints(500)) {
      val lvl = rnd.nextInt(31)
      val c = S2.lngLatToCell(lng, lat, lvl)
      assert(S2.fromToken(S2.toToken(c)) === c)
      assert(S2.level(c) === lvl)
    }
  }

  test("cell contains its center; children round-trip to parent") {
    val rnd = new scala.util.Random(2L)
    for ((lng, lat) <- Fixtures.randomPoints(300)) {
      val lvl = 2 + rnd.nextInt(19)
      val c = S2.lngLatToCell(lng, lat, lvl)
      val (clng, clat) = S2.cellCenterLngLat(c)
      assert(S2.lngLatToCell(clng, clat, lvl) === c)
      S2.children(c).foreach { ch =>
        assert(S2.parent(ch, lvl) === c)
        val (xlng, xlat) = S2.cellCenterLngLat(ch)
        assert(S2.lngLatToCell(xlng, xlat, lvl) === c)
      }
    }
  }

  test("childrenAtLevel count and parentage") {
    val c = S2.lngLatToCell(17.0, 51.1, 8)
    val kids = S2.childrenAtLevel(c, 11)
    assert(kids.length === 64)
    assert(kids.forall(k => S2.parent(k, 8) === c))
    assert(kids.distinct.length === 64)
  }

  test("edge neighbors are symmetric and distinct") {
    val rnd = new scala.util.Random(3L)
    for ((lng, lat) <- Fixtures.randomPoints(200, latAbs = 84.0)) {
      val lvl = 1 + rnd.nextInt(20)
      val c = S2.lngLatToCell(lng, lat, lvl)
      val ns = S2.edgeNeighbors(c)
      assert(ns.distinct.length === 4)
      ns.foreach { n =>
        assert(S2.level(n) === lvl)
        assert(S2.edgeNeighbors(n).contains(c))
      }
    }
  }

  test("level guard") {
    intercept[IllegalArgumentException](S2.cover(Fixtures.p2, -1))
    intercept[IllegalArgumentException](S2.cover(Fixtures.p2, 31))
  }
}

class GeoBufferSpec extends AnyFunSuite {
  test("metric buffer: ring vertices sit `meters` away, original contained") {
    val p = Geo.point(17.03, 51.11)
    val buf = Geo.bufferMeters(p, 1000.0)
    assert(buf.contains(p))
    def haversineM(lng1: Double, lat1: Double, lng2: Double, lat2: Double): Double = {
      val R = 6371008.8
      val dLat = math.toRadians(lat2 - lat1); val dLng = math.toRadians(lng2 - lng1)
      val a = math.pow(math.sin(dLat / 2), 2) +
        math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
          math.pow(math.sin(dLng / 2), 2)
      2 * R * math.asin(math.sqrt(a))
    }
    buf.getCoordinates.foreach { c =>
      val d = haversineM(17.03, 51.11, c.x, c.y)
      assert(math.abs(d - 1000.0) < 5.0, s"vertex at $d m")
    }
    // polygon buffer contains the original polygon
    val poly = Fixtures.slippyPolygon
    val pbuf = Geo.bufferMeters(poly, 500.0)
    assert(pbuf.contains(poly))
    assert(pbuf.getArea > poly.getArea)
  }
}
