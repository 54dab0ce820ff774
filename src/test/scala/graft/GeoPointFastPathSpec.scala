package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Geo
import graft.functions.GeoOps

/** Round-7 optimization guard: the geometry kernels read simple 2D WKB
  * points directly (21-byte layout) instead of a full JTS parse. The fast
  * path must agree with the JTS route on both byte orders and leave every
  * non-point payload on the general path. */
class GeoPointFastPathSpec extends AnyFunSuite {

  private def bigEndian(wkb: Array[Byte]): Array[Byte] = {
    // JTS writes NDR or XDR depending on writer config; build the XDR twin
    // by re-writing through a big-endian writer
    val g = Geo.fromWkb(wkb)
    new org.locationtech.jts.io.WKBWriter(2,
      org.locationtech.jts.io.ByteOrderValues.BIG_ENDIAN).write(g)
  }

  test("centroid and predicates agree with JTS on point WKB, both byte orders") {
    val pts = Seq((3.25, -1.5), (-179.95, 59.95), (0.0, 0.0), (-0.0, 12.125))
    val rect = Geo.toWkb(Geo.box(-10, -10, 10, 10))
    pts.foreach { case (x, y) =>
      val ndrOrXdr = Geo.toWkb(Geo.point(x, y))
      Seq(ndrOrXdr, bigEndian(ndrOrXdr)).foreach { wkb =>
        assert(GeoOps.centroidX(wkb) === x)
        assert(GeoOps.centroidY(wkb) === y)
        val g = Geo.fromWkb(wkb)
        assert(GeoOps.intersects(rect, wkb) ===
          Geo.fromWkb(rect).intersects(g))
        assert(GeoOps.contains(rect, wkb) === Geo.fromWkb(rect).contains(g))
        assert(GeoOps.within(wkb, rect) === g.within(Geo.fromWkb(rect)))
        assert(GeoOps.containsCentroid(rect, wkb) ===
          Geo.fromWkb(rect).contains(g.getCentroid))
      }
    }
  }

  test("non-point WKB still routes through JTS") {
    val boxA = Geo.toWkb(Geo.box(0, 0, 4, 4))
    val boxB = Geo.toWkb(Geo.box(2, 2, 6, 6))
    assert(GeoOps.centroidX(boxA) === 2.0)
    assert(GeoOps.centroidY(boxA) === 2.0)
    assert(GeoOps.intersects(boxA, boxB))
    assert(!GeoOps.contains(boxA, boxB))
    // a 21-byte payload that is NOT a point type must not be misread
    val line = Geo.toWkb(Geo.fromWkt("LINESTRING (0 0, 2 2)"))
    assert(GeoOps.centroidX(line) === Geo.fromWkb(line).getCentroid.getX)
  }

  test("POINT EMPTY (21-byte NaN WKB) keeps the loud JTS behavior") {
    // JTS serializes the empty point as a NaN-ordinate point, which is the
    // same 21-byte layout the fast path matches on — the NaN guard must
    // route it back to JTS so the former loud failure does not become a
    // silent NaN flowing into cell derivations
    val empty = Geo.toWkb(Geo.fromWkt("POINT EMPTY"))
    assertThrows[Exception](Geo.fromWkb(empty).getCentroid.getX)
    assertThrows[Exception](GeoOps.centroidX(empty))
    assertThrows[Exception](GeoOps.centroidY(empty))
  }
}
