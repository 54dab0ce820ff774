package graft.functions

import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import graft.core.Geo

/** Static executor-side kernels behind the Catalyst expressions. Codegen
  * emits direct static calls into this object, so the hot path stays inside
  * whole-stage codegen with no closure/serialization overhead.
  *
  * WKB parsing dominates predicate cost when one side repeats (the region /
  * broadcast side of the cell join), so prepared geometries are cached in a
  * small per-thread LRU keyed by the WKB bytes.
  */
object GeoOps {

  private final val CacheSize = 2048

  private final class Key(val bytes: Array[Byte]) {
    override val hashCode: Int = java.util.Arrays.hashCode(bytes)
    override def equals(o: Any): Boolean = o match {
      case k: Key => java.util.Arrays.equals(bytes, k.bytes)
      case _ => false
    }
  }

  private val prepCache =
    ThreadLocal.withInitial[java.util.LinkedHashMap[Key, PreparedGeometry]](() =>
      new java.util.LinkedHashMap[Key, PreparedGeometry](256, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Key, PreparedGeometry]): Boolean =
          size() > CacheSize
      })

  /** Prepared geometry for the (typically repeating) left argument. */
  def prepared(wkb: Array[Byte]): PreparedGeometry = {
    val cache = prepCache.get()
    val k = new Key(wkb)
    var p = cache.get(k)
    if (p == null) {
      p = PreparedGeometryFactory.prepare(Geo.fromWkb(wkb))
      cache.put(k, p)
    }
    p
  }

  // ---- predicates (left side cached/prepared) ----
  def intersects(a: Array[Byte], b: Array[Byte]): Boolean =
    prepared(a).intersects(Geo.fromWkb(b))

  def contains(a: Array[Byte], b: Array[Byte]): Boolean =
    prepared(a).contains(Geo.fromWkb(b))

  def within(a: Array[Byte], b: Array[Byte]): Boolean =
    prepared(b).contains(Geo.fromWkb(a))

  def touches(a: Array[Byte], b: Array[Byte]): Boolean =
    prepared(a).touches(Geo.fromWkb(b))

  def containsCentroid(a: Array[Byte], b: Array[Byte]): Boolean =
    prepared(a).contains(Geo.fromWkb(b).getCentroid)

  // ---- constructors / converters ----
  def geomFromText(wkt: String): Array[Byte] = Geo.wktToWkb(wkt)
  def asText(wkb: Array[Byte]): String = Geo.toWkt(Geo.fromWkb(wkb))
  def asTextShapely(wkb: Array[Byte]): String = Geo.toWktShapely(Geo.fromWkb(wkb))
  def makePoint(lng: Double, lat: Double): Array[Byte] = Geo.toWkb(Geo.point(lng, lat))

  /** Axis-aligned box polygon — the footprint hot path (no WKT round-trip). */
  def makeBox(minX: Double, minY: Double, maxX: Double, maxY: Double): Array[Byte] =
    Geo.toWkb(Geo.box(minX, minY, maxX, maxY))

  // ---- scalar geometry ops ----
  def intersection(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Geo.toWkb(Geo.fromWkb(a).intersection(Geo.fromWkb(b)))

  def area(a: Array[Byte]): Double = Geo.fromWkb(a).getArea

  /** Drop interior rings (reference srai/geometry.py:50-64). */
  def removeInteriors(a: Array[Byte]): Array[Byte] =
    Geo.toWkb(Geo.removeInteriors(Geo.fromWkb(a)))

  /** Metric buffer via spherical AEQD round-trip (reference
    * srai/geometry.py:67-94). */
  def bufferMeters(a: Array[Byte], meters: Double): Array[Byte] =
    Geo.toWkb(Geo.bufferMeters(Geo.fromWkb(a), meters))

  def centroidX(a: Array[Byte]): Double = Geo.fromWkb(a).getCentroid.getX
  def centroidY(a: Array[Byte]): Double = Geo.fromWkb(a).getCentroid.getY

  def startPoint(a: Array[Byte]): Array[Byte] = {
    val g = Geo.fromWkb(a)
    Geo.toWkb(Geo.point(g.getCoordinates.head.x, g.getCoordinates.head.y))
  }

  def endPoint(a: Array[Byte]): Array[Byte] = {
    val g = Geo.fromWkb(a)
    Geo.toWkb(Geo.point(g.getCoordinates.last.x, g.getCoordinates.last.y))
  }

  def length(a: Array[Byte]): Double = Geo.fromWkb(a).getLength

  def dump(a: Array[Byte]): Array[Array[Byte]] =
    Geo.dump(Geo.fromWkb(a)).map(Geo.toWkb).toArray

  def envelope(a: Array[Byte]): Array[Double] = {
    val e = Geo.fromWkb(a).getEnvelopeInternal
    Array(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
  }
}
