package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import graft.core.{S2, Slippy, Geo}

/** Catalyst-typed kernels: same static-call pattern as [[GeoOps]] but
  * returning Catalyst container types (ArrayData / UTF8String) so generated
  * code can call them directly without row conversion. */
object CatalystHelpers {

  def dump(wkb: Array[Byte]): ArrayData =
    new GenericArrayData(GeoOps.dump(wkb).asInstanceOf[Array[Any]])

  // ---- S2 ----
  def s2Cell(lng: Double, lat: Double, level: Int): Long =
    S2.lngLatToCell(lng, lat, level)

  def s2Token(id: Long): UTF8String = UTF8String.fromString(S2.toToken(id))

  def s2FromToken(token: UTF8String): Long = S2.fromToken(token.toString)

  def s2Children(id: Long, level: Int): ArrayData =
    ArrayData.toArrayData(S2.childrenAtLevel(id, level))

  def s2Cover(wkb: Array[Byte], level: Int): ArrayData =
    ArrayData.toArrayData(S2.cover(Geo.fromWkb(wkb), level).toArray)

  def s2Boundary(id: Long): Array[Byte] = Geo.toWkb(S2.cellGeometry(id))

  def s2Level(id: Long): Int = S2.level(id)

  def s2Parent(id: Long, level: Int): Long = S2.parent(id, level)

  // ---- slippy ----
  def slippyCover(wkb: Array[Byte], zoom: Int): ArrayData = {
    val tiles = Slippy.cover(Geo.fromWkb(wkb), zoom)
    new GenericArrayData(tiles.map { case (x, y) =>
      org.apache.spark.sql.catalyst.InternalRow(x, y)
    }.toArray[Any])
  }

  def slippyBoundary(x: Int, y: Int, zoom: Int): Array[Byte] =
    Geo.toWkb(Slippy.tileGeometry(x, y, zoom))
}
