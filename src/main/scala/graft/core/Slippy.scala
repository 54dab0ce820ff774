package graft.core

/** OSM slippy-map tile math (public spec: wiki.openstreetmap.org/Slippy_map_tilenames).
  * Reference semantics: srai/regionalizers/slippy_map_regionalizer.py:105-127
  * (forward lat/lng→x/y and inverse), region_id = "{x}_{y}_{z}".
  * Pure closed-form — no data tables. Zoom 0..19 (guard: slippy:35-36).
  */
object Slippy {
  val MinZoom = 0
  val MaxZoom = 19

  def checkZoom(z: Int): Unit =
    require(z >= MinZoom && z <= MaxZoom, s"zoom must be in [$MinZoom, $MaxZoom], got $z")

  /** lng/lat (degrees) → tile x,y at zoom. Mirrors slippy_map_regionalizer.py:105-117. */
  def lngLatToTile(lng: Double, lat: Double, zoom: Int): (Int, Int) = {
    val n = 1 << zoom
    val x = math.floor((lng + 180.0) / 360.0 * n).toInt
    val latRad = math.toRadians(lat)
    val y = math.floor((1.0 - asinh(math.tan(latRad)) / math.Pi) / 2.0 * n).toInt
    (clamp(x, n), clamp(y, n))
  }

  private def clamp(v: Int, n: Int): Int = math.max(0, math.min(n - 1, v))

  private def asinh(v: Double): Double = math.log(v + math.sqrt(v * v + 1.0))

  /** tile x,y → lng/lat of the tile's NW corner (inverse of forward math;
    * slippy_map_regionalizer.py:119-127). */
  def tileToLngLat(x: Int, y: Int, zoom: Int): (Double, Double) = {
    val n = (1 << zoom).toDouble
    val lng = x / n * 360.0 - 180.0
    val lat = math.toDegrees(math.atan(math.sinh(math.Pi * (1.0 - 2.0 * y / n))))
    (lng, lat)
  }

  def tileId(x: Int, y: Int, zoom: Int): String = s"${x}_${y}_${zoom}"

  /** Tile polygon (lon/lat box between NW corner of (x,y) and of (x+1,y+1)). */
  def tileGeometry(x: Int, y: Int, zoom: Int): org.locationtech.jts.geom.Geometry = {
    val (w, nLat) = tileToLngLat(x, y, zoom)
    val (e, sLat) = tileToLngLat(x + 1, y + 1, zoom)
    Geo.box(w, sLat, e, nLat)
  }

  /** All tiles at `zoom` intersecting geometry `g` (JTS, planar — matches the
    * reference's shapely `intersects` skip test slippy:96-103). Emitted as
    * (x, y) pairs; caller refines/ids. Bbox-bounded product like slippy:77-86. */
  def cover(g: org.locationtech.jts.geom.Geometry, zoom: Int): Seq[(Int, Int)] = {
    val env = g.getEnvelopeInternal
    val (x0, y0) = lngLatToTile(env.getMinX, env.getMaxY, zoom) // NW
    val (x1, y1) = lngLatToTile(env.getMaxX, env.getMinY, zoom) // SE
    val prep = org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(g)
    for {
      x <- x0 to x1
      y <- y0 to y1
      if prep.intersects(tileGeometry(x, y, zoom))
    } yield (x, y)
  }
}
