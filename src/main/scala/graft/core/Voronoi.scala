package graft.core

import org.locationtech.jts.geom.Geometry

/** Spherical Voronoi (Thiessen) regions from scratch (reference:
  * srai/regionalizers/voronoi_regionalizer.py + _spherical_voronoi.py —
  * scipy SphericalVoronoi with slerp-densified edges).
  *
  * Construction here: per-seed gnomonic half-plane clipping. The bisector of
  * seeds i,j on the sphere is the great circle { p : p·(ci−cj) = 0 }; in the
  * gnomonic projection centered at ci every great circle maps to a straight
  * LINE, so cell_i is an exact half-plane intersection (Sutherland–Hodgman),
  * and interpolating along the clipped polygon's edges in the gnomonic plane
  * densifies along the true spherical edge (no slerp needed).
  *
  * Valid for cells within the open hemisphere around their seed — guaranteed
  * for ≥4 non-degenerate seeds like the reference requires
  * (voronoi_regionalizer.py:87-97 validations mirrored). Cells crossing the
  * antimeridian carry the same planar lon/lat caveat as the rest of the
  * engine.
  */
object Voronoi {

  private type V3 = (Double, Double, Double)

  private def unit(lng: Double, lat: Double): V3 = {
    val la = math.toRadians(lat); val lo = math.toRadians(lng)
    (math.cos(lo) * math.cos(la), math.sin(lo) * math.cos(la), math.sin(la))
  }

  private def cross(a: V3, b: V3): V3 =
    (a._2 * b._3 - a._3 * b._2, a._3 * b._1 - a._1 * b._3, a._1 * b._2 - a._2 * b._1)

  private def dot(a: V3, b: V3): Double = a._1 * b._1 + a._2 * b._2 + a._3 * b._3

  private def norm(a: V3): V3 = {
    val n = math.sqrt(dot(a, a)); (a._1 / n, a._2 / n, a._3 / n)
  }

  /** Voronoi cell polygons, one per seed (lng, lat degrees), same order.
    *
    * Each cell is bounded to `maxRadiusDeg` angular radius around its seed
    * (the reference clips to an input mask — voronoi_regionalizer.py:185-186;
    * an unbounded outer cell cannot be represented as a valid planar lon/lat
    * polygon anyway). Keep seed sets ≳ maxRadius away from the poles and the
    * antimeridian, the engine's general planar-WKB caveat. */
  def cells(seeds: Seq[(Double, Double)], densifyPerEdge: Int = 24,
            maxRadiusDeg: Double = 25.0): Seq[Geometry] = {
    require(seeds.size >= 4,
      "Voronoi requires at least 4 seeds (reference ValueError)")
    require(seeds.distinct.size == seeds.size,
      "duplicate seed points (reference ValueError)")
    seeds.foreach { case (lng, lat) =>
      require(lng >= -180 && lng <= 180 && lat >= -90 && lat <= 90,
        s"seed out of WGS84 bounds: ($lng, $lat)")
    }
    val cs = seeds.map { case (lng, lat) => unit(lng, lat) }
    cs.zipWithIndex.map { case (ci, i) =>
      // gnomonic basis at the seed
      val ref: V3 = if (math.abs(ci._3) < 0.9) (0.0, 0.0, 1.0) else (1.0, 0.0, 0.0)
      val e1 = norm(cross(ref, ci))
      val e2 = cross(ci, e1)
      // start with a regular 16-gon of gnomonic radius tan(maxRadius) —
      // the bounded mask around the seed — and clip per bisector
      val L = math.tan(math.toRadians(maxRadiusDeg))
      var poly: Vector[(Double, Double)] = (0 until 16).map { s =>
        val a = 2 * math.Pi * s / 16
        (L * math.cos(a), L * math.sin(a))
      }.toVector
      for ((cj, j) <- cs.zipWithIndex if j != i && poly.nonEmpty) {
        val d = (ci._1 - cj._1, ci._2 - cj._2, ci._3 - cj._3)
        val a = dot(e1, d); val b = dot(e2, d); val c = dot(ci, d)
        // keep a*u + b*v + c >= 0 (Sutherland–Hodgman)
        val out = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
        val n = poly.length
        for (k <- 0 until n) {
          val p = poly(k); val q = poly((k + 1) % n)
          val fp = a * p._1 + b * p._2 + c
          val fq = a * q._1 + b * q._2 + c
          if (fp >= 0) out += p
          if ((fp >= 0) != (fq >= 0)) {
            val t = fp / (fp - fq)
            out += ((p._1 + t * (q._1 - p._1), p._2 + t * (q._2 - p._2)))
          }
        }
        poly = out.toVector
      }
      // densify along edges (straight in gnomonic == great-circle arcs),
      // then inverse-project
      val dense = poly.indices.flatMap { k =>
        val p = poly(k); val q = poly((k + 1) % poly.length)
        (0 until densifyPerEdge).map { s =>
          val t = s.toDouble / densifyPerEdge
          (p._1 + t * (q._1 - p._1), p._2 + t * (q._2 - p._2))
        }
      }
      val ring = dense.map { case (u, v) =>
        val p = norm((ci._1 + u * e1._1 + v * e2._1,
          ci._2 + u * e1._2 + v * e2._2,
          ci._3 + u * e1._3 + v * e2._3))
        val lat = math.toDegrees(math.asin(math.max(-1, math.min(1, p._3))))
        val lng = math.toDegrees(math.atan2(p._2, p._1))
        (lng, lat)
      }
      Geo.polygon(ring)
    }
  }
}
