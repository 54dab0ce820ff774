package graft

import graft.core.{Geo, H3}

/** H3 smoke drive: `sbt "Test/runMain graft.H3Drive"`. */
object H3Drive {
  def main(args: Array[String]): Unit = {
    // 1. round-trips at random points/res
    val rnd = new scala.util.Random(11L)
    var ok = 0; var bad = 0
    for (_ <- 1 to 3000) {
      val lat = rnd.nextDouble() * 160 - 80
      val lng = rnd.nextDouble() * 360 - 180
      val res = rnd.nextInt(10)
      val h = H3.latLngToCell(lat, lng, res)
      val (clat, clng) = H3.cellToLatLng(h)
      val h2 = H3.latLngToCell(clat, clng, res)
      if (h == h2) ok += 1 else {
        bad += 1
        if (bad <= 5) println(f"RT FAIL res=$res ($lat%.4f,$lng%.4f) h=${H3.toHexString(h)} center=($clat%.4f,$clng%.4f) h2=${H3.toHexString(h2)}")
      }
    }
    println(s"roundtrip ok=$ok bad=$bad")
    // 2. known fixture: res 3 cell containing (0.5, 0.0)-ish should be 83754efffffffff family
    for ((lat, lng) <- Seq((0.7, 0.0), (0.3, -0.5), (51.11, 17.03))) {
      val h = H3.latLngToCell(lat, lng, 3)
      println(f"cell@($lat,$lng) res3 = ${H3.toHexString(h)}")
    }
    // known srai fixture ids at res 9 near Wroclaw 51.11, 17.03
    println("res9 @ (51.1100645, 17.0290)= " + H3.toHexString(H3.latLngToCell(51.1106, 17.0297, 9)))
    // 3. parent/children coherence
    val h = H3.latLngToCell(51.11, 17.03, 9)
    val kids = H3.children(h, 10)
    println(s"children count=${kids.size} parentsOk=${kids.forall(k => H3.parent(k, 9) == h)}")
    // 4. neighbors/ring sizes mid-face
    val n = H3.neighbors(h)
    println(s"neighbors=${n.size} ring1=${H3.gridRing(h, 1).size} disk2=${H3.gridDisk(h, 2).size}")
    // 5. boundary sanity: vertices within ~2 cell radii of center
    val b = H3.cellBoundary(h)
    println(s"boundary verts=${b.length}")
    // 6. pentagon: base cell 4 res 0 = north pentagon
    val pent0 = (0 until 122).filter(H3.isPentagon)
    println(s"pentagons: ${pent0.mkString(",")}")
  }
}
