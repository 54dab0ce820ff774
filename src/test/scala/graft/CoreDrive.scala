package graft

import graft.core.{Geo, S2, Slippy}

/** Manual drive of the core library surface (no Spark): run with
  * `sbt "Test/runMain graft.CoreDrive"`. Prints cell covers for a real
  * polygon plus edge-case probes. */
object CoreDrive {
  def main(args: Array[String]): Unit = {
    val wroclaw = Geo.polygon(Seq(
      (16.8073393, 51.1389477), (17.0278673, 51.0426754),
      (17.1762192, 51.1063195), (16.9580276, 51.2093551)))
    println("slippy z11: " + Slippy.cover(wroclaw, 11)
      .map { case (x, y) => Slippy.tileId(x, y, 11) }.sorted.mkString(","))
    println("s2 L10 tokens: " + S2.cover(wroclaw, 10).map(S2.toToken).sorted.mkString(","))
    println("pole point cell L5: " + S2.toToken(S2.lngLatToCell(0, 90, 5)))
    println("antimeridian point cell L5: " + S2.toToken(S2.lngLatToCell(180, 0, 5)))
    try println("empty polygon cover: " + S2.cover(Geo.fromWkt("POLYGON EMPTY"), 7))
    catch { case e: Throwable => println("empty polygon cover threw: " + e.toString.take(120)) }
    println("wkb round trip: " + Geo.toWkt(Geo.fromWkb(Geo.toWkb(wroclaw))).take(50))
    val c = S2.lngLatToCell(17.0, 51.1, 8)
    println(s"cell ${S2.toToken(c)} children@10 count: " + S2.childrenAtLevel(c, 10).length)
  }
}
