package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GeoMetrics, Gf}
import graft.operators._

/** Round-2 operators: trajectory metrics, union aggregate + ring buffer,
  * GTFS chain, OSM way normalization, bounded top-k aggregate. */
class NewOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // ---- GeoMetrics / DTW kernels -------------------------------------

  val wro = (51.1089, 17.0326); val poz = (52.4064, 16.9252)

  test("haversine: zero on identical points, symmetric, Wrocław–Poznań ≈ 144-146 km") {
    assert(GeoMetrics.haversineM(wro._1, wro._2, wro._1, wro._2) === 0.0)
    val d1 = GeoMetrics.haversineM(wro._1, wro._2, poz._1, poz._2)
    val d2 = GeoMetrics.haversineM(poz._1, poz._2, wro._1, wro._2)
    assert(d1 === d2)
    assert(d1 > 144000 && d1 < 146000, s"got $d1")
  }

  test("dtw: identity is 0, single-pair equals haversine, warping aligns repeats") {
    val a = Array(wro, poz)
    assert(GeoMetrics.dtw(a, a) === 0.0)
    assert(GeoMetrics.dtw(Array(wro), Array(poz)) ===
      GeoMetrics.haversineM(wro._1, wro._2, poz._1, poz._2))
    // repeated point warps onto the single occurrence at zero cost
    assert(GeoMetrics.dtw(Array(wro, poz, poz), Array(wro, poz)) === 0.0)
    // empty path → +inf like the reference's no-valid-pairs contract
    assert(GeoMetrics.dtw(Array.empty, a).isPosInfinity)
  }

  test("dtw_latlng expression + h3 sequence path round-trip") {
    val h3a = graft.core.H3.toHexString(
      graft.core.H3.latLngToCell(wro._1, wro._2, 8))
    val h3b = graft.core.H3.toHexString(
      graft.core.H3.latLngToCell(poz._1, poz._2, 8))
    val df = Seq((Seq(h3a, h3b), Seq(h3a, h3b)), (Seq(h3a), Seq(h3b)))
      .toDF("sa", "sb")
      .select(Gf.dtwLatLng(Trajectory.h3ToPath(col("sa")),
        Trajectory.h3ToPath(col("sb"))).as("d"))
    val ds = df.collect().map(_.getDouble(0))
    assert(ds(0) === 0.0)
    // cell centers ≈ the original points → distance within one hex radius
    assert(math.abs(ds(1) - GeoMetrics.haversineM(wro._1, wro._2, poz._1, poz._2)) < 1000)
  }

  test("sequence metrics: zip truncation + element-wise accuracy") {
    val df = Seq((Seq(Seq(0.0, 0.0), Seq(0.0, 1.0), Seq(0.0, 2.0)),
      Seq(Seq(0.0, 0.0), Seq(0.0, 1.0)),
      Seq("a", "b", "c"), Seq("a", "x"))).toDF("a", "b", "sa", "sb")
    val r = df.select(
      Trajectory.haversineMean(col("a"), col("b")).as("h"),
      Trajectory.sequenceAccuracy(col("sa"), col("sb")).as("acc")).collect()(0)
    assert(r.getDouble(0) === 0.0) // truncates to first two (equal) points
    assert(r.getDouble(1) === 0.5)
  }

  // ---- HMP / TTE preprocessing --------------------------------------

  test("trajectory metric kernels == declarative zip_with formulas (bitwise)") {
    // unequal lengths (zip truncation), null elements (skip / null-safe
    // match), NaN coordinates, an empty side, string sequences with nulls
    val paths = Seq(
      (Seq(Some(Seq(51.1, 17.0)), Some(Seq(51.2, 17.1)), None),
        Seq(Some(Seq(51.1, 17.0)), Some(Seq(52.0, 16.9)))),
      (Seq(Some(Seq(0.0, 0.0))), Seq(Some(Seq(0.0, 180.0)), Some(Seq(1.0, 1.0)))),
      (Seq.empty[Option[Seq[Double]]], Seq(Some(Seq(1.0, 1.0)))),
      (Seq(Some(Seq(Double.NaN, 2.0))), Seq(Some(Seq(1.0, 2.0)))),
      (Seq(None, None), Seq(Some(Seq(3.0, 4.0)), None)))
      .toDF("a", "b")
    val havRows = paths.select(
      Trajectory.haversineMean(col("a"), col("b")).as("k"),
      Trajectory.haversineMeanDeclarative(col("a"), col("b")).as("d")).collect()
    havRows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)), s"FP mismatch: $r")
    }
    val seqs = Seq(
      (Seq(Some("a"), Some("b"), None, Some("c")), Seq(Some("a"), Some("x"), None)),
      (Seq.empty[Option[String]], Seq(Some("z"))),
      (Seq(Some("only")), Seq(Some("only"))),
      (Seq(None), Seq(Some("v"))))
      .toDF("a", "b")
    val accRows = seqs.select(
      Trajectory.sequenceAccuracy(col("a"), col("b")).as("k"),
      Trajectory.sequenceAccuracyDeclarative(col("a"), col("b")).as("d")).collect()
    accRows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) === r.getDouble(1), s"mismatch: $r")
    }
    // inner-null coordinates and RAGGED elements skip the pair on BOTH
    // sides (the equality spec originally exposed the declarative form
    // turning a null coordinate into a phantom antipodal distance)
    val tricky = Seq(
      (Seq(Some(Seq(Option.empty[Double], Some(17.0))), Some(Seq(Some(51.0), Some(17.0)))),
        Seq(Some(Seq(Some(51.0), Some(17.0))), Some(Seq(Some(51.5), Some(17.2))))),
      (Seq(Some(Seq(Some(51.0)))), Seq(Some(Seq(Some(51.0), Some(17.0))))))
      .toDF("a", "b")
    val trickyRows = tricky.select(
      Trajectory.haversineMean(col("a"), col("b")).as("k"),
      Trajectory.haversineMeanDeclarative(col("a"), col("b")).as("d")).collect()
    trickyRows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)), s"FP mismatch: $r")
    }
    // binary sequences compare BY VALUE (Scala == on Array[Byte] is
    // reference equality — the kernel must not fall into it)
    val bin = Seq((Seq(Array[Byte](1, 2), Array[Byte](3)),
      Seq(Array[Byte](1, 2), Array[Byte](9)))).toDF("a", "b")
    assert(bin.select(Trajectory.sequenceAccuracy(col("a"), col("b")))
      .collect()(0).getDouble(0) === 0.5)
    // nested element types are refused at analysis, not silently zeroed
    val nested = Seq((Seq(Seq(1, 2)), Seq(Seq(1, 2)))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException](
      nested.select(Trajectory.sequenceAccuracy(col("a"), col("b"))).collect())

    // h3_seq_path equals the per-element transform
    val ids = Seq(Seq("861f0d487ffffff", "861f0d48fffffff")).toDF("s")
    val p1 = ids.select(Trajectory.h3ToPath(col("s"))).collect()(0).getSeq[Seq[Double]](0)
    val p2 = ids.select(transform(col("s"),
      c => Gf.h3LatLng(Gf.h3FromStr(c)))).collect()(0).getSeq[Seq[Double]](0)
    assert(p1 === p2)
  }

  test("hmp split matches the reference's 85% rule incl. n=1 and full-split edge") {
    val df = Seq(
      (1L, Seq("a")), // int(1*0.85)=0 → x empty, y whole
      (2L, (1 to 20).map(i => s"c${i % 4}")), // int(17)
      (3L, Seq("a", "a", "a", "a"))) // int(3.4)=3
      .toDF("user_id", "h3_sequence")
    val out = Trajectory.hmpPreprocess(df, "h3_sequence")
      .select("user_id", "x_len", "y_len").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) === ((0, 1)))
    assert(out(2L) === ((4, 3))) // first 17 cover c0..c3; last 3 are c2,c3,c0
    assert(out(3L) === ((1, 1)))
  }

  // ---- union aggregate + ring buffer ---------------------------------

  test("st_union_agg dissolves overlapping boxes (area < sum, = bbox here)") {
    import graft.core.Geo
    val df = Seq(
      Tuple1(Geo.toWkb(Geo.box(0, 0, 2, 1))),
      Tuple1(Geo.toWkb(Geo.box(1, 0, 3, 1)))).toDF("g")
    val wkb = df.agg(Gf.stUnionAgg(col("g"))).collect()(0).getAs[Array[Byte]](0)
    assert(math.abs(Geo.fromWkb(wkb).getArea - 3.0) < 1e-12)
  }

  test("h3 ring buffer geometry covers the seed cells and grows with k") {
    import graft.core.{Geo, H3}
    val seed = H3.toHexString(H3.latLngToCell(wro._1, wro._2, 7))
    val cells = Seq(Tuple1(seed)).toDF(Tables.RegionsIndex)
    val g1 = Geo.fromWkb(Neighbourhoods.h3RingBufferGeometry(cells, 1)
      .collect()(0).getAs[Array[Byte]](0))
    val g2 = Geo.fromWkb(Neighbourhoods.h3RingBufferGeometry(cells, 2)
      .collect()(0).getAs[Array[Byte]](0))
    val seedGeom = H3.cellGeometry(H3.fromHexString(seed))
    assert(g1.covers(seedGeom.buffer(-1e-9)))
    assert(g2.covers(g1.buffer(-1e-9)))
    // k=1 disk = 7 hexes dissolved into one polygon of ~7x the area
    assert(math.abs(g1.getArea / seedGeom.getArea - 7.0) < 0.01)
    assert(g1.getGeometryType === "Polygon")
  }

  // ---- GTFS ----------------------------------------------------------

  test("gtfs departure-hour parse mirrors the reference (HH>=24, H:MM:SS)") {
    val df = Seq("25:30:00", "9:30:00", "00:05:00", "23:59:59")
      .toDF("departure_time")
      .select(Gtfs.departureHour(col("departure_time")).as("h"))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(1, 9, 0, 23))
  }

  test("gtfs transform: distinct trips + sorted headsign sets per stop-hour") {
    val stopTimes = Seq(
      ("t1", "s1", "08:10:00"), ("t1", "s1", "08:20:00"), // same trip twice in hour 8
      ("t2", "s1", "08:30:00"), ("t3", "s1", "09:00:00"),
      ("t1", "s2", null)) // null departure dropped
      .toDF("trip_id", "stop_id", "departure_time")
    val trips = Seq(("t1", "HS-B"), ("t2", "HS-A"), ("t3", "HS-A"))
      .toDF("trip_id", "trip_headsign")
    val stops = Seq(("s1", 17.0, 51.1), ("s2", 17.1, 51.2))
      .toDF("stop_id", "stop_lon", "stop_lat")
    val out = Gtfs.transform(stopTimes, trips, stops)
      .where(col("stop_id") === "s1").collect()(0)
    assert(out.getAs[Long]("trips_at_8") === 2) // t1 counted once
    assert(out.getAs[String]("directions_at_8") === "HS-A,HS-B")
    assert(out.getAs[Long]("trips_at_9") === 1)
    assert(out.getAs[String]("directions_at_9") === "HS-A")
    assert(out.getAs[Long]("trips_at_7") === 0)
    assert(out.getAs[String]("directions_at_7") === "")
  }

  // ---- OSM way normalization -----------------------------------------

  test("way normalization: banker's rounding edges + unit conversions") {
    def norm(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
             v: String): String =
      Seq(Tuple1(v)).toDF("x").select(f(col("x"))).collect()(0).getString(0)
    // maxspeed: python round() is HALF_EVEN: 25/10=2.5→2; 35/10=3.5→4
    assert(norm(WayNormalizer.maxspeed, "25") === "20")
    assert(norm(WayNormalizer.maxspeed, "35") === "40")
    assert(norm(WayNormalizer.maxspeed, "62 mph") === "100") // 99.78 → 100
    assert(norm(WayNormalizer.maxspeed, "DE:rural") === "100")
    assert(norm(WayNormalizer.maxspeed, "variable") === "None")
    // width halves: 1.25*2=2.5→2→1.0; 1.75*2=3.5→4→2.0
    assert(norm(WayNormalizer.width, "1.25") === "1.0")
    assert(norm(WayNormalizer.width, "1.75") === "2.0")
    assert(norm(WayNormalizer.width, "6 m") === "6.0")
    assert(norm(WayNormalizer.lanes, "2.9") === "2") // int() truncates
    assert(norm(WayNormalizer.lanes, "1e2") === "15")
  }

  // ---- multimodal: resize --------------------------------------------

  test("img_resize: exact integer downscale, dims + content preserved") {
    import graft.functions.ImageOps
    val px = ImageOps.synthPixels(7, 64, 32)
    val png = ImageOps.encode(px, 64, 32, "png")
    val df = Seq(Tuple1(png)).toDF("bytes")
      .select(Gf.imgResize(col("bytes"), 32, 16, "png").as("small"))
    val small = df.collect()(0).getAs[Array[Byte]](0)
    assert(ImageOps.width(small) === 32 && ImageOps.height(small) === 16)
    // 2x2 box average of a checkerboard-ish pattern keeps the perceptual
    // hash close to the original (aHash is itself an 8x8 box average)
    val d = ImageOps.hamming(ImageOps.phash(png), ImageOps.phash(small))
    assert(d <= 4, s"resize destroyed structure: hamming $d")
    // exact kernel check: uniform image stays exactly uniform
    val flat = ImageOps.encode(Array.fill(64 * 32)(0x336699), 64, 32, "png")
    val rs = ImageOps.resize(flat, 16, 8, "png")
    assert(ImageOps.decodeRgb(rs).forall(_ == 0x336699))
  }

  // ---- bounded top-k aggregate ---------------------------------------

  test("topk_agg: exact ordering with overflow + ties, matches a plain sort") {
    val n = 5000
    val df = spark.range(n).select(
      (col("id") % 7).cast("string").as("q"),
      (pmod(col("id") * 2654435761L, lit(1000)) / 1000.0).as("score"),
      col("id").as("nid"))
    val got = df.groupBy("q")
      .agg(Gf.topKAgg(col("score"), col("nid"), 5).as("top"))
      .select(col("q"), posexplode(col("top")))
      .select(col("q"), col("pos"), col("col.score"), col("col.id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val want = df.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy(t => (-t._2, t._3)).take(5).zipWithIndex
          .map { case ((_, s, id), i) => (q, i, s, id) }
      }.sortBy(t => (t._1, t._2))
    assert(got.toSeq === want)
  }
}
