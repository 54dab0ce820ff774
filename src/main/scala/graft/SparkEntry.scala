package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Gf
import graft.operators._
import graft.sources.DerivedGeo

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), with a DuckDB-runnable oracle where the semantics are
  * ANSI-SQL-expressible. Column names/types are aligned pairwise with the
  * oracle SQL (the driver hash-compares after sorting columns by name).
  *
  * Float-sum parity rule: every floating aggregate is summed exactly as
  * decimal(18,4|6) and only then cast to double, so partial-aggregation
  * order can never change the result on either engine.
  */
object SparkEntry {

  private def prep(s: SparkSession): SparkSession = { Gf.register(s); s }

  /** Scratch dir for the sink-exercising queries (q44/q63/q64), reaped on
    * JVM exit: the query value is lazy (a DataFrame), so the dir must live
    * until the driver materializes it — a shutdown hook is the earliest
    * safe delete point (repeated Verify runs were accumulating orphan
    * dirs under /tmp, ADVICE round 5). */
  private def tmpDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
      catch { case _: java.io.IOException => () }))
    p.toString
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** 5×5 grid of EXACTLY-tiling rects (shared edges, no overlap) for the
    * adjacency/BFS certificates — region r sits at grid (r%5, r/5). */
  private def gridRegions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation").select(
      col("n_nationkey").cast("string").as(Tables.RegionsIndex),
      Gf.stBox(
        (col("n_nationkey") % 5) * 10 - 25,
        floor(col("n_nationkey") / 5) * 8 - 20,
        (col("n_nationkey") % 5) * 10 - 15,
        floor(col("n_nationkey") / 5) * 8 - 12).as(Tables.Geometry))

  /** Fixed Voronoi seeds (q37) — a REGIONAL constellation (the gnomonic
    * cell construction covers a hemisphere around each seed, so cells of a
    * globe-spanning seed set cannot be represented as plain lng/lat
    * polygons near the antimeridian); coordinates are offset off the 0.05°
    * point grid so no synthetic point is ever equidistant to two seeds. */
  val voronoiSeeds: Seq[(Double, Double)] = Seq(
    (-53.4567, 41.1234), (-37.8912, -12.3456), (14.6789, 41.9876),
    (38.1357, -33.2468), (3.9753, 8.8642), (-41.2345, -37.6543),
    (47.4321, 22.1357), (-10.8642, -5.9753))

  /** Flagship: cell-indexed spatial join (points-in-rect-regions) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q06_spatial_join")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational spine ---
    "q01_pricing_summary" -> ((s, dir) => {
      t(prep(s), dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q02_segment_sales" -> ((s, dir) => {
      t(prep(s), dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total_price"))
        .orderBy("c_mktsegment")
    }),

    "q03_top_orders_per_segment" -> ((s, dir) => {
      val joined = t(prep(s), dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      joined.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .orderBy(col("c_mktsegment"), col("o_totalprice").desc, col("o_orderkey"))
    }),

    // --- CountEmbedder (A1) over nation⊳customer as regions⊳features ---
    "q04_count_embedder" -> ((s, dir) => {
      val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      val regions = t(prep(s), dir, "nation")
        .select(col("n_nationkey").cast("string").as(Tables.RegionsIndex))
      val customers = t(s, dir, "customer")
      val features = customers.select(
        col("c_custkey").cast("string").as(Tables.FeaturesIndex),
        col("c_mktsegment"))
      val joint = customers.select(
        col("c_nationkey").cast("string").as(Tables.RegionsIndex),
        col("c_custkey").cast("string").as(Tables.FeaturesIndex))
      new CountEmbedder(segments.map("c_mktsegment_" + _), countSubcategories = true)
        .transform(regions, features, joint)
        .orderBy(Tables.RegionsIndex)
    }),

    // --- tile assignment (R3/J4): slippy z9 counts, pure column math ---
    "q05_tile_assign" -> ((s, dir) => {
      DerivedGeo.points(prep(s), dir)
        .select(concat_ws("_",
          DerivedGeo.tileX(col("lng"), 9).cast("string"),
          DerivedGeo.tileY(col("lat"), 9).cast("string"),
          lit("9")).as("tile_id"))
        .groupBy("tile_id").agg(count(lit(1)).as("n"))
        .orderBy("tile_id")
    }),

    // --- flagship spatial join (J1): broadcast cell join + JTS refine ---
    "q06_spatial_join" -> ((s, dir) => {
      val joint = new IntersectionJoiner(cellLevel = 6, pointFeatures = true,
        broadcastRegions = Some(true))
        .transform(DerivedGeo.rectRegions(prep(s), dir),
          DerivedGeo.pointFeatures(s, dir))
      joint.groupBy(Tables.RegionsIndex).agg(count(lit(1)).as("n_points"))
        .orderBy(Tables.RegionsIndex)
    }),

    // --- S2 cell math certified against the reference's golden S2 regions
    // (s2vec wro level-14 set): 'center' rows re-derive the region id from
    // the stored geometry's centroid alone; 'l16' rows descend two levels
    // with s2_children and climb back with s2_parent — the oracle recomputes
    // the same descendants with pure SQL bit arithmetic on the cell id. ---
    "q07_s2_assign" -> ((s, dir) => {
      val golden = prep(s).read.parquet(
        "/root/reference/tests/embedders/s2vec/test_files/wro_s2_14_regions.parquet")
      val center = golden.select(
        Gf.s2Token(Gf.s2Cell(Gf.stCentroidX(col("geometry")),
          Gf.stCentroidY(col("geometry")), 14)).as("t"))
        .select(col("t").as(Tables.RegionsIndex), col("t").as("token"),
          lit("center").as("kind"))
      val l16 = golden
        .select(explode(Gf.s2Children(Gf.s2FromToken(col("region_id")), 16)).as("c"))
        .select(
          Gf.s2Token(Gf.s2Parent(col("c"), 14)).as(Tables.RegionsIndex),
          Gf.s2Token(col("c")).as("token"), lit("l16").as("kind"))
      center.unionAll(l16).orderBy("kind", Tables.RegionsIndex, "token")
    }),

    // --- S2 within-refinement (J3, reference s2_regionalizer.py buffer
    // semantics): regionalize the UNION of the two golden wro level-14
    // cells' boundaries with buffer=false — the cover admits every
    // edge-touching neighbor cell (11 at this site), the within refine must
    // keep exactly the two golden cells (a cell is within a union
    // containing itself; an edge-touching neighbor is not). The union is
    // built from OUR s2_boundary of the golden tokens so the within test
    // compares identical vertex coordinates (the golden parquet's polygons
    // differ from any reimplementation at the ~1e-9° level, which `within`
    // is exact about). ---
    "q50_s2_within_refine" -> ((s, dir) => {
      val golden = prep(s).read.parquet(
        "/root/reference/tests/embedders/s2vec/test_files/wro_s2_14_regions.parquet")
      val area = golden
        .select(Gf.s2Boundary(Gf.s2FromToken(col("region_id"))).as(Tables.Geometry))
        .agg(Gf.stUnionAgg(col(Tables.Geometry)).as(Tables.Geometry))
      new S2Regionalizer(14, buffer = false).transform(area)
        .select(Tables.RegionsIndex).orderBy(Tables.RegionsIndex)
    }),

    // --- H3 ring-buffer CELLS (N9, reference srai/h3.py:209-226): buffer a
    // deterministic seed slice of the golden poz_8 vocabulary by k=2 disks
    // and keep the in-vocabulary portion; the oracle recomputes membership
    // as hexdist(seed, cell) ≤ 2 over the IJ fixture. (Out-of-vocabulary
    // buffer cells have no SQL-expressible ids; the dissolved-geometry
    // variant is q31-certified.) ---
    "q51_ring_buffer_cells" -> ((s, dir) => {
      prep(s)
      val regions = s.read.parquet(
        "/root/reference/tests/embedders/hex2vec/test_files/poz_8_regions.parquet")
        .select(col("region_id").as(Tables.RegionsIndex))
      val seeds = regions.where(
        substring(col(Tables.RegionsIndex), 9, 1).isin("1", "3", "5", "7", "9"))
      Neighbourhoods.h3RingBuffer(seeds, 2)
        .join(regions, Seq(Tables.RegionsIndex), "left_semi")
        .orderBy(Tables.RegionsIndex)
    }),

    // --- audio features over PCM16 binary (multimodal training-data ops):
    // REAL little-endian int16 decode + windowed RMS + zero-crossing count
    // inside Catalyst expressions; synthesis is integer arithmetic the
    // oracle replays sample-by-sample. ---
    "q52_audio_features" -> ((s, dir) => {
      val pcm = call_function("synth_pcm16", col("audio_id"), lit(1024))
      t(prep(s), dir, "documents").select(col("doc_id").as("audio_id"))
        .select(col("audio_id"),
          call_function("audio_zero_crossings", pcm).as("zcr"),
          posexplode(call_function("audio_rms_windows", pcm, lit(256))))
        .select(col("audio_id"), col("pos").cast("int").as("w"),
          round(col("col"), 6).as("rms"), col("zcr"))
        .orderBy("audio_id", "w")
    }),

    // --- video frame sampling (multimodal training-data ops): toy
    // deterministic container (header + gray frames), REAL header parse +
    // strided frame slicing + per-frame luma mean; oracle replays the pixel
    // formula per sampled frame. ---
    "q53_video_frames" -> ((s, dir) => {
      val vids = t(prep(s), dir, "nation")
        .select(col("n_nationkey").cast("long").as("video_id"))
      val container = call_function("synth_video",
        col("video_id"), lit(16), lit(16), lit(12))
      vids.select(col("video_id"),
          posexplode(call_function("video_frame_sample", container, lit(3))))
        .select(col("video_id"), (col("pos") * 3).cast("int").as("frame"),
          round(call_function("bytes_mean", col("col")), 6).as("mean_luma"))
        .orderBy("video_id", "frame")
    }),

    // --- REAL public-spec audio container: the q52 PCM16 stream wrapped in
    // a RIFF/WAVE file (fmt + LIST-INFO + data chunks — the parser must
    // walk chunks, not assume fixed offsets), then decoded back through the
    // WAV header path before the same RMS/ZCR kernels. The oracle is the
    // exact q52 sample replay plus the header fields the parse recovered. ---
    "q54_wav_audio" -> ((s, dir) => {
      val wav = call_function("wav_encode",
        call_function("synth_pcm16", col("audio_id"), lit(1024)),
        lit(16000), lit(1))
      val pcm = call_function("wav_pcm", col("wav"))
      t(prep(s), dir, "documents").select(col("doc_id").as("audio_id"))
        .withColumn("wav", wav)
        .select(col("audio_id"),
          call_function("wav_sample_rate", col("wav")).as("sample_rate"),
          call_function("wav_channels", col("wav")).as("channels"),
          call_function("audio_zero_crossings", pcm).as("zcr"),
          posexplode(call_function("audio_rms_windows", pcm, lit(256))))
        .select(col("audio_id"), col("sample_rate"), col("channels"),
          col("pos").cast("int").as("w"), round(col("col"), 6).as("rms"),
          col("zcr"))
        .orderBy("audio_id", "w")
    }),

    // --- REAL public-spec video container: deterministic gray frames
    // encoded with the REAL JDK JPEG codec, wrapped in a spec-complete
    // MJPEG AVI (hdrl/strl headers, movi chunks, idx1 index), then parsed
    // back. Certificates per frame: (a) byte-exact container round-trip
    // (md5 of extracted payload vs re-synthesized JPEG), (b) decode
    // fidelity of the JPEG path vs a lossless PNG reference — PSNR ≥ 40 dB,
    // the BASELINE per-row invariant for lossy formats, (c) header fields
    // + per-payload JPEG dimensions. JPEG bytes are not SQL-replayable, so
    // the oracle pins the structural facts; byte-level exactness rides the
    // md5 equality computed Spark-side (both operands full round-trips). ---
    "q55_avi_mjpeg" -> ((s, dir) => {
      val jpegFrames = array((0 until 6).map(f =>
        call_function("frame_synth", col("video_id"), lit(f), lit(16), lit(16),
          lit("jpeg"))): _*)
      val avi = call_function("avi_mjpeg_encode", jpegFrames, lit(16), lit(16), lit(8))
      t(prep(s), dir, "nation")
        .select(col("n_nationkey").cast("long").as("video_id"))
        .withColumn("avi", avi)
        .select(col("video_id"),
          call_function("avi_frame_count", col("avi")).as("n_frames"),
          call_function("avi_width", col("avi")).as("w"),
          call_function("avi_height", col("avi")).as("h"),
          posexplode(call_function("avi_frames", col("avi"))))
        .select(col("video_id"), col("n_frames"), col("w"), col("h"),
          col("pos").cast("int").as("frame"),
          (md5(col("col")) === md5(call_function("frame_synth", col("video_id"),
            col("pos").cast("int"), lit(16), lit(16), lit("jpeg")))).as("bytes_exact"),
          (call_function("img_psnr", col("col"),
            call_function("frame_synth", col("video_id"), col("pos").cast("int"),
              lit(16), lit(16), lit("png"))) >= 40.0).as("psnr_ok"),
          call_function("img_width", col("col")).as("jpeg_w"),
          call_function("img_height", col("col")).as("jpeg_h"))
        .orderBy("video_id", "frame")
    }),

    // --- P6: geometry sha256 (reference get_geometry_hash,
    // srai/geometry.py:133-138 — SHA256 over the WKT string). Integer-valued
    // coordinates make our JTS WKT byte-reconstructible in SQL ("POINT (3 1)");
    // the hash composition sha2∘st_astext is what this row certifies over
    // the engine's canonical WKT. (Shapely's wkt.dumps byte layout —
    // fixed 16-decimal coordinates — is certified separately by q59 via
    // st_astext_shapely, so both hash streams are available.) ---
    "q56_geom_sha256" -> ((s, dir) => {
      val x = col("n_nationkey") % 10
      val y = col("n_nationkey") % 5
      t(prep(s), dir, "nation").select(
          col("n_nationkey").as("id"),
          sha2(Gf.stAsText(Gf.stPoint(x, y)), 256).as("sha_point"),
          sha2(Gf.stAsText(Gf.stBox(x, y, x + 2, y + 3)), 256).as("sha_box"))
        .orderBy("id")
    }),

    // --- P6 shapely parity (round-5): st_astext_shapely reproduces
    // shapely wkt.dumps' fixed 16-decimal byte layout, so the sha256
    // stream interchanges with reference get_geometry_hash
    // (srai/geometry.py:133-138) on NON-integer coordinates — closing the
    // q56 formatting deviation. The oracle rebuilds the exact bytes with
    // DuckDB printf('%.16f') (validated bit-equal to CPython/glibc
    // formatting); the raw point WKT is also compared as a STRING so a
    // mismatch is readable, not just a hash diff. ---
    "q59_geom_sha256_shapely" -> ((s, dir) => {
      val x = col("n_nationkey").cast("double") * 0.1 - 1.2
      val y = col("n_nationkey").cast("double") * 0.05 + 0.3
      t(prep(s), dir, "nation").select(
          col("n_nationkey").as("id"),
          Gf.stAsTextShapely(Gf.stPoint(x, y)).as("wkt_point"),
          sha2(Gf.stAsTextShapely(Gf.stPoint(x, y)), 256).as("sha_point"),
          sha2(Gf.stAsTextShapely(Gf.stBox(x, y, x + 2.4, y + 3.7)), 256)
            .as("sha_box"))
        .orderBy("id")
    }),

    // --- §2.8 streaming, ENGINE-EXECUTED: the event-time sessionizer run
    // through the real micro-batch machinery (MemoryStream →
    // flatMapGroupsWithState under EventTimeTimeout + a real state store →
    // memory sink), the events replayed across 8 micro-batches with
    // deterministic ±15-minute arrival disorder crossing batch boundaries.
    // The driver's batch SQL oracle (the q09 session rule, session_start
    // carried as epoch ms — the state math is ms-resolution) certifies that
    // the STREAMING answer converges to the batch answer: the last §2.8 row
    // that previously had only function-level evidence. ---
    "q60_sessionize_stream" -> ((s, dir) =>
      graft.streaming.Streams
        .replayEventTimeSessions(prep(s), t(s, dir, "events"))
        .orderBy("user_id", "session_seq")),

    // --- image pipeline (graft payload): synth → decode/hash → tile ---
    "q10_image_tile_counts" -> ((s, dir) => {
      val k = graft.sources.Images.key(col("image_id"))
      graft.sources.Images.forTestdata(prep(s), dir).toDF
        .select(concat_ws("_",
          DerivedGeo.tileX(graft.sources.Images.lng(k), 8).cast("string"),
          DerivedGeo.tileY(graft.sources.Images.lat(k), 8).cast("string"),
          lit("8")).as("tile_id"))
        .groupBy("tile_id").agg(count(lit(1)).as("n"))
        .orderBy("tile_id")
    }),

    "q11_image_footprint_join" -> ((s, dir) => {
      val images = graft.sources.Images.withFootprint(
        graft.sources.Images.forTestdata(prep(s), dir).toDF, halfExtent = 0.02)
        .select(col("image_id").as(Tables.FeaturesIndex), col(Tables.Geometry))
      // boxFeatures fast path: one center cell per image (no ×4 cover
      // explode on the big side, no pair-dedup exchange); regions cover
      // their envelope dilated by the same half-extent — lossless
      val joint = new IntersectionJoiner(cellLevel = 6,
        broadcastRegions = Some(true), boxFeatures = Some(0.02))
        .transform(DerivedGeo.rectRegions(s, dir), images)
      joint.groupBy(Tables.RegionsIndex).agg(count(lit(1)).as("n_images"))
        .orderBy(Tables.RegionsIndex)
    }),

    // patch grid (raster↔vector tiling): the oracle certifies grid
    // completeness (every image × every pos with the row/col arithmetic)
    // plus the parent∘child == anchor invariant per patch; the exact
    // top-left→bottom-right lexsort order of patch TOKENS is pinned by
    // ImagePipelineSpec (cell ids are not SQL-expressible).
    "q12_patch_grid" -> ((s, dir) => {
      val images = graft.sources.Images.withFootprint(
        graft.sources.Images.forTestdata(prep(s), dir).toDF)
        .where(graft.sources.Images.key(col("image_id")) < 2000)
      operators.Tiling.patchGrid(images, 10, 12)
        .select(col("image_id"), col("pos"), col("pos_row"), col("pos_col"),
          (Gf.s2Parent(Gf.s2FromToken(col("patch_id")), 10) ===
            Gf.s2FromToken(col("img_region_id"))).cast("int").as("parent_ok"))
        .orderBy("image_id", "pos")
    }),

    "q13_image_exact_dedup" -> ((s, dir) => {
      graft.sources.Images.forTestdata(prep(s), dir).toDF
        .groupBy(md5(col("bytes")).as("content_hash"))
        .agg(count(lit(1)).as("group_size"))
        .groupBy("group_size").agg(count(lit(1)).as("n_groups"))
        .orderBy("group_size")
    }),

    // Image NEAR-dup via phash hamming banding (round-6 — the one
    // LLM-pipeline gap round 5 left): every 5th image gets a planted
    // JPEG-RE-ENCODED copy — different bytes (md5/q13 cannot see it), same
    // perceptual content. STRUCTURAL recall contract: the synthetic corpus
    // has 512 deterministic patterns and re-encode moves the 64-bit phash
    // by AT MOST 1 bit on every one of them (PhashProbe: 493 at d=0, 19 at
    // d=1), so at maxHamming=3 with 4×16-bit pigeonhole chunks every
    // planted pair is a guaranteed candidate AND passes verification — the
    // oracle (planted key enumeration) is exact for any corpus built from
    // these patterns, at every SF. Organic cross-pattern near-dups (some
    // patterns share a phash) are real near-dups but data-dependent, so the
    // certified slice filters to the planted pairs — rejection of far pairs
    // and the hamming histogram are spec-asserted (ImagePhashSpec).
    "q65_image_phash_neardup" -> ((s, dir) => {
      val images = graft.sources.Images.forTestdata(prep(s), dir).toDF
      val aug = images.select(col("image_id"), col("bytes"))
        .unionAll(images
          .where(graft.sources.Images.key(col("image_id")) % 5 === 0)
          .select(concat(lit("re_"), col("image_id")).as("image_id"),
            Gf.imgReencode(col("bytes"), lit("jpeg")).as("bytes")))
      Dedup.phashPairsFromBytes(aug, "image_id", "bytes", maxHamming = 3)
        .where(col("id_b") === concat(lit("re_"), col("id_a")))
        .select("id_a", "id_b")
        .orderBy("id_a")
    }),

    // --- event-stream batch analytics ---
    "q08_events_hourly" -> ((s, dir) => {
      t(prep(s), dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
        .orderBy("event_type", "hour")
    }),

    // --- text analysis (training-data pipeline) ---
    "q14_token_stats" -> ((s, dir) => {
      t(prep(s), dir, "documents").select(
        col("doc_id"),
        TextOps.nTokens(col("text")).as("n_tokens"),
        TextOps.nDistinctTokens(col("text")).as("n_distinct"))
        .orderBy("doc_id")
    }),

    "q15_quality_score" -> ((s, dir) => {
      val docs = t(prep(s), dir, "documents")
      val len = length(col("text"))
      docs.select(
        col("doc_id"),
        TextOps.nTokens(col("text")).as("n_tokens"),
        (TextOps.stopwordCount(col("text")) / len).as("stop_ratio"),
        (TextOps.punctCount(col("text")) / len).as("punct_ratio"),
        (TextOps.digitCount(col("text")) / len).as("digit_ratio"))
        .withColumn("quality",
          (col("n_tokens") >= 20 && col("n_tokens") <= 1000 &&
            col("stop_ratio") >= 0.005).cast("int"))
        .orderBy("doc_id")
    }),

    "q16_langid" -> ((s, dir) => {
      t(prep(s), dir, "documents")
        .select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),

    // --- dedup suite over a corpus with planted duplicates ---
    "q17_exact_dedup" -> ((s, dir) => {
      val docs = t(prep(s), dir, "documents")
      val aug = docs.select(col("doc_id"), col("text"))
        .unionAll(docs.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.exact(aug, "doc_id", "text").orderBy("content_hash")
    }),

    "q18_minhash_neardup" -> ((s, dir) => {
      val docs = t(prep(s), dir, "documents")
      val aug = docs.select(col("doc_id"), col("text"))
        .unionAll(docs.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.minhashPairs(aug, "doc_id", "text", threshold = 0.9)
        .orderBy("id_a", "id_b")
    }),

    // --- embedding similarity ---
    "q19_embed_neardup" -> ((s, dir) => {
      val emb = t(prep(s), dir, "embeddings")
      val aug = emb.select(col("vec_id"), col("embedding"))
        .unionAll(emb.where(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"),
            transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
      Similarity.cosineNearDupPairs(aug, threshold = 0.999)
        .orderBy("id_a", "id_b")
    }),

    "q20_ann_topk" -> ((s, dir) => {
      val emb = t(prep(s), dir, "embeddings")
      val queries = emb.where(col("vec_id").isin(1L, 2L, 3L))
      Similarity.bruteForceTopK(emb, queries, 10)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed ANN with a TRUE-ANSWER oracle: strong-match search
    // (cosine >= 0.95) over a corpus with planted same-direction duplicates.
    // Identical directions produce identical sign patterns in EVERY
    // hyperplane table, so LSH recall at this threshold is guaranteed by
    // construction — the driver's brute-force DuckDB oracle certifies the
    // whole path (bucketing, candidate dedup, exact cosine, bounded top-k
    // ranking) exactly. General-regime recall stays spec-asserted in
    // TextSimilaritySpec.
    "q21_ann_lsh" -> ((s, dir) => {
      val emb = t(prep(s), dir, "embeddings")
      val aug = emb.select(col("vec_id"), col("embedding"))
        .unionAll(emb.where(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"),
            transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
      val queries = emb.where(col("vec_id") % 5 === 0 && col("vec_id") < 100)
      // STRUCTURAL recall contract: gate only the planted twins — identical
      // direction → identical hyperplane signs in every table → guaranteed
      // LSH candidates at cosine 1.0. Organic ≥0.95 pairs are
      // data-dependent for ANY blocking scheme (a regenerated corpus could
      // legitimately miss one), so they are certified by the exact q20
      // brute-force oracle and the TextSimilaritySpec recall tests instead.
      Similarity.lshTopK(aug, queries, 10, planes = 16, tables = 4)
        .where(col("neighbor_id") === col("query_id") + 100000L)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id")
    }),

    // q21 with the round-5 AUTO-TUNED parameters: Similarity.suggestLsh
    // samples signature-bucket occupancy to size the hyperplane count and
    // solves the LSH recall model at designCos for the table count; the
    // chosen (planes, tables) feed lshTopK unchanged. Same planted-twin
    // structural contract as q21 — identical directions collide in EVERY
    // hyperplane table, for ANY parameter choice — so the oracle is
    // parameter-independent and certifies the auto path end-to-end (the
    // QUALITY of the choice on clustered vs uniform corpora is
    // spec-asserted in SimilarityAutoSpec).
    "q61_ann_lsh_auto" -> ((s, dir) => {
      val emb = t(prep(s), dir, "embeddings")
      val aug = emb.select(col("vec_id"), col("embedding"))
        .unionAll(emb.where(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"),
            transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
      val queries = emb.where(col("vec_id") % 5 === 0 && col("vec_id") < 100)
      val params = Similarity.suggestLsh(emb, designCos = 0.97)
      Similarity.lshTopK(aug, queries, 10,
          planes = params.planes, tables = params.tables)
        .where(col("neighbor_id") === col("query_id") + 100000L)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id")
    }),

    // IVF (inverted-file) ANN — the round-5 second scale path next to LSH:
    // a sample-trained spherical k-means quantizer, one codegen cell per
    // corpus row, queries probe their nprobe nearest cells. Planted-twin
    // structural contract at nprobe = 1: cell assignment is SCALE-INVARIANT
    // (argmax dot over unit centroids), so the ×2 twin lands in exactly its
    // query's top-1 cell for ANY trained quantizer — the oracle is
    // training-independent. Exactness of the full path (nprobe = nlist ≡
    // brute force, hash-equal) and the recall@nprobe curve are
    // spec-asserted in IvfSpec.
    "q62_ann_ivf" -> ((s, dir) => {
      val emb = t(prep(s), dir, "embeddings")
      val aug = emb.select(col("vec_id"), col("embedding"))
        .unionAll(emb.where(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"),
            transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
      val queries = emb.where(col("vec_id") % 5 === 0 && col("vec_id") < 100)
      Similarity.ivfTopK(aug, queries, 10, nlist = 32, nprobe = 1)
        .where(col("neighbor_id") === col("query_id") + 100000L)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id")
    }),

    // q62 with round-6 AUTO-TUNED parameters: Similarity.suggestIvf sizes
    // nlist by the √n rule, trains the quantizer, and walks nprobe up the
    // sampled recall curve to the target. Same planted-twin structural
    // contract as q62 — cell assignment is scale-invariant, so the ×2 twin
    // shares its query's top-1 cell for ANY trained quantizer and ANY
    // nprobe ≥ 1 — making the oracle parameter-independent and certifying
    // the auto path end-to-end (choice QUALITY on clustered vs uniform
    // corpora is spec-asserted in SimilarityAutoSpec).
    "q66_ann_ivf_auto" -> ((s, dir) => {
      val emb = t(prep(s), dir, "embeddings")
      val aug = emb.select(col("vec_id"), col("embedding"))
        .unionAll(emb.where(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"),
            transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
      val queries = emb.where(col("vec_id") % 5 === 0 && col("vec_id") < 100)
      val (model, params) = Similarity.suggestIvf(emb, recallTarget = 0.9)
      Similarity.ivfTopKWith(model, aug, queries, 10, nprobe = params.nprobe)
        .where(col("neighbor_id") === col("query_id") + 100000L)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id")
    }),

    // PERSISTED IVF index, certified EXACT: the corpus is written through
    // the lineage sink bucketed by quantizer cell (the layout IS the
    // index), then searched with nprobe = nlist — which reads every bucket
    // and must equal true brute-force top-k. The oracle is the same
    // DuckDB exhaustive scan as q20, so the whole persisted path
    // (assign → grouped commit → manifest prune → probe join → bounded
    // top-k) is hash-exact against an independent engine. The PRUNING
    // (nprobe < nlist reads only probed buckets' files) is spec-asserted
    // in IvfIndexSpec via inputFiles.
    "q63_ann_ivf_index" -> ((s, dir) => {
      val emb = t(prep(s), dir, "embeddings")
      val queries = emb.where(col("vec_id").isin(1L, 2L, 3L))
      val tmp = tmpDir("q63_ivf_index")
      val model = Similarity.trainIvf(emb, nlist = 8, iters = 5)
      Similarity.writeIvfIndex(emb, tmp, model, groups = 2)
      Similarity.searchIvfIndex(queries, tmp, 10, nprobe = 8)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("query_id", "rank")
    }),

    // Sink TIME-TRAVEL, certified end to end: the events table lands in a
    // lineage sink in two commits split by a deterministic predicate, and
    // snapshotAsOf at the first commit's written_at boundary must read back
    // EXACTLY the first batch — the DuckDB oracle recomputes that batch's
    // aggregate from the same predicate, so a boundary leak in either
    // direction (batch-2 rows bleeding in, batch-1 buckets pruned out)
    // breaks the hash. The 5 ms sleep keeps the two commits' millisecond
    // clocks distinct.
    "q64_sink_time_travel" -> ((s, dir) => {
      val ev = t(prep(s), dir, "events")
        .select(col("event_id"), col("user_id"),
          (col("user_id") % 8).cast("string").as("bucket"))
      val tmp = tmpDir("q64_tt")
      graft.sources.LineageSink.write(
        ev.where(col("event_id") % 2 === 0), tmp, "bucket")
      val boundary = graft.sources.LineageSink.manifest(s, tmp)
        .agg(max(col("written_at"))).collect()(0).getTimestamp(0)
      Thread.sleep(5)
      graft.sources.LineageSink.write(
        ev.where(col("event_id") % 2 =!= 0), tmp, "bucket")
      graft.sources.LineageSink.snapshotAsOf(s, tmp, boundary)
        // partition-type inference may surface the bucket dir value as an
        // int; pin the grouping key type for the oracle compare
        .groupBy(col("bucket").cast("string").as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"))
        .orderBy("bucket")
    }),

    // Round-6 data compaction + expiry, certified through the oracle gate:
    // the table lands as THREE commits per bucket (many small files),
    // compactData bin-packs every bucket through the same two-phase commit,
    // expireSuperseded retires the superseded files at a zero horizon — and
    // the snapshot after BOTH maintenance passes must still equal a DuckDB
    // recompute of the full table. Catches any maintenance bug that loses,
    // duplicates, or re-keys rows (the "007"≠7 partition-inference trap is
    // on this path: buckets are digit strings).
    "q67_sink_compaction" -> ((s, dir) => {
      val ev = t(prep(s), dir, "events")
        .select(col("event_id"), col("user_id"),
          (col("user_id") % 8).cast("string").as("bucket"))
      val tmp = tmpDir("q67_compact")
      for (m <- 0 until 3)
        graft.sources.LineageSink.write(
          ev.where(pmod(col("event_id"), lit(3)) === m), tmp, "bucket")
      val compacted = graft.sources.LineageSink.compactData(s, tmp)
      require(compacted == 8, s"q67: expected 8 buckets compacted, got $compacted")
      val expired =
        graft.sources.LineageSink.expireSuperseded(s, tmp, olderThanMs = 0L)
      require(expired > 0, "q67: expiry retired nothing")
      graft.sources.LineageSink.snapshot(s, tmp)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"))
        .orderBy("bucket")
    }),

    // SimHash blocking with exact-Jaccard verification. STRUCTURAL recall
    // contract: gate only the planted exact copies (identical text →
    // identical simhash → guaranteed block, jaccard exactly 1.0). Organic
    // ≥0.9 pairs have no recall bound under simhash chunk blocking (unlike
    // q18's banding, whose miss probability is < 1e-7), so they stay
    // certified by q18's full inverted-index true-answer oracle and the
    // TextSimilaritySpec organic tests. The hamming-threshold variant
    // (simhashPairs) stays spec-pinned (the 64-bit hash is not
    // SQL-expressible).
    "q22_simhash_neardup" -> ((s, dir) => {
      val docs = t(prep(s), dir, "documents")
      val aug = docs.select(col("doc_id"), col("text"))
        .unionAll(docs.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.simhashJaccardPairs(aug, "doc_id", "text", threshold = 0.9)
        .where(col("id_b") === col("id_a") + 1000000L)
        .orderBy("id_a", "id_b")
    }),

    // --- H3 encode certified against the reference's golden region sets
    // (Poznań res-8, Wrocław res-9, AL res-10 — 315 real cells): every
    // region id is RECOMPUTED from the stored cell geometry's centroid;
    // the golden region_id column is never read on the Spark side. ---
    "q26_h3_assign" -> ((s, dir) => {
      prep(s)
      Seq(
        ("/root/reference/tests/embedders/hex2vec/test_files/poz_8_regions.parquet", 8, "poz_8"),
        ("/root/reference/tests/embedders/geovex/test_files/wro_9_regions.parquet", 9, "wro_9"),
        ("/root/reference/tests/embedders/geovex/test_files/AL_10_regions.parquet", 10, "AL_10"))
        .map { case (path, res, tag) =>
          // GeoParquet path: footer CRS must declare WGS84 (L1 guard)
          graft.sources.GeoParquet.read(s, path).select(
            Gf.h3Str(Gf.h3Cell(Gf.stCentroidX(col("geometry")),
              Gf.stCentroidY(col("geometry")), res)).as(Tables.RegionsIndex),
            lit(tag).as("src"))
        }.reduce(_ unionAll _).orderBy("src", Tables.RegionsIndex)
    }),

    // ContextualCountEmbedder over the golden Poznań region set: Spark
    // derives the k=2 neighbourhood from h3_grid_ring; the oracle
    // recomputes the same squashed embedding in pure SQL using the
    // checked-in local-IJ fixture (fixtures/poz8_ij.parquet — hex grid
    // distance is closed-form in axial IJ; FixtureGen asserts IJ distance
    // == true grid distance for every region pair before writing).
    "q27_h3_contextual" -> ((s, dir) => {
      prep(s)
      val hex = "/root/reference/tests/embedders/hex2vec/test_files"
      val regions = s.read.parquet(s"$hex/poz_8_regions.parquet")
        .select(col("region_id").as(Tables.RegionsIndex))
      val counts = regions.join(
        s.read.parquet(s"$hex/poz_8_joint.parquet").groupBy("region_id")
          .agg(count(lit(1)).cast("int").as("cnt")),
        Seq(Tables.RegionsIndex), "left").na.fill(0, Seq("cnt"))
      val closure = Neighbourhoods.h3Closure(regions, 2)
      new ContextualCountEmbedder(closure, 2)
        .transform(counts)
        .orderBy(Tables.RegionsIndex)
    }),

    // --- skew-join path: 80% of images collapse onto 5 hotspot cells
    // ("dense urban tiles"); explicit salting (salt=8) + AQE skew join ---
    "q28_skew_spatial_join" -> ((s, dir) => {
      val images = graft.sources.Images.withFootprint(
        graft.sources.Images.forTestdata(prep(s), dir).toDF,
        halfExtent = 0.02, skewHotPermille = 800)
        .select(col("image_id").as(Tables.FeaturesIndex), col(Tables.Geometry))
      val joint = new IntersectionJoiner(cellLevel = 6, salt = 8)
        .transform(DerivedGeo.rectRegions(s, dir), images)
      joint.groupBy(Tables.RegionsIndex).agg(count(lit(1)).as("n_images"))
        .orderBy(Tables.RegionsIndex)
    }),

    // --- the srai canon (SURVEY §3.1) as ONE lazy plan, end-to-end against
    // the reference's own Poznań snapshot: st_union_agg dissolves the golden
    // cells into the area polygon → H3Regionalizer (centroid mode)
    // reproduces srai's 127-cell region set → IntersectionJoiner rebuilds
    // the joint pair set → CountEmbedder counts amenity/leisure one-hots.
    // The DuckDB oracle recomputes the counts from the golden joint/features
    // files — an exact end-to-end certificate of the whole pipeline. ---
    "q29_flagship_pipeline" -> ((s, dir) => {
      prep(s)
      val hex = "/root/reference/tests/embedders/hex2vec/test_files"
      val area = s.read.parquet(s"$hex/poz_8_regions.parquet")
        .agg(Gf.stUnionAgg(col("geometry")).as(Tables.Geometry))
      val regions = new H3Regionalizer(8, buffer = false).transform(area)
      val features = s.read.parquet(s"$hex/poz_8_features.parquet")
        .select(col("feature_id").as(Tables.FeaturesIndex),
          col("geometry").as(Tables.Geometry), col("amenity"), col("leisure"))
      val joint = new IntersectionJoiner(cellLevel = 13,
        broadcastRegions = Some(true)).transform(regions, features)
      new CountEmbedder(Seq("amenity_restaurant", "leisure_park"),
        countSubcategories = true)
        .transform(regions, features, joint)
        .orderBy(Tables.RegionsIndex)
    }),

    // --- evaluator metrics (A13) over deterministic pred/label tables ---
    "q23_eval_metrics" -> ((s, dir) => {
      val labels = t(prep(s), dir, "customer")
        .groupBy(col("c_nationkey").cast("string").as(Tables.RegionsIndex))
        .agg(count(lit(1)).cast("double").as("label"))
      val preds = labels.select(col(Tables.RegionsIndex),
        ((col("label") * 11 + 10) / 10.0).as("pred"))
      Evaluator.regressionMetrics(preds, labels)
    }),

    // --- GTFS-style hour pivot (A5): wide per-hour counts + set-valued agg ---
    "q24_hour_pivot" -> ((s, dir) => {
      val ev = t(prep(s), dir, "events")
        .withColumn("h", hour(col("ts")))
      val hourCols = (0 until 24).map(h =>
        sum(when(col("h") === h, 1).otherwise(0)).cast("long").as(s"trips_at_$h"))
      val dirCol = concat_ws(",",
        transform(sort_array(collect_set(pmod(col("user_id"), lit(7)))),
          x => x.cast("string"))).as("directions")
      ev.groupBy("event_type")
        .agg(hourCols.head, (hourCols.tail :+ dirCol): _*)
        .orderBy("event_type")
    }),

    // --- quantile bucketing (A8): per-cell counts -> ntile bins ---
    "q25_quantile_buckets" -> ((s, dir) => {
      DerivedGeo.points(prep(s), dir)
        .select(concat_ws("_",
          DerivedGeo.tileX(col("lng"), 6).cast("string"),
          DerivedGeo.tileY(col("lat"), 6).cast("string"),
          lit("6")).as("cell"))
        .groupBy("cell").agg(count(lit(1)).as("n"))
        .withColumn("bucket", ntile(4).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("n"), col("cell"))))
        .orderBy("cell")
    }),

    // --- qcut(duplicates="drop") variant of q25 (A8, reference
    // spatial_split.py:202-219): exact linear-interpolation quantile edges,
    // duplicate-edge merge, right-closed 0-based codes; oracle recomputes
    // with DuckDB quantile_cont. Dup-edge collapse itself is pinned against
    // real pandas outputs in QuantilesSpec. ---
    "q47_qcut_buckets" -> ((s, dir) => {
      val stats = DerivedGeo.points(prep(s), dir)
        .select(concat_ws("_",
          DerivedGeo.tileX(col("lng"), 6).cast("string"),
          DerivedGeo.tileY(col("lat"), 6).cast("string"),
          lit("6")).as("cell"))
        .groupBy("cell").agg(count(lit(1)).as("n"))
      operators.Quantiles.qcut(stats, "n", 4).orderBy("cell")
    }),

    // --- remove_interiors (P3, reference geometry.py:50-64): polygons with
    // id-sized square holes, built as WKT; the oracle is the closed-form
    // shell/holed area (coordinates are quarter-precision → shoelace sums
    // are exact in both engines). ---
    "q48_remove_interiors" -> ((s, dir) => {
      val ids = t(prep(s), dir, "nation").select(col("n_nationkey").as("id"))
      val x = (col("id") % 40).cast("double") * 0.5 - 10.0
      val y = (col("id") % 20).cast("double") * 0.5 - 5.0
      val h = (col("id") % 3).cast("double") * 0.25 + 0.25 // hole side
      def pt(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        concat(a.cast("string"), lit(" "), b.cast("string"))
      def ring(cs: Seq[(org.apache.spark.sql.Column, org.apache.spark.sql.Column)]) =
        concat_ws(", ", cs.map { case (a, b) => pt(a, b) }: _*)
      val shell = ring(Seq((x, y), (x + 2.0, y), (x + 2.0, y + 2.0),
        (x, y + 2.0), (x, y)))
      val hole = ring(Seq((x + 0.5, y + 0.5), (x + 0.5 + h, y + 0.5),
        (x + 0.5 + h, y + 0.5 + h), (x + 0.5, y + 0.5 + h), (x + 0.5, y + 0.5)))
      val wkt = concat(lit("POLYGON (("), shell, lit("), ("), hole, lit("))"))
      val geom = call_function("st_geomfromtext", wkt)
      ids.select(col("id"),
        round(Gf.stArea(geom), 9).as("area_with_hole"),
        round(Gf.stArea(Gf.stRemoveInteriors(geom)), 9).as("area_shell"))
        .orderBy("id")
    }),

    // --- metric buffer (P4, reference geometry.py:67-94 pyproj AEQD
    // round-trip): geodesic roundness certificate. For each point, buffer
    // by 50 km and probe destination points at 4 bearings × {0.99R, 1.01R}
    // (closed-form spherical destination): inside probes must intersect,
    // outside must not (the 32-gon boundary sits in [0.9952R, R]). ---
    "q49_buffer_roundness" -> ((s, dir) => {
      val Re = 6371008.8 // the AEQD sphere radius used by bufferMeters
      val R = 50000.0
      val pts = DerivedGeo.points(prep(s), dir)
        .where(col("point_id") < 40)
        .select(col("point_id"), col("lng"), col("lat"))
      val probes = pts
        .withColumn("bearing", explode(lit(Array(0.0, 90.0, 180.0, 270.0))))
        .withColumn("f", explode(lit(Array(0.99, 1.01))))
      val phi1 = radians(col("lat")); val lam1 = radians(col("lng"))
      val theta = radians(col("bearing"))
      val delta = col("f") * R / Re
      val phi2 = asin(sin(phi1) * cos(delta) + cos(phi1) * sin(delta) * cos(theta))
      val lam2 = lam1 + atan2(sin(theta) * sin(delta) * cos(phi1),
        cos(delta) - sin(phi1) * sin(phi2))
      val buf = Gf.stBufferMeters(Gf.stPoint(col("lng"), col("lat")), lit(R))
      probes.select(col("point_id"), col("bearing"), col("f"),
        Gf.stIntersects(buf, Gf.stPoint(degrees(lam2), degrees(phi2)))
          .cast("int").as("contains"))
        .orderBy("point_id", "bearing", "f")
    }),

    // --- trajectory metrics (A13, reference _custom_metrics.py:45-100):
    // per-user ordered paths; haversine-mean + element-wise accuracy are
    // driver-certified (closed-form SQL); exact DTW is spec-pinned
    // (TrajectorySpec) since dynamic programming is not SQL-expressible. ---
    "q30_trajectory_metrics" -> ((s, dir) => {
      val ev = t(prep(s), dir, "events").select(
        col("user_id"), col("ts"), col("event_id"),
        ((col("event_id") % 3600) / 10.0 - 180.0 + 0.05).as("lng"),
        (((col("event_id") * 7) % 1200) / 10.0 - 60.0 + 0.05).as("lat"))
        .withColumn("lngp", col("lng") + (pmod(col("user_id"), lit(7)) - 3) * 0.02)
        .withColumn("latp", col("lat") + (pmod(col("user_id"), lit(5)) - 2) * 0.02)
        .withColumn("tl", concat_ws("_",
          DerivedGeo.tileX(col("lng"), 6).cast("string"),
          DerivedGeo.tileY(col("lat"), 6).cast("string")))
        .withColumn("tp", concat_ws("_",
          DerivedGeo.tileX(col("lngp"), 6).cast("string"),
          DerivedGeo.tileY(col("latp"), 6).cast("string")))
      val seqs = ev.groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
          array(col("lat"), col("lng")).as("lab"),
          array(col("latp"), col("lngp")).as("prd"),
          col("tl"), col("tp")))).as("s"))
      // per-pair distances round to mm, then order-independent decimal mean
      val pairDist = zip_with(col("s.lab"), col("s.prd"), (a, b) =>
        round(Gf.haversineM(a.getItem(0), a.getItem(1),
          b.getItem(0), b.getItem(1)), 3).cast("decimal(25,6)"))
      seqs.select(
        col("user_id"),
        (aggregate(pairDist, lit(0).cast("decimal(30,6)"),
          (acc, x) => (acc + x).cast("decimal(30,6)"))
          .cast("double") / size(col("s.lab"))).as("hav_mean_m"),
        operators.Trajectory.sequenceAccuracy(col("s.tl"), col("s.tp")).as("tile_acc"),
        size(col("s.lab")).as("n_points"))
        .withColumn("hav_mean_m", round(col("hav_mean_m"), 6))
        .orderBy("user_id")
    }),

    // --- st_union_agg (SURVEY §2.9): dissolve each z2 parent's distinct
    // z6 tiles into one geometry; tiles are disjoint, so the union's area
    // equals the closed-form per-tile sum the oracle computes. ---
    "q31_union_tiles" -> ((s, dir) => {
      val tiles = DerivedGeo.points(prep(s), dir)
        .select(DerivedGeo.tileX(col("lng"), 6).as("x"),
          DerivedGeo.tileY(col("lat"), 6).as("y"))
        .dropDuplicates("x", "y")
      tiles
        .withColumn("parent", concat_ws("_",
          floor(col("x") / 16).cast("int").cast("string"),
          floor(col("y") / 16).cast("int").cast("string"), lit("2")))
        .groupBy("parent")
        .agg(count(lit(1)).as("n_tiles"),
          round(Gf.stArea(Gf.stUnionAgg(
            Gf.slippyBoundary(col("x"), col("y"), 6))), 6).as("union_area"))
        .orderBy("parent")
    }),

    // --- GTFS join chain (L8, reference gtfs_loader.py:60-193): synthetic
    // GTFS-shaped stop_times ⋈ trips ⋈ stops with per-hour distinct-trip
    // counts and headsign direction sets. ---
    "q32_gtfs" -> ((s, dir) => {
      prep(s)
      import s.implicits._
      val trips = s.range(200).select(
        concat(lit("t"), col("id")).as("trip_id"),
        concat(lit("HS"), pmod(col("id"), lit(7))).as("trip_headsign"))
      val stops = s.range(40).select(
        concat(lit("s"), col("id")).as("stop_id"),
        (col("id") / 10.0).as("stop_lon"), (col("id") / 20.0).as("stop_lat"))
      val stopTimes = s.range(4000).select(
        concat(lit("t"), pmod(col("id"), lit(200))).as("trip_id"),
        concat(lit("s"), pmod(col("id") * 7, lit(40))).as("stop_id"),
        when(pmod(col("id"), lit(11)) === 0, lit(null))
          .otherwise(concat(
            lpad(pmod(col("id") * 13, lit(30)).cast("string"), 2, "0"), lit(":"),
            lpad(pmod(col("id"), lit(60)).cast("string"), 2, "0"), lit(":00")))
          .as("departure_time"))
      operators.Gtfs.transform(stopTimes, trips, stops)
        .withColumn("lng", Gf.stCentroidX(col(Tables.Geometry)))
        .withColumn("lat", Gf.stCentroidY(col(Tables.Geometry)))
        .drop(Tables.Geometry)
        .orderBy("stop_id")
    }),

    // --- GTFS stop-VISIT counts (round-4 countVisits toggle — gtfs_kit's
    // exact counting: a trip looping through a stop twice in an hour counts
    // twice). The q32 feed has real repeats (every trip revisits each of
    // its stops 20×), so this certifies a genuinely different answer:
    // COUNT(*) per (stop, hour) instead of COUNT(DISTINCT trip_id). ---
    "q57_gtfs_visits" -> ((s, dir) => {
      prep(s)
      val trips = s.range(200).select(
        concat(lit("t"), col("id")).as("trip_id"),
        concat(lit("HS"), pmod(col("id"), lit(7))).as("trip_headsign"))
      val stops = s.range(40).select(
        concat(lit("s"), col("id")).as("stop_id"),
        (col("id") / 10.0).as("stop_lon"), (col("id") / 20.0).as("stop_lat"))
      val stopTimes = s.range(4000).select(
        concat(lit("t"), pmod(col("id"), lit(200))).as("trip_id"),
        concat(lit("s"), pmod(col("id") * 7, lit(40))).as("stop_id"),
        when(pmod(col("id"), lit(11)) === 0, lit(null))
          .otherwise(concat(
            lpad(pmod(col("id") * 13, lit(30)).cast("string"), 2, "0"), lit(":"),
            lpad(pmod(col("id"), lit(60)).cast("string"), 2, "0"), lit(":00")))
          .as("departure_time"))
      operators.Gtfs.transform(stopTimes, trips, stops, countVisits = true)
        .select((col("stop_id") +: (0 until 24).map(h =>
          col(s"trips_at_$h"))): _*)
        .orderBy("stop_id")
    }),

    // --- auto index-level spatial join (round-4 cellLevel=None mode): the
    // S2 level comes from suggestLevel over the region set at transform
    // time; the join answer is level-independent (exact JTS refine), so the
    // oracle is q06's closed-form box test verbatim. ---
    "q58_auto_level_join" -> ((s, dir) => {
      val joint = IntersectionJoiner.auto(pointFeatures = true,
        broadcastRegions = Some(true))
        .transform(DerivedGeo.rectRegions(prep(s), dir),
          DerivedGeo.pointFeatures(s, dir))
      joint.groupBy(Tables.RegionsIndex).agg(count(lit(1)).as("n_points"))
        .orderBy(Tables.RegionsIndex)
    }),

    // --- OSM way-attribute normalization (L9 second half, reference
    // osm_way_loader.py:304-374): every sanitize/normalize rule exercised
    // by a fixed variant table; the oracle maps each variant to its
    // hand-computed reference result. ---
    "q33_way_normalize" -> ((s, dir) => {
      prep(s)
      val raw = s.range(1200).select(
        col("id"),
        element_at(typedlit(Seq("residential", "primary", "none", null)),
          pmod(col("id"), lit(4)).cast("int") + 1).as("highway"),
        element_at(typedlit(Seq("50", "50 km/h", "30 mph", "signals", "DE:urban",
          "AT:walk", "AU:urban", null, "none", "7", "120", "1000")),
          pmod(col("id"), lit(12)).cast("int") + 1).as("maxspeed"),
        element_at(typedlit(Seq("2", "2.5", "20", "abc", null, "3")),
          pmod(col("id"), lit(6)).cast("int") + 1).as("lanes"),
        element_at(typedlit(Seq("3.5", "4 m", "12'", "10ft", "100", "nan", null)),
          pmod(col("id"), lit(7)).cast("int") + 1).as("width"))
      operators.WayNormalizer.normalize(raw,
        Seq("highway", "maxspeed", "lanes", "width"))
        .orderBy("id")
    }),

    // --- HF trajectory preprocessing (L11, reference _base.py:455-525):
    // 85% sequence split, distinct-cell lengths, duration, equal-width
    // stratification bins. Sequences use slippy ids so the oracle is
    // closed-form; the H3-sequence variant is spec-pinned. ---
    "q34_hmp_preprocess" -> ((s, dir) => {
      val ev = t(prep(s), dir, "events").select(
        col("user_id"), col("ts"), col("event_id"),
        concat_ws("_",
          DerivedGeo.tileX((col("event_id") % 3600) / 10.0 - 180.0 + 0.05, 6).cast("string"),
          DerivedGeo.tileY(((col("event_id") * 7) % 1200) / 10.0 - 60.0 + 0.05, 6).cast("string"))
          .as("cell"))
      val seqs = ev.groupBy("user_id")
        .agg(sort_array(collect_list(struct(
          struct(col("ts"), col("event_id")).as("o"), col("cell").as("p")))).as("sm"))
        .select(col("user_id"), col("sm.p").as("h3_sequence"),
          transform(col("sm.o.ts"), t =>
            unix_micros(t.cast("timestamp")) / 1e6).as("ts_seq"))
      val pre = operators.Trajectory.stratificationBin(
        operators.Trajectory.ttePreprocess(
          operators.Trajectory.hmpPreprocess(seqs, "h3_sequence")
            .withColumnRenamed("stratify_col", "hmp_stratify")
            .withColumn("stratify_col", col("hmp_stratify")), "ts_seq")
          .withColumnRenamed("stratify_col", "duration_s")
          .withColumn("stratify_col", col("hmp_stratify")), 8)
      pre.select(col("user_id"), size(col("h3_sequence")).as("n"),
        col("x_len"), col("y_len"), col("hmp_stratify").as("stratify_col"),
        col("stratification_bin"), round(col("duration_s"), 6).as("duration_s"))
        .orderBy("user_id")
    }),

    // --- ContextualCountEmbedder concatenated form (A3) over the golden
    // region set — same IJ-fixture SQL recompute as q27, per-distance
    // blocks instead of the squash. ---
    "q35_h3_contextual_concat" -> ((s, dir) => {
      prep(s)
      val hex = "/root/reference/tests/embedders/hex2vec/test_files"
      val regions = s.read.parquet(s"$hex/poz_8_regions.parquet")
        .select(col("region_id").as(Tables.RegionsIndex))
      val counts = regions.join(
        s.read.parquet(s"$hex/poz_8_joint.parquet").groupBy("region_id")
          .agg(count(lit(1)).cast("int").as("cnt")),
        Seq(Tables.RegionsIndex), "left").na.fill(0, Seq("cnt"))
      val closure = Neighbourhoods.h3Closure(regions, 2)
      new ContextualCountEmbedder(closure, 2, concatenate = true)
        .transform(counts)
        .orderBy(Tables.RegionsIndex)
    }),

    // --- exact-median aggregation (A4) through the same topology:
    // reference is exact np.nanmedian; Spark median() and DuckDB median()
    // both interpolate the two middle values, so the oracle is exact. ---
    "q36_h3_contextual_median" -> ((s, dir) => {
      prep(s)
      val hex = "/root/reference/tests/embedders/hex2vec/test_files"
      val regions = s.read.parquet(s"$hex/poz_8_regions.parquet")
        .select(col("region_id").as(Tables.RegionsIndex))
      val counts = regions.join(
        s.read.parquet(s"$hex/poz_8_joint.parquet").groupBy("region_id")
          .agg(count(lit(1)).cast("int").as("cnt")),
        Seq(Tables.RegionsIndex), "left").na.fill(0, Seq("cnt"))
      val closure = Neighbourhoods.h3Closure(regions, 2)
      new ContextualCountEmbedder(closure, 2, concatenate = true,
        aggregation = "median")
        .transform(counts)
        .orderBy(Tables.RegionsIndex)
    }),

    // --- spherical Voronoi end-to-end (R4): regionalize 8 fixed seeds,
    // assign every synthetic point through the cell-indexed point join; the
    // oracle recomputes the assignment as a great-circle argmin (the
    // definition of a Voronoi cell), certifying the clipped geometry. ---
    "q37_voronoi_assign" -> ((s, dir) => {
      prep(s)
      import s.implicits._
      val seedPts = voronoiSeeds.map { case (lngS, latS) =>
        Tuple1(graft.core.Geo.toWkb(graft.core.Geo.point(lngS, latS)))
      }.toDF(Tables.Geometry)
      // 60° cell radius: every window point is well within it of its
      // nearest seed, so the cells tile the whole tested window
      val regions = new VoronoiRegionalizer(maxRadiusDeg = 60).transform(seedPts)
      val features = DerivedGeo.points(s, dir)
        .where(col("lng").between(-50, 45) && col("lat").between(-35, 40))
        .select(col("point_id").cast("string").as(Tables.FeaturesIndex),
          Gf.stPoint(col("lng"), col("lat")).as(Tables.Geometry))
      val joint = new IntersectionJoiner(cellLevel = 5, pointFeatures = true,
        broadcastRegions = Some(true)).transform(regions, features)
      joint.groupBy(Tables.RegionsIndex).agg(count(lit(1)).as("n"))
        .orderBy(Tables.RegionsIndex)
    }),

    // --- adjacency neighbourhood (N6): 5×5 exactly-tiling rect grid —
    // JTS `touches` through the cell-indexed self-join must equal the
    // closed-form queen neighbourhood (share an edge or a corner). ---
    "q38_adjacency" -> ((s, dir) => {
      val regions = gridRegions(prep(s), dir)
      Neighbourhoods.adjacencyEdges(regions, cellLevel = 6)
        .orderBy("region_id", "neighbour_id")
    }),

    // --- BFS hop closure (N5) over the same adjacency: queen-move hop
    // distance on a grid IS the Chebyshev distance — closed form for the
    // oracle, Pregel-lite frontier joins on the Spark side. ---
    "q39_bfs_closure" -> ((s, dir) => {
      val regions = gridRegions(prep(s), dir)
      val edges = Neighbourhoods.adjacencyEdges(regions, cellLevel = 6)
      Neighbourhoods.distanceClosure(edges, 3)
        .orderBy("region_id", "neighbour_id")
    }),

    // --- train-statistics scaling (A7/A10): μ/σ standardize + MinMax over
    // a customer-derived feature frame; stats aggregate once driver-side
    // and broadcast as literals (round 6 kills stddev partial-sum ULP). ---
    "q40_scaling" -> ((s, dir) => {
      val base = t(prep(s), dir, "customer")
        .groupBy(col("c_nationkey").cast("string").as(Tables.RegionsIndex))
        .agg(count(lit(1)).cast("double").as("f1"),
          sum(col("c_acctbal").cast("decimal(18,4)")).cast("double").as("f2"))
      val std = Scaling.standardize(base, base, Seq("f1", "f2"))
        .select(col(Tables.RegionsIndex),
          round(col("f1"), 6).as("f1_std"), round(col("f2"), 6).as("f2_std"))
      val mm = Scaling.minMax(base, base, "f1")
        .select(col(Tables.RegionsIndex), round(col("f1"), 6).as("f1_mm"))
      std.join(mm, Seq(Tables.RegionsIndex)).orderBy(Tables.RegionsIndex)
    }),

    // --- center-handling matrix (N4) over the grid closure: neighbours up
    // to distance 2 with the center row included (reference
    // _base.py:139-167 semantics). ---
    "q41_neighbours_upto" -> ((s, dir) => {
      val regions = gridRegions(prep(s), dir)
      val edges = Neighbourhoods.adjacencyEdges(regions, cellLevel = 6)
      val closure = Neighbourhoods.distanceClosure(edges, 3)
      val seeds = regions.select(Tables.RegionsIndex)
        .where(col(Tables.RegionsIndex).isin("0", "6", "12", "24"))
      Neighbourhoods.neighboursUpToDistance(closure, seeds, 2, includeCenter = true)
        .orderBy("region_id", "neighbour_id", "distance")
    }),

    // --- returnGeom=true (J2): intersection geometries of overlapping
    // rects × image-footprint boxes — box∩box area is closed-form for the
    // oracle. ---
    "q42_intersection_geom" -> ((s, dir) => {
      val images = graft.sources.Images.withFootprint(
        graft.sources.Images.forTestdata(prep(s), dir).toDF, halfExtent = 0.02)
        .where(graft.sources.Images.key(col("image_id")) < 4000)
        .select(col("image_id").as(Tables.FeaturesIndex), col(Tables.Geometry))
      new IntersectionJoiner(cellLevel = 6, broadcastRegions = Some(true),
        boxFeatures = Some(0.02))
        .transform(DerivedGeo.rectRegions(s, dir), images, returnGeom = true)
        .select(col(Tables.RegionsIndex), col(Tables.FeaturesIndex),
          round(Gf.stArea(col(Tables.Geometry)), 9).as("ix_area"))
        .orderBy(Tables.RegionsIndex, Tables.FeaturesIndex)
    }),

    // --- GeoVex hex tensor (N8) over the golden region set, flattened to
    // (region_id, r, c, v) scalar rows: the oracle recomputes the dense
    // (2k+2)² layout — pos = (k+i)·side + (k−j) — from the IJ fixture
    // (FixtureGen asserts pairwise localIj == fixture difference). ---
    "q43_hex_tensor" -> ((s, dir) => {
      prep(s)
      val hex = "/root/reference/tests/embedders/hex2vec/test_files"
      val regions = s.read.parquet(s"$hex/poz_8_regions.parquet")
        .select(col("region_id").as(Tables.RegionsIndex))
      val counts = regions.join(
        s.read.parquet(s"$hex/poz_8_joint.parquet").groupBy("region_id")
          .agg(count(lit(1)).cast("int").as("cnt")),
        Seq(Tables.RegionsIndex), "left").na.fill(0, Seq("cnt"))
      operators.Tiling.hexTensor(regions, counts, 1, "cnt")
        .select(col(Tables.RegionsIndex), posexplode(col("rows")))
        .withColumnRenamed("pos", "r").withColumnRenamed("col", "vals")
        .select(col(Tables.RegionsIndex), col("r").cast("int").as("r"),
          posexplode(col("vals")))
        .select(col(Tables.RegionsIndex), col("r"),
          col("pos").cast("int").as("c"), col("col").as("v"))
        .orderBy(Tables.RegionsIndex, "r", "c")
    }),

    // --- LineageSink crash-resume exactly-once (§2.8, north rule:
    // "resumable from checkpoint with per-partition lineage + metrics").
    // Three wrecked attempts are injected — a partial commit history
    // (buckets b0-b2 only), a job dead mid-STAGING write, and a job dead
    // mid-MOVE (pending marker written, half its files already renamed into
    // the table) — then one resumeWrite. Output joins per-bucket counts
    // read back from the committed table with the manifest's lineage rows;
    // the oracle is the closed-form per-bucket expectation, so any lost or
    // doubled row (or manifest drift) hash-mismatches. ---
    "q44_lineage_resume" -> ((s, dir) => {
      val docs = t(prep(s), dir, "documents").select(
        col("doc_id"),
        concat(lit("b"), pmod(col("doc_id"), lit(7)).cast("string")).as("bucket"),
        col("n_chars"))
      val tmp = tmpDir("q44_lineage")
      graft.sources.LineageSink.write(
        docs.where(pmod(col("doc_id"), lit(7)) <= 2), tmp, "bucket")
      graft.sources.LineageSink.injectCrashMidStaging(
        docs.where(pmod(col("doc_id"), lit(7)) === 3), tmp, "bucket")
      graft.sources.LineageSink.injectCrashMidCommit(
        docs.where(pmod(col("doc_id"), lit(7)) === 4), tmp, "bucket")
      graft.sources.LineageSink.resumeWrite(docs, tmp, "bucket")
      val data = s.read.parquet(s"$tmp/data")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"), sum("n_chars").as("chars"))
      val m = graft.sources.LineageSink.manifest(s, tmp)
        .groupBy("bucket").agg(sum("rows").as("m_rows"))
      data.join(m, Seq("bucket")).orderBy("bucket")
    }),

    // --- SpatialSplit greedy (A9) driver certificate: the seeded-order
    // greedy fold over a per-cell stats table derived from events. 6 cells
    // into 8 quantile bins exercises EMPTY bins (the max(1.0) guard), and
    // equal 0.5/0.5 ratios force argmin TIES (first-split preference). The
    // oracle replays the exact fold with a recursive CTE (reference
    // semantics: spatial_split.py:202-315). ---
    "q45_spatial_split" -> ((s, dir) => {
      val stats = t(prep(s), dir, "events")
        .groupBy(pmod(col("user_id"), lit(6)).cast("long").as("cell"))
        .agg(count(lit(1)).as("n"))
      new SpatialSplit(parentCellLevel = 10,
        ratios = Seq("train" -> 0.5, "test" -> 0.5), nBins = 8, seed = 42L)
        .assignStats(stats)
        .orderBy("cell")
    }),

    // --- Hex2Vec triplets (A12) driver certificate over the golden poz_8
    // vocabulary: positives from the H3 ring generator, negatives from the
    // bounded hash-pick sampler. The oracle recomputes everything
    // independently — neighbour/disk distances from the IJ fixture, the
    // dense index + Lehmer pick hash in plain SQL arithmetic
    // (neighbour_dataset.py:100-162 semantics, seeded). ---
    "q46_hex2vec_triplets" -> ((s, dir) => {
      prep(s)
      val hex = "/root/reference/tests/embedders/hex2vec/test_files"
      val regions = s.read.parquet(s"$hex/poz_8_regions.parquet")
        .select(col("region_id").as(Tables.RegionsIndex))
      operators.Triplets.hex2vec(regions, excludeK = 2,
        negativesPerAnchor = 2, seed = 42L, oversample = 16)
        .orderBy("anchor", "positive", "negative")
    }),

    "q09_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(prep(s), dir, "events")
        .withColumn("prev_ms", lag(unix_millis(col("ts").cast("timestamp")), 1).over(w))
        .withColumn("new_s",
          when(col("prev_ms").isNull ||
            unix_millis(col("ts").cast("timestamp")) - col("prev_ms") > 1800000L, 1).otherwise(0))
        .withColumn("session_seq",
          sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_seq")
        .agg(min("ts").as("session_start"), count(lit(1)).as("n_events"))
        .orderBy("user_id", "session_seq")
    }))

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q02_segment_sales" ->
      """SELECT c_mktsegment,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q03_top_orders_per_segment" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey) x
        |WHERE rn <= 3 ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey""".stripMargin,

    "q04_count_embedder" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS region_id,
        |  CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END), 0) AS INT) AS c_mktsegment_AUTOMOBILE,
        |  CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END), 0) AS INT) AS c_mktsegment_BUILDING,
        |  CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END), 0) AS INT) AS c_mktsegment_FURNITURE,
        |  CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END), 0) AS INT) AS c_mktsegment_HOUSEHOLD,
        |  CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END), 0) AS INT) AS c_mktsegment_MACHINERY
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY n_nationkey ORDER BY region_id""".stripMargin,

    "q05_tile_assign" -> {
      val x = DerivedGeo.tileXSql("lng", 9)
      val y = DerivedGeo.tileYSql("lat", 9)
      s"""WITH p AS (${DerivedGeo.pointsSql})
         |SELECT CONCAT_WS('_', CAST($x AS VARCHAR), CAST($y AS VARCHAR), '9') AS tile_id,
         |       COUNT(*) AS n
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q06_spatial_join" ->
      s"""WITH p AS (${DerivedGeo.pointsSql}), r AS (${DerivedGeo.rectsSql})
         |SELECT r.region_id, COUNT(*) AS n_points
         |FROM p JOIN r ON p.lng >= r.xmin AND p.lng <= r.xmax
         |              AND p.lat >= r.ymin AND p.lat <= r.ymax
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_image_tile_counts" -> {
      val k = "k"
      val x = DerivedGeo.tileXSql(graft.sources.Images.lngSql(k), 8)
      val y = DerivedGeo.tileYSql(graft.sources.Images.latSql(k), 8)
      s"""WITH keys AS (${graft.sources.Images.keysSql})
         |SELECT CONCAT_WS('_', CAST($x AS VARCHAR), CAST($y AS VARCHAR), '8') AS tile_id,
         |       COUNT(*) AS n
         |FROM keys GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q11_image_footprint_join" -> {
      val lng = graft.sources.Images.lngSql("k")
      val lat = graft.sources.Images.latSql("k")
      s"""WITH keys AS (${graft.sources.Images.keysSql}),
         |  img AS (SELECT k, $lng AS lng, $lat AS lat FROM keys),
         |  r AS (${DerivedGeo.rectsSql})
         |SELECT r.region_id, COUNT(*) AS n_images
         |FROM img JOIN r ON img.lng - 0.02 <= r.xmax AND img.lng + 0.02 >= r.xmin
         |               AND img.lat - 0.02 <= r.ymax AND img.lat + 0.02 >= r.ymin
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q13_image_exact_dedup" ->
      s"""WITH keys AS (${graft.sources.Images.keysSql}),
         |  groups AS (SELECT k % 512 AS pat, COUNT(*) AS group_size
         |             FROM keys GROUP BY 1)
         |SELECT group_size, COUNT(*) AS n_groups
         |FROM groups GROUP BY 1 ORDER BY 1""".stripMargin,

    // planted-copy enumeration: re-encode moves the phash ≤ 1 bit on every
    // pattern (PhashProbe), so each planted pair is guaranteed at
    // maxHamming = 3 — the truth is the key set itself
    "q65_image_phash_neardup" ->
      s"""WITH keys AS (${graft.sources.Images.keysSql})
         |SELECT printf('img_%09d', k) AS id_a,
         |       're_' || printf('img_%09d', k) AS id_b
         |FROM keys WHERE k % 5 = 0 ORDER BY 1""".stripMargin,

    "q14_token_stats" ->
      s"""SELECT doc_id, ${TextOps.nTokensSql("text")} AS n_tokens,
         |       ${TextOps.nDistinctTokensSql("text")} AS n_distinct
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q15_quality_score" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    ${TextOps.nTokensSql("text")} AS n_tokens,
         |    ${TextOps.stopwordCountSql("text")} / length(text) AS stop_ratio,
         |    ${TextOps.punctCountSql("text")} / length(text) AS punct_ratio,
         |    ${TextOps.digitCountSql("text")} / length(text) AS digit_ratio
         |  FROM documents)
         |SELECT doc_id, n_tokens, stop_ratio, punct_ratio, digit_ratio,
         |  CAST((n_tokens >= 20 AND n_tokens <= 1000 AND stop_ratio >= 0.005) AS INT) AS quality
         |FROM q ORDER BY doc_id""".stripMargin,

    "q16_langid" ->
      s"""SELECT doc_id, ${TextOps.langIdSql("text")} AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q17_exact_dedup" ->
      s"""WITH aug AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0)
         |SELECT ${TextOps.fingerprintSql("text")} AS content_hash,
         |       COUNT(*) AS group_size, MIN(doc_id) AS keep_id
         |FROM aug GROUP BY 1 ORDER BY 1""".stripMargin,

    // true-answer oracle: exact 3-gram jaccard via a shingle inverted-index
    // join (the documents table itself contains driver-planted near-dups).
    // At threshold 0.9 the 16x4 LSH banding has miss probability < 1e-7, so
    // candidate recall is effectively exact; verification is exact on both
    // sides, making the outputs identical.
    "q18_minhash_neardup" ->
      """WITH docs AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, regexp_extract_all(text, '\S+')
        |  FROM documents WHERE doc_id % 7 = 0),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |      ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |            FOR i IN generate_series(1, len(t)-2)] END) AS s
        |  FROM docs),
        |ex AS (SELECT doc_id, unnest(s) AS g, len(s) AS n FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c,
        |         ANY_VALUE(a.n) AS na, ANY_VALUE(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, c / (na + nb - c) AS jaccard
        |FROM pairs WHERE c / (na + nb - c) >= 0.9 ORDER BY 1, 2""".stripMargin,

    "q19_embed_neardup" ->
      """SELECT vec_id AS id_a, vec_id + 100000 AS id_b
        |FROM embeddings WHERE vec_id % 5 = 0 ORDER BY 1, 2""".stripMargin,

    "q20_ann_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |  q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (1, 2, 3)),
        |  c AS (SELECT q.query_id, e.vec_id AS neighbor_id,
        |          list_cosine_similarity(e.v, q.qv) AS cos
        |        FROM e, q WHERE e.vec_id <> q.query_id),
        |  r AS (SELECT query_id, neighbor_id, cos,
        |          ROW_NUMBER() OVER (PARTITION BY query_id
        |            ORDER BY cos DESC, neighbor_id ASC) AS rn
        |        FROM c)
        |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, CAST(rn AS INT) AS rank
        |FROM r WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin,


    "q28_skew_spatial_join" -> {
      val lng = graft.sources.Images.skewLngSql("k", 800)
      val lat = graft.sources.Images.skewLatSql("k", 800)
      s"""WITH keys AS (${graft.sources.Images.keysSql}),
         |  img AS (SELECT k, $lng AS lng, $lat AS lat FROM keys),
         |  r AS (${DerivedGeo.rectsSql})
         |SELECT r.region_id, COUNT(*) AS n_images
         |FROM img JOIN r ON img.lng - 0.02 <= r.xmax AND img.lng + 0.02 >= r.xmin
         |               AND img.lat - 0.02 <= r.ymax AND img.lat + 0.02 >= r.ymin
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q23_eval_metrics" ->
      """WITH labels AS (
        |  SELECT CAST(c_nationkey AS VARCHAR) AS region_id,
        |         CAST(COUNT(*) AS DOUBLE) AS label
        |  FROM customer GROUP BY 1),
        |j AS (SELECT (label * 11 + 10) / 10.0 AS p, label AS y FROM labels),
        |s AS (SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST((p - y) * (p - y) AS DECIMAL(30,10))) AS DOUBLE) AS ss_res,
        |  CAST(SUM(CAST(abs(p - y) AS DECIMAL(30,10))) AS DOUBLE) AS sae,
        |  CAST(SUM(CAST(CASE WHEN y <> 0 THEN abs((p - y) / y) ELSE 0.0 END AS DECIMAL(30,10))) AS DOUBLE) AS sape,
        |  CAST(SUM(CAST(CASE WHEN abs(p) + abs(y) <> 0 THEN abs(p - y) / ((abs(p) + abs(y)) / 2) ELSE 0.0 END AS DECIMAL(30,10))) AS DOUBLE) AS ssmape,
        |  CAST(SUM(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(y * y AS DECIMAL(30,10))) AS DOUBLE) AS syy
        |  FROM j)
        |SELECT n, ss_res / n AS mse, sqrt(ss_res / n) AS rmse, sae / n AS mae,
        |  sape / n AS mape, ssmape / n AS smape,
        |  1.0 - ss_res / (syy - sy * sy / n) AS r2
        |FROM s""".stripMargin,

    "q24_hour_pivot" -> {
      val hourCols = (0 until 24).map(h =>
        s"CAST(SUM(CASE WHEN hour(ts) = $h THEN 1 ELSE 0 END) AS BIGINT) AS trips_at_$h")
        .mkString(",\n        |  ")
      s"""SELECT event_type,
         |  $hourCols,
         |  array_to_string(list_sort(list(DISTINCT user_id % 7)), ',') AS directions
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q25_quantile_buckets" -> {
      val x = DerivedGeo.tileXSql("lng", 6)
      val y = DerivedGeo.tileYSql("lat", 6)
      s"""WITH p AS (${DerivedGeo.pointsSql}),
         |c AS (SELECT CONCAT_WS('_', CAST($x AS VARCHAR), CAST($y AS VARCHAR), '6') AS cell,
         |             COUNT(*) AS n
         |      FROM p GROUP BY 1)
         |SELECT cell, n, CAST(NTILE(4) OVER (ORDER BY n, cell) AS INT) AS bucket
         |FROM c ORDER BY cell""".stripMargin
    },

    "q52_audio_features" ->
      """WITH a AS (SELECT doc_id AS audio_id FROM documents),
        |s AS (SELECT audio_id, i, ((audio_id * 31 + i * 7919) % 65536) - 32768 AS v
        |      FROM a, (SELECT unnest(generate_series(0, 1023)) AS i) t),
        |r AS (SELECT audio_id, CAST(i // 256 AS INT) AS w,
        |         round(sqrt(CAST(sum(v * v) AS DOUBLE) / 256), 6) AS rms
        |      FROM s GROUP BY 1, 2),
        |z AS (SELECT audio_id,
        |         CAST(count(*) FILTER (WHERE v * lead_v < 0) AS BIGINT) AS zcr
        |      FROM (SELECT audio_id, v,
        |              lead(v) OVER (PARTITION BY audio_id ORDER BY i) AS lead_v
        |            FROM s)
        |      GROUP BY 1)
        |SELECT r.audio_id, r.w, r.rms, z.zcr
        |FROM r JOIN z USING (audio_id) ORDER BY 1, 2""".stripMargin,

    "q53_video_frames" ->
      """WITH v AS (SELECT CAST(n_nationkey AS BIGINT) AS video_id FROM nation),
        |f AS (SELECT unnest([0, 3, 6, 9]) AS frame),
        |px AS (SELECT unnest(generate_series(0, 255)) AS p)
        |SELECT video_id, CAST(frame AS INT) AS frame,
        |  round(CAST(sum((video_id + frame * 31 + px.p * 7) % 256) AS DOUBLE) / 256, 6)
        |    AS mean_luma
        |FROM v, f, px GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // exact q52 replay + the WAV header fields the container parse recovers
    "q54_wav_audio" ->
      """WITH a AS (SELECT doc_id AS audio_id FROM documents),
        |s AS (SELECT audio_id, i, ((audio_id * 31 + i * 7919) % 65536) - 32768 AS v
        |      FROM a, (SELECT unnest(generate_series(0, 1023)) AS i) t),
        |r AS (SELECT audio_id, CAST(i // 256 AS INT) AS w,
        |         round(sqrt(CAST(sum(v * v) AS DOUBLE) / 256), 6) AS rms
        |      FROM s GROUP BY 1, 2),
        |z AS (SELECT audio_id,
        |         CAST(count(*) FILTER (WHERE v * lead_v < 0) AS BIGINT) AS zcr
        |      FROM (SELECT audio_id, v,
        |              lead(v) OVER (PARTITION BY audio_id ORDER BY i) AS lead_v
        |            FROM s)
        |      GROUP BY 1)
        |SELECT r.audio_id, CAST(16000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels, r.w, r.rms, z.zcr
        |FROM r JOIN z USING (audio_id) ORDER BY r.audio_id, r.w""".stripMargin,

    // structural facts of the AVI round-trip; bytes_exact/psnr_ok are
    // Spark-computed certificates the oracle pins to true for every frame
    "q55_avi_mjpeg" ->
      """WITH v AS (SELECT CAST(n_nationkey AS BIGINT) AS video_id FROM nation),
        |f AS (SELECT unnest(generate_series(0, 5)) AS frame)
        |SELECT video_id, CAST(6 AS INT) AS n_frames, CAST(16 AS INT) AS w,
        |  CAST(16 AS INT) AS h, CAST(frame AS INT) AS frame,
        |  true AS bytes_exact, true AS psnr_ok,
        |  CAST(16 AS INT) AS jpeg_w, CAST(16 AS INT) AS jpeg_h
        |FROM v, f ORDER BY video_id, frame""".stripMargin,

    "q56_geom_sha256" ->
      """SELECT n_nationkey AS id,
        |  sha256('POINT (' || (n_nationkey % 10) || ' ' || (n_nationkey % 5) || ')')
        |    AS sha_point,
        |  sha256('POLYGON ((' ||
        |    (n_nationkey % 10) || ' ' || (n_nationkey % 5) || ', ' ||
        |    (n_nationkey % 10 + 2) || ' ' || (n_nationkey % 5) || ', ' ||
        |    (n_nationkey % 10 + 2) || ' ' || (n_nationkey % 5 + 3) || ', ' ||
        |    (n_nationkey % 10) || ' ' || (n_nationkey % 5 + 3) || ', ' ||
        |    (n_nationkey % 10) || ' ' || (n_nationkey % 5) || '))') AS sha_box
        |FROM nation ORDER BY id""".stripMargin,

    "q59_geom_sha256_shapely" ->
      """WITH c AS (
        |  SELECT n_nationkey AS id,
        |    CAST(n_nationkey AS DOUBLE) * CAST(0.1 AS DOUBLE) - CAST(1.2 AS DOUBLE) AS x,
        |    CAST(n_nationkey AS DOUBLE) * CAST(0.05 AS DOUBLE) + CAST(0.3 AS DOUBLE) AS y
        |  FROM nation),
        |g AS (
        |  SELECT id, x, y,
        |    x + CAST(2.4 AS DOUBLE) AS x2, y + CAST(3.7 AS DOUBLE) AS y2 FROM c),
        |s AS (
        |  SELECT id,
        |    'POINT (' || printf('%.16f', x) || ' ' || printf('%.16f', y) || ')' AS wkt_point,
        |    'POLYGON ((' ||
        |      printf('%.16f', x) || ' ' || printf('%.16f', y) || ', ' ||
        |      printf('%.16f', x2) || ' ' || printf('%.16f', y) || ', ' ||
        |      printf('%.16f', x2) || ' ' || printf('%.16f', y2) || ', ' ||
        |      printf('%.16f', x) || ' ' || printf('%.16f', y2) || ', ' ||
        |      printf('%.16f', x) || ' ' || printf('%.16f', y) || '))' AS wkt_box
        |  FROM g)
        |SELECT id, wkt_point, sha256(wkt_point) AS sha_point,
        |  sha256(wkt_box) AS sha_box
        |FROM s ORDER BY id""".stripMargin,

    // batch truth for the ENGINE-executed streaming sessionizer: the q09
    // session rule with session_start as epoch ms (epoch_ms floors — same
    // as Timestamp.getTime on the streaming side; within-ms ordering can't
    // move a boundary because a 0-ms gap never exceeds the 30-min rule)
    "q60_sessionize_stream" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM e)
        |SELECT user_id, session_seq, MIN(ts_ms) AS session_start_ms,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin,

    "q50_s2_within_refine" ->
      """SELECT region_id
        |FROM read_parquet('/root/reference/tests/embedders/s2vec/test_files/wro_s2_14_regions.parquet')
        |ORDER BY region_id""".stripMargin,

    "q51_ring_buffer_cells" ->
      """WITH ij AS (SELECT region_id, i, j FROM read_parquet('/root/repo/fixtures/poz8_ij.parquet')),
        |seeds AS (SELECT region_id, i, j FROM ij
        |          WHERE substring(region_id, 9, 1) IN ('1','3','5','7','9'))
        |SELECT DISTINCT b.region_id AS region_id
        |FROM seeds a JOIN ij b
        |  ON (abs(a.i - b.i) + abs(a.j - b.j) + abs((a.i - b.i) - (a.j - b.j))) // 2 <= 2
        |ORDER BY b.region_id""".stripMargin,

    "q48_remove_interiors" ->
      """SELECT n_nationkey AS id,
        |  round(4.0 - power(CAST(n_nationkey % 3 AS DOUBLE) * 0.25 + 0.25, 2), 9)
        |    AS area_with_hole,
        |  CAST(4.0 AS DOUBLE) AS area_shell
        |FROM nation ORDER BY id""".stripMargin,

    "q49_buffer_roundness" -> {
      s"""WITH p AS (${DerivedGeo.pointsSql}),
         |q AS (SELECT point_id FROM p WHERE point_id < 40),
         |bs AS (SELECT unnest([0.0, 90.0, 180.0, 270.0]) AS bearing),
         |fs AS (SELECT unnest([0.99, 1.01]) AS f)
         |SELECT point_id, bearing, f,
         |  CAST(CASE WHEN f < 1.0 THEN 1 ELSE 0 END AS INT) AS contains
         |FROM q, bs, fs ORDER BY point_id, bearing, f""".stripMargin
    },

    "q47_qcut_buckets" -> {
      val x = DerivedGeo.tileXSql("lng", 6)
      val y = DerivedGeo.tileYSql("lat", 6)
      s"""WITH p AS (${DerivedGeo.pointsSql}),
         |c AS (SELECT CONCAT_WS('_', CAST($x AS VARCHAR), CAST($y AS VARCHAR), '6') AS cell,
         |             COUNT(*) AS n
         |      FROM p GROUP BY 1),
         |e AS (SELECT quantile_cont(n, [0.0, 0.25, 0.5, 0.75, 1.0]) AS qs FROM c),
         |d AS (SELECT DISTINCT unnest(qs) AS edge FROM e)
         |SELECT c.cell, c.n,
         |  CASE WHEN (SELECT count(*) FROM d) < 2 THEN NULL
         |       ELSE CAST(greatest(0,
         |         (SELECT count(*) FROM d WHERE d.edge < c.n) - 1) AS INT)
         |  END AS bucket
         |FROM c ORDER BY cell""".stripMargin
    },

    "q08_events_hourly" ->
      """SELECT event_type, date_trunc('hour', ts) AS hour,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // golden-fixture oracles: DuckDB reads the reference's checked-in
    // parquet snapshots directly (absolute paths, same sandbox)
    "q26_h3_assign" ->
      """SELECT region_id, 'poz_8' AS src FROM read_parquet('/root/reference/tests/embedders/hex2vec/test_files/poz_8_regions.parquet')
        |UNION ALL
        |SELECT region_id, 'wro_9' AS src FROM read_parquet('/root/reference/tests/embedders/geovex/test_files/wro_9_regions.parquet')
        |UNION ALL
        |SELECT region_id, 'AL_10' AS src FROM read_parquet('/root/reference/tests/embedders/geovex/test_files/AL_10_regions.parquet')
        |ORDER BY src, region_id""".stripMargin,

    // S2 descendants recomputed with pure bit arithmetic on the cell id:
    // lsb = id & -id, children centers = id + (2k-3)·(lsb/4), token = hex
    // with trailing zeros stripped (face-2 ids stay positive in BIGINT)
    "q07_s2_assign" ->
      """WITH r AS (SELECT region_id FROM read_parquet('/root/reference/tests/embedders/s2vec/test_files/wro_s2_14_regions.parquet')),
        |ids AS (SELECT region_id,
        |  CAST(CAST('0x' || rpad(region_id, 16, '0') AS UBIGINT) AS BIGINT) AS id FROM r),
        |c1 AS (SELECT region_id, id + (2*k - 3) * ((id & -id) // 4) AS cid
        |       FROM ids, (VALUES (0),(1),(2),(3)) t(k)),
        |c2 AS (SELECT region_id, cid + (2*k - 3) * ((cid & -cid) // 4) AS cid2
        |       FROM c1, (VALUES (0),(1),(2),(3)) t(k))
        |SELECT region_id, region_id AS token, 'center' AS kind FROM r
        |UNION ALL
        |SELECT region_id, rtrim(lower(lpad(hex(cid2), 16, '0')), '0') AS token,
        |       'l16' AS kind FROM c2
        |ORDER BY kind, region_id, token""".stripMargin,

    "q12_patch_grid" -> {
      s"""WITH keys AS (${graft.sources.Images.keysSql}),
         |f AS (SELECT k FROM keys WHERE k < 2000),
         |p AS (SELECT unnest(generate_series(0, 15)) AS pos)
         |SELECT 'img_' || lpad(CAST(k AS VARCHAR), 9, '0') AS image_id,
         |  CAST(pos AS INT) AS pos, CAST(pos // 4 AS INT) AS pos_row,
         |  CAST(pos % 4 AS INT) AS pos_col, 1 AS parent_ok
         |FROM f, p ORDER BY image_id, pos""".stripMargin
    },

    // exact brute-force strong-match top-k (list_cosine_similarity): the
    // LSH result must equal the true answer at threshold 0.95
    // planted-twin recall certificate: the twin is the identical direction
    // scaled ×2, so its cosine is 1 by construction on both engines
    "q21_ann_lsh" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |  q AS (SELECT vec_id AS query_id, v FROM e
        |        WHERE vec_id % 5 = 0 AND vec_id < 100)
        |SELECT query_id, query_id + 100000 AS neighbor_id,
        |  round(list_cosine_similarity(list_transform(v, x -> x * 2), v), 6) AS cosine
        |FROM q ORDER BY query_id""".stripMargin,

    // same planted-twin truth as q21 — the structural guarantee holds for
    // ANY (planes, tables), so the auto-tuned run must reproduce it exactly
    "q61_ann_lsh_auto" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |  q AS (SELECT vec_id AS query_id, v FROM e
        |        WHERE vec_id % 5 = 0 AND vec_id < 100)
        |SELECT query_id, query_id + 100000 AS neighbor_id,
        |  round(list_cosine_similarity(list_transform(v, x -> x * 2), v), 6) AS cosine
        |FROM q ORDER BY query_id""".stripMargin,

    // same planted-twin truth again — IVF cell assignment is
    // scale-invariant, so the twin is guaranteed at nprobe = 1 for ANY
    // trained quantizer (IvfSpec proves the structural property and the
    // nprobe = nlist ≡ brute-force exactness)
    "q62_ann_ivf" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |  q AS (SELECT vec_id AS query_id, v FROM e
        |        WHERE vec_id % 5 = 0 AND vec_id < 100)
        |SELECT query_id, query_id + 100000 AS neighbor_id,
        |  round(list_cosine_similarity(list_transform(v, x -> x * 2), v), 6) AS cosine
        |FROM q ORDER BY query_id""".stripMargin,

    // same planted-twin truth as q62 — the auto-tuner cannot break a
    // structural guarantee that holds for every (nlist, nprobe ≥ 1)
    "q66_ann_ivf_auto" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |  q AS (SELECT vec_id AS query_id, v FROM e
        |        WHERE vec_id % 5 = 0 AND vec_id < 100)
        |SELECT query_id, query_id + 100000 AS neighbor_id,
        |  round(list_cosine_similarity(list_transform(v, x -> x * 2), v), 6) AS cosine
        |FROM q ORDER BY query_id""".stripMargin,

    // exact truth for the persisted-index search at nprobe = nlist: the
    // same exhaustive scan as q20 (the index path must lose NOTHING)
    "q63_ann_ivf_index" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |  q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (1, 2, 3)),
        |  c AS (SELECT q.query_id, e.vec_id AS neighbor_id,
        |          list_cosine_similarity(e.v, q.qv) AS cos
        |        FROM e, q WHERE e.vec_id <> q.query_id),
        |  r AS (SELECT query_id, neighbor_id, cos,
        |          ROW_NUMBER() OVER (PARTITION BY query_id
        |            ORDER BY cos DESC, neighbor_id ASC) AS rn
        |        FROM c)
        |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, CAST(rn AS INT) AS rank
        |FROM r WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin,

    // truth for the as-of boundary read: the first commit's batch is the
    // deterministic even-event_id slice, recomputed here from the raw table
    "q64_sink_time_travel" ->
      """SELECT CAST(user_id % 8 AS VARCHAR) AS bucket,
        |  count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM events WHERE event_id % 2 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // maintenance must be invisible: the post-compaction post-expiry
    // snapshot is just the full table
    "q67_sink_compaction" ->
      """SELECT CAST(user_id % 8 AS VARCHAR) AS bucket,
        |  count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // planted-copy recall certificate: identical text → jaccard exactly 1
    "q22_simhash_neardup" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |  CAST(1.0 AS DOUBLE) AS jaccard
        |FROM documents WHERE doc_id % 7 = 0 ORDER BY 1, 2""".stripMargin,

    // squashed contextual embedding recomputed in pure SQL from the IJ
    // fixture: hex grid distance d = (|di| + |dj| + |di-dj|) / 2
    "q27_h3_contextual" ->
      """WITH r AS (SELECT region_id FROM read_parquet('/root/reference/tests/embedders/hex2vec/test_files/poz_8_regions.parquet')),
        |jc AS (SELECT region_id, CAST(count(*) AS INT) AS c
        |       FROM read_parquet('/root/reference/tests/embedders/hex2vec/test_files/poz_8_joint.parquet') GROUP BY 1),
        |base AS (SELECT r.region_id, COALESCE(c, 0) AS c FROM r LEFT JOIN jc USING (region_id)),
        |ij AS (SELECT region_id, i, j FROM read_parquet('/root/repo/fixtures/poz8_ij.parquet')),
        |pairs AS (SELECT a.region_id, b.region_id AS nb,
        |    (abs(a.i - b.i) + abs(a.j - b.j) + abs((a.i - b.i) - (a.j - b.j))) // 2 AS d
        |  FROM ij a JOIN ij b ON a.region_id <> b.region_id),
        |a1 AS (SELECT p.region_id, AVG(base.c) AS m FROM pairs p
        |       JOIN base ON base.region_id = p.nb WHERE d = 1 GROUP BY 1),
        |a2 AS (SELECT p.region_id, AVG(base.c) AS m FROM pairs p
        |       JOIN base ON base.region_id = p.nb WHERE d = 2 GROUP BY 1)
        |SELECT b.region_id,
        |  CAST(b.c AS DOUBLE) + COALESCE(a1.m, 0) / 4.0 + COALESCE(a2.m, 0) / 9.0 AS cnt
        |FROM base b LEFT JOIN a1 USING (region_id) LEFT JOIN a2 USING (region_id)
        |ORDER BY region_id""".stripMargin,

    // end-to-end flagship certificate: counts recomputed from the golden
    // joint pair set — exact match requires our regionalize→join pipeline
    // to reproduce srai's joint EXACTLY on real OSM data
    "q29_flagship_pipeline" ->
      """WITH r AS (SELECT region_id FROM read_parquet('/root/reference/tests/embedders/hex2vec/test_files/poz_8_regions.parquet')),
        |f AS (SELECT feature_id, amenity, leisure FROM read_parquet('/root/reference/tests/embedders/hex2vec/test_files/poz_8_features.parquet')),
        |j AS (SELECT region_id, feature_id FROM read_parquet('/root/reference/tests/embedders/hex2vec/test_files/poz_8_joint.parquet')),
        |c AS (SELECT j.region_id,
        |        SUM(CASE WHEN f.amenity = 'restaurant' THEN 1 ELSE 0 END) AS a,
        |        SUM(CASE WHEN f.leisure = 'park' THEN 1 ELSE 0 END) AS l
        |      FROM j JOIN f USING (feature_id) GROUP BY 1)
        |SELECT r.region_id,
        |  CAST(COALESCE(a, 0) AS INT) AS amenity_restaurant,
        |  CAST(COALESCE(l, 0) AS INT) AS leisure_park
        |FROM r LEFT JOIN c USING (region_id) ORDER BY region_id""".stripMargin,

    "q30_trajectory_metrics" -> {
      val hav = graft.functions.Gf.haversineSql("lat", "lng", "latp", "lngp")
      val xl = DerivedGeo.tileXSql("lng", 6); val yl = DerivedGeo.tileYSql("lat", 6)
      val xp = DerivedGeo.tileXSql("lngp", 6); val yp = DerivedGeo.tileYSql("latp", 6)
      s"""WITH ev AS (
         |  SELECT user_id, ts, event_id,
         |    (event_id % 3600) / 10.0 - 180.0 + 0.05 AS lng,
         |    ((event_id * 7) % 1200) / 10.0 - 60.0 + 0.05 AS lat
         |  FROM events),
         |e2 AS (SELECT *, lng + (user_id % 7 - 3) * 0.02 AS lngp,
         |               lat + (user_id % 5 - 2) * 0.02 AS latp FROM ev),
         |e3 AS (SELECT user_id,
         |    CAST(round($hav, 3) AS DECIMAL(25,6)) AS d,
         |    CASE WHEN $xl = $xp AND $yl = $yp THEN 1 ELSE 0 END AS m
         |  FROM e2)
         |SELECT user_id,
         |  round(CAST(SUM(d) AS DOUBLE) / COUNT(*), 6) AS hav_mean_m,
         |  CAST(SUM(m) AS DOUBLE) / COUNT(*) AS tile_acc,
         |  CAST(COUNT(*) AS INT) AS n_points
         |FROM e3 GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // disjoint z6 tiles: dissolved-union area == closed-form per-tile sum
    "q31_union_tiles" -> {
      val x = DerivedGeo.tileXSql("lng", 6)
      val y = DerivedGeo.tileYSql("lat", 6)
      s"""WITH p AS (${DerivedGeo.pointsSql}),
         |t AS (SELECT DISTINCT $x AS x, $y AS y FROM p),
         |a AS (SELECT x, y,
         |    degrees(atan((exp(pi() * (1 - 2 * y / 64.0)) - exp(-pi() * (1 - 2 * y / 64.0))) / 2)) AS ymax,
         |    degrees(atan((exp(pi() * (1 - 2 * (y + 1) / 64.0)) - exp(-pi() * (1 - 2 * (y + 1) / 64.0))) / 2)) AS ymin
         |  FROM t)
         |SELECT CONCAT_WS('_', CAST(x // 16 AS VARCHAR), CAST(y // 16 AS VARCHAR), '2') AS parent,
         |  COUNT(*) AS n_tiles,
         |  round(SUM((360.0 / 64.0) * (ymax - ymin)), 6) AS union_area
         |FROM a GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q32_gtfs" -> {
      val hourCols = (0 until 24).map { h =>
        s"""  CAST(COUNT(DISTINCT j.trip_id) FILTER (WHERE hour = $h) AS BIGINT) AS trips_at_$h,
           |  COALESCE(array_to_string(list_sort(list(DISTINCT trip_headsign) FILTER (WHERE hour = $h)), ','), '') AS directions_at_$h""".stripMargin
      }.mkString(",\n")
      s"""WITH trips AS (SELECT 't' || CAST(id AS VARCHAR) AS trip_id,
         |        'HS' || CAST(id % 7 AS VARCHAR) AS trip_headsign FROM range(200) t(id)),
         |stops AS (SELECT 's' || CAST(id AS VARCHAR) AS stop_id,
         |        id / 10.0 AS lng, id / 20.0 AS lat FROM range(40) t(id)),
         |st AS (SELECT 't' || CAST(id % 200 AS VARCHAR) AS trip_id,
         |        's' || CAST((id * 7) % 40 AS VARCHAR) AS stop_id,
         |        CASE WHEN id % 11 = 0 THEN NULL ELSE
         |          lpad(CAST((id * 13) % 30 AS VARCHAR), 2, '0') || ':' ||
         |          lpad(CAST(id % 60 AS VARCHAR), 2, '0') || ':00' END AS departure_time
         |     FROM range(4000) t(id)),
         |j AS (SELECT st.stop_id, st.trip_id, t.trip_headsign,
         |        CAST(replace(substring(departure_time, 1, 2), ':', '') AS INT) % 24 AS hour
         |      FROM st JOIN trips t USING (trip_id) WHERE departure_time IS NOT NULL),
         |agg AS (SELECT stop_id,
         |$hourCols
         |  FROM j GROUP BY stop_id)
         |SELECT s.stop_id, agg.* EXCLUDE (stop_id), s.lng, s.lat
         |FROM stops s JOIN agg USING (stop_id) ORDER BY s.stop_id""".stripMargin
    },

    "q57_gtfs_visits" -> {
      val hourCols = (0 until 24).map { h =>
        s"  CAST(COUNT(*) FILTER (WHERE hour = $h) AS BIGINT) AS trips_at_$h"
      }.mkString(",\n")
      s"""WITH trips AS (SELECT 't' || CAST(id AS VARCHAR) AS trip_id,
         |        'HS' || CAST(id % 7 AS VARCHAR) AS trip_headsign FROM range(200) t(id)),
         |st AS (SELECT 't' || CAST(id % 200 AS VARCHAR) AS trip_id,
         |        's' || CAST((id * 7) % 40 AS VARCHAR) AS stop_id,
         |        CASE WHEN id % 11 = 0 THEN NULL ELSE
         |          lpad(CAST((id * 13) % 30 AS VARCHAR), 2, '0') || ':' ||
         |          lpad(CAST(id % 60 AS VARCHAR), 2, '0') || ':00' END AS departure_time
         |     FROM range(4000) t(id)),
         |j AS (SELECT st.stop_id, st.trip_id,
         |        CAST(replace(substring(departure_time, 1, 2), ':', '') AS INT) % 24 AS hour
         |      FROM st JOIN trips t USING (trip_id) WHERE departure_time IS NOT NULL)
         |SELECT stop_id,
         |$hourCols
         |FROM j GROUP BY stop_id ORDER BY stop_id""".stripMargin
    },

    "q58_auto_level_join" ->
      s"""WITH p AS (${DerivedGeo.pointsSql}), r AS (${DerivedGeo.rectsSql})
         |SELECT r.region_id, COUNT(*) AS n_points
         |FROM p JOIN r ON p.lng >= r.xmin AND p.lng <= r.xmax
         |              AND p.lat >= r.ymin AND p.lat <= r.ymax
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q33_way_normalize" ->
      """SELECT id,
        |  CASE id % 4 WHEN 0 THEN 'residential' WHEN 1 THEN 'primary' ELSE 'None' END AS highway,
        |  CASE id % 12 WHEN 3 THEN 'None' WHEN 5 THEN '5' WHEN 6 THEN 'None'
        |    WHEN 7 THEN 'None' WHEN 8 THEN 'None' WHEN 9 THEN '7'
        |    WHEN 10 THEN '120' WHEN 11 THEN '200' ELSE '50' END AS maxspeed,
        |  CASE id % 6 WHEN 2 THEN '15' WHEN 3 THEN 'None' WHEN 4 THEN 'None'
        |    WHEN 5 THEN '3' ELSE '2' END AS lanes,
        |  CASE id % 7 WHEN 0 THEN '3.5' WHEN 1 THEN '4.0' WHEN 2 THEN '0.5'
        |    WHEN 3 THEN '3.0' WHEN 4 THEN '30.0' ELSE 'None' END AS width
        |FROM range(1200) t(id) ORDER BY id""".stripMargin,

    "q34_hmp_preprocess" -> {
      val x = DerivedGeo.tileXSql("(event_id % 3600) / 10.0 - 180.0 + 0.05", 6)
      val y = DerivedGeo.tileYSql("((event_id * 7) % 1200) / 10.0 - 60.0 + 0.05", 6)
      s"""WITH ev AS (SELECT user_id, ts, event_id,
         |    CONCAT_WS('_', CAST($x AS VARCHAR), CAST($y AS VARCHAR)) AS cell
         |  FROM events),
         |sq AS (SELECT user_id, list(cell ORDER BY ts, event_id) AS seq,
         |              list(ts ORDER BY ts, event_id) AS tss
         |       FROM ev GROUP BY 1),
         |sp AS (SELECT user_id, len(seq) AS n,
         |    CASE WHEN CAST(floor(len(seq) * 0.85) AS INT) = len(seq) THEN len(seq) - 1
         |         ELSE CAST(floor(len(seq) * 0.85) AS INT) END AS k, seq, tss FROM sq),
         |d AS (SELECT user_id, n,
         |    len(list_distinct(seq[1:k])) AS x_len,
         |    len(list_distinct(seq[k+1:n])) AS y_len,
         |    CASE WHEN n < 2 THEN 0.0 ELSE epoch(tss[n]) - epoch(tss[1]) END AS dur
         |  FROM sp),
         |st AS (SELECT min(x_len + y_len) AS mn, max(x_len + y_len) AS mx FROM d)
         |SELECT user_id, CAST(n AS INT) AS n, CAST(x_len AS INT) AS x_len,
         |  CAST(y_len AS INT) AS y_len,
         |  CAST(x_len + y_len AS DOUBLE) AS stratify_col,
         |  CAST(CASE WHEN mx = mn THEN 0 ELSE
         |    greatest(0, least(CAST(ceil((x_len + y_len - mn) / ((mx - mn) / 8.0)) AS INT) - 1, 7))
         |  END AS INT) AS stratification_bin,
         |  round(dur, 6) AS duration_s
         |FROM d, st ORDER BY user_id""".stripMargin
    },

    "q35_h3_contextual_concat" ->
      """WITH r AS (SELECT region_id FROM read_parquet('/root/reference/tests/embedders/hex2vec/test_files/poz_8_regions.parquet')),
        |jc AS (SELECT region_id, CAST(count(*) AS INT) AS c
        |       FROM read_parquet('/root/reference/tests/embedders/hex2vec/test_files/poz_8_joint.parquet') GROUP BY 1),
        |base AS (SELECT r.region_id, COALESCE(c, 0) AS c FROM r LEFT JOIN jc USING (region_id)),
        |ij AS (SELECT region_id, i, j FROM read_parquet('/root/repo/fixtures/poz8_ij.parquet')),
        |pairs AS (SELECT a.region_id, b.region_id AS nb,
        |    (abs(a.i - b.i) + abs(a.j - b.j) + abs((a.i - b.i) - (a.j - b.j))) // 2 AS d
        |  FROM ij a JOIN ij b ON a.region_id <> b.region_id),
        |a1 AS (SELECT p.region_id, AVG(base.c) AS m FROM pairs p
        |       JOIN base ON base.region_id = p.nb WHERE d = 1 GROUP BY 1),
        |a2 AS (SELECT p.region_id, AVG(base.c) AS m FROM pairs p
        |       JOIN base ON base.region_id = p.nb WHERE d = 2 GROUP BY 1)
        |SELECT b.region_id, CAST(b.c AS DOUBLE) AS cnt_0,
        |  COALESCE(a1.m, 0) AS cnt_1, COALESCE(a2.m, 0) AS cnt_2
        |FROM base b LEFT JOIN a1 USING (region_id) LEFT JOIN a2 USING (region_id)
        |ORDER BY region_id""".stripMargin,

    "q36_h3_contextual_median" ->
      """WITH r AS (SELECT region_id FROM read_parquet('/root/reference/tests/embedders/hex2vec/test_files/poz_8_regions.parquet')),
        |jc AS (SELECT region_id, CAST(count(*) AS INT) AS c
        |       FROM read_parquet('/root/reference/tests/embedders/hex2vec/test_files/poz_8_joint.parquet') GROUP BY 1),
        |base AS (SELECT r.region_id, COALESCE(c, 0) AS c FROM r LEFT JOIN jc USING (region_id)),
        |ij AS (SELECT region_id, i, j FROM read_parquet('/root/repo/fixtures/poz8_ij.parquet')),
        |pairs AS (SELECT a.region_id, b.region_id AS nb,
        |    (abs(a.i - b.i) + abs(a.j - b.j) + abs((a.i - b.i) - (a.j - b.j))) // 2 AS d
        |  FROM ij a JOIN ij b ON a.region_id <> b.region_id),
        |a1 AS (SELECT p.region_id, median(base.c) AS m FROM pairs p
        |       JOIN base ON base.region_id = p.nb WHERE d = 1 GROUP BY 1),
        |a2 AS (SELECT p.region_id, median(base.c) AS m FROM pairs p
        |       JOIN base ON base.region_id = p.nb WHERE d = 2 GROUP BY 1)
        |SELECT b.region_id, CAST(b.c AS DOUBLE) AS cnt_0,
        |  CAST(COALESCE(a1.m, 0) AS DOUBLE) AS cnt_1,
        |  CAST(COALESCE(a2.m, 0) AS DOUBLE) AS cnt_2
        |FROM base b LEFT JOIN a1 USING (region_id) LEFT JOIN a2 USING (region_id)
        |ORDER BY region_id""".stripMargin,

    // great-circle argmin IS the Voronoi-cell definition — certifies the
    // gnomonic-clipped spherical cell geometry through the point join
    "q37_voronoi_assign" -> {
      val seedRows = voronoiSeeds.zipWithIndex
        .map { case ((lngS, latS), i) => s"($i, $lngS, $latS)" }.mkString(", ")
      val hav = graft.functions.Gf.haversineSql("p.lat", "p.lng", "s.lat", "s.lng")
      s"""WITH p0 AS (${DerivedGeo.pointsSql}),
         |p AS (SELECT * FROM p0 WHERE lng BETWEEN -50 AND 45
         |                         AND lat BETWEEN -35 AND 40),
         |seeds(sid, lng, lat) AS (VALUES $seedRows),
         |d AS (SELECT p.point_id, s.sid, $hav AS dist
         |      FROM p, seeds s),
         |best AS (SELECT point_id, sid, ROW_NUMBER() OVER (
         |           PARTITION BY point_id ORDER BY dist, sid) AS rn FROM d)
         |SELECT CAST(sid AS VARCHAR) AS region_id, COUNT(*) AS n
         |FROM best WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q38_adjacency" ->
      """WITH g AS (SELECT n_nationkey AS r, n_nationkey % 5 AS gx,
        |                  CAST(floor(n_nationkey / 5) AS INT) AS gy FROM nation)
        |SELECT CAST(a.r AS VARCHAR) AS region_id, CAST(b.r AS VARCHAR) AS neighbour_id
        |FROM g a JOIN g b ON a.r <> b.r
        |  AND abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
        |ORDER BY 1, 2""".stripMargin,

    "q39_bfs_closure" ->
      """WITH g AS (SELECT n_nationkey AS r, n_nationkey % 5 AS gx,
        |                  CAST(floor(n_nationkey / 5) AS INT) AS gy FROM nation)
        |SELECT CAST(a.r AS VARCHAR) AS region_id, CAST(b.r AS VARCHAR) AS neighbour_id,
        |  CAST(greatest(abs(a.gx - b.gx), abs(a.gy - b.gy)) AS INT) AS distance
        |FROM g a JOIN g b ON a.r <> b.r
        |  AND greatest(abs(a.gx - b.gx), abs(a.gy - b.gy)) <= 3
        |ORDER BY 1, 2""".stripMargin,

    "q40_scaling" ->
      """WITH base AS (
        |  SELECT CAST(c_nationkey AS VARCHAR) AS region_id,
        |    CAST(COUNT(*) AS DOUBLE) AS f1,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS f2
        |  FROM customer GROUP BY 1),
        |st AS (SELECT avg(f1) AS m1, stddev_pop(f1) AS s1,
        |              avg(f2) AS m2, stddev_pop(f2) AS s2,
        |              min(f1) AS mn1, max(f1) AS mx1 FROM base)
        |SELECT region_id,
        |  round((f1 - m1) / s1, 6) AS f1_std,
        |  round((f2 - m2) / s2, 6) AS f2_std,
        |  round(least(greatest((f1 - mn1) / (mx1 - mn1), 0.0), 1.0), 6) AS f1_mm
        |FROM base, st ORDER BY region_id""".stripMargin,

    "q41_neighbours_upto" ->
      """WITH g AS (SELECT n_nationkey AS r, n_nationkey % 5 AS gx,
        |                  CAST(floor(n_nationkey / 5) AS INT) AS gy FROM nation),
        |seeds AS (SELECT * FROM g WHERE r IN (0, 6, 12, 24))
        |SELECT CAST(a.r AS VARCHAR) AS region_id, CAST(b.r AS VARCHAR) AS neighbour_id,
        |  CAST(greatest(abs(a.gx - b.gx), abs(a.gy - b.gy)) AS INT) AS distance
        |FROM seeds a JOIN g b
        |  ON greatest(abs(a.gx - b.gx), abs(a.gy - b.gy)) <= 2
        |ORDER BY 1, 2, 3""".stripMargin,

    "q42_intersection_geom" -> {
      val lng = graft.sources.Images.lngSql("k")
      val lat = graft.sources.Images.latSql("k")
      s"""WITH keys AS (${graft.sources.Images.keysSql}),
         |img AS (SELECT k, $lng AS lng, $lat AS lat FROM keys WHERE k < 4000),
         |r AS (${DerivedGeo.rectsSql}),
         |j AS (SELECT r.region_id, 'img_' || lpad(CAST(k AS VARCHAR), 9, '0') AS feature_id,
         |        (least(lng + 0.02, r.xmax) - greatest(lng - 0.02, r.xmin)) AS w,
         |        (least(lat + 0.02, r.ymax) - greatest(lat - 0.02, r.ymin)) AS h
         |      FROM img JOIN r ON lng - 0.02 <= r.xmax AND lng + 0.02 >= r.xmin
         |                     AND lat - 0.02 <= r.ymax AND lat + 0.02 >= r.ymin)
         |SELECT region_id, feature_id, round(w * h, 9) AS ix_area
         |FROM j ORDER BY region_id, feature_id""".stripMargin
    },

    "q43_hex_tensor" ->
      """WITH r AS (SELECT region_id FROM read_parquet('/root/reference/tests/embedders/hex2vec/test_files/poz_8_regions.parquet')),
        |jc AS (SELECT region_id, CAST(count(*) AS INT) AS c
        |       FROM read_parquet('/root/reference/tests/embedders/hex2vec/test_files/poz_8_joint.parquet') GROUP BY 1),
        |base AS (SELECT r.region_id, COALESCE(c, 0) AS c FROM r LEFT JOIN jc USING (region_id)),
        |ij AS (SELECT region_id, i, j FROM read_parquet('/root/repo/fixtures/poz8_ij.parquet')),
        |rel AS (SELECT a.region_id AS anchor, b.region_id AS nb,
        |    b.i - a.i AS di, b.j - a.j AS dj,
        |    (abs(a.i - b.i) + abs(a.j - b.j) + abs((a.i - b.i) - (a.j - b.j))) // 2 AS d
        |  FROM ij a JOIN ij b ON true),
        |near AS (SELECT * FROM rel WHERE d <= 1),
        |complete AS (SELECT anchor FROM near GROUP BY 1 HAVING count(*) = 7),
        |axes AS (SELECT unnest(generate_series(0, 3)) AS x),
        |slots AS (SELECT c.anchor, r.x AS r, cc.x AS c FROM complete c, axes r, axes cc),
        |vals AS (SELECT n.anchor,
        |    CAST(((1 + n.di) * 4 + (1 - n.dj)) // 4 AS INT) AS r,
        |    CAST(((1 + n.di) * 4 + (1 - n.dj)) % 4 AS INT) AS c,
        |    base.c AS v
        |  FROM near n JOIN complete USING (anchor)
        |  JOIN base ON base.region_id = n.nb)
        |SELECT sl.anchor AS region_id, CAST(sl.r AS INT) AS r, CAST(sl.c AS INT) AS c,
        |  CAST(COALESCE(v.v, 0) AS DOUBLE) AS v
        |FROM slots sl LEFT JOIN vals v USING (anchor, r, c)
        |ORDER BY 1, 2, 3""".stripMargin,

    // recursive-CTE replay of the greedy stratified split: state = the
    // (split × bin) placed-count matrix as 16 BIGINT columns, one recursion
    // step per cell in seeded hash order, cost terms generated in the exact
    // b-ascending / split-ascending order the Scala fold sums them (IEEE
    // double addition order matters for bit parity)
    "q45_spatial_split" -> {
      val nBins = 8
      val want = Seq(0.5, 0.5)
      def cost(s: Int): String = (1 to nBins).flatMap { b =>
        Seq(0, 1).map { s2 =>
          val add =
            if (s2 == s) s"(CASE WHEN o.bucket = $b THEN o.n ELSE 0 END)"
            else "0"
          s"abs(CAST(${want(s2)} AS DOUBLE) - (g.g${s2}_$b + $add) / t.t$b)"
        }
      }.mkString(" + ")
      val pickTrain = s"(${cost(0)}) <= (${cost(1)})"
      val gInit = (for (s <- 0 to 1; b <- 1 to nBins)
        yield s"CAST(0 AS BIGINT) AS g${s}_$b").mkString(", ")
      val gStep = (for (s <- 0 to 1; b <- 1 to nBins) yield {
        val cond = if (s == 0) pickTrain else s"NOT ($pickTrain)"
        s"g.g${s}_$b + (CASE WHEN ($cond) AND o.bucket = $b THEN o.n ELSE 0 END) AS g${s}_$b"
      }).mkString(",\n    ")
      val tots = (1 to nBins).map(b =>
        s"greatest(CAST(1 AS DOUBLE), CAST(COALESCE(sum(CASE WHEN bucket = $b THEN n END), 0) AS DOUBLE)) AS t$b")
        .mkString(",\n    ")
      s"""WITH RECURSIVE
         |stats AS (SELECT CAST(user_id % 6 AS BIGINT) AS cell,
         |                 CAST(count(*) AS BIGINT) AS n
         |          FROM events GROUP BY 1),
         |bucketed AS (SELECT cell, n,
         |    CAST(ntile($nBins) OVER (ORDER BY n, cell) AS INT) AS bucket
         |  FROM stats),
         |ordered AS (SELECT cell, n, bucket,
         |    CAST(row_number() OVER (ORDER BY
         |      ((cell % 2147483647) * 48271 + 42) % 2147483647, cell) AS INT) AS step
         |  FROM bucketed),
         |tot AS (SELECT
         |    $tots
         |  FROM bucketed),
         |g AS (
         |  SELECT 0 AS step, CAST(NULL AS VARCHAR) AS choice, $gInit
         |  UNION ALL
         |  SELECT g.step + 1,
         |    CASE WHEN $pickTrain THEN 'train' ELSE 'test' END AS choice,
         |    $gStep
         |  FROM g, ordered o, tot t WHERE o.step = g.step + 1
         |)
         |SELECT o.cell, o.n, o.bucket, gg.choice AS split
         |FROM g gg JOIN ordered o USING (step)
         |ORDER BY cell""".stripMargin
    },

    "q46_hex2vec_triplets" ->
      """WITH r AS (SELECT region_id,
        |    CAST(CAST('0x' || region_id AS UBIGINT) AS BIGINT) AS a64
        |  FROM read_parquet('/root/reference/tests/embedders/hex2vec/test_files/poz_8_regions.parquet')),
        |ij AS (SELECT region_id, i, j FROM read_parquet('/root/repo/fixtures/poz8_ij.parquet')),
        |rel AS (SELECT a.region_id AS anchor, b.region_id AS cand,
        |    (abs(a.i - b.i) + abs(a.j - b.j) + abs((a.i - b.i) - (a.j - b.j))) // 2 AS d
        |  FROM ij a JOIN ij b ON a.region_id <> b.region_id),
        |pos AS (SELECT anchor, cand AS positive FROM rel WHERE d = 1),
        |excl AS (SELECT anchor, cand FROM rel WHERE d <= 2),
        |idxed AS (SELECT region_id AS candidate,
        |    row_number() OVER (ORDER BY a64 % 64, region_id) - 1 AS idx FROM r),
        |nn AS (SELECT count(*) AS n FROM r),
        |picks AS (SELECT r.region_id AS anchor, s.i,
        |    ((r.a64 % 2147483647) * 48271 + (s.i + 1) * 16807 + 42)
        |      % 2147483647 % (SELECT n FROM nn) AS idx
        |  FROM r, (SELECT unnest(generate_series(0, 15)) AS i) s),
        |cand AS (SELECT p.anchor, x.candidate, min(p.i) AS i
        |  FROM picks p JOIN idxed x USING (idx)
        |  WHERE x.candidate <> p.anchor GROUP BY 1, 2),
        |surv AS (SELECT c.* FROM cand c
        |  LEFT JOIN excl e ON c.anchor = e.anchor AND c.candidate = e.cand
        |  WHERE e.anchor IS NULL),
        |neg AS (SELECT anchor, candidate AS negative FROM (
        |    SELECT *, row_number() OVER (PARTITION BY anchor
        |      ORDER BY i, candidate) AS rn FROM surv)
        |  WHERE rn <= 2)
        |SELECT p.anchor, p.positive, n.negative
        |FROM pos p JOIN neg n USING (anchor)
        |ORDER BY 1, 2, 3""".stripMargin,

    "q44_lineage_resume" ->
      """SELECT 'b' || CAST(doc_id % 7 AS VARCHAR) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS chars,
        |  CAST(count(*) AS BIGINT) AS m_rows
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q09_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM e)
        |SELECT user_id, session_seq, MIN(ts) AS session_start, COUNT(*) AS n_events
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
