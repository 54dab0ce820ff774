package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the 100-TB shape: pushdown reaches parquet,
  * small sides broadcast, hot paths stay inside whole-stage codegen, and
  * the flagship join contains no cartesian/nested-loop stage. */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession.spark

  val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    df.queryExecution.executedPlan.toString
  }

  test("flagship spatial join: broadcast hash join, no cartesian product") {
    val p = plan("q06_spatial_join")
    assert(!p.contains("BroadcastNestedLoop"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n${p.take(2000)}")
  }

  test("filter + projection push down to the parquet scan") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .where(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val p = df.queryExecution.executedPlan.toString
    // constraintPropagation is intentionally off (no inferred IsNotNull);
    // the user's explicit predicate must still reach the scan
    assert(p.contains("GreaterThan(l_quantity,30.0)"),
      s"missing pushdown:\n${p.take(1500)}")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"missing column pruning:\n${p.take(1500)}")
  }

  test("tile assignment is whole-stage codegen end to end (no UDF boxing)") {
    val p = plan("q05_tile_assign")
    // whole-stage codegen renders as *(n) stage markers in the plan string
    assert(p.contains("*(1)"), s"no codegen stages:\n${p.take(1200)}")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))
  }

  test("cell-join refinement expressions run inside codegen stages") {
    val p = plan("q06_spatial_join")
    // custom expressions compile via static kernels: no ScalaUDF nodes
    assert(!p.contains("ScalaUDF"))
    assert(p.contains("*(1)"), s"no codegen stages:\n${p.take(1200)}")
  }

  test("dedup/minhash plan has a single shuffle per aggregate (partial aggs)") {
    val p = plan("q17_exact_dedup")
    // partial_count before the exchange proves map-side combine
    assert(p.contains("partial_count") || p.contains("HashAggregate"))
  }

  test("box-feature footprint join: one Generate, no pair-dedup exchange") {
    import org.apache.spark.sql.execution.GenerateExec
    val df = SparkEntry.queries("q11_image_footprint_join")(spark, dir)
    df.collect()
    // AQE wraps the broadcast side in a query stage the tree collect does
    // not descend into — inspect the rendered FINAL plan instead
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // only the (small) region side explodes its cover; images are keyed by
    // their single center cell — round 2 exploded both sides ×~4
    val coverGenerates = "Generate explode\\(s2_cover".r.findAllIn(p).size
    assert(coverGenerates === 1,
      s"expected 1 cover Generate, got $coverGenerates:\n${p.take(2000)}")
    assert(p.contains("s2_cover_expanded"), "region side should cover ⊕ h")
    // center-cell keying makes each pair unique by construction → the
    // dropDuplicates exchange keyed by (region_id, feature_id) is gone
    // (the remaining region_id-only exchange is the final count aggregate)
    val dedupEx = "hashpartitioning\\(region_id#\\d+, feature_id#\\d+".r
    assert(dedupEx.findFirstIn(p).isEmpty,
      s"pair-dedup exchange present:\n${p.take(1500)}")
  }

  test("GTFS hour pivot plans without an Expand node (no ×25 row blowup)") {
    // 24 independent count_distinct aggregates would rewrite through Expand,
    // multiplying stop_times before the exchange (VERDICT r2 #2); the
    // per-(stop, hour) single-distinct shape must not
    val p = plan("q32_gtfs")
    assert(!p.contains("Expand"), s"Expand in GTFS plan:\n${p.take(2000)}")
  }

  test("lineage-sink layout prunes partitions on bucket predicates") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("prune").toString
    val df = (0 until 200).map(i => (i.toLong, s"b${i % 10}")).toDF("id", "bucket")
    graft.sources.LineageSink.write(df, out, "bucket")
    val read = spark.read.parquet(s"$out/data").where(col("bucket") === "b3")
    val p = read.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [(bucket"),
      s"bucket predicate not pruning partitions:\n${p.take(1200)}")
    assert(read.count() === 20)
  }

  test("minhash/simhash/LSH: no array payload rides a multi-key (band/pair) exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.types.ArrayType
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("q18_minhash_neardup", "q22_simhash_neardup", "q21_ann_lsh")) {
        val df = SparkEntry.queries(q)(spark, dir)
        val shuffles = df.queryExecution.executedPlan.collect {
          case s: ShuffleExchangeExec => s
        }
        assert(shuffles.nonEmpty)
        shuffles.foreach { s =>
          val keys = s.outputPartitioning match {
            case h: HashPartitioning => h.expressions.length
            case _ => 0
          }
          val arrays = s.output.filter(_.dataType.isInstanceOf[ArrayType])
          // banding exchanges (band, hash) and pair-dedup exchanges
          // (id_a, id_b) are multi-key: they must be payload-free; only the
          // single-id join-backs may carry the shingle/vector arrays once
          if (keys >= 2)
            assert(arrays.isEmpty,
              s"$q: multi-key exchange carries arrays ${arrays.map(_.name)}")
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("ANN top-k and patch grid plans contain no Window operator") {
    for (q <- Seq("q20_ann_topk", "q21_ann_lsh", "q12_patch_grid")) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), s"$q plan has a window:\n${p.take(1500)}")
    }
  }

  test("near-dup operator plans contain NO higher-order functions (hot-path codegen)") {
    // HOFs (transform/slice/zip_with/exists lambdas) evaluate interpreted
    // per element — the round-4 kernel pass removed every one from the
    // dedup/similarity hot paths (measured 3-5× per operator); this guards
    // the regression class wholesale. Operator plans are built over plain
    // literal inputs (some SparkEntry queries legitimately use a HOF to
    // SYNTHESIZE their test data).
    import spark.implicits._
    import graft.operators.{Dedup, Similarity}
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e g"))
      .toDF("doc_id", "text")
    val vecs = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f, 2.1f)))
      .toDF("vec_id", "embedding")
    val geo = Seq((1L, -20.0, 30.0)).toDF("image_id", "lng", "lat")
    val seqs = Seq((Seq("861f0d487ffffff"), Seq("861f0d487ffffff")))
      .toDF("a", "b")
    val plans = Seq(
      "minhashPairs" -> Dedup.minhashPairs(docs, "doc_id", "text"),
      "simhashPairs" -> Dedup.simhashPairs(docs, "doc_id", "text"),
      "simhashJaccardPairs" -> Dedup.simhashJaccardPairs(docs, "doc_id", "text"),
      "cosineNearDupPairs" -> Similarity.cosineNearDupPairs(vecs, 0.9),
      "lshTopK" -> Similarity.lshTopK(vecs, vecs.limit(1), 5),
      "bruteForceTopK" -> Similarity.bruteForceTopK(vecs, vecs.limit(1), 5),
      "ivfTopKWith" -> Similarity.ivfTopKWith(
        Similarity.IvfModel(1, 2, Array(0.6, 0.8)), vecs, vecs.limit(1), 5, 1),
      "patchGrid" -> graft.operators.Tiling.patchGrid(geo, 8, 10),
      "hexTensor" -> graft.operators.Tiling.hexTensor(
        Seq("861f0d487ffffff").toDF(graft.operators.Tables.RegionsIndex),
        Seq(("861f0d487ffffff", 1.0)).toDF(graft.operators.Tables.RegionsIndex, "v"), 2, "v"),
      "trajectoryMetrics" -> seqs.select(
        graft.operators.Trajectory.sequenceAccuracy(col("a"), col("b")),
        graft.operators.Trajectory.haversineMean(
          graft.operators.Trajectory.h3ToPath(col("a")),
          graft.operators.Trajectory.h3ToPath(col("b")))))
    for ((name, df) <- plans) {
      // walk the TREE, not the plan string — toString truncates wide field
      // lists at spark.sql.debug.maxToStringFields and would hide a lambda
      val lambdas = df.queryExecution.optimizedPlan.collect {
        case node if node.expressions.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.LambdaFunction])) => node
      }
      assert(lambdas.isEmpty,
        s"$name plan evaluates a higher-order function:\n${lambdas.headOption}")
    }
  }

  test("AQE and skew-join handling enabled in the session") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
  }
}

class TripletsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._
  import graft.operators.Triplets

  test("hex2vec triplets: positives adjacent, negatives outside disk(k), deterministic") {
    val center = "862bac507ffffff"
    val cells = graft.core.H3.gridDisk(graft.core.H3.fromHexString(center), 3)
      .map(graft.core.H3.toHexString)
    val regions = cells.toDF(graft.operators.Tables.RegionsIndex)
    val t = Triplets.hex2vec(regions, excludeK = 2, negativesPerAnchor = 2, seed = 7L)
    val rows = t.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.nonEmpty)
    // positive is a direct neighbour of the anchor
    rows.foreach { case (a, p, n) =>
      val aId = graft.core.H3.fromHexString(a)
      assert(graft.core.H3.neighbors(aId).map(graft.core.H3.toHexString).contains(p))
      // negative at hop distance > 2
      val disk2 = graft.core.H3.gridDisk(aId, 2).map(graft.core.H3.toHexString).toSet
      assert(!disk2.contains(n), s"negative $n within disk(2) of $a")
    }
    // deterministic under the same seed
    val t2 = Triplets.hex2vec(regions, excludeK = 2, negativesPerAnchor = 2, seed = 7L)
    assert(t.exceptAll(t2).count() === 0)
  }

  test("every anchor gets exactly negativesPerAnchor negatives (top-up pass)") {
    // tiny vocabulary: disk(2) of the center covers most of disk(3), so the
    // bounded hash picks under-fill for central anchors and the exhaustive
    // top-up must complete them (candidates at distance 3 always exist)
    val center = "862bac507ffffff"
    val cells = graft.core.H3.gridDisk(graft.core.H3.fromHexString(center), 3)
      .map(graft.core.H3.toHexString)
    val regions = cells.toDF(graft.operators.Tables.RegionsIndex)
    val t = Triplets.hex2vec(regions, excludeK = 2, negativesPerAnchor = 8,
      seed = 3L, oversample = 9)
    val perAnchor = t.groupBy("anchor")
      .agg(countDistinct("negative").as("k")).collect()
    assert(perAnchor.nonEmpty)
    perAnchor.foreach { r =>
      assert(r.getLong(1) === 8L, s"anchor ${r.getString(0)} has ${r.getLong(1)} negatives")
    }
  }

  test("triplets plan contains no global (partition-less) window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val center = "862bac507ffffff"
    val cells = graft.core.H3.gridDisk(graft.core.H3.fromHexString(center), 3)
      .map(graft.core.H3.toHexString)
    val regions = cells.toDF(graft.operators.Tables.RegionsIndex)
    val t = Triplets.hex2vec(regions)
    val offenders = t.queryExecution.executedPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(offenders.isEmpty,
      s"global window sorts the vocabulary in one task:\n${offenders.mkString("\n")}")
  }
}
