package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite with graft.testutil.OpenStreamLeakCheck {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-layout-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()

  test("hive-partitioned writes prune partitions at the scan on a day filter") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("day") === "2024-01-05")
    pruned.collect()
    val p = pruned.queryExecution.executedPlan.toString
    // The day predicate must become a PARTITION filter (directory-level
    // listing prune), not a data filter evaluated per row: at 100 TB the
    // difference is reading one day vs reading the lake.
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("isnotnull(day") || pf.contains("day#"),
      s"day filter did not reach PartitionFilters: $pf")
    assert(!pf.contains("PartitionFilters: []"), "partition filter list empty")
    // And the row counts must agree with the unpartitioned read.
    val expect = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(to_date(col("ts")) === "2024-01-05").count()
    assert(pruned.count() === expect)
  }

  test("schema evolution: mergeSchema unions generations, old rows null-fill") {
    val out = java.nio.file.Files.createTempDirectory("graft-evol").toString
    import spark.implicits._
    // Generation 1: (doc_id, text). Generation 2 adds a lang column — the
    // corpus-versioning reality a long-lived lake must read as ONE table.
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$out/gen=1")
    Seq((3L, "gamma", "en")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$out/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.toSet === Set("doc_id", "text", "lang", "gen"))
    val rows = merged.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows === Map(1L -> null, 2L -> null, 3L -> "en"))
    // Column pruning still reaches the scan under the merged schema.
    val p = merged.select("doc_id").queryExecution.executedPlan.toString
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"), s"merged-schema scan reads unused column: $readSchema")
  }

  test("joins between co-bucketed tables plan without an exchange") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    // A fresh in-memory catalog forgets tables from earlier sessions but
    // their directories survive in the warehouse; clear both sides so
    // saveAsTable never trips LOCATION_ALREADY_EXISTS.
    for (t <- Seq("orders_b", "customer_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val loc = new java.io.File(warehouse, t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Layout.writeBucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", Seq("o_custkey"), 4)
    Layout.writeBucketed(customer.select("c_custkey", "c_name"),
      "customer_b", Seq("c_custkey"), 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"co-bucketed join still shuffles:\n$plan")

      // Control: the same join over plain parquet shuffles both sides.
      val unbucketed = orders.join(customer, col("o_custkey") === col("c_custkey"))
      unbucketed.collect()
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))

      // Same results either way.
      assert(joined.count() === unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("zorder2 interleaves bits: known values and bounds") {
    import spark.implicits._
    val rows = Seq(
      (1L, 0L),       // x bit 0 -> z bit 0
      (0L, 1L),       // y bit 0 -> z bit 1
      (0xFFFFL, 0L),  // all-x -> even-bit mask 0x55555555
      (0L, 0xFFFFL),  // all-y -> odd-bit mask 0xAAAAAAAA
      (0xFFFFL, 0xFFFFL)) // full grid corner -> 2^32 - 1
      .toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(rows.toSeq === Seq(1L, 2L, 0x55555555L, 0xAAAAAAAAL, 0xFFFFFFFFL))
  }

  test("hilbert2 matches the hand-walked order-1 and order-2 curves") {
    import spark.implicits._
    def d(bits: Int, cells: (Long, Long)*): Seq[Long] =
      cells.toDF("x", "y")
        .select(Layout.hilbert2(col("x"), col("y"), bits).as("d"))
        .collect().toSeq.map(_.getLong(0))
    // Order 1: the U through (0,0)->(0,1)->(1,1)->(1,0).
    assert(d(1, (0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)) === Seq(0L, 1L, 2L, 3L))
    // Order 2: first and last corners of each quadrant, from the classic
    // 16-cell walk.
    assert(d(2, (0L, 0L), (1L, 0L), (0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 0L))
      === Seq(0L, 1L, 3L, 4L, 7L, 14L, 15L))
  }

  test("hilbert2 order-4: bijective and EVERY consecutive pair is grid-adjacent") {
    import spark.implicits._
    // The property Z-order cannot have (Morton makes diagonal jumps) and
    // the reason Hilbert files cover tighter blobs — checked exhaustively
    // over the full 16x16 grid.
    val cells = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val walked = cells.toDF("x", "y")
      .select(col("x"), col("y"), Layout.hilbert2(col("x"), col("y"), bits = 4).as("d"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    assert(walked.map(_._1).toSeq === (0L until 256L)) // bijection onto [0, 256)
    walked.map(_._2).sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve jumps from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("hilbertAudit files span at most the zorderAudit per-axis bound on uniform data") {
    import spark.implicits._
    // Uniform 64x64-cell grid scaled onto the 16-bit domain; with
    // bucketBits=3 each of the 64 files must cover at most 1/8 of each
    // axis (+1 cell slack for the 1024-wide quantization step).
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x * 1024L, y * 1024L)
    val audit = Layout.hilbertAudit(pts.toDF("x", "y"), col("x"), col("y"), bucketBits = 3)
      .collect()
    assert(audit.map(_.getLong(1)).sum === 64L * 64L)
    audit.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 65536L / 8 + 1024L, s"x span too wide: $r")
      assert(r.getLong(5) - r.getLong(4) <= 65536L / 8 + 1024L, s"y span too wide: $r")
    }
  }

  test("quantize16 maps bounds to grid edges with integer exactness") {
    import spark.implicits._
    val q = Seq(0L, 1L, 1249L, 2500L).toDF("v")
      .select(Layout.quantize16(col("v"), 0L, 2500L).as("q"))
      .collect().map(_.getLong(0))
    assert(q(0) === 0L)
    assert(q(1) === (65536L / 2501))          // exact integer cell
    assert(q(3) === (2500L * 65536L / 2501))  // hi -> top occupied cell, 65509
    assert(q.forall(v => v >= 0 && v <= 65535))
    intercept[IllegalArgumentException] {
      Layout.quantize16(col("v"), 0L, 1L << 38) // width bound is enforced
    }
  }

  test("repartitionByZOrder beats single-column sorting on real written files") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val qx = Layout.quantize16(
      datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).cast("long"),
      0L, 2500L)
    val qy = Layout.quantize16(floor(col("o_totalprice")).cast("long"), 0L, 600000L)
    val cells = o.select(qx.as("qx"), qy.as("qy"))

    def fileSpans(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("zorder-files").toString
      df.write.mode("overwrite").parquet(dir)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq
      files.map { f =>
        val r = spark.read.parquet(f.toString)
          .agg(min("qx"), max("qx"), min("qy"), max("qy")).head()
        (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
      }
    }
    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)

    val z = fileSpans(Layout.repartitionByZOrder(cells, col("qx"), col("qy"), 16))
    val xOnly = fileSpans(cells.repartitionByRange(16, col("qx"))
      .sortWithinPartitions(col("qx")))
    assert(z.size >= 8 && xOnly.size >= 8)
    // Single-column sort: each file is tight on x but spans nearly the
    // full y axis (price is independent of date). Z-order: the median
    // file is tight on BOTH axes — that's the file-skipping win.
    assert(median(xOnly.map(_._2)) > 40000L,
      s"x-sorted files unexpectedly tight on y: $xOnly")
    assert(median(z.map(_._1)) < 25000L, s"z-ordered x spans too wide: $z")
    assert(median(z.map(_._2)) < 25000L, s"z-ordered y spans too wide: $z")
  }

  test("zorderAudit: every file spans at most 1/2^bits of BOTH axes") {
    import spark.implicits._
    // Uniform 64x64 grid scaled onto the 16-bit domain.
    val grid = (for (i <- 0 until 64; j <- 0 until 64)
      yield (i * 1024L, j * 1024L)).toDF("x", "y")
    val audit = Layout.zorderAudit(grid, col("x"), col("y"), bucketBits = 3)
      .collect()
    assert(audit.length === 64) // 8x8 files, all populated
    audit.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 8192, s"x span too wide: $r")
      assert(r.getLong(5) - r.getLong(4) <= 8192, s"y span too wide: $r")
      assert(r.getLong(1) === 64L) // uniform occupancy
    }
  }

  test("compact merges a many-file directory, preserves rows, refuses in-place") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("compact-src").toString
    val dest = java.nio.file.Files.createTempDirectory("compact-dest").toString + "/out"
    // 64 tiny files — the streaming-sink/CDC debris shape.
    (1L to 4096L).map(i => (i, s"row-$i")).toDF("id", "payload")
      .repartition(64).write.mode("overwrite").parquet(src)
    def parquetFiles(d: String) =
      new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(src) === 64)

    val n = graft.sources.Layout.compact(spark, src, dest,
      targetFileBytes = 1L << 20)
    assert(parquetFiles(dest) === n)
    assert(n < 64, s"compaction did not reduce file count: $n")
    // Content survives exactly (same multiset of rows).
    val before = spark.read.parquet(src).collect().map(_.toString).sorted
    val after = spark.read.parquet(dest).collect().map(_.toString).sorted
    assert(after === before)

    intercept[IllegalArgumentException] {
      graft.sources.Layout.compact(spark, src, src + "/../" +
        new java.io.File(src).getName)
    }
  }

  test("shard manifest: order-independent checksum catches every corruption class") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Seq(
      (1L, 0, "alpha doc"), (2L, 0, "beta doc"), (3L, 0, "gamma doc"),
      (4L, 1, "delta doc"), (5L, 1, "epsilon doc"))
    def manifest(rows: Seq[(Long, Int, String)], parts: Int = 1): Map[Int, (Long, Long, Long, Long, Long)] =
      graft.sources.Layout.shardManifest(
        rows.toDF("doc_id", "shard", "text").repartition(parts),
        col("shard"), col("doc_id"), col("text"))
        .collect().map(r => r.getInt(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap

    val m = manifest(base)
    assert(m(0)._1 === 3L && m(1)._1 === 2L)
    assert(m(0)._2 === ("alpha doc".length + "beta doc".length + "gamma doc".length).toLong)
    assert((m(0)._3, m(0)._4) === ((1L, 3L)))

    // Row order and partitioning are free: shuffled input, many
    // partitions — identical manifest (xor is commutative/associative,
    // partials combine map-side).
    assert(manifest(scala.util.Random.shuffle(base), parts = 4) === m)

    // Every corruption class moves the touched shard's line and ONLY it:
    val flipped = base.updated(1, (2L, 0, "beta dox"))           // one byte
    val dropped = base.take(4)                                    // lost row (shard 1)
    val duped = base :+ ((3L, 0, "gamma doc"))                    // double-counted row
    val swapped = base.updated(0, (1L, 0, "beta doc"))            // texts traded between
      .updated(1, (2L, 0, "alpha doc"))                           // ids — mass unchanged
    assert(manifest(flipped)(0)._5 !== m(0)._5)
    assert(manifest(flipped)(1) === m(1))
    assert(manifest(dropped)(1)._1 === 1L)
    assert(manifest(duped)(0)._1 === 4L)
    val sm = manifest(swapped)
    assert((sm(0)._2 === m(0)._2) && (sm(0)._5 !== m(0)._5),
      "id-folded hash must catch content re-labeling that preserves byte mass")

    // The q192 composition prunes epochShards' unused `pos` window: the
    // manifest plan must contain no Window node (one aggregation only).
    val composed = graft.sources.Layout.shardManifest(
      graft.operators.Sampling.epochShards(
        base.toDF("doc_id", "ignored_shard", "text").select(col("doc_id"), col("text")),
        idCol = col("doc_id"), seed = 7L, nShards = 8),
      col("shard"), col("doc_id"), col("text"))
    assert(!composed.queryExecution.executedPlan.toString.contains("Window"),
      "unused pos window must be pruned from the manifest plan")
  }
}
