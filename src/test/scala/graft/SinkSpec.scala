package graft

import org.apache.spark.sql.functions._

/** Storage-layout surfaces that only matter at scale: partitioned
  * parquet output (directory pruning on read) and bucketed tables
  * (co-located joins with no shuffle exchange).
  */
class SinkSpec extends SparkSpec {

  test("partitioned parquet sink lays out lang= dirs and prunes partitions on read") {
    val dir = "/root/repo/target/tmp/part_sink"
    Tables.documents(spark, sf).write.mode("overwrite").partitionBy("lang").parquet(dir)
    assert(new java.io.File(s"$dir/lang=en").isDirectory)
    val back = spark.read.parquet(dir)
    assert(back.count() === Tables.documents(spark, sf).count())
    val pruned = back.filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("(lang"), plan)
    assert(pruned.count() ===
      Tables.documents(spark, sf).filter(col("lang") === "en").count())
  }

  /** DROP TABLE on the in-memory catalog won't remove files written by
    * a previous JVM — clear the managed location too or saveAsTable
    * fails with LOCATION_ALREADY_EXISTS.
    */
  private def dropManaged(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val root = java.nio.file.Paths.get(s"/root/repo/spark-warehouse/$table")
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  test("compaction: 64 microbatch files collapse to the size-derived count, data unchanged") {
    def parquetFiles(p: String): Int = {
      val fs = new java.io.File(p).listFiles()
      if (fs == null) 0 else fs.count(f => f.isFile && f.getName.endsWith(".parquet"))
    }
    val frag = sources.Layouts.fragmentedDocs(spark, sf)
    val cmp = sources.Layouts.compactedDocs(spark, sf)
    assert(parquetFiles(frag) === 64, "fragmented layout must model the microbatch tax")
    // ceil(bytes / 128 MB) at fixture scale is exactly 1 — the
    // formula, not a constant, decides the count.
    assert(parquetFiles(cmp) === 1, s"expected the size formula to yield one file")
    assert(spark.read.parquet(cmp).count() ===
      Tables.documents(spark, sf).count())
  }

  test("bucketed tables co-locate the equi-join: no shuffle exchange in the plan") {
    dropManaged("li_bucketed")
    dropManaged("ord_bucketed")
    Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    val j = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(j.count() === expected)
  }

  /** Rows the parquet scan actually EMITTED after row-group min/max
    * skipping (record-level filtering is off by default, so survivors
    * of non-skipped row groups all surface here) — the read-side
    * measure of a layout's pruning payoff.
    */
  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      p +: kids.flatMap(flatten)
    }
    val scans = flatten(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, s"no file scan:\n${df.queryExecution.executedPlan}")
    val rows = scans.head.metrics.get("numOutputRows").map(_.value)
    assert(rows.nonEmpty,
      s"scan metric 'numOutputRows' absent — available: ${scans.head.metrics.keys.mkString(", ")}")
    rows.get
  }

  test("z-ordered layout prunes a 2-D range predicate via row-group stats; the unsorted twin reads everything") {
    // The payoff q_zorder's interleave buys at write time: sort the
    // table by the Morton value and every parquet row group covers a
    // contiguous z-range, i.e. a BOUNDED box in (gx, gy) space — so
    // per-row-group min/max stats let the pushed 2-D range filter skip
    // row groups on EITHER dim. The same data written in random order
    // has every row group spanning the full range of both dims:
    // nothing skips, the scan emits every row.
    import spark.implicits._
    val base = Tables.orders(spark, sf).select(
      $"o_orderkey",
      ($"o_custkey" % 256).cast("long").as("gx"),
      (floor($"o_totalprice" / lit(2000.0)).cast("long") % 256).as("gy"))
      .withColumn("zval", graft.operators.Relational.mortonZ($"gx", $"gy"))
    val zdir = "/root/repo/target/tmp/zorder_sorted"
    val udir = "/root/repo/target/tmp/zorder_unsorted"
    // 16 files ≈ 16 row groups at fixture scale: enough granularity
    // for the stats to bite, same count on both sides so file count
    // isn't a confound.
    base.repartitionByRange(16, $"zval").sortWithinPartitions($"zval")
      .write.mode("overwrite").parquet(zdir)
    base.repartition(16).write.mode("overwrite").parquet(udir)

    def box(dir: String) = spark.read.parquet(dir)
      .filter($"gx".between(0, 63) && $"gy".between(0, 63))
    // The filter must reach the parquet reader for stats to matter.
    assert(box(zdir).queryExecution.executedPlan.toString.contains("PushedFilters: ["))

    val zRead = scanOutputRows(box(zdir))
    val uRead = scanOutputRows(box(udir))
    val total = base.count()
    val matching = box(zdir).count()
    assert(uRead === total,
      s"unsorted twin should read all $total rows (no row group prunable), read $uRead")
    assert(zRead < total / 2,
      s"z-ordered layout should skip most row groups: read $zRead of $total (box = $matching)")
    // Pruning must be invisible in the data.
    assert(box(zdir).orderBy($"o_orderkey").collect().toSeq ===
      box(udir).orderBy($"o_orderkey").collect().toSeq)
  }

  test("every sink round-trips a zero-row dataset (the EmptyInputSpec twin for write-then-read queries)") {
    // A filter that matches nothing is routine at scale; the write
    // side must still produce something the read side can open.
    // Parquet/ORC carry schema in the footer, JSONL reads through the
    // declared schema, CSV re-reads through its header line — in every
    // case: zero rows back, columns intact.
    import spark.implicits._
    val nation0 = Tables.nation(spark, sf)
      .select($"n_nationkey", $"n_name", $"n_regionkey").limit(0)

    val csvDir = Scratch.dir("empty_csv")
    sources.Csv.writeCsv(nation0, csvDir)
    val csvBack = sources.Csv.readCsvAllString(spark, csvDir)
    assert(csvBack.count() === 0)
    assert(csvBack.columns.toSeq === Seq("n_nationkey", "n_name", "n_regionkey"))

    val jsonDir = Scratch.dir("empty_jsonl")
    sources.Jsonl.writeJsonl(nation0, jsonDir)
    val jsonBack = sources.Jsonl.readJsonl(spark, jsonDir, nation0.schema)
    assert(jsonBack.count() === 0)
    assert(jsonBack.schema === nation0.schema)

    val orcDir = Scratch.dir("empty_orc")
    sources.Orc.writeOrc(nation0, orcDir)
    val orcBack = sources.Orc.readOrc(spark, orcDir)
    assert(orcBack.count() === 0)
    assert(orcBack.schema === nation0.schema)
  }
}
