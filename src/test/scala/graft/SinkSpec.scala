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
}
