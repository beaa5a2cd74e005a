package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Partition pruning over a hive-partitioned layout
  * (Tables.writePartitionedTable): a filter on the partition key must
  * cut the files the scan actually reads to that key's directory —
  * asserted via the executed scan's numFiles metric, since
  * `inputFiles` reflects the pre-pruning FileIndex — and show up as a
  * PartitionFilter (not a post-scan row Filter) in the physical plan. */
class PartitionedScanSpec extends SparkSpecBase {

  test("lang filter prunes the partitioned scan to one directory") {
    val out = new java.io.File("target/part_layout/documents").getAbsolutePath
    Tables.writePartitionedTable(
      Tables.documents(spark, sf), out, Seq("lang"))

    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: FileSourceScanExec => f }.get
      scan.metrics("numFiles").value
    }

    val all = spark.read.parquet(out)
    val en = all.filter(col("lang") === "en")

    // correctness: identical rows to filtering plain parquet
    val expected = Tables.documents(spark, sf)
      .filter(col("lang") === "en").count()
    assert(en.count() == expected)

    // pruning: the scan reads only lang=en's files (one writer task →
    // one file per partition directory; 5 langs in the corpus)
    val enFiles = filesRead(en)
    val allFiles = filesRead(all)
    assert(enFiles > 0)
    assert(enFiles < allFiles,
      s"scan not pruned: read $enFiles of $allFiles files")
    val onDisk = new java.io.File(out, "lang=en").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(enFiles == onDisk)

    // plan: the predicate is a PartitionFilter on the scan
    val plan = en.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*lang[^\\]]*\\]".r
      .findFirstIn(plan).isDefined, plan)
  }
}
