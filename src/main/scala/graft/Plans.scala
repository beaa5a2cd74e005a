package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted physical plans for plan-quality review
  * (pushed filters, read schemas, broadcast vs sort-merge, codegen). */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q01_pricing_summary", "q03_star_join")
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
