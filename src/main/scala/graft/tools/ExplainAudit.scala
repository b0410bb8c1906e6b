package graft.tools
import org.apache.spark.sql.SparkSession
import graft.queries.Registry
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = Set("q60_scan_filter_project", "q30_join_broadcast", "q01_groupby_agg_low")
    Registry.all.filter(q => names(q.name)).foreach { q =>
      println(s"===== ${q.name} =====")
      println(q.fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
