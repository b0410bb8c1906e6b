package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import graft.queries.Registry

/** Writes `.explain("formatted")` for named queries to
  * `plans/<round>/<query>_<tag>.txt` — the before/after plan evidence an
  * optimization round commits. Args: <outDir> <tag> [query names...]
  * (default: all headliners). Session shape matches graft.Bench
  * (local[$SPARK_GRAFT_CPUS], shuffle.partitions=cpus) so the dumped plan
  * is the plan the bench actually runs. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val qs =
      if (names.isEmpty) Registry.all.filter(_.headline)
      else Registry.all.filter(q => names.contains(q.name))
    qs.foreach { q =>
      val plan = q.fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${q.name}_$tag.txt"), plan)
      println(s"wrote $outDir/${q.name}_$tag.txt")
    }
    spark.stop()
  }
}
