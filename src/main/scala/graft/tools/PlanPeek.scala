package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Prints exchange/broadcast counts per named query — a quick shuffle
  * audit without the full PLANS.md dump. Args: query names. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val verbose = args.contains("-v")
    args.filterNot(_ == "-v").foreach { name =>
      Registry.all.find(_.name == name) match {
        case Some(q) =>
          val plan = q.fn(spark, dir).queryExecution.executedPlan.toString
          if (verbose) println(plan)
          // word-bounded: "Exchange" alone also matches Reused/Broadcast
          val ex = "(?<![A-Za-z])Exchange".r.findAllIn(plan).size
          val bc = "BroadcastExchange".r.findAllIn(plan).size
          val reused = "ReusedExchange".r.findAllIn(plan).size
          val sorts = "Sort ".r.findAllIn(plan).size
          println(s"$name: exchanges=$ex broadcasts=$bc reused=$reused sorts=$sorts")
        case None => println(s"$name: NOT FOUND")
      }
    }
    spark.stop()
  }
}
