package graft
import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Benchmark main: runs the headline queries (BASELINE.md's 10 workload
  * shapes) against SPARK_GRAFT_SF_DIR and prints one JSON line. Queries
  * are forced with a full materialization of the physical plan's RDD —
  * NOT `.count()`, which would let Catalyst prune every column and skip
  * the real work for projection-shaped queries. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: pay session init + first-scan codegen once, so the
    // per-query numbers measure the operators, not JVM startup.
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .queryExecution.toRdd.foreach(_ => ())
    val headline = Registry.all.filter(_.headline)
    // Two timed runs per query, report the faster: the first run pays
    // whole-stage-codegen JIT compilation, which a steady-state cluster
    // amortizes away; the second run measures the actual plan.
    val results = headline.map { q =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try {
          q.fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
            Double.PositiveInfinity // a failed run must never win the min
        }
      }
      val best = times.min
      q.name -> (if (best.isInfinity) -1.0 else best) // -1 marks failure
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    // total over successes only — a failed query (-1 marker) must not
    // subtract from the headline number; report it separately instead
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failed = results.count(_._2 < 0)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
