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
    // Timed runs per query (default 3), report the fastest: the first run
    // pays whole-stage-codegen JIT compilation, which a steady-state
    // cluster amortizes away; min-of-3 keeps sub-second queries from
    // wobbling ±20% on scheduler noise (the r4 q70/q90/q100 artifacts).
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val results = headline.map { q =>
      val times = (1 to runs).map { _ =>
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

/**
 * Scale-slope smoke test: the suite otherwise never runs above sf0.1, so
 * this main amplifies the corpus ~8× (disjoint replicas — key columns
 * offset per replica, document text made replica-unique so join/group/
 * dedup cardinalities scale linearly, the way real corpus growth does)
 * and reports each headline query's time ratio divided by the row ratio.
 * A plan that holds at 100 TB has slope ≈ 1 (linear in rows); slope > 1.5
 * is flagged — it means some stage is super-linear (all-pairs blowup,
 * driver funnel, single-partition sort) and would fall over at 1000×.
 */
object ScaleBench {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.LongType

  private val Tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Disjoint-replica amplification: long key/id columns shift by a wide
    * per-replica stride, document text gets a replica token (so content
    * fingerprints stay unique per replica). Everything else copies. */
  private def amplify(df: DataFrame, table: String, factor: Int): DataFrame = {
    val keyish = df.schema.fields.collect {
      case f if f.dataType == LongType &&
        (f.name.endsWith("key") || f.name.endsWith("_id")) => f.name
    }
    val replicas = (0 until factor).map { r =>
      val shifted = keyish.foldLeft(df)((d, k) =>
        d.withColumn(k, col(k) + lit(r * 100000000000L)))
      if (table == "documents")
        shifted.withColumn("text", concat(col("text"), lit(s" replica$r")))
      else shifted
    }
    replicas.reduce(_ unionAll _)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val bigDir = s"/tmp/graft_scale/x$factor"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events.ts is TIMESTAMP(NANOS); read it as raw long (QueryKit's knob)
    // so the amplified copy round-trips through the same conversion path
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.foreach { t =>
      val out = new java.io.File(s"$bigDir/$t.parquet")
      if (!new java.io.File(out, "_SUCCESS").exists()) {
        amplify(spark.read.parquet(s"$baseDir/$t.parquet"), t, factor)
          .write.mode("overwrite").parquet(out.getAbsolutePath)
      }
    }
    val headline = Registry.all.filter(_.headline)
    def time(q: graft.queries.Q, dir: String): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        q.fn(spark, dir).queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }
    // warmup both scan paths
    spark.read.parquet(s"$baseDir/lineitem.parquet").queryExecution.toRdd.foreach(_ => ())
    spark.read.parquet(s"$bigDir/lineitem.parquet").queryExecution.toRdd.foreach(_ => ())
    val rows = headline.map { q =>
      val (tb, ts) = (time(q, baseDir), time(q, bigDir))
      // subtract nothing: fixed per-query overhead makes slope < 1 for
      // fast queries, which is fine — only super-linear growth flags
      val slope = (ts / tb) / factor
      (q.name, tb, ts, slope)
    }
    val flagged = rows.collect { case (n, _, _, s) if s > 1.5 => n }
    val qs = rows.map { case (n, tb, ts, s) =>
      f""""$n":{"base":$tb%.3f,"scaled":$ts%.3f,"slope":$s%.3f}"""
    }.mkString("{", ",", "}")
    val fl = flagged.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"scale_slope","factor":$factor,"queries":$qs,"flagged":$fl,"base":"$baseDir"}""")
    spark.stop()
  }
}
