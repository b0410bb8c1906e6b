package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.{Frame, SortKey}
import graft.ops.{Cumulative, RowOrder}

/**
 * Randomized equivalence tests: the distributed two-pass formulations
 * must equal their naive single-task formulations on ARBITRARY data —
 * random values, random sizes, random partition counts — not just the
 * fixtures. Seeded, so every run checks the same datasets (deterministic
 * CI) while still exercising shapes nobody hand-picked: duplicates,
 * negative values, single rows, partition counts exceeding row counts.
 */
class PropertySpec extends SparkSuite {

  private def cases(seed: Long, n: Int): Seq[(List[(Long, Double)], Int)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val size = 1 + rnd.nextInt(60)
      // a small value vocabulary forces duplicate order keys
      val rows = List.tabulate(size)(i => (i.toLong, (rnd.nextInt(41) - 20) / 4.0))
      (rows, 1 + rnd.nextInt(5))
    }
  }

  test("two-pass row order equals the single-task window row_number on random data") {
    import spark.implicits._
    cases(seed = 11, n = 6).foreach { case (rows, parts) =>
      val df = spark.createDataset(rows).toDF("id", "v").repartition(parts)
      val fast = RowOrder.withRowOrder(df,
        Seq(SortKey.desc("v"), SortKey.asc("id")), Some(parts))
        .select(col("id"), col(Frame.RowOrder).as("r"))
      val naive = df.withColumn("r",
        row_number().over(Window.orderBy(col("v").desc, col("id").asc)) - 1)
        .select(col("id"), col("r").cast("long"))
      assertParity(fast, naive)
    }
  }

  test("parallel-prefix global cumsum equals the single-task running window on random data") {
    import spark.implicits._
    cases(seed = 23, n = 6).foreach { case (rows, parts) =>
      val df = spark.createDataset(rows).toDF("id", "v").repartition(parts)
      val fast = Cumulative.globalRunning(df, Seq(SortKey.asc("id")), "sum",
        Seq("v" -> "v_sum"), numPartitions = Some(parts))
        .select(col("id"), round(col("v_sum"), 6).as("c"))
      val naive = df.withColumn("c",
        round(sum(col("v")).over(Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, 0)), 6))
        .select(col("id"), col("c"))
      assertParity(fast, naive)
    }
  }

  test("cumprodDouble tracks cumprodLong within FP tolerance on random small factors") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    (1 to 5).foreach { _ =>
      val size = 1 + rnd.nextInt(50)
      val rows = List.tabulate(size)(i => (i.toLong, 1L + rnd.nextInt(3)))
      val df = spark.createDataset(rows).toDF("i", "f").withColumn("k", lit("g"))
      val ord = Seq(SortKey.asc("i"))
      val exact = Frame(df).groupby("k").cumprodLong("f", "cp", ord)
        .df.orderBy("i").collect().map(_.getAs[Long]("cp"))
      val approx = Frame(df).groupby("k").cumprodDouble("f", "cp", ord)
        .df.orderBy("i").collect().map(_.getAs[Double]("cp"))
      exact.zip(approx).foreach { case (e, a) =>
        assert(math.abs(a - e.toDouble) <= math.abs(e.toDouble) * 1e-11,
          s"exact=$e approx=$a")
      }
    }
  }
}
