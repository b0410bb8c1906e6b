package graft

import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}

/** §2.2/§2.7/§2.11 Frame operator semantics on sf0.001 + inline data. */
class FrameSpec extends SparkSuite {

  private def li = Frame(table("lineitem"))

  test("select prunes to requested columns") {
    val out = li.select("l_orderkey", "l_quantity").df
    assert(out.columns.toSeq == Seq("l_orderkey", "l_quantity"))
  }

  test("filter + query agree") {
    val a = li.filter(col("l_quantity") > 30).df.count()
    val b = li.query("l_quantity > 30").df.count()
    assert(a == b && a > 0)
  }

  test("rename keeps data, renames index cols too") {
    val f = Frame(table("region"), indexCols = Seq("r_regionkey"))
      .rename("r_regionkey" -> "rk", "r_name" -> "name")
    assert(f.indexCols == Seq("rk"))
    assert(f.df.columns.contains("name"))
    assert(f.df.count() == 5)
  }

  test("astype casts and preserves column order") {
    val f = li.astype("l_quantity" -> "int", "l_orderkey" -> "string")
    val sch = f.df.schema
    assert(sch("l_quantity").dataType.typeName == "integer")
    assert(sch("l_orderkey").dataType.typeName == "string")
    assert(f.df.columns.toSeq == li.df.columns.toSeq)
  }

  test("clip bounds values") {
    val f = li.clip("l_quantity", 10, 20)
    val r = f.df.agg(min(col("l_quantity")), max(col("l_quantity"))).head()
    assert(r.getDouble(0) >= 10.0 && r.getDouble(1) <= 20.0)
  }

  test("dropna + fillna round-trip") {
    import spark.implicits._
    val d = Seq[(java.lang.Long, java.lang.Double)]((1L, 1.0), (2L, null), (null, 3.0))
      .toDF("a", "b")
    assert(Frame(d).dropna("any").df.count() == 1)
    assert(Frame(d).dropna("all").df.count() == 3)
    assert(Frame(d).fillna(0.0, Seq("b")).df.filter(col("b").isNull).count() == 0)
  }

  test("tail flips declared ordering and restores it") {
    val f = Frame(table("orders"), ordering = Seq(SortKey.asc("o_orderkey")))
    val lastTwo = f.tail(2).df.collect().map(_.getLong(0))
    val expected = table("orders").orderBy(col("o_orderkey").desc).limit(2)
      .collect().map(_.getLong(0)).sorted
    assert(lastTwo.sorted.toSeq == expected.toSeq)
  }

  test("dropDuplicates keep-first under declared order") {
    import spark.implicits._
    val d = Seq(("a", 2L), ("a", 1L), ("b", 5L)).toDF("k", "v")
    val out = Frame(d).dropDuplicates(Seq("k"), Seq(SortKey.asc("v")))
      .df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 1L), ("b", 5L)))
  }

  test("valueCounts orders by count desc then value") {
    val vc = Frame(table("orders")).valueCounts("o_orderstatus").df.collect()
    val counts = vc.map(_.getLong(1))
    assert(counts.sorted.reverse.toSeq == counts.toSeq)
  }

  test("sampleByHash: deterministic, partition-exact, and close to frac") {
    val orders = Frame(table("orders"))
    val total = orders.df.count()
    val a = orders.sampleByHash("o_orderkey", 0.25, "s")
    val b = orders.sampleByHashComplement("o_orderkey", 0.25, "s")
    // exact partition: sample + complement cover every row once
    assert(a.df.count() + b.df.count() == total)
    // frac accuracy (md5 is uniform; 3σ bound at n=total)
    val p = a.df.count().toDouble / total
    assert(math.abs(p - 0.25) < 3 * math.sqrt(0.25 * 0.75 / total), s"p=$p")
    // repartitioning must not change membership (content hash, not RNG)
    val rep = Frame(orders.df.repartition(13)).sampleByHash("o_orderkey", 0.25, "s")
    assert(rep.df.select("o_orderkey").exceptAll(a.df.select("o_orderkey")).isEmpty)
    // a different salt draws a different (overlapping but distinct) sample
    val c = orders.sampleByHash("o_orderkey", 0.25, "other")
    assert(c.df.select("o_orderkey").exceptAll(a.df.select("o_orderkey")).count() > 0)
  }

  test("sampleByHash routes null keys to the complement, not into the void") {
    import spark.implicits._
    val d = Frame(Seq[(Option[Long], String)](
      (Some(1L), "a"), (None, "b"), (Some(3L), "c"), (None, "d"))
      .toDF("k", "v"))
    val s = d.sampleByHash("k", 0.5, "x").df.count()
    val r = d.sampleByHashComplement("k", 0.5, "x").df.count()
    assert(s + r == 4, s"sample=$s complement=$r — null keys must not vanish")
    // both null-key rows are in the complement
    assert(d.sampleByHashComplement("k", 0.5, "x").df.filter(col("k").isNull).count() == 2)
  }

  test("sampleByHashStratified: per-stratum fracs, default fallthrough, null routing") {
    import spark.implicits._
    val d = Frame(Seq[(Option[Long], String)](
      (Some(1L), "en"), (Some(2L), "en"), (Some(3L), "rare"),
      (Some(4L), "other"), (None, "en"))
      .toDF("k", "lang"))
    // frac 0 for en, 1 for rare, default 0 → only the rare row survives
    val kept = d.sampleByHashStratified("k", "lang", Map("en" -> 0.0, "rare" -> 1.0))
      .df.collect().map(_.getString(1)).toSeq
    assert(kept == Seq("rare"))
    // exact partition incl. the null-key row
    val comp = d.sampleByHashStratifiedComplement("k", "lang", Map("en" -> 0.0, "rare" -> 1.0))
    assert(comp.df.count() == 4)
    assert(comp.df.filter(col("k").isNull).count() == 1)
    // default 1.0 keeps strata absent from the map
    val all = d.sampleByHashStratified("k", "lang", Map("en" -> 1.0), defaultFrac = 1.0)
    assert(all.df.count() == 4) // everything except the unhashable null key
  }

  test("sampleWeighted: deterministic, exact n, weight-tilted, bad weights excluded") {
    import spark.implicits._
    val d = Frame((1L to 200L).map(i =>
      (i, if (i <= 100) 50.0 else 0.5)).toDF("k", "w"))
    val a = d.sampleWeighted("k", "w", 50, "s1").df.collect().map(_.getLong(0)).toSet
    val b = d.sampleWeighted("k", "w", 50, "s1").df.collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 50) // reproducible, exactly n
    // 100:1 weight ratio → the heavy stratum dominates the sample
    val heavy = a.count(_ <= 100)
    assert(heavy > 40, s"heavy=$heavy of 50")
    // a different salt draws a different (still deterministic) sample
    val c = d.sampleWeighted("k", "w", 50, "s2").df.collect().map(_.getLong(0)).toSet
    assert(c != a)
    // null / zero / negative weights can never be selected
    val bad = Frame(Seq[(Long, java.lang.Double)](
      (1L, 10.0), (2L, null), (3L, 0.0), (4L, -5.0), (5L, 1.0)).toDF("k", "w"))
    val picked = bad.sampleWeighted("k", "w", 5, "s").df.collect().map(_.getLong(0)).toSet
    assert(picked == Set(1L, 5L))
  }

  test("fluent rolling computes windowed means over the declared ordering") {
    import spark.implicits._
    val d = Frame(Seq((1L, 2.0), (2L, 4.0), (3L, 6.0), (4L, 8.0)).toDF("i", "v"))
      .sortValues(Seq(SortKey.asc("i")))
    val got = d.rolling(2).mean("v", "m").df
      .orderBy("i").collect().map(r => Option(r.getAs[java.lang.Double]("m")))
    assert(got.toSeq == Seq(None, Some(3.0), Some(5.0), Some(7.0)))
    // min_periods=1 fills the leading edge
    val mp = d.rolling(2, minPeriods = Some(1)).mean("v", "m").df
      .orderBy("i").collect().map(_.getAs[Double]("m"))
    assert(mp.toSeq == Seq(2.0, 3.0, 5.0, 7.0))
  }

  test("fluent expanding mean/sum/count skip nulls and honor min_periods") {
    import spark.implicits._
    val d = Frame(Seq[(Long, java.lang.Double)](
      (1L, 2.0), (2L, null), (3L, 4.0), (4L, 6.0)).toDF("i", "v"))
      .sortValues(Seq(SortKey.asc("i")))
    val m = d.expanding(minPeriods = 2).mean("v", "m").df
      .orderBy("i").collect().map(r => Option(r.getAs[java.lang.Double]("m")).map(_.toDouble))
    // valid counts run 1,1,2,3 → first two rows below min_periods
    assert(m.toSeq == Seq(None, None, Some(3.0), Some(4.0)))
    val mx = d.expanding().max("v", "x").df
      .orderBy("i").collect().map(_.getAs[Double]("x"))
    assert(mx.toSeq == Seq(2.0, 2.0, 4.0, 6.0))
  }

  test("validIndexBounds finds first/last non-null positions; all-null column yields nulls") {
    import spark.implicits._
    val d = Frame(Seq[(Long, java.lang.Double, java.lang.Double)](
      (1L, null, null), (2L, 5.0, null), (3L, 7.0, null), (4L, null, null))
      .toDF("i", "x", "y"))
    val r = d.validIndexBounds("i", Seq("x", "y")).collect()(0)
    assert(r.getLong(r.fieldIndex("x_first")) == 2L)
    assert(r.getLong(r.fieldIndex("x_last")) == 3L)
    assert(r.isNullAt(r.fieldIndex("y_first")) && r.isNullAt(r.fieldIndex("y_last")))
  }

  test("memoryUsage: fixed width × rows; var-width byte sum + 8/row, null = word only") {
    import spark.implicits._
    val d = Frame(Seq((1L, Some("abc")), (2L, Some("é")), (3L, None))
      .toDF("id", "s"))
    val got = d.memoryUsage().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("id") == 3 * 8)
    // "abc"=3 bytes, "é"=2 bytes (utf-8), null=0; + 8-byte word each
    assert(got("s") == (3 + 2 + 0) + 3 * 8)
  }

  test("whereCol keeps where cond holds; maskCol replaces where it holds") {
    import spark.implicits._
    val d = Seq(1.0, -2.0, 3.0).toDF("x")
    val w = Frame(d).whereCol("x", col("x") > 0, lit(0.0)).df
      .collect().map(_.getDouble(0)).toSeq
    val m = Frame(d).maskCol("x", col("x") > 0, lit(0.0)).df
      .collect().map(_.getDouble(0)).toSeq
    assert(w == Seq(1.0, 0.0, 3.0))
    assert(m == Seq(0.0, -2.0, 0.0))
  }

  test("strGetDummies emits all-zeros for null input; binopFill div gives IEEE inf") {
    import spark.implicits._
    val d = Frame(Seq((1L, "a|b"), (2L, null)).toDF("id", "tag"))
      .strGetDummies("tag", "|", Seq("a", "c"), prefix = "is_")
    val rows = d.df.orderBy("id").collect()
    assert(rows(0).getAs[Int]("is_a") == 1 && rows(0).getAs[Int]("is_c") == 0)
    // pandas str.get_dummies: NaN row → all zeros, not nulls
    assert(rows(1).getAs[Int]("is_a") == 0 && rows(1).getAs[Int]("is_c") == 0)

    val b = Frame(Seq[(java.lang.Double, java.lang.Double)]((5.0, null), (null, null))
      .toDF("a", "b"))
      .binopFill("a", "b", "d", "div", 0.0)
    val vals = b.df.orderBy(col("a").asc_nulls_last).collect()
    // a.div(null, fill_value=0) = 5/0 = inf (pandas); both-null stays null
    assert(vals(0).getAs[Double]("d").isPosInfinity)
    assert(vals(1).isNullAt(vals(1).fieldIndex("d")))
  }

  test("binopFill div follows IEEE signs for ±0.0 divisors and 0/0") {
    import spark.implicits._
    val d = Frame(Seq(
      (1L, 5.0, 0.0), (2L, 5.0, -0.0), (3L, -5.0, -0.0), (4L, 0.0, 0.0))
      .toDF("id", "a", "b"))
      .binopFill("a", "b", "d", "div", 0.0)
    val vals = d.df.orderBy("id").collect().map(_.getAs[Double]("d"))
    assert(vals(0).isPosInfinity) //  5 /  0.0
    assert(vals(1).isNegInfinity) //  5 / -0.0 (IEEE: sign flips)
    assert(vals(2).isPosInfinity) // -5 / -0.0
    assert(vals(3).isNaN)         //  0 /  0.0
  }

  test("truncate keeps the closed index-label range; open ends; index required") {
    import spark.implicits._
    val f = Frame(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v"),
      indexCols = Seq("k"))
    def ks(fr: Frame) = fr.df.orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(ks(f.truncate(2L, 3L)) == Seq(2L, 3L))
    assert(ks(f.truncate(before = 3L)) == Seq(3L, 4L))
    assert(ks(f.truncate(after = 2L)) == Seq(1L, 2L))
    assert(ks(f.truncate()) == Seq(1L, 2L, 3L, 4L))
    val noIx = Frame(Seq((1L, "a")).toDF("k", "v"))
    assert(intercept[IllegalArgumentException](noIx.truncate(1L, 2L))
      .getMessage.contains("index"))
  }

  test("sortIndexAxis1 orders columns by label both ways; squeeze collapses one data column") {
    import spark.implicits._
    val f = Frame(Seq((1L, "x", 2.0)).toDF("b", "c", "a"))
    assert(f.sortIndexAxis1().df.columns.toSeq == Seq("a", "b", "c"))
    assert(f.sortIndexAxis1(ascending = false).df.columns.toSeq == Seq("c", "b", "a"))
    // multi-data-column frame: squeeze is the identity, like pandas
    assert(f.squeeze().df.columns.toSeq == f.df.columns.toSeq)
    // one data column beside the index: squeeze drops the index columns
    val indexed = Frame(Seq((1L, 2.0), (3L, 4.0)).toDF("k", "v"), indexCols = Seq("k"))
    val s = indexed.squeeze()
    assert(s.df.columns.toSeq == Seq("v"))
    assert(s.df.orderBy("v").collect().map(_.getDouble(0)).toSeq == Seq(2.0, 4.0))
  }

  test("xs filters one index level and drops it; reorder_levels permutes; rename_axis renames") {
    import spark.implicits._
    val f = Frame(Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 1L, 30.0))
      .toDF("g", "k", "v"), indexCols = Seq("g", "k"))
    val x = f.xs("a", level = 0)
    assert(x.indexCols == Seq("k"))
    assert(x.df.columns.toSeq == Seq("k", "v"))
    assert(x.df.orderBy("k").collect().map(_.getDouble(1)).toSeq == Seq(10.0, 20.0))
    val r = f.reorderLevels(Seq(1, 0))
    assert(r.indexCols == Seq("k", "g"))
    assert(f.reorderLevels(Seq("k", "g")).indexCols == Seq("k", "g"))
    assert(intercept[IllegalArgumentException](f.reorderLevels(Seq(0, 0)))
      .getMessage.contains("permutation"))
    val rn = f.renameAxis("grp", "key")
    assert(rn.indexCols == Seq("grp", "key"))
    assert(rn.df.columns.toSeq == Seq("grp", "key", "v"))
  }

  test("select_dtypes keeps columns by type class; index levels always survive") {
    import spark.implicits._
    val f = Frame(Seq((1L, "x", 2.0, true)).toDF("k", "s", "d", "b"),
      indexCols = Seq("s"))
    assert(f.selectDtypes(include = Seq("number")).df.columns.toSeq == Seq("k", "s", "d"))
    assert(f.selectDtypes(include = Seq("floating")).df.columns.toSeq == Seq("s", "d"))
    assert(f.selectDtypes(exclude = Seq("number")).df.columns.toSeq == Seq("s", "b"))
    assert(f.selectDtypes(include = Seq("integer", "bool")).df.columns.toSeq
      == Seq("k", "s", "b"))
    assert(intercept[IllegalArgumentException](f.selectDtypes()).getMessage
      .contains("include"))
  }

  test("factorize codes values in first-appearance order; null gets -1") {
    import spark.implicits._
    val f = Frame(Seq((1L, "b"), (2L, "a"), (3L, "b"), (4L, null), (5L, "c"))
      .toDF("k", "v")).sortValues(Seq(SortKey.asc("k")))
    val got = f.factorize("v", "code").df.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    // b first at k=1 -> 0, a at k=2 -> 1, c at k=5 -> 2, null -> -1
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, -1L), (5L, 2L)))
  }

  test("trainTestSplit partitions exactly; null keys land in train") {
    import spark.implicits._
    val f = Frame((1L to 100L).map(i => (if (i == 7) None else Some(i), s"r$i"))
      .toDF("k", "v"))
    val (train, test) = f.trainTestSplit("k", testSize = 0.3, salt = "s")
    val (nTr, nTe) = (train.df.count(), test.df.count())
    assert(nTr + nTe == 100, s"split not exhaustive: $nTr + $nTe")
    assert(train.df.join(test.df, Seq("v"), "inner").count() == 0, "splits overlap")
    assert(nTe > 10 && nTe < 50, s"test split far off 30%: $nTe")
    assert(train.df.filter(col("k").isNull).count() == 1, "null key must go to train")
    // determinism: same salt, same split
    val (_, test2) = f.trainTestSplit("k", 0.3, "s")
    assert(test2.df.collect().map(_.getString(1)).sorted.toSeq ==
      test.df.collect().map(_.getString(1)).sorted.toSeq)
  }

  test("asofLabels picks the most recent at-or-before row per query label") {
    import spark.implicits._
    val f = Frame(Seq((10L, 1.0), (20L, 2.0), (30L, 3.0)).toDF("k", "v"),
      indexCols = Seq("k"))
    val got = f.asofLabels(Seq(5L, 10L, 25L, 99L)).df
      .orderBy("k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    assert(got == Seq((5L, None), (10L, Some(1.0)), (25L, Some(2.0)), (99L, Some(3.0))))
  }

  test("binopFill floordiv/mod/pow follow numpy: remainder sign tracks the divisor") {
    import spark.implicits._
    val f = Frame(Seq((7.0, 2.0), (-7.0, 2.0), (7.0, -2.0), (1.0, 0.0))
      .toDF("a", "b"))
    val rows = f.binopFill("a", "b", "fd", "floordiv", 0.0)
      .binopFill("a", "b", "md", "mod", 0.0)
      .binopFill("a", "b", "pw", "pow", 0.0)
      .df.select("a", "b", "fd", "md", "pw").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSeq.sortBy(t => (t._1, t._2))
    val byKey = rows.map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap
    assert(byKey((7.0, 2.0)) == (3.0, 1.0, 49.0))
    assert(byKey((-7.0, 2.0)) == (-4.0, 1.0, 49.0)) // numpy: -7 % 2 = 1
    val (fdN, mdN, pwN) = byKey((7.0, -2.0)) // 7 % -2 = -1 (divisor sign)
    assert(fdN == -4.0 && mdN == -1.0 && math.abs(pwN - 1.0 / 49.0) < 1e-15)
    val (fd0, md0, _) = byKey((1.0, 0.0))
    assert(fd0.isPosInfinity && md0.isNaN) // numpy: x//0 = inf, x%0 = NaN
  }

  test("to_string / to_latex render byte-exact pandas output; to_markdown pipe format") {
    import spark.implicits._
    val f = Frame(Seq(
      (Option("alpha"), 1L, 1.5), (Option("beta"), 22L, 2.25),
      (Option.empty[String], 333L, 30.0)).toDF("name", "qty", "price"))
    // pinned literals generated by genuine pandas 2.x:
    //   df.to_string(index=False) / df.to_latex(index=False)
    assert(f.toStringTable() ==
      " name  qty  price\nalpha    1   1.50\n beta   22   2.25\n None  333  30.00")
    assert(f.toLatexTable() ==
      "\\begin{tabular}{lrr}\n\\toprule\nname & qty & price \\\\\n\\midrule\n" +
      "alpha & 1 & 1.500000 \\\\\nbeta & 22 & 2.250000 \\\\\nNaN & 333 & 30.000000 \\\\\n" +
      "\\bottomrule\n\\end{tabular}\n")
    val md = f.toMarkdownTable()
    assert(md.startsWith("| name"))
    assert(md.linesIterator.toSeq(1).matches("\\|:[-]+\\|[-]+:\\|[-]+:\\|"))
    assert(md.contains("| beta"))
  }

  test("hasnans / isUnique match the pandas contracts") {
    import spark.implicits._
    val f = Frame(Seq((1L, Some(1.0), "a"), (2L, None, "b"),
      (3L, Some(Double.NaN), "a")).toDF("id", "v", "s"))
    assert(f.hasnans("v"))          // null present
    assert(!f.hasnans("id"))
    assert(f.hasnans("v"))          // NaN also counts
    assert(f.isUnique("id"))
    assert(!f.isUnique("s"))        // "a" twice
    // single null is a distinct value; two nulls are not unique
    val one = Frame(Seq((1L, Some("x")), (2L, Option.empty[String])).toDF("id", "s"))
    assert(one.isUnique("s"))
    val two = Frame(Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "s"))
    assert(!two.isUnique("s"))
  }
}
