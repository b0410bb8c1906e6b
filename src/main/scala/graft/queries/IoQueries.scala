package graft.queries

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import QueryKit._

/**
 * §2.1 scans / sources / sinks
 * (reference: modin/core/io/text/text_file_dispatcher.py:988 read_csv
 * byte-range splitting; column_stores/parquet_dispatcher.py:94-258
 * row-group partitioning; io.py:677-792 sinks).
 *
 * The reference parallelizes file IO by splitting byte ranges /
 * row-groups across workers; Spark's readers do the identical split
 * natively (csv newline-aligned splits, parquet row-group splits, json
 * line splits), so each query here is a write → read-back → aggregate
 * round-trip, oracle-checked against the original parquet table. Sinks
 * write one file per partition in parallel — the same physics as the
 * reference's per-partition Ray writes.
 */
object IoQueries {

  private def tmp(fixtureDir: String, name: String): String =
    QueryKit.scratch("/tmp/graft_io", fixtureDir, name)

  val all: Seq[Q] = Seq(

    // to_csv + read_csv round-trip (header, explicit schema on read —
    // the reference's metadata-row-once trick is Spark's schema option).
    Q("q10_csv_roundtrip",
      (s, dir) => {
        val src = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderpriority"))
        val path = tmp(dir, "orders_csv")
        src.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
        val back = s.read
          .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, o_orderpriority STRING")
          .option("header", "true").csv(path)
        Frame(back.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total")))
          .sortValues(Seq(SortKey.asc("o_orderstatus"))).df
      },
      Some("""
        SELECT o_orderstatus, count(*) AS n,
               round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(18,0))) AS DOUBLE) / 100.0, 2) AS total
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // to_json(lines) + read_json round-trip (reference json_dispatcher
    // byte-range split == Spark's per-line json source).
    Q("q11_json_roundtrip",
      (s, dir) => {
        val src = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        val path = tmp(dir, "lineitem_json")
        src.write.mode(SaveMode.Overwrite).json(path)
        val back = s.read
          .schema("l_orderkey BIGINT, l_quantity DOUBLE, l_returnflag STRING")
          .json(path)
        Frame(back.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty")))
          .sortValues(Seq(SortKey.asc("l_returnflag"))).df
      },
      Some("""
        SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // from_map / from_range (reference from_map dispatcher.py:188-240 —
    // one partition per input chunk): generate a table inside the plan
    // from spark.range + expressions, no driver-side data.
    Q("q140_from_range",
      (s, dir) => {
        val gen = s.range(0, 100000, 1, 8).select(
          col("id"),
          (col("id") % 7).as("bucket"),
          (col("id") * col("id") % 1001).as("v"))
        Frame(gen.groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"), max(col("id")).as("max_id")))
          .sortValues(Seq(SortKey.asc("bucket"))).df
      },
      Some("""
        SELECT id % 7 AS bucket, count(*) AS n,
               CAST(sum(id * id % 1001) AS BIGINT) AS sum_v, max(id) AS max_id
        FROM (SELECT unnest(range(0, 100000)) AS id)
        GROUP BY 1 ORDER BY 1""")),

    // to_orc + read_orc round-trip (reference read_orc is a
    // default_to_pandas thin path; native columnar source in Spark).
    Q("q12_orc_roundtrip",
      (s, dir) => {
        val src = t(s, dir, "customer")
        val path = tmp(dir, "customer_orc")
        src.write.mode(SaveMode.Overwrite).orc(path)
        val back = s.read.orc(path)
        Frame(back.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), round(avg(col("c_acctbal")), 4).as("avg_bal")))
          .sortValues(Seq(SortKey.asc("c_mktsegment"))).df
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // to_parquet + read_parquet round-trip with a partitioned sink
    // (BASELINE bench shape 10). partitionBy gives the hive-style layout
    // the reference's glob readers consume; reading back prunes by the
    // partition column before any row is touched.
    Q("q13_parquet_roundtrip",
      (s, dir) => {
        val src = t(s, dir, "part")
        val path = tmp(dir, "part_parquet")
        // repartition on the partition column before partitionBy: without
        // it every task writes every brand (tasks×brands small files —
        // the classic small-file explosion at scale); with it each brand
        // is one task → one right-sized file per partition value.
        // Probed r15 (ProfileBench): AQE byte-coalesces this tiny shuffle
        // to ONE task which writes all 25 brand files serially (658 ms);
        // pinning one-task-per-brand with an explicit partition count was
        // MEASURED WORSE (write stage 1002 ms wall, ~300 ms of parquet
        // writer + committer setup per task dwarfs the 26 ms/file write).
        // The bare repartition is the right form at every scale: AQE
        // coalesces only while partitions sit under the 64 MB advisory
        // size, so production-sized brands keep one task per brand.
        src.repartition(col("p_brand"))
          .write.mode(SaveMode.Overwrite).partitionBy("p_brand").parquet(path)
        // explicit schema on the read-back: skips the footer-sampling
        // schema-inference pass over every written file (data columns from
        // the source, partition column appended) — at a thousand-partition
        // sink that inference pass is a full listing + footer read
        val backSchema = src.drop("p_brand").schema.add("p_brand", "string")
        val back = s.read.schema(backSchema).parquet(path)
          .filter(col("p_brand") === "Brand#11")
        Frame(back.groupBy(col("p_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("p_retailprice")), 2).as("total")))
          .sortValues(Seq(SortKey.asc("p_type"))).df
      },
      Some("""
        SELECT p_type, count(*) AS n, round(sum(p_retailprice), 2) AS total
        FROM part WHERE p_brand = 'Brand#11'
        GROUP BY p_type ORDER BY p_type"""),
      headline = true),

    // read_table (tab-separated csv) + read_fwf (fixed-width text via
    // sources.FixedWidth: newline-aligned byte split by the text source,
    // codegen'd substring/trim/cast per column — the reference's text
    // dispatcher split, text_file_dispatcher.py:988). Both written then
    // read back and aggregated; the oracle computes the same aggregates
    // from the original table, so a parse drift in either path fails.
    Q("q146_read_table_fwf",
      (s, dir) => {
        val src = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val tpath = tmp(dir, "orders_tsv")
        src.write.mode(SaveMode.Overwrite)
          .option("sep", "\t").option("header", "true").csv(tpath)
        val tback = s.read
          .schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
          .option("sep", "\t").option("header", "true").csv(tpath)
        val fpath = tmp(dir, "orders_fwf")
        // field widths sized for the full domain (20 ≥ any long's 19
        // digits + sign, 24 ≥ any %.2f double) — java's Formatter WIDENS
        // overflowing fields rather than truncating, which would silently
        // shift every later colspec at larger scale factors
        src.select(format_string("%20d%2s%24.2f",
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")).as("value"))
          .write.mode(SaveMode.Overwrite).text(fpath)
        val fback = graft.sources.FixedWidth.read(s, fpath, Seq(
          ("o_orderkey", 0, 20, "bigint"),
          ("o_orderstatus", 20, 22, "string"),
          ("o_totalprice", 22, 46, "double")))
        val tAgg = tback.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_tsv"), moneySum(col("o_totalprice")).as("total_tsv"))
        val fAgg = fback.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_fwf"), moneySum(col("o_totalprice")).as("total_fwf"))
        Frame(tAgg.join(fAgg, "o_orderstatus"))
          .sortValues(Seq(SortKey.asc("o_orderstatus"))).df
      },
      Some("""
        SELECT o_orderstatus,
               count(*) AS n_tsv, round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(18,0))) AS DOUBLE) / 100.0, 2) AS total_tsv,
               count(*) AS n_fwf, round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(18,0))) AS DOUBLE) / 100.0, 2) AS total_fwf
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // to_xml + read_xml round-trip (pandas read_xml/to_xml — the
    // reference defaults these to single-node pandas; Spark 4 bundles the
    // xml datasource, which splits on rowTag boundaries like the csv
    // source splits on newlines, so the scan parallelizes the same way).
    Q("q147_xml_roundtrip",
      (s, dir) => {
        val src = t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        val path = tmp(dir, "nation_xml")
        src.write.mode(SaveMode.Overwrite)
          .option("rowTag", "nation").format("xml").save(path)
        val back = s.read
          .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
          .option("rowTag", "nation").format("xml").load(path)
        Frame(back.groupBy(col("n_regionkey"))
          .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name")))
          .sortValues(Seq(SortKey.asc("n_regionkey"))).df
      },
      Some("""
        SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
               count(*) AS n, min(n_name) AS first_name
        FROM nation GROUP BY 1 ORDER BY 1""")),

    // Z-order clustered write + predicate read-back (the Delta/Iceberg
    // OPTIMIZE ZORDER idea re-expressed as a plain parquet layout tool —
    // ops/Scale.writeZOrdered). Content round-trips exactly; ZOrderSpec
    // separately pins the layout property (per-file span in EVERY
    // z-dimension ≪ global span) that makes the pushed-down min/max
    // predicates below actually skip row groups at 100 TB.
    Q("q184_zorder_roundtrip",
      (s, dir) => {
        val src = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
            col("l_extendedprice"))
        val path = tmp(dir, "lineitem_zorder")
        graft.ops.Scale.writeZOrdered(src, path, Seq("l_orderkey", "l_partkey"),
          bitsPerDim = 8, numFiles = Some(8))
        val back = s.read.parquet(path)
          .filter(col("l_orderkey") < 15000 && col("l_partkey") < 1000)
        Frame(back.groupBy((col("l_orderkey") % 10).as("okey_mod"))
          .agg(count(lit(1)).as("n"), moneySum(col("l_extendedprice")).as("rev")))
          .sortValues(Seq(SortKey.asc("okey_mod"))).df
      },
      Some("""
        SELECT l_orderkey % 10 AS okey_mod, count(*) AS n,
               round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(18,0))) AS DOUBLE) / 100.0, 2) AS rev
        FROM lineitem WHERE l_orderkey < 15000 AND l_partkey < 1000
        GROUP BY 1 ORDER BY 1""")),

    // to_excel + read_excel round-trip, oracle-checked against the source
    // parquet (upgrades the Excel source from tested-only to a green
    // CORRECTNESS row): write the customer slice to one workbook, read it
    // back through the zip/XML parser, aggregate — a cell-level drift in
    // either direction (number formatting, type inference, row indexing)
    // shifts the aggregate and fails the hash. The write is the
    // documented driver-side valve (reference to_excel is likewise
    // single-node pandas, core/io/io.py:218-410).
    Q("q220_excel_roundtrip",
      (s, dir) => {
        val src = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        val path = tmp(dir, "cust_xlsx")
        new java.io.File(path).mkdirs()
        graft.sources.Excel.write(src, s"$path/customer.xlsx")
        val back = graft.sources.Excel.read(s, s"$path/customer.xlsx")
        Frame(back.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("c_acctbal")), 2).as("total"),
            min(col("c_custkey")).as("min_key")))
          .sortValues(Seq(SortKey.asc("c_mktsegment"))).df
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS total,
               min(c_custkey) AS min_key
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // to_feather + read_feather (Arrow IPC file) round-trip, oracle-checked
    // against the source parquet — same upgrade as q220 for the Arrow
    // source (was ArrowIpcSpec-only): a drift in the IPC encoder/decoder
    // (endianness, validity bitmaps, varchar offsets) shifts the aggregate.
    Q("q221_feather_roundtrip",
      (s, dir) => {
        val src = t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"), col("s_name"))
        val path = tmp(dir, "supp_feather")
        new java.io.File(path).mkdirs()
        graft.sources.ArrowIpc.writeFeather(src, s"$path/supplier.arrow")
        val back = graft.sources.ArrowIpc.readFeather(s, s"$path/supplier.arrow")
        Frame(back.groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("s_acctbal")), 2).as("total"),
            min(col("s_name")).as("first_name")))
          .sortValues(Seq(SortKey.asc("s_nationkey"))).df
      },
      Some("""
        SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS total,
               min(s_name) AS first_name
        FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // to_html + read_html round-trip (r9 — closes the read_html slice of
    // the io.py:218-410 row; reference runs it single-node via
    // default_to_pandas). One document per nation region written
    // driver-side, read back as a directory (one task per document, the
    // many-small-pages crawl-ingestion shape), aggregated vs DuckDB on
    // the source parquet — a drift in tag parsing, entity escaping, or
    // dtype inference shifts the hash.
    Q("q222_html_roundtrip",
      (s, dir) => {
        val src = t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        val path = tmp(dir, "nation_html")
        val d = new java.io.File(path)
        d.mkdirs()
        d.listFiles().filter(_.getName.endsWith(".html")).foreach(_.delete())
        (0L until 5L).foreach { rk =>
          graft.sources.Html.write(
            src.filter(col("n_regionkey") === rk).orderBy(col("n_nationkey")),
            s"$path/region_$rk.html")
        }
        val back = graft.sources.Html.read(s, path)
        Frame(back.groupBy(col("n_regionkey"))
          .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"),
            sum(col("n_nationkey")).as("key_sum")))
          .sortValues(Seq(SortKey.asc("n_regionkey"))).df
      },
      Some("""
        SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, count(*) AS n,
               min(n_name) AS first_name,
               CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        FROM nation GROUP BY 1 ORDER BY 1""")),

    // to_stata + read_stata round-trip (r9 — the .dta v114 binary format,
    // reference io.py:218-410 default_to_pandas; StataSpec additionally
    // validates the reader against a genuine pandas-written fixture and
    // pandas reads our writer's output back). Long narrows to st_int
    // here (keys fit int32), doubles carry the "." missing code; the
    // read-back aggregate must hash-match DuckDB on the source parquet.
    Q("q223_stata_roundtrip",
      (s, dir) => {
        val src = t(s, dir, "region")
          .join(t(s, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
          .select(col("n_nationkey"), col("n_name"), col("r_name"))
        val path = tmp(dir, "nation_dta")
        new java.io.File(path).mkdirs()
        graft.sources.Stata.write(src, s"$path/nations.dta")
        val back = graft.sources.Stata.read(s, s"$path/nations.dta")
        Frame(back.groupBy(col("r_name"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_nationkey")).cast("long").as("key_sum"),
            min(col("n_name")).as("first_name")))
          .sortValues(Seq(SortKey.asc("r_name"))).df
      },
      Some("""
        SELECT r_name, count(*) AS n,
               CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
               min(n_name) AS first_name
        FROM region JOIN nation ON r_regionkey = n_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // to_sas + read_sas round-trip (r9 — XPORT v5, reference
    // io.py:218-410 default_to_pandas; SasXportSpec additionally pins
    // the reader to pandas.read_sas's parse of a committed fixture and
    // validates the IBM hex-float codec bit-exactly). The format's only
    // numeric type is the IBM double and names cap at 8 ASCII bytes, so
    // keys alias short and come back as doubles — cast to long before
    // the aggregate so the oracle schema matches.
    Q("q224_sas_roundtrip",
      (s, dir) => {
        val src = t(s, dir, "supplier")
          .select(col("s_suppkey").as("SUPPKEY"),
            col("s_nationkey").as("NATKEY"), col("s_acctbal").as("ACCTBAL"))
        val path = tmp(dir, "supp_xpt")
        new java.io.File(path).mkdirs()
        graft.sources.SasXport.write(src, s"$path/supplier.xpt")
        val back = graft.sources.SasXport.read(s, s"$path/supplier.xpt")
        Frame(back.groupBy(col("NATKEY").cast("long").as("s_nationkey"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("ACCTBAL")), 2).as("total"),
            min(col("SUPPKEY")).cast("long").as("min_key")))
          .sortValues(Seq(SortKey.asc("s_nationkey"))).df
      },
      Some("""
        SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, count(*) AS n,
               round(sum(s_acctbal), 2) AS total,
               CAST(min(s_suppkey) AS BIGINT) AS min_key
        FROM supplier GROUP BY 1 ORDER BY 1""")),

    // to_spss + read_spss round-trip (r9 — .sav system file per the
    // public PSPP format doc; no external .sav implementation ships in
    // this env, so unlike stata/sas the gate proves the WRITE→READ loop
    // + aggregate against the source parquet, with format edges pinned
    // in SpssSpec). Bytecode compression on the write path: customer
    // keys are small integers, so both the biased-bytecode and
    // literal-double branches execute. Like SAS, the dictionary has two
    // types — keys come back as doubles and cast to long before the
    // aggregate.
    Q("q228_spss_roundtrip",
      (s, dir) => {
        val src = t(s, dir, "customer")
          .select(col("c_custkey").as("CUSTKEY"),
            col("c_mktsegment").as("SEGMENT"), col("c_acctbal").as("ACCTBAL"))
        val path = tmp(dir, "cust_sav")
        new java.io.File(path).mkdirs()
        graft.sources.Spss.write(src, s"$path/customer.sav")
        val back = graft.sources.Spss.read(s, s"$path/customer.sav")
        Frame(back.groupBy(col("SEGMENT").as("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("ACCTBAL")), 2).as("total"),
            min(col("CUSTKEY")).cast("long").as("min_key")))
          .sortValues(Seq(SortKey.asc("c_mktsegment"))).df
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS total,
               CAST(min(c_custkey) AS BIGINT) AS min_key
        FROM customer GROUP BY 1 ORDER BY 1""")))
}
