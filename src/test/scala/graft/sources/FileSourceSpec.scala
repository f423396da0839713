package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class FileSourceSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_fs").toString
  private lazy val nation = graft.Tables(spark, sf, "nation")

  test("parquet auto-detect") {
    val df = FileSource.file(spark, s"$sf/nation.parquet")
    assert(df.count() == nation.count())
  }

  test("csv with names round-trip preserves rows and schema names") {
    Sink.csv(nation, s"$tmp/nation.csv")
    val back = FileSource.file(spark, s"$tmp/nation.csv")
    assert(back.columns.toSeq == nation.columns.toSeq)
    assert(back.count() == nation.count())
  }

  test("tsv and headerless csv formats") {
    Sink.csv(nation, s"$tmp/nation_h.csv", header = false)
    val headerless = FileSource.file(spark, s"$tmp/nation_h.csv", Some("CSV"))
    assert(headerless.count() == nation.count())
    assert(headerless.columns.head == "_c0") // no names in format CSV

    nation.write.mode("overwrite").option("sep", "\t").option("header", "true")
      .csv(s"$tmp/nation.tsv")
    val tsv = FileSource.file(spark, s"$tmp/nation.tsv")
    assert(tsv.count() == nation.count())
    assert(tsv.columns.toSeq == nation.columns.toSeq)
  }

  test("json-each-row round-trip") {
    Sink.json(nation, s"$tmp/nation.json")
    val back = FileSource.file(spark, s"$tmp/nation.json")
    assert(back.count() == nation.count())
    assert(back.columns.toSet == nation.columns.toSet)
  }

  test("xml auto-detects and parses <row> records") {
    val dir = new java.io.File(s"$tmp/xmlsrc")
    dir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$tmp/xmlsrc/data.xml"),
      """<rows>
        |  <row><n_nationkey>1</n_nationkey><n_name>FRANCE</n_name></row>
        |  <row><n_nationkey>2</n_nationkey><n_name>KENYA</n_name></row>
        |</rows>""".stripMargin)
    val back = FileSource.file(spark, s"$tmp/xmlsrc/data.xml")
    assert(back.count() == 2)
    assert(back.columns.toSet == Set("n_nationkey", "n_name"))
    assert(back.where("n_name = 'KENYA'").count() == 1)
    // full write/read round trip through the Sink
    Sink.xml(nation, s"$tmp/nation_xml")
    val rt = FileSource.file(spark, s"$tmp/nation_xml", Some("xml"))
    assert(rt.count() == nation.count())
    assert(rt.columns.toSet == nation.columns.toSet)
  }

  test("orc round-trip with explicit format") {
    nation.write.mode("overwrite").orc(s"$tmp/nation_orc")
    val back = FileSource.file(spark, s"$tmp/nation_orc", Some("ORC"))
    assert(back.count() == nation.count())
  }

  test("scheme routing normalizes s3 and rejects unknown extensions") {
    // file: scheme passes through the same reader
    val df = FileSource.route(spark, s"file://$sf/nation.parquet")
    assert(df.count() == nation.count())
    intercept[IllegalArgumentException] {
      FileSource.file(spark, "/data/table.xyz")
    }
  }

  test("jdbc() reads an external database with filter pushdown") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE ext_users (id INT, name VARCHAR(20), score INT)")
      st.execute("INSERT INTO ext_users VALUES (1,'a',10),(2,'b',20),(3,'c',30)")
      st.close()
    } finally conn.close()
    val df = FileSource.jdbc(spark, url, "ext_users")
      .filter(org.apache.spark.sql.functions.col("score") > 15)
    assert(df.count() == 2)
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("id", "name", "score"))
    // the filter reaches the JDBC scan, not a post-scan Spark filter only
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("SCORE"), plan.take(600))
  }

  test("url() spools a remote object to a local copy and reads it") {
    // file:// stands in for http(s) — spoolUrl accepts any URL stream,
    // and route() takes the spool path for http(s) schemes
    Sink.csv(nation, s"$tmp/nation_url.csv")
    val part = new java.io.File(s"$tmp/nation_url.csv").listFiles()
      .filter(_.getName.endsWith(".csv")).head
    val spooled = FileSource.spoolUrl(s"file://${part.getAbsolutePath}")
    assert(spooled != part.getAbsolutePath) // a local copy, not the original
    assert(spooled.endsWith(".csv")) // extension survives for auto-detect
    val df = FileSource.file(spark, spooled)
    assert(df.count() == nation.count())
    // second spool of the same URL reuses the cached copy
    assert(FileSource.spoolUrl(s"file://${part.getAbsolutePath}") == spooled)
  }

  test("partitioned parquet sink lays out partition directories") {
    Sink.parquet(nation, s"$tmp/nation_part", partitionBy = Seq("n_regionkey"))
    val dirs = new java.io.File(s"$tmp/nation_part").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("n_regionkey=")))
    val back = FileSource.file(spark, s"$tmp/nation_part/n_regionkey=0/", Some("Parquet"))
    assert(back.count() > 0)
  }

  test("zorderParquet clusters both layout columns into narrow file ranges") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val nFiles = 8

    Sink.parquet(li.repartition(nFiles), s"$tmp/li_plain")
    Sink.zorderParquet(li, s"$tmp/li_zorder",
      Seq("l_orderkey", "l_partkey"), nFiles)

    // identical content
    val back = spark.read.parquet(s"$tmp/li_zorder")
    assert(back.count() == li.count())
    assert(back.agg(sum("l_quantity")).head.getDouble(0) ==
      li.agg(sum("l_quantity")).head.getDouble(0))

    // each z-ordered file covers a small AREA of the 2-d key space;
    // round-robin files cover ~the whole space. Area = product of the
    // file's normalized per-column ranges.
    def meanArea(path: String): Double = {
      val o = Sink.fileColumnRanges(spark, path, "l_orderkey")
      val p = Sink.fileColumnRanges(spark, path, "l_partkey")
      val (oMin, oMax) = (o.map(_._2).min, o.map(_._3).max)
      val (pMin, pMax) = (p.map(_._2).min, p.map(_._3).max)
      val byFile = o.map(r => r._1 -> r).toMap
      val areas = p.map { pr =>
        val or = byFile(pr._1)
        ((or._3 - or._2).toDouble / math.max(1, oMax - oMin)) *
          ((pr._3 - pr._2).toDouble / math.max(1, pMax - pMin))
      }
      areas.sum / areas.size
    }
    val (plain, zorder) = (meanArea(s"$tmp/li_plain"), meanArea(s"$tmp/li_zorder"))
    assert(zorder < plain / 2,
      f"zorder mean file area $zorder%.3f not < half of plain $plain%.3f")
  }

  test("bloomParquet writes bloom filters the footer can prove") {
    import org.apache.spark.sql.functions._
    // high-cardinality keys: parquet only materializes a bloom filter
    // once a chunk falls back from dictionary encoding (a complete
    // dictionary already answers point lookups), so the spec models
    // the real use case — an id column whose dictionary page overflows
    val ids = spark.range(300000)
      .select(col("id"), md5(col("id").cast("string")).as("key"))
      .coalesce(1)
    Sink.bloomParquet(ids, s"$tmp/ids_bloom", Seq("key"), ndv = 300000)
    assert(Sink.hasBloomFilter(spark, s"$tmp/ids_bloom", "key"))
    assert(!Sink.hasBloomFilter(spark, s"$tmp/ids_bloom", "id"))
    // content survives the write
    assert(spark.read.parquet(s"$tmp/ids_bloom").count() == 300000)
  }

  test("compactParquet repacks a fragmented directory without losing rows") {
    val dir = s"$tmp/frag"
    // a badly fragmented table: one file per row group of a 25-row table
    nation.repartition(20).write.mode("overwrite").parquet(dir)
    val before = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(before > 2)
    val checksum = spark.read.parquet(dir)
      .agg(org.apache.spark.sql.functions.sum("n_nationkey")).head.getLong(0)
    val (was, now) = Sink.compactParquet(spark, dir, targetFileBytes = 1L << 30)
    assert(was == before && now == 1, s"$was -> $now")
    val after = spark.read.parquet(dir)
    assert(after.count() == nation.count())
    assert(after.agg(org.apache.spark.sql.functions.sum("n_nationkey"))
      .head.getLong(0) == checksum)
    // idempotent: already-compact directories are left untouched
    assert(Sink.compactParquet(spark, dir, targetFileBytes = 1L << 30) == (1, 1))
  }
}
