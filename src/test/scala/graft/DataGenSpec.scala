package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Contract tests for tools.DataGen — the generator behind the committed
  * sf1.0 scale point (PROFILE_sf1.txt). The scale measurement is only as
  * trustworthy as the fixture, so pin: reproducibility (two runs are
  * row-identical), schema compatibility with the driver fixture (same
  * Spark-level column names and types per table), and linear row-count
  * scaling.
  */
class DataGenSpec extends SparkSpec {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private lazy val genA = {
    val dir = Files.createTempDirectory("datagen-a").toString
    tools.DataGen.generate(spark, 0.001, dir); dir
  }

  private def contentHash(dir: String, t: String): Long = {
    val df = spark.read.parquet(s"$dir/$t.parquet")
    // order-insensitive row-content fingerprint: xor-fold of per-row hashes
    // (xor, not sum — sum overflows Long under ANSI mode)
    df.select(xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)
  }

  test("DataGen is reproducible: two runs generate identical content") {
    val dirB = Files.createTempDirectory("datagen-b").toString
    tools.DataGen.generate(spark, 0.001, dirB)
    tables.foreach { t =>
      assert(contentHash(genA, t) == contentHash(dirB, t),
        s"$t must be row-identical across runs")
    }
  }

  test("DataGen schemas match the driver fixture per table") {
    tables.foreach { t =>
      val gen = spark.read.parquet(s"$genA/$t.parquet").schema
      val drv = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").schema
      val genCols = gen.fields.map(f => (f.name, f.dataType.typeName)).toSeq
      val drvCols = drv.fields.map(f => (f.name, f.dataType.typeName)).toSeq
      assert(genCols == drvCols, s"$t schema drift: gen=$genCols vs driver=$drvCols")
    }
  }

  test("DataGen row counts scale linearly with sf") {
    val dir2 = Files.createTempDirectory("datagen-2x").toString
    tools.DataGen.generate(spark, 0.002, dir2)
    Seq("lineitem", "orders", "documents", "events").foreach { t =>
      val n1 = spark.read.parquet(s"$genA/$t.parquet").count()
      val n2 = spark.read.parquet(s"$dir2/$t.parquet").count()
      assert(n2 == 2 * n1, s"$t: sf0.002 must be exactly 2x sf0.001 rows ($n2 vs $n1)")
    }
    // dimension tables don't scale
    assert(spark.read.parquet(s"$dir2/region.parquet").count() == 5)
    assert(spark.read.parquet(s"$dir2/nation.parquet").count() == 25)
  }

  test("DataGen events.ts is a µs timestamp_ntz that tbl() converts like the driver's") {
    val sch = spark.read.parquet(s"$genA/events.parquet").schema
    assert(sch("ts").dataType.typeName == "timestamp_ntz")
    val viaTbl = graft.ops.tbl(spark, genA, "events").schema
    assert(viaTbl("ts").dataType.typeName == "timestamp")
  }

  test("tbl() reads the ns-long and µs-ntz events encodings to identical instants") {
    // The driver fixture shipped ts as timestamp[ns] (read as a raw long
    // under nanosAsLong) through r12 and as timestamp[us] (TIMESTAMP_NTZ)
    // since r14 — the r13/r14 breakage was tbl() assuming the long form.
    // Pin both branches: the same underlying instants must come back as the
    // same TimestampType values regardless of fixture encoding.
    val base = Files.createTempDirectory("tbl-enc").toString
    val ntz = graft.ops.tbl(spark, genA, "events")
      .select(col("event_id"), col("ts"))
    // re-encode the SAME fixture as the legacy ns-long form
    spark.read.parquet(s"$genA/events.parquet")
      .withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val viaLong = graft.ops.tbl(spark, base, "events")
      .select(col("event_id"), col("ts"))
    assert(viaLong.schema("ts").dataType.typeName == "timestamp")
    assert(ntz.exceptAll(viaLong).count() == 0 && viaLong.exceptAll(ntz).count() == 0,
      "both encodings must yield identical (event_id, ts) instants through tbl()")
  }

  test("every planted document duplicate matches its source text exactly") {
    // Recompute the generator's pointer rule and check the planted pair:
    // before the r12 pointer-chain guard, a source that was itself a dup
    // pointer derived its text elsewhere, so ~1/64 of planted "duplicates"
    // matched nothing. Now: pointer ⇒ text-identical source, no exception.
    // sf0.04 (200 docs) is the smallest fixture where the hash plants a
    // pointer (sf0.001's 5 docs plant none — verified by direct probe).
    val dirD = Files.createTempDirectory("datagen-dup").toString
    tools.DataGen.generate(spark, 0.04, dirD)
    val docs = spark.read.parquet(s"$dirD/documents.parquet")
    val n = docs.count()
    val dSrc = pmod(xxhash64(lit("dsrcid"), col("doc_id")), lit(math.max(1L, n / 2)))
    val ptr = docs.filter(
        pmod(xxhash64(lit("ddup"), col("doc_id")), lit(64)) === 0 &&
        pmod(xxhash64(lit("ddup"), dSrc), lit(64)) =!= 0)
      .select(col("doc_id").as("p_id"), dSrc.as("src_id"), col("text").as("p_text"))
    val joined = ptr.join(docs.select(col("doc_id").as("src_id"), col("text")), "src_id")
    val total = joined.count()
    assert(total > 0, "fixture must plant at least one duplicate pair")
    assert(joined.filter(col("p_text") =!= col("text")).count() == 0,
      "every planted pointer's text must equal its source's text")
  }
}
