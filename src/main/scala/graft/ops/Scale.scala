package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for the 100 TB design point.
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins at
  * runtime; these helpers cover the two cases AQE can't: a hot key whose
  * rows must still aggregate/join through one reducer, and plans where the
  * skew is known ahead of time and a deterministic layout is preferred.
  */
object Scale {

  /** Deterministic per-row salt in [0, nSalts): hash of the given columns.
    * Content-derived (not partition- or order-derived), so replays and
    * retries salt identically — a random or partition-id salt would break
    * determinism and exactly-once sinks.
    */
  def salt(nSalts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(nSalts.toLong)).cast("int")

  /** Salted equi-join: spread a skewed fact key across `nSalts` reducers by
    * salting the fact side on full-row content and replicating each dim row
    * to every salt. Dim grows nSalts× (bounded: use for genuinely small dim
    * sides that still can't broadcast, or hot-key subsets); the fact side's
    * hot key fans out to nSalts parallel streams.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, nSalts: Int,
      saltCols: Seq[String]): DataFrame = {
    val salted = fact.withColumn("__salt", salt(nSalts, saltCols.map(col): _*))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation for distributive aggregates over a skewed
    * group key: partial-aggregate on (key, salt) — nSalts parallel partial
    * states per hot key — then final-aggregate on key. Equivalent to the
    * direct groupBy for SUM/COUNT/MIN/MAX.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String, nSalts: Int,
      saltCols: Seq[String]): DataFrame =
    df.withColumn("__salt", salt(nSalts, saltCols.map(col): _*))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).cast("long").as("cnt"))

  /** Deterministic hash-threshold sample: keep rows whose content hash
    * falls below the rate threshold. Unlike `df.sample` (seed + partition
    * dependent), the decision is a pure function of row content — replays,
    * retries, repartitions and cluster layouts all pick the same rows, and
    * samples NEST: sample(0.1) ⊆ sample(0.3) over the same columns, which
    * lets a pipeline grow a training subset without reshuffling history.
    * Rate granularity 1e-6.
    */
  def hashSample(df: DataFrame, rate: Double, cols: Seq[String]): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(pmod(xxhash64(cols.map(col): _*), lit(1000000L))
      < math.round(rate * 1000000L))
  }

  /** Deterministic stratified sample: up to `n` rows per stratum, picked in
    * content-hash order (stable and uniform-ish within the stratum, not
    * data-order-dependent). One keyed window — shuffles once on the stratum.
    */
  def stratifiedSample(df: DataFrame, stratumCols: Seq[String], n: Int,
      hashCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCols.map(col): _*)
      .orderBy(xxhash64(hashCols.map(col): _*) +: hashCols.map(col): _*)
    df.withColumn("__srn", row_number().over(w))
      .filter(col("__srn") <= n)
      .drop("__srn")
  }

  /** Hive-style partitioned parquet layout: one directory per value of
    * `partCols`. Readers filtering on a partition column prune whole
    * directories at PLANNING time (`PartitionFilters` in the scan, zero I/O
    * for excluded partitions) — the storage-layout lever that turns a
    * 100 TB corpus scan into a per-language/per-day scan. Partition columns
    * must be bounded-cardinality (lang, date, source — never a key).
    */
  def partitionedWrite(df: DataFrame, outDir: String, partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(outDir)

  /** Z-order (Morton) interleave of two non-negative int columns, 16 bits
    * each → one 32-bit curve position. Pure codegen'd bit arithmetic
    * (shifts/masks via the four-step bit-spread), no UDF.
    *
    * Why: range-partitioning a table by ONE column clusters its parquet
    * min/max stats for that column only — a filter on any other column
    * skips nothing. Sorting by the interleaved curve position gives every
    * file a small bounding BOX in (a, b) space, so row-group/file stats
    * prune scans filtering on EITHER column (or both) — the multi-column
    * data-skipping layout a 100 TB immutable corpus is rewritten into
    * once and scanned forever. Columns wider than 16 bits should be
    * quantized (e.g. `(col / bucket)`) before interleaving: the curve
    * needs locality, not identity.
    */
  def zorder(a: Column, b: Column): Column = {
    // spread the low 16 bits of x to even bit positions (classic
    // mask-shift doubling: 0x0000FFFF → …0101 pattern in 4 steps)
    def spread(x: Column): Column = {
      val m0 = x.bitwiseAND(lit(0xFFFFL))
      val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
      val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
      m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))
  }

  /** Write `df` laid out along the (a, b) Z-order curve: range-partition +
    * intra-partition sort on the curve position (one exchange — the same
    * cost as any global sort), then drop the helper column. `nFiles`
    * bounds output file count so file-level min/max stats stay coarse
    * enough to matter. Readers need no special support: Spark's parquet
    * scan consumes the row-group stats the layout created.
    */
  def zorderedWrite(df: DataFrame, outDir: String, a: String, b: String,
      nFiles: Int): Unit =
    df.withColumn("__z", zorder(col(a), col(b)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
}
