package graft

import org.apache.spark.sql.functions._

/** Cross-checks for the two r15 scan-shape rewrites that carry DuckDB
  * oracles: q_peak_concurrency (two-level sweep line) against a brute
  * force per-minute census, and q_bottomk_sample (bounded KMV aggregate)
  * against the window formulation it replaces. The oracle hash gate
  * proves engine-vs-DuckDB; these prove the SCALE rewrite inside the
  * engine equals the naive form it optimizes away.
  */
class SweepSampleSpec extends SparkSpec {

  test("q_peak_concurrency equals a brute-force interval-overlap count") {
    val got = query("q_peak_concurrency").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got.values.forall(_ >= 1L))

    // brute force per event type: for every event start t, count events
    // of the same type whose [ts, ts+15m) interval covers t. The sweep
    // max is attained at some interval start, so this census equals it.
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("ts").cast("timestamp").as("ts"))
    val exact = ev.as("a")
      .join(ev.as("b"), col("a.event_type") === col("b.event_type") &&
        col("b.ts") <= col("a.ts") &&
        col("a.ts") < col("b.ts") + expr("INTERVAL 15 MINUTES"))
      .groupBy(col("a.event_type").as("et"), col("a.ts").as("t0"))
      .agg(count(lit(1)).as("cover"))
      .groupBy("et").agg(max(col("cover")).as("peak"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("q_bottomk_sample equals the window bottom-k it replaces") {
    val viaAgg = query("q_bottomk_sample").collect().map(_.toString).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(asc_nulls_first("h"), asc_nulls_first("doc_id"))
    val viaWindow = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), col("doc_id"),
        (col("doc_id") % 1000003L * 2654435761L % 4294967296L).as("h"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select("lang", "doc_id", "h", "rn")
      .orderBy(asc_nulls_first("lang"), asc_nulls_first("rn"))
      .collect().map(_.toString).toSeq
    assert(viaAgg.nonEmpty && viaAgg == viaWindow)
  }

  test("q_bottomk_sample plans the bounded aggregate, not a Window") {
    val plan = query("q_bottomk_sample").queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Window"), plan)
  }
}
