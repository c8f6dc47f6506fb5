package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-data preprocessing pipeline — the flow a 100 TB
  * corpus actually runs, built entirely from this engine's operators:
  *
  *   quality filter → exact dedup → (near-dup removal) → per-lang stats
  *
  * Every stage is a narrow filter or a keyed aggregation/window — the
  * pipeline inherits each operator's scale shape (no stage introduces an
  * unkeyed shuffle or a driver-side loop).
  *
  * q_pipeline_clean (✓ oracle): quality gate + exact dedup + stats — fully
  * relational, DuckDB-checkable.
  * q_pipeline_full (✗): additionally removes MinHash-LSH near-duplicate
  * candidates (keeps the lower doc_id of each candidate pair); signature
  * hashes are engine-specific, so it is ScalaTest-verified.
  */
object Pipeline {

  private def qualityGate(df: DataFrame): DataFrame = {
    val nTokens = size(split(col("text"), " "))
    df.filter(nTokens.between(20, 80))
  }

  private def exactDedup(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("text")
    df.withColumn("__min_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("__min_id"))
      .drop("__min_id")
  }

  private def langStats(df: DataFrame): DataFrame =
    df.groupBy("lang")
      .agg(count(lit(1)).as("doc_cnt"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(asc_nulls_first("lang"))

  /** Near-dup removal: drop the higher doc_id of every MinHash-LSH
    * candidate pair (computed on the post-dedup corpus; pair generation is
    * Dedup.minhashPairs — one definition, one set of parameters).
    */
  private def nearDupRemoval(s: SparkSession, df: DataFrame): DataFrame = {
    val pairs = Dedup.minhashPairs(df.select("doc_id", "text"))
    val drop = pairs.select(col("b_id").as("doc_id")).distinct()
    df.join(drop, Seq("doc_id"), "left_anti")
  }

  val all: Seq[Q] = Seq(
    Q(
      "q_pipeline_clean",
      (s, d) => langStats(exactDedup(qualityGate(tbl(s, d, "documents")))),
      Some("""WITH q AS (
             |  SELECT * FROM documents
             |  WHERE len(string_split(text, ' ')) BETWEEN 20 AND 80),
             |k AS (
             |  SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS min_id FROM q)
             |SELECT lang, COUNT(*) AS doc_cnt,
             |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
             |FROM k WHERE doc_id = min_id
             |GROUP BY lang ORDER BY lang ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "q_pipeline_full",
      (s, d) =>
        langStats(nearDupRemoval(s, exactDedup(qualityGate(tbl(s, d, "documents"))))),
      None
    )
  )
}
