package graft.ops

import org.apache.spark.sql.functions._

/** Set operations, pivot and scalar subquery (SURVEY.md §2-B rows 23–27).
  *
  * Scale notes: INTERSECT/EXCEPT are distinct-aggregates over the key —
  * shuffle bounded by distinct values. Pivot uses an explicit value list so
  * it is a single-pass pivot aggregate (no extra distinct-values job). The
  * scalar subquery broadcasts one aggregated row, not the table.
  */
object SetOps {

  val all: Seq[Q] = Seq(
    Q(
      "q_union_all",
      (s, d) => {
        val e = tbl(s, d, "events").select("event_id", "event_type", "value")
        e.filter(col("event_type") === "click")
          .unionAll(e.filter(col("event_type") === "error"))
          .orderBy(asc_nulls_first("event_id"))
      },
      Some("""SELECT event_id, event_type, value FROM (
             |  SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
             |  UNION ALL
             |  SELECT event_id, event_type, value FROM events WHERE event_type = 'error'
             |)
             |ORDER BY event_id ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "q_intersect",
      (s, d) => {
        tbl(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .intersect(tbl(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
          .orderBy(asc_nulls_first("nationkey"))
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      // Registered customers that never emitted an event. Subtracting the
      // EVENTS id set (not orders — every synthetic customer has an
      // order, so that form returned 0 rows and passed vacuously) keeps
      // the result provably non-empty on the driver fixtures: 135 rows
      // at sf0.001, 1350 at sf0.01. NonVacuousSpec plants the synthetic
      // non-empty case as well.
      "q_except",
      (s, d) => {
        tbl(s, d, "customer").select(col("c_custkey").as("custkey"))
          .except(tbl(s, d, "events").select(col("user_id").as("custkey")))
          .orderBy(asc_nulls_first("custkey"))
      },
      Some("""SELECT c_custkey AS custkey FROM customer
             |EXCEPT
             |SELECT user_id AS custkey FROM events
             |ORDER BY custkey ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "q_pivot",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val pivoted = tbl(s, d, "events")
          .groupBy("user_id")
          .pivot("event_type", types)
          .count()
        types.foldLeft(pivoted) { (df, t) =>
          df.withColumn(s"${t}_cnt", coalesce(col(t), lit(0L))).drop(t)
        }.orderBy(asc_nulls_first("user_id"))
      },
      Some("""SELECT user_id,
             |  COUNT(*) FILTER (WHERE event_type = 'click') AS click_cnt,
             |  COUNT(*) FILTER (WHERE event_type = 'error') AS error_cnt,
             |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase_cnt,
             |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup_cnt,
             |  COUNT(*) FILTER (WHERE event_type = 'view') AS view_cnt
             |FROM events GROUP BY user_id
             |ORDER BY user_id ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      // Unpivot/melt — the inverse report reshape of q_pivot: a wide
      // per-group aggregate goes long as (group, metric, value). Spark's
      // native Dataset.unpivot (Expand under the hood — one pass, no join,
      // no shuffle beyond the feeding agg); the oracle spells the same
      // reshape as UNION ALL. Metrics sum as exact decimals then cast once
      // (the engines agree bit-for-bit); reshape output is 3× the agg's
      // row count, bounded by group cardinality, never corpus-sized.
      "q_unpivot",
      (s, d) => {
        tbl(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(asDec(sum(dec(col("l_quantity")))).as("sum_qty"),
            asDec(sum(dec(col("l_extendedprice")))).as("sum_price"),
            asDec(sum(dec(col("l_discount")))).as("sum_disc"))
          .unpivot(
            Array(col("l_returnflag"), col("l_linestatus")),
            Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
            "metric", "value")
          .orderBy(asc_nulls_first("l_returnflag"),
            asc_nulls_first("l_linestatus"), asc_nulls_first("metric"))
      },
      Some("""WITH a AS (
             |  SELECT l_returnflag, l_linestatus,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
             |    CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT l_returnflag, l_linestatus, metric, value FROM (
             |  SELECT l_returnflag, l_linestatus, 'sum_qty' AS metric,
             |    sum_qty AS value FROM a
             |  UNION ALL SELECT l_returnflag, l_linestatus, 'sum_price', sum_price FROM a
             |  UNION ALL SELECT l_returnflag, l_linestatus, 'sum_disc', sum_disc FROM a)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST,
             |  metric ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "q_subquery_scalar",
      (s, d) => {
        // Orders above global average price. The threshold is an exact
        // decimal SUM cast to double then one IEEE division — bit-identical
        // across engines, so the predicate boundary is deterministic.
        val o = tbl(s, d, "orders")
        val thresh = o.agg(
          (sum(dec(col("o_totalprice"))).cast("double") / count(lit(1))).as("avg_price"))
        o.crossJoin(broadcast(thresh))
          .filter(col("o_totalprice") > col("avg_price"))
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(asc_nulls_first("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |WHERE o_totalprice > (
             |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
             |  FROM orders)
             |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      // UNION with distinct semantics (vs q_union_all): dedup is a
      // distinct-aggregate over the output key — shuffle bounded by
      // distinct values, like INTERSECT/EXCEPT.
      "q_union_distinct",
      (s, d) => {
        val e = tbl(s, d, "events")
        e.filter(col("event_type") === "click").select("user_id")
          .union(e.filter(col("event_type") === "purchase").select("user_id"))
          .distinct()
          .orderBy(asc_nulls_first("user_id"))
      },
      Some("""SELECT user_id FROM events WHERE event_type = 'click'
             |UNION
             |SELECT user_id FROM events WHERE event_type = 'purchase'
             |ORDER BY user_id ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      // Correlated scalar subquery (orders above THEIR CUSTOMER's average),
      // decorrelated as a per-key window — the scale-correct plan: one
      // shuffle on the correlation key instead of a re-executed subquery
      // per row. Average = exact-decimal sum → one IEEE division.
      "q_corr_subquery",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
        tbl(s, d, "orders")
          .withColumn("cust_avg",
            sum(dec(col("o_totalprice"))).over(w).cast("double")
              / count(lit(1)).over(w))
          .filter(col("o_totalprice") > col("cust_avg"))
          .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
          .transform(df => sortOnce(df)(asc_nulls_first("o_orderkey")))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, cust_avg FROM (
             |  SELECT o_orderkey, o_custkey, o_totalprice,
             |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
             |           OVER (PARTITION BY o_custkey) AS DOUBLE)
             |      / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
             |  FROM orders)
             |WHERE o_totalprice > cust_avg
             |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin)
    )
  )
}
