package graft.ops

import org.apache.spark.sql.functions._

/** Scalar-function and generator family (SURVEY.md §2-B rows 28–34) plus
  * the reference's separator framing transform re-expressed relationally
  * (q_transform_sep ≈ /root/reference/transform.go:28-59 semantics) and a
  * binary/multimodal metadata probe (q_binary_meta).
  *
  * Scale notes: everything here is a narrow per-row projection — one
  * whole-stage-codegen span over the scan, no shuffle except the final
  * declared ORDER BY (driver-contract determinism) and explode's group-by.
  *
  * Determinism: lengths/date parts cast to an explicit integer width (Spark
  * INT vs DuckDB BIGINT defaults differ); float math restricted to single
  * correctly-rounded IEEE ops (sqrt, one division) or exact cases (powers
  * of two) — libm-divergent territory (pow of arbitrary doubles, ln, trig)
  * is avoided in oracle-checked outputs.
  */
object Scalars {

  val all: Seq[Q] = Seq(
    Q(
      "q_string_funcs",
      (s, d) => {
        tbl(s, d, "part")
          .select(col("p_partkey"),
            upper(col("p_name")).as("name_upper"),
            substring(col("p_name"), 1, 8).as("name_prefix"),
            length(col("p_name")).cast("int").as("name_len"),
            concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
            col("p_name").like("%a%").as("has_a"),
            regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"))
          .orderBy(asc_nulls_first("p_partkey"))
      },
      Some("""SELECT p_partkey, UPPER(p_name) AS name_upper,
             |  SUBSTRING(p_name, 1, 8) AS name_prefix,
             |  CAST(LENGTH(p_name) AS INT) AS name_len,
             |  CONCAT(p_brand, '/', p_type) AS brand_type,
             |  (p_name LIKE '%a%') AS has_a,
             |  regexp_extract(p_name, '^(\w+)', 1) AS first_word
             |FROM part ORDER BY p_partkey ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "q_date_funcs",
      (s, d) => {
        tbl(s, d, "orders")
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("order_year"),
            month(col("o_orderdate")).cast("int").as("order_month"),
            dayofmonth(col("o_orderdate")).cast("int").as("order_day"),
            quarter(col("o_orderdate")).cast("int").as("order_quarter"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"))
          .orderBy(asc_nulls_first("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  CAST(YEAR(o_orderdate) AS INT) AS order_year,
             |  CAST(MONTH(o_orderdate) AS INT) AS order_month,
             |  CAST(DAY(o_orderdate) AS INT) AS order_day,
             |  CAST(QUARTER(o_orderdate) AS INT) AS order_quarter,
             |  CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
             |  CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
             |FROM orders ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "q_math_funcs",
      (s, d) => {
        tbl(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            round(dec(col("l_extendedprice")), 2).cast("double").as("price_r2"),
            abs(col("l_discount") - 0.05).as("disc_dev"),
            sqrt(col("l_quantity")).as("sqrt_qty"),
            pow(lit(2.0), (col("l_linenumber") % 5).cast("double")).as("pow2_mod"),
            (col("l_orderkey") % 7).cast("long").as("key_mod7"),
            floor(col("l_extendedprice")).cast("long").as("price_floor"))
          // computed sort keys (price_r2 …) → sort-first impossible; cache
          // the projection once instead of recomputing it for sampling
          .transform(df => sortOnce(df)(
            asc_nulls_first("l_orderkey"), asc_nulls_first("l_linenumber"),
            asc_nulls_first("price_r2"), asc_nulls_first("disc_dev"),
            asc_nulls_first("sqrt_qty"), asc_nulls_first("pow2_mod")))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4)), 2) AS DOUBLE) AS price_r2,
             |  ABS(l_discount - 0.05) AS disc_dev,
             |  SQRT(l_quantity) AS sqrt_qty,
             |  POWER(2.0, CAST(l_linenumber % 5 AS DOUBLE)) AS pow2_mod,
             |  CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
             |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor
             |FROM lineitem
             |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
             |  price_r2 ASC NULLS FIRST, disc_dev ASC NULLS FIRST,
             |  sqrt_qty ASC NULLS FIRST, pow2_mod ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "q_case_null",
      (s, d) => {
        tbl(s, d, "customer")
          .select(col("c_custkey"),
            when(col("c_acctbal") < 0, "negative")
              .when(col("c_acctbal") < 1000, "low")
              .when(col("c_acctbal") < 5000, "mid")
              .otherwise("high").as("bal_tier"),
            coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg_norm"),
            when(col("c_nationkey") % 2 === 0, lit(null)).otherwise(col("c_nationkey"))
              .cast("int").as("odd_nation"))
          .orderBy(asc_nulls_first("c_custkey"))
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN c_acctbal < 0 THEN 'negative'
             |       WHEN c_acctbal < 1000 THEN 'low'
             |       WHEN c_acctbal < 5000 THEN 'mid'
             |       ELSE 'high' END AS bal_tier,
             |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_norm,
             |  CAST(CASE WHEN c_nationkey % 2 = 0 THEN NULL ELSE c_nationkey END AS INT) AS odd_nation
             |FROM customer ORDER BY c_custkey ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "q_json_extract",
      (s, d) => {
        // Sort FIRST on the raw key, parse after: the range partitioner's
        // sampling pass then re-executes only the 2-column scan, and the
        // JSON parse runs exactly once, post-exchange (a parse-then-sort
        // plan pays the parse twice — sampling + real pass). The two
        // get_json_object calls share one parse via subexpression
        // elimination inside the single codegen'd projection.
        tbl(s, d, "events")
          .select(col("event_id"), col("props"))
          .orderBy(asc_nulls_first("event_id"))
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").as("k_str"),
            get_json_object(col("props"), "$.k").cast("long").as("k_num"))
      },
      Some("""SELECT event_id,
             |  json_extract_string(props, '$.k') AS k_str,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
             |FROM events ORDER BY event_id ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "q_array_funcs",
      (s, d) => {
        // outputs stay scalar (array-typed cells hash engine-dependently in
        // the compare harness); slice/element_at are still exercised.
        tbl(s, d, "embeddings")
          .select(col("vec_id"),
            size(col("embedding")).cast("int").as("dim"),
            element_at(col("embedding"), 1).as("first_val"),
            element_at(col("embedding"), 64).as("last_val"),
            size(slice(col("embedding"), 1, 4)).cast("int").as("head4_len"),
            element_at(slice(col("embedding"), 1, 4), 4).as("head4_last"))
          .orderBy(asc_nulls_first("vec_id"))
      },
      Some("""SELECT vec_id,
             |  CAST(len(embedding) AS INT) AS dim,
             |  embedding[1] AS first_val,
             |  embedding[64] AS last_val,
             |  CAST(len(embedding[1:4]) AS INT) AS head4_len,
             |  (embedding[1:4])[4] AS head4_last
             |FROM embeddings ORDER BY vec_id ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "q_explode_tokens",
      (s, d) => {
        tbl(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy("token")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(desc_nulls_last("cnt"), asc_nulls_first("token"))
          .limit(40)
      },
      Some("""SELECT token, COUNT(*) AS cnt
             |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
             |GROUP BY token
             |ORDER BY cnt DESC NULLS LAST, token ASC NULLS FIRST
             |LIMIT 40""".stripMargin)
    ),
    Q(
      // Higher-order array functions with deterministic outputs: element
      // counts and extrema are exact picks (no float accumulation), so
      // lambda-based filter/transform pipelines hash-match across engines —
      // unlike aggregate()-style float folds, which stay ScalaTest-checked
      // (graft.functions vector math).
      "q_array_hof",
      (s, d) => {
        val e = col("embedding")
        tbl(s, d, "embeddings")
          .select(col("vec_id"),
            size(filter(e, x => x > 0f)).cast("long").as("n_pos"),
            size(filter(e, x => x < 0f)).cast("long").as("n_neg"),
            array_max(e).as("max_val"),
            array_min(e).as("min_val"),
            element_at(transform(e, x => (x > 0.1f).cast("int")), 1)
              .cast("long").as("first_gt"))
          .orderBy(asc_nulls_first("vec_id"))
      },
      Some("""SELECT vec_id,
             |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
             |  CAST(len(list_filter(embedding, x -> x < 0)) AS BIGINT) AS n_neg,
             |  list_max(embedding) AS max_val,
             |  list_min(embedding) AS min_val,
             |  CAST(list_transform(embedding,
             |    x -> CAST(x > CAST(0.1 AS FLOAT) AS INT))[1] AS BIGINT) AS first_gt
             |FROM embeddings ORDER BY vec_id ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      // Positional explode (ordinality-preserving generator): token + its
      // 0-based position per document — the generator variant pipelines
      // that need token offsets (n-gram windows, positional features) use.
      "q_posexplode",
      (s, d) => {
        tbl(s, d, "documents")
          .filter(col("doc_id") < 20)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("token"))
          .orderBy(asc_nulls_first("doc_id"), asc_nulls_first("pos"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS l
             |  FROM documents WHERE doc_id < 20),
             |u AS (
             |  SELECT doc_id,
             |    unnest([{'pos': i - 1, 'tok': l[i]} FOR i IN range(1, len(l) + 1)]) AS s
             |  FROM t)
             |SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.tok AS token FROM u
             |ORDER BY doc_id ASC NULLS FIRST, pos ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      // Reference separator transform (append on send / strip on receive,
      // /root/reference/transform.go:28-59) as a column pipeline: both
      // directions emitted so send∘receive=identity is oracle-checkable.
      "q_transform_sep",
      (s, d) => {
        val framed = concat(col("source"), lit("\n"))
        tbl(s, d, "documents")
          .select(col("doc_id"), col("source"),
            framed.as("framed"),
            when(framed.endsWith("\n"), framed.substr(lit(1), length(framed) - 1))
              .otherwise(framed).as("unframed"))
          .orderBy(asc_nulls_first("doc_id"))
      },
      Some("""SELECT doc_id, source,
             |  CONCAT(source, chr(10)) AS framed,
             |  CASE WHEN CONCAT(source, chr(10)) LIKE '%' || chr(10)
             |       THEN SUBSTRING(CONCAT(source, chr(10)), 1, CAST(LENGTH(CONCAT(source, chr(10))) AS INT) - 1)
             |       ELSE CONCAT(source, chr(10)) END AS unframed
             |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      // Multimodal plumbing probe: treat text as an opaque binary payload
      // column (the engine's multimodal columns are `binary` + typed
      // metadata; see graft.multimodal for the decode pipeline).
      "q_binary_meta",
      (s, d) => {
        tbl(s, d, "documents")
          .select(col("doc_id"),
            length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
            ascii(substring(col("text"), 1, 1)).cast("int").as("first_byte"),
            substring(base64(encode(col("text"), "UTF-8")), 1, 12).as("b64_prefix"))
          .orderBy(asc_nulls_first("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  CAST(ascii(SUBSTRING(text, 1, 1)) AS INT) AS first_byte,
             |  SUBSTRING(to_base64(encode(text)), 1, 12) AS b64_prefix
             |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin)
    )
  )
}
