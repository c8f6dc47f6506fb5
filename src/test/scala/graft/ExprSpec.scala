package graft

import org.apache.spark.sql.functions._

import graft.expr.RollingMinHash

/** Native-expression correctness: RollingMinHash vs a naive Scala
  * reference (hash every substring from scratch), codegen compilation, and
  * edge cases.
  */
class ExprSpec extends SparkSpec {

  import spark.implicits._

  private val Base = 1000003L

  /** O(n·w) reference: min over full polynomial hash of each window. */
  private def naive(s: String, w: Int): Long = {
    val b = s.getBytes("UTF-8")
    val n = b.length
    if (n == 0) return 0L
    val ww = math.min(w, math.max(n, 1))
    def hashOf(off: Int, len: Int): Long = {
      var h = 0L
      var i = 0
      while (i < len) { h = h * Base + (b(off + i) & 0xff); i += 1 }
      h
    }
    if (n < ww) hashOf(0, n)
    else (0 to n - ww).map(off => hashOf(off, ww)).min
  }

  test("LshSignatures equals the composed hyperplaneBit formulation on fixture embeddings") {
    import graft.functions.VectorFunctions
    val nBits = 4; val nTables = 16
    val emb = graft.ops.tbl(spark, sfDir, "embeddings")
    val composed = emb.select(col("vec_id"), array((0 until nTables).map { t =>
      (0 until nBits).map(b =>
        VectorFunctions.hyperplaneBit(col("embedding"), t * nBits + b) * (1L << b))
        .reduce(_ + _)
    }: _*).as("sig"))
    val native = emb.select(col("vec_id"),
      graft.expr.LshSignatures(col("embedding"), nBits, nTables).as("sig"))
    val diff = native.as("n").join(composed.as("c"), "vec_id")
      .filter(col("n.sig") =!= col("c.sig")).count()
    assert(diff == 0, "every vector must bucket identically in both formulations")
  }

  test("LshSignatures compiles under CODEGEN_ONLY and fails loudly on over-long vectors") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    // Without this, ConvertToLocalRelation folds the Project over the local
    // Seq relation with a hardcoded InterpretedMutableProjection and the
    // test never exercises doGenCode at all.
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try {
      val ok = Seq(Tuple1(Array.fill(64)(1.0f))).toDF("v")
        .select(graft.expr.LshSignatures(col("v"), 4, 2)).as[Seq[Long]].head()
      assert(ok.length == 2 && ok.forall(b => b >= 0 && b < 16))
      val err = intercept[Exception](
        Seq(Tuple1(Array.fill(65)(1.0f))).toDF("v")
          .select(graft.expr.LshSignatures(col("v"), 4, 2)).collect())
      assert(err.getMessage.contains("exceeds plane dim") ||
        err.getCause != null && err.getCause.getMessage.contains("exceeds plane dim"))
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("RollingMinHash equals the naive reference on fixture documents") {
    val docs = graft.ops.tbl(spark, sfDir, "documents")
      .select(col("text"), RollingMinHash(col("text"), 16).as("h"))
      .as[(String, Long)].collect()
    assert(docs.nonEmpty)
    docs.foreach { case (text, h) => assert(h == naive(text, 16), text.take(40)) }
  }

  test("RollingMinHash edge cases: empty, shorter than window, exact window") {
    val rows = Seq("", "ab", "0123456789abcdef", "xx0123456789abcdefyy")
      .toDF("t")
      .select(col("t"), RollingMinHash(col("t"), 16).as("h"))
      .as[(String, Long)].collect().toMap
    rows.foreach { case (t, h) => assert(h == naive(t, 16), s"'$t'") }
    assert(rows("") == 0L)
  }

  test("RollingMinHash compiles under CODEGEN_ONLY") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    // keep the Project unfolded so doGenCode actually runs (see the
    // LshSignatures codegen test)
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try {
      val h = Seq("hello rolling world of fingerprints").toDF("t")
        .select(RollingMinHash(col("t"), 8)).as[Long].head()
      assert(h == naive("hello rolling world of fingerprints", 8))
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("rolling_min_hash is callable from SQL after extension registration") {
    graft.expr.GraftExtensions.register(spark)
    val h = spark.sql("SELECT rolling_min_hash('hello rolling world', 8) AS h")
      .as[Long].head()
    assert(h == naive("hello rolling world", 8))
    val err = intercept[Exception](
      spark.sql("SELECT rolling_min_hash('x', 'notint')").collect())
    assert(err.getMessage.contains("integer literal"))
  }

  test("RollingMinHash rejects non-string input with a clear message") {
    val err = intercept[Exception] {
      Seq(1L).toDF("x").select(RollingMinHash(col("x"), 8)).collect()
    }
    assert(err.getMessage.contains("string"))
  }
}
