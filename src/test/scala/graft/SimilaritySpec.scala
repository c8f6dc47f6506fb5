package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** ScalaTest oracles for the similarity family (no SQL oracle: float
  * reduction order is engine-specific).
  */
class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private def cosScala(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb)
  }

  test("vector dot/norm/cosine match scala math") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, -5.0f, 6.0f)),
      (Array(0.5f, 0.0f, -1.5f), Array(2.0f, 2.0f, 2.0f))
    ).toDF("a", "b")
    val got = df.select(
      VectorFunctions.dot(col("a"), col("b")),
      VectorFunctions.norm(col("a")),
      VectorFunctions.cosine(col("a"), col("b"))).as[(Double, Double, Double)].collect()
    assert(math.abs(got(0)._1 - (4.0 - 10.0 + 18.0)) < 1e-9)
    assert(math.abs(got(0)._2 - math.sqrt(14.0)) < 1e-9)
    assert(math.abs(got(0)._3 - cosScala(Seq(1f, 2f, 3f), Seq(4f, -5f, 6f))) < 1e-9)
  }

  test("native VectorDot is bit-identical to the higher-order-function dot") {
    val emb = graft.ops.tbl(spark, sfDir, "embeddings")
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(broadcast(emb.filter(col("vec_id") < 3)
        .select(col("embedding").as("b"))))
    val diff = pairs.select(
      (VectorFunctions.dot(col("a"), col("b")) =!=
        VectorFunctions.dotHof(col("a"), col("b"))).as("ne"))
      .filter(col("ne")).count()
    assert(diff == 0, "native and HOF dot must agree exactly on every pair")
  }

  test("VectorDot doGenCode compiles under CODEGEN_ONLY (no interpreter fallback)") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    // keep the Project unfolded so doGenCode actually runs (see the
    // LshSignatures codegen test in ExprSpec)
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try {
      val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      val v = df.select(VectorFunctions.dot(col("a"), col("b"))).as[Double].head()
      assert(v == 11.0)
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("vector_dot is callable from SQL after extension registration") {
    graft.expr.GraftExtensions.register(spark)
    val v = spark.sql("SELECT vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").as[Double].head()
    assert(v == 11.0)
    // type checking rejects non-float arrays with the custom message
    val err = intercept[Exception](
      spark.sql("SELECT vector_dot(array(1.0), array(2.0))").collect())
    assert(err.getMessage.contains("array<float>"))
  }

  test("cosine of zero vector is 0, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val c = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].head()
    assert(c == 0.0)
  }

  test("q_sim_cosine_topk matches driver-side brute force") {
    val emb = graft.ops.tbl(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    val got = query("q_sim_cosine_topk")
      .select(col("probe_id"), col("vec_id"), col("rn"))
      .as[(Long, Long, Long)].collect()

    val k = 5
    (0L until 10L).foreach { p =>
      val want = emb.view.filterKeys(_ != p)
        .map { case (id, v) => (id, cosScala(emb(p), v)) }.toSeq
        .sortBy { case (id, c) => (-c, id) }.take(k)
      val gotP = got.filter(_._1 == p).sortBy(_._3).map(_._2)
      assert(gotP.toSeq == want.map(_._1), s"probe $p neighbor ids")
      // exact score semantics: the engine's cosine on the picked pairs
      // matches driver-side math (the declared output carries ids+rank
      // only — see the oracle note in Similarity.scala)
      gotP.foreach { id =>
        val engine = VectorFunctions.cosine(col("a"), col("b"))
        val c = Seq((emb(p).toArray, emb(id).toArray)).toDF("a", "b")
          .select(engine).as[Double].head()
        assert(math.abs(c - cosScala(emb(p), emb(id))) < 1e-12)
      }
    }
  }

  test("q_sim_cosine_lsh recall ≥ 0.4 vs brute-force top-5") {
    val bf = query("q_sim_cosine_topk")
      .select(col("probe_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val lsh = query("q_sim_cosine_lsh")
      .select(col("probe_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    // 4 tables × 8 bits on 64-dim random-ish vectors: recall is modest by
    // design at this corpus size; the property pinned here is "well above
    // random chance and stable", not production recall.
    assert(recall >= 0.4, s"LSH recall $recall")
  }

  test("q_sim_cosine_ivf recall ≥ 0.5 vs brute-force top-5 and rank-correct") {
    val bf = query("q_sim_cosine_topk")
      .select(col("probe_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val ivf = query("q_sim_cosine_ivf")
      .select(col("probe_id"), col("vec_id"), col("rn"))
      .as[(Long, Long, Long)].collect()
    val recall = (bf & ivf.map(t => (t._1, t._2)).toSet).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall $recall")
    // ranks must order by the exact cosine (re-score inside cells is exact;
    // declared output is ids+rank — see the oracle note in Similarity.scala)
    val emb = graft.ops.tbl(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    ivf.groupBy(_._1).foreach { case (p, rows) =>
      val byRn = rows.sortBy(_._3).map(_._2).toSeq
      val byTrueCos = byRn.sortBy(id => (-cosScala(emb(p), emb(id)), id))
      assert(byRn == byTrueCos, s"probe $p IVF ranks vs true cosine order")
    }
  }

  test("q_embed_neardup_all: corpus-wide recall ≥ 0.8 and precision 1.0 vs brute force") {
    val emb = graft.ops.tbl(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    val floor = 0.4
    val truth = (for {
      (a, va) <- emb.toSeq; (b, vb) <- emb.toSeq
      if a < b && cosScala(va, vb) > floor
    } yield (a, b)).toSet
    assert(truth.nonEmpty, "fixture must contain near-dup pairs")
    val got = query("q_embed_neardup_all")
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    // exact re-score after candidate generation → every returned pair is a
    // TRUE pair (precision 1.0); only recall depends on the LSH parameters
    assert((got -- truth).isEmpty, s"false positives: ${(got -- truth).take(5)}")
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.8, s"corpus-wide near-dup recall $recall (${got.size}/${truth.size})")
  }

  test("q_embed_clusters groups exactly the transitive closure of the found pairs") {
    val pairs = query("q_embed_neardup_all")
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect()
    // driver-side union-find over the engine's own pairs = expected clusters
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find).map { case (root, members) => root -> members.length.toLong }
    val got = query("q_embed_clusters")
      .select(col("cluster_id"), col("cluster_size")).as[(Long, Long)]
      .collect().toMap
    assert(got == want, s"cluster census mismatch: got ${got.size} want ${want.size} clusters")
  }

  test("q_embed_neardup returns the true nearest neighbor per probe") {
    val emb = graft.ops.tbl(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    val got = query("q_embed_neardup")
      .select(col("probe_id"), col("nn_id")).as[(Long, Long)].collect().toMap
    got.foreach { case (p, nn) =>
      val want = emb.view.filterKeys(_ != p)
        .map { case (id, v) => (id, cosScala(emb(p), v)) }.toSeq
        .sortBy { case (id, c) => (-c, id) }.head
      assert(nn == want._1, s"probe $p: got $nn want ${want._1}")
    }
  }
}
