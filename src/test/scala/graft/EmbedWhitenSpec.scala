package graft

import graft.functions.{GramMatrix, GramStats}

/** Embedding whitening (graft.functions.GramMatrix + q_embed_whiten) —
  * the one-pass covariance/top-PC path. Angles: Gram algebra (merge =
  * concatenated input), the query's scores against INDEPENDENT reference
  * math on collected vectors, the exact norm identity, and the partial-
  * aggregation plan the 33 KB buffer exists to buy.
  */
class EmbedWhitenSpec extends SparkSpec {

  private def collectEmb(): Array[Array[Float]] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).toArray)

  test("GramMatrix merge equals the sketch of the concatenated input") {
    val dim = 3
    val agg = new GramMatrix(dim)
    val a = Seq(Array(1f, 2f, 3f), Array(-1f, 0f, 1f))
    val b = Seq(Array(2f, 2f, 2f))
    val merged = agg.merge(
      a.foldLeft(agg.zero)(agg.reduce),
      b.foldLeft(agg.zero)(agg.reduce))
    val whole = (a ++ b).foldLeft(agg.zero)(agg.reduce)
    assert(merged.sameElements(whole))
    val st = GramStats(dim, merged)
    assert(st.n == 3.0)
    assert(math.abs(st.mean(0) - 2.0 / 3) < 1e-12)
    // covariance is symmetric with non-negative diagonal
    (0 until dim).foreach { i =>
      assert(st.cov(i)(i) >= -1e-12)
      (0 until dim).foreach(j => assert(st.cov(i)(j) == st.cov(j)(i)))
    }
  }

  test("q_embed_whiten matches independent reference math on the fixture") {
    val rows = query("q_embed_whiten").collect()
    val xs = collectEmb()
    assert(rows.length == xs.length && rows.nonEmpty)
    val dim = xs.head.length

    // independent reference: mean, covariance, top eigenvector (600
    // plain power iterations from a different start than the engine's)
    val n = xs.length.toDouble
    val mu = Array.tabulate(dim)(i => xs.map(_(i).toDouble).sum / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      xs.map(x => (x(i) - mu(i)) * (x(j) - mu(j))).sum / n
    }
    var v = Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
    (0 until 600).foreach { _ =>
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => cov(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    val best = (0 until dim).maxBy(i => math.abs(v(i)))
    if (v(best) < 0) v = v.map(-_)
    val lambdaRef = (0 until dim).map(i =>
      (0 until dim).map(j => v(i) * cov(i)(j) * v(j)).sum).sum

    val cVals = rows.map(_.getDouble(1))
    // variance captured along the engine's component = top eigenvalue
    val varC = cVals.map(c => c * c).sum / n - math.pow(cVals.sum / n, 2)
    assert(math.abs(varC - lambdaRef) <= 1e-6 * lambdaRef,
      s"var(c)=$varC vs lambda=$lambdaRef")
    // scores match the reference projection row by row
    val scale = math.sqrt(lambdaRef)
    xs.zip(cVals).foreach { case (x, c) =>
      val cRef = (0 until dim).map(i => (x(i) - mu(i)) * v(i)).sum
      assert(math.abs(c - cRef) <= 1e-6 * scale, s"c=$c ref=$cRef")
    }
    // centered projection has (near-)zero mean
    assert(math.abs(cVals.sum / n) <= 1e-9 * scale)
  }

  test("q_embed_whiten norm identity: after = before − c², non-negative") {
    query("q_embed_whiten").collect().foreach { r =>
      val (c, before, after) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(after - (before - c * c)) <= 1e-9 * math.max(1.0, before))
      assert(after >= -1e-9)
      assert(before >= c * c - 1e-9) // removal never exceeds the norm
    }
  }

  test("whitenEmbeddings removes exactly the top component's variance") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val (_, v, lambda) = ops.Similarity.topComponent(emb)
    val before = collectEmb()
    val after = ops.Similarity.whitenEmbeddings(emb)
      .orderBy("vec_id").collect().map(_.getSeq[Float](1).toArray)
    assert(after.length == before.length)
    val dim = v.length
    val n = after.length.toDouble

    // 1) whitened vectors have ~zero projection on v (they were centered
    //    and the v-component subtracted; float32 round-trip is the noise)
    after.foreach { x =>
      val p = (0 until dim).map(i => x(i) * v(i)).sum
      assert(math.abs(p) <= 1e-3, s"residual projection $p")
    }

    // 2) total variance drops by exactly the top eigenvalue
    def totalVar(xs: Array[Array[Float]]): Double = {
      val mu = Array.tabulate(dim)(i => xs.map(_(i).toDouble).sum / n)
      (0 until dim).map(i => xs.map(x => math.pow(x(i) - mu(i), 2)).sum / n).sum
    }
    val (tb, ta) = (totalVar(before), totalVar(after))
    assert(math.abs((tb - ta) - lambda) <= 1e-4 * tb,
      s"var before=$tb after=$ta lambda=$lambda")

    // 3) schema preserved: still (vec_id, embedding array<float>)
    val out = ops.Similarity.whitenEmbeddings(emb)
    assert(out.columns.toSeq == Seq("vec_id", "embedding"))
    assert(out.schema("embedding").dataType.simpleString == "array<float>")
  }

  test("q_embed_whiten plans partial aggregation for the Gram pass") {
    // the gram collect happens at construction; audit the projection scan
    // has no joins and the constructed plan aggregates map-side
    val df = query("q_embed_whiten")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }
}
