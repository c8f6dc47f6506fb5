package graft

import graft.functions.TopKByValue

/** Bounded top-k aggregate (graft.functions.TopKByValue) — the map-side-
  * combine rewrite of window top-k. Three angles: algebra of the buffer
  * (bounded, sorted, associative merge), equivalence with the window form
  * on the real fixture, and the plan shape the rewrite exists to buy
  * (partial ObjectHashAggregate, zero Window operators).
  */
class TopKSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    spark.conf.set("graft.sortOnce.nocheckpoint", "true")
    super.beforeAll()
  }
  override def afterAll(): Unit = {
    spark.conf.unset("graft.sortOnce.nocheckpoint")
    super.afterAll()
  }

  test("reduce keeps the buffer sorted, bounded at k, with the desc/asc tiebreak") {
    val agg = new TopKByValue(3)
    val buf = Seq((5.0, 10L), (1.0, 1L), (9.0, 7L), (5.0, 2L), (9.0, 9L))
      .foldLeft(agg.zero)(agg.reduce)
    // top-3 of {9@7, 9@9, 5@2, 5@10, 1@1} under value desc, key asc
    assert(buf == Vector((9.0, 7L), (9.0, 9L), (5.0, 2L)))
    // below-the-bar insert is a no-op on a full buffer
    assert(agg.reduce(buf, (0.5, 0L)) == buf)
  }

  test("merge of two full buffers is the global top-k; associative and commutative") {
    val agg = new TopKByValue(3)
    val b1 = Vector((9.0, 1L), (7.0, 2L), (5.0, 3L))
    val b2 = Vector((8.0, 4L), (7.0, 1L), (6.0, 5L))
    val m = agg.merge(b1, b2)
    assert(m == Vector((9.0, 1L), (8.0, 4L), (7.0, 1L)))
    assert(agg.merge(b2, b1) == m)
    val b3 = Vector((10.0, 6L))
    assert(agg.merge(agg.merge(b1, b2), b3) == agg.merge(b1, agg.merge(b2, b3)))
    assert(agg.merge(agg.zero, b1) == b1)
  }

  test("q_topk_agg returns exactly the window form's rows (same oracle)") {
    val viaAgg = query("q_topk_agg").collect().map(_.toString).toSeq
    val viaWindow = query("q_topk_per_group").collect().map(_.toString).toSeq
    assert(viaAgg.nonEmpty && viaAgg == viaWindow)
  }

  test("q_topk_agg plans partial aggregation and no Window operator") {
    val plan = query("q_topk_agg").queryExecution.executedPlan.toString
    // two ObjectHashAggregate phases = map-side partial + final merge;
    // that partial phase is the whole point of the rewrite
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Window"), plan)
  }
}
