package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.KeyedEvent

/** Custom keyed state (flatMapGroupsWithState): per-key running totals
  * accumulate across micro-batches, and idle keys expire with a final
  * record — bounded state on an unbounded key space.
  */
class StatefulSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("state accumulates across micro-batches and idle keys expire") {
    val in = MemoryStream[KeyedEvent](spark)
    val out = StatefulOps.runningTotals(in.toDS(), idleMs = 30 * 60 * 1000L,
      lateness = "5 minutes")
    val q = out.writeStream.format("memory").queryName("stateful_rt")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(KeyedEvent(1L, ts("2024-01-01 10:00:00"), 2.0),
        KeyedEvent(2L, ts("2024-01-01 10:00:00"), 5.0))
      q.processAllAvailable()
      in.addData(KeyedEvent(1L, ts("2024-01-01 10:01:00"), 3.0))
      q.processAllAvailable()
      // advance the watermark far past key 1/2 idle horizon → both expire
      in.addData(KeyedEvent(9L, ts("2024-01-01 14:00:00"), 1.0))
      q.processAllAvailable()
      in.addData(KeyedEvent(9L, ts("2024-01-01 14:00:01"), 1.0))
      q.processAllAvailable()

      val rows = spark.table("stateful_rt")
        .select($"key", $"events", $"total", $"expired")
        .as[(Long, Long, Double, Boolean)].collect().toSeq
      // batch 1 emits (1 → 1 event, 2.0), (2 → 1 event, 5.0);
      // batch 2 emits the UPDATED key-1 state: 2 events, 5.0 total
      assert(rows.contains((1L, 1L, 2.0, false)))
      assert(rows.contains((2L, 1L, 5.0, false)))
      assert(rows.contains((1L, 2L, 5.0, false)),
        "second batch must see state from the first")
      assert(rows.contains((1L, 2L, 5.0, true)), "idle key 1 must expire")
      assert(rows.contains((2L, 1L, 5.0, true)), "idle key 2 must expire")
    } finally q.stop()
  }
}
