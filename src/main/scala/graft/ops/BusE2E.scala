package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.bus._

/** stream_bus_e2e — the §2-A capstone as a declared query: runs the golden
  * bus scenario (/root/reference/frizzle_integration_test.go:82-131) on a
  * MemoryStream bus synchronously and returns the observable outcome
  * (routed messages, dead letters, counters) as a DataFrame. No SQL oracle
  * (it is a streaming run, not a relational expression); the expected rows
  * are pinned exactly by graft.BusSpec.
  */
object BusE2E {

  val all: Seq[Q] = Seq(
    Q(
      "stream_bus_e2e",
      (s, _) => {
        import s.implicits._
        val src = new MemorySource(s)
        val sink = new MemorySink
        val dlq = new MemorySink
        val isLower = col("data").cast("string").rlike("^[a-z]+$")
        val bus = new FrizzleStream(s, src,
          FrizzleStream.exprProcessor(
            dest = when(isLower && col("data").cast("string") =!= "fail", "all-lower"),
            failed = col("data").cast("string") === "fail"),
          sink, Some(dlq),
          checkpointDir = Some(Files.createTempDirectory("buse2e").toString))
          .start()
        val inputs = Seq("foo", "BAR", "fail", "baSil", "frizzle")
        src.put(inputs.zipWithIndex.map { case (p, i) => Msg.utf8(s"m$i", p) }: _*)
        bus.awaitIdle()
        val rows =
          sink.sent("all-lower").map(m => ("sent", m.id, m.dataUtf8)) ++
            dlq.sent("failed").map(m => ("failed", m.id, m.dataUtf8)) ++
            bus.stats.snapshot.toSeq.sortBy(_._1).map { case (k, v) => ("stat", k, v.toString) }
        bus.flushAndClose(10000)
        rows.toDF("kind", "key", "value")
          .orderBy(asc_nulls_first("kind"), asc_nulls_first("key"))
      },
      None
    )
  )
}
