package graft.bus

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

/** The bus message: an id (also the delivery-tracking key), an opaque byte
  * payload, and an event timestamp — the engine's analog of the reference's
  * Msg interface (/root/reference/msg.go:15-20). Schema-on-read happens at
  * the edge: analytics parse `data` into typed columns; the bus itself
  * never interprets it.
  */
final case class Msg(id: String, data: Array[Byte], ts: Timestamp) {
  def dataUtf8: String = new String(data, StandardCharsets.UTF_8)
}

object Msg {
  def utf8(id: String, s: String, ts: Timestamp = new Timestamp(0L)): Msg =
    Msg(id, s.getBytes(StandardCharsets.UTF_8), ts)
}

// The per-message routing outcome (Send / Ack / Fail verbs,
// /root/reference/frizzle.go:115-150) is expressed set-orientedly as the
// processor's `dest`/`failed` columns (FrizzleStream.exprProcessor) — there
// is deliberately no per-message Routed object on the data path.
