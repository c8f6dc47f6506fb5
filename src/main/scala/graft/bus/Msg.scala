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

/** Outcome of processing one message, produced by the app's processor:
  * an optional destination (None = don't send) and a failure flag.
  * Mirrors the reference app contract (Send / Ack / Fail verbs,
  * /root/reference/frizzle.go:115-150) in a set-oriented form: Ack is
  * implicit in epoch commit; Fail routes to the fail sink.
  */
final case class Routed(msg: Msg, dest: Option[String], failed: Boolean)
