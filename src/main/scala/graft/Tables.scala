package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed views of the engine's tables — `Dataset[T]` with case-class
  * Encoders at the public API edge (schema-dynamic internals stay
  * DataFrame). Consumers get compile-time column safety:
  *
  *   Tables.documents(spark, dir).filter(_.lang == "en").map(_.n_chars)
  */
object Tables {

  final case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  final case class Embedding(vec_id: Long, embedding: Seq[Float], label: Int)
  final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)
  final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    ops.tbl(spark, dir, "documents").as[Document]
  }

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    ops.tbl(spark, dir, "events").as[Event]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    ops.tbl(spark, dir, "embeddings").as[Embedding]
  }

  def customers(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    ops.tbl(spark, dir, "customer").as[Customer]
  }

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    ops.tbl(spark, dir, "orders").as[Order]
  }
}
