package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pins the Verify failure contract (r15): a throwing query must surface as
  * an explicit `_errors.json` record, never as a silently-missing key —
  * through r14 a broken key wrote nothing, so the driver's correctness
  * report omitted it and a 26-query breakage survived two rounds unnoticed.
  */
class VerifySpec extends SparkSpec {

  private def good(s: SparkSession, dir: String): DataFrame =
    ops.tbl(s, dir, "region")

  private def broken(s: SparkSession, dir: String): DataFrame =
    ops.tbl(s, dir, "region").selectExpr("r_regionkey + r_name") // DATATYPE_MISMATCH

  test("a deliberately-broken key lands in _errors.json; good keys still dump") {
    val out = Files.createTempDirectory("verify-err").toString
    val failed = Verify.dump(spark,
      Map("k_good" -> (good _), "k_broken" -> (broken _)),
      Map("k_good" -> "SELECT * FROM region"),
      sfDir, out)
    assert(failed.keySet == Set("k_broken"))
    assert(new java.io.File(s"$out/k_good").isDirectory,
      "successful keys must still write parquet")
    assert(!new java.io.File(s"$out/k_broken").exists())
    val errJson = Files.readString(Paths.get(s"$out/_errors.json"))
    assert(errJson.contains("\"k_broken\""), s"error marker missing: $errJson")
    assert(!errJson.contains("k_good"))
    assert(Files.readString(Paths.get(s"$out/oracle_sql.json"))
      .contains("\"k_good\""))
  }

  test("a clean run writes an empty _errors.json (presence is the signal)") {
    val out = Files.createTempDirectory("verify-clean").toString
    val failed = Verify.dump(spark, Map("k_good" -> (good _)),
      Map.empty, sfDir, out)
    assert(failed.isEmpty)
    assert(Files.readString(Paths.get(s"$out/_errors.json")).trim == "{}")
  }
}
