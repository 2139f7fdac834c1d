package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL surface: custom functions reachable from spark.sql via both the
  * temp-function registry (evm.register) and the documented values.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("registered functions evaluate from SQL") {
    graft.functions.evm.register(spark)
    import spark.implicits._
    val row = spark.sql(
      """SELECT keccak_utf8('abc') AS k,
        |       topic_uint_dec('0x0000000000000000000000000000000000000000000000000000000000003039') AS u,
        |       namehash('0x0000000000000000000000000000000000000000000000000000000000000000', 'os') AS nh,
        |       utf8_strict('0x68690a') AS s,
        |       utf8_strict('0x80') AS bad
        |""".stripMargin).as[(String, String, String, String, Option[String])].head()
    assert(row._1 == "0x4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert(row._2 == "12345")
    assert(row._3 == graft.hypermap.Fixtures.OsHash)
    assert(row._4 == "hi\n")
    assert(row._5.isEmpty)
  }

  test("GraftExtensions applies cleanly (full wiring driven via spark.sql.extensions)") {
    // extensions bind at session construction; the end-to-end path
    // (--conf spark.sql.extensions=graft.GraftExtensions) is exercised in
    // the verify drive. Here: the injection itself must be well-formed.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
  }
}
