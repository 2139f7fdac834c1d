package graft

import graft.functions.{strsim, StringSim}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JaroWinklerExpr semantics pinned to DuckDB's jaro_winkler_similarity
  * (values below probed from DuckDB directly — the dd_jaro oracle).
  */
class StringSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val probed = Seq( // (a, b, duckdb jaro_winkler_similarity)
    ("martha", "marhta", 0.9611111111),
    ("dixon", "dicksonx", 0.8133333333),
    ("jellyfish", "smellyfish", 0.8962962963),
    ("dwayne", "duane", 0.8400000000),
    ("", "", 0.0), ("a", "", 0.0),
    ("abc", "abc", 1.0),
    ("crate", "trace", 0.7333333333),
    ("abcdef", "fedcba", 0.3888888889),
    ("prefixmatch", "prefixmatters", 0.9020979021),
    ("aaaaaaaaaa", "aaaaabaaaa", 0.9600000000),
    ("ab", "ba", 0.0),
    ("abcvwxyz", "cabvwxyz", 0.9583333333),
    ("abcdxxxxxx", "abcdyyyyyy", 0.6), // jaro ≤ 0.7 → NO winkler boost
    ("ax", "ay", 0.6666666667),
    ("aaaaaaaaax", "aaaaaaaaay", 0.96)) // prefix capped at 4

  test("static kernel matches every DuckDB-probed value") {
    probed.foreach { case (a, b, want) =>
      val got = StringSim.jaroWinkler(a, b)
      assert(math.abs(got - want) < 1e-9, s"jw($a, $b) = $got, duckdb $want")
    }
  }

  test("Catalyst expression evaluates through codegen and handles nulls") {
    val df = probed.map { case (a, b, w) => (a, b, w) }.toDF("a", "b", "w")
    val bad = df.select(strsim.jaro_winkler($"a", $"b").as("jw"), $"w")
      .where(abs($"jw" - $"w") > 1e-9).count()
    assert(bad == 0L)
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(strsim.jaro_winkler($"a", $"b")).collect().head
    assert(n.isNullAt(0), "null input must yield null")
  }
}
