package graft

import org.scalatest.funsuite.AnyFunSuite

/** The CTE-materialization rewrite must be surgical: it exists solely to
  * stop a CTE-inlining DuckDB from exponentially replaying unrolled
  * iterative oracle chains (gr_sssp measured >300 s inlined vs 0.45 s
  * materialized, VERDICT r12), and it must never change semantics or
  * corrupt non-CTE `AS` syntax.
  */
class OracleSqlSpec extends AnyFunSuite {
  import OracleSql.materializeMultiRefCtes

  test("multi-referenced CTE gets MATERIALIZED") {
    val sql = "WITH d0 AS (SELECT 1 AS x), " +
      "d1 AS (SELECT x FROM d0 UNION SELECT x+1 FROM d0) SELECT * FROM d1"
    val out = materializeMultiRefCtes(sql)
    assert(out.contains("d0 AS MATERIALIZED ("))
    // d1 is defined once + referenced once = 2 occurrences → untouched
    assert(out.contains("d1 AS (SELECT"))
  }

  test("single-reference CTE is untouched") {
    val sql = "WITH a AS (SELECT 1 AS x) SELECT * FROM a"
    assert(materializeMultiRefCtes(sql) == sql)
  }

  test("idempotent — already-materialized defs don't double-rewrite") {
    val sql = "WITH d0 AS (SELECT 1 AS x), " +
      "d1 AS (SELECT x FROM d0 UNION SELECT x+1 FROM d0) SELECT * FROM d1"
    val once = materializeMultiRefCtes(sql)
    assert(materializeMultiRefCtes(once) == once)
  }

  test("WITH RECURSIVE: non-recursive members materialize, recursive don't") {
    val sql = "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM r " +
      "WHERE n < 5), s AS (SELECT n FROM r), t AS (SELECT * FROM s UNION " +
      "SELECT * FROM s) SELECT * FROM t"
    val out = materializeMultiRefCtes(sql)
    // r's def has a column list → not a def-site match; s is referenced
    // 2× by t → materialized; t is single-reference → untouched
    assert(out.contains("r(n) AS (SELECT 1"))
    assert(out.contains("s AS MATERIALIZED (SELECT n FROM r)"))
    assert(out.contains("t AS (SELECT"))
  }

  test("self-referential CTE without a column list is never materialized") {
    val sql = "WITH RECURSIVE reach AS (SELECT 1 AS n UNION SELECT n+1 " +
      "FROM reach WHERE n < 3) SELECT * FROM reach, reach AS r2"
    assert(materializeMultiRefCtes(sql) == sql)
  }

  test("casts, column aliases, and derived-table aliases are not def sites") {
    val sql = "WITH c AS (SELECT CAST(x AS DECIMAL(10,2)) AS y FROM " +
      "(SELECT 1 AS x) AS t) SELECT c.y, c2.y FROM c, c AS c2"
    val out = materializeMultiRefCtes(sql)
    assert(out.contains("c AS MATERIALIZED (SELECT"))
    assert(out.contains("CAST(x AS DECIMAL(10,2))"))
    assert(out.contains("(SELECT 1 AS x) AS t"))
  }

  test("named window definitions are never materialized") {
    val sql = "WITH daily AS (SELECT day, n FROM t), x AS (SELECT sum(n) " +
      "OVER w AS s, avg(n) OVER w2 AS a FROM daily WINDOW w AS (ORDER BY " +
      "day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), w2 AS (ORDER BY day)" +
      ") SELECT * FROM x, daily"
    val out = materializeMultiRefCtes(sql)
    assert(out.contains("WINDOW w AS (ORDER BY"))
    assert(out.contains("w2 AS (ORDER BY day)"))
    assert(out.contains("daily AS MATERIALIZED ("))
  }

  test("string literals are masked: a literal 'x AS (' is never a def site") {
    val sql = "WITH c AS (SELECT 'name AS (' AS lit FROM t UNION " +
      "SELECT 'name AS (' FROM t) SELECT * FROM c, c AS c2"
    val out = materializeMultiRefCtes(sql)
    // c qualifies (def + 2 refs) and is rewritten; the literal content —
    // which names a fake def site occurring 2 more times — is untouched
    assert(out.contains("c AS MATERIALIZED (SELECT 'name AS ('"))
    assert(!out.contains("'name AS MATERIALIZED ("))
  }

  test("literals with escaped quotes and parens don't skew the body scan") {
    val sql = "WITH d AS (SELECT 'it''s (deep' AS s FROM t), " +
      "e AS (SELECT s FROM d UNION SELECT s || ')' FROM d) SELECT * FROM e"
    val out = materializeMultiRefCtes(sql)
    assert(out.contains("d AS MATERIALIZED (SELECT 'it''s (deep'"))
    assert(out.contains("e AS (SELECT")) // single-ref: untouched
  }

  test("rewrite output is the original text plus injections only") {
    // regression: the masked-position rebuild must re-emit the ORIGINAL
    // sql (scala.StringBuilder has no (CharSequence, from, to) append —
    // an auto-tupled append(Any) once embedded "(sql,0,152)" garbage)
    val sql = "WITH d0 AS (SELECT 1 AS x), " +
      "d1 AS (SELECT x FROM d0 UNION SELECT x+1 FROM d0) SELECT * FROM d1"
    val out = materializeMultiRefCtes(sql)
    assert(out == sql.replace("d0 AS (", "d0 AS MATERIALIZED ("))
    assert(!out.contains("(WITH") && !out.contains(",0,"))
  }

  test("the six r12-flagged exponential oracles are now materialized") {
    val flagged = Seq("gr_sssp", "gr_bfs", "gr_kcore", "gr_hits",
      "geo_dbscan_cc", "ann_ivfpq_residual")
    flagged.foreach { name =>
      val sql = SparkEntry.oracleSql(name)
      assert(sql.contains("AS MATERIALIZED ("),
        s"$name oracle has no materialized CTE after rewrite")
    }
  }
}
