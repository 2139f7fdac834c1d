package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Evidence for the PERF.md claim that bucketed table layout removes the
  * join shuffle entirely: both sides bucketed+sorted on the join key with
  * the same bucket count → SortMergeJoin with NO ShuffleExchange on
  * either side. At 100 TB this is the difference between re-shuffling
  * every fact table per join and reading co-located buckets.
  */
class BucketedLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("co-bucketed orders⋈lineitem plans without a shuffle exchange") {
    val base = Files.createTempDirectory("graft-bucketed-join")
    val orders = Tables.t(spark, sf, "orders")
    val lineitem = Tables.t(spark, sf, "lineitem")
    // At sf0.001 both sides fit under the broadcast threshold and a
    // BroadcastHashJoin would trivially have no shuffle — disable it so
    // the test exercises what it claims: a SortMergeJoin made
    // exchange-free purely by the bucketed layout.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      orders.write
        .option("path", base.resolve("orders").toString)
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
      lineitem.write
        .option("path", base.resolve("lineitem").toString)
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")

      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
      val plan = joined.queryExecution.sparkPlan
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"expected shuffle-free co-located join, found: ${shuffles.map(_.nodeName)}")
      val smj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, s"expected a SortMergeJoin, plan was:\n$plan")

      // and it computes the same rows as the plain (shuffling) join
      val expected = orders.join(lineitem, $"o_orderkey" === $"l_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
