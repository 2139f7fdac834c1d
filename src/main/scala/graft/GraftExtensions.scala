package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SparkSessionExtensions entry point: registers the engine's custom
  * functions into the session's FunctionRegistry so the pure-SQL surface
  * (`spark.sql`) can use them — the supported injection path for library
  * extensions.
  *
  * Activate with:
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions") ...
  * or programmatically `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("keccak_hex", "keccak_hex(hexStr) - keccak256 of hex-encoded bytes") {
      es => KeccakOfHex(es.head)
    }
    inject("keccak_utf8", "keccak_utf8(str) - keccak256 of UTF-8 bytes") {
      es => KeccakOfUtf8(es.head)
    }
    inject("topic_address", "topic_address(topic) - EIP-55 address from a 32-byte topic") {
      es => TopicAddress(es.head)
    }
    inject("topic_uint_dec", "topic_uint_dec(topic) - uint256 topic as base-10 string") {
      es => TopicUintDec(es.head)
    }
    inject("uint_dec_to_bytes32", "uint_dec_to_bytes32(dec) - base-10 uint256 as bytes32 hex") {
      es => UintDecToBytes32(es.head)
    }
    inject("utf8_strict", "utf8_strict(hexStr) - strict UTF-8 decode, NULL if invalid") {
      es => Utf8Strict(es.head)
    }
    inject("namehash", "namehash(parentHex, label) - keccak256(parent || keccak256(label))") {
      es => NamehashExpr(es(0), es(1))
    }
    inject("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays") {
      es => CosineSim(es(0), es(1))
    }

    // Optimizer rule: theta band joins (abs(l − r) <= w, no equi key)
    // re-plan as bucketed hash joins — see BandJoinBucketRule scaladoc.
    e.injectOptimizerRule(_ => graft.plans.BandJoinBucketRule)
  }
}
