package graft.hypermap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{EvmCodec, evm}

/** T1/T2: raw eth_getLogs rows → decoded wide events table.
  *
  * Re-expresses ethers parseLog + the 7-way processEvent switch
  * (/root/reference/src/lib/services/events.ts:83-245) as ONE narrow
  * projection: topic0 dispatch, per-type sparse columns, silent skip of
  * non-matching / malformed logs. No shuffle — decode is map-side and stays
  * in whole-stage codegen (custom expressions emit static calls).
  *
  * Skip semantics reproduced exactly:
  *   - wrong contract address / unknown topic0 / wrong topics arity → skip
  *     (parseLog returns null or throws, events.ts:226-245);
  *   - malformed ABI data section or invalid-UTF-8 label → the WHOLE log is
  *     skipped (toUtf8String throws inside the try, events.ts:242-244);
  *   - absent label bytes decode to '' (events.ts:134).
  */
object Decode {

  // Event signatures: keccak256 of the canonical declaration
  // (/root/reference/src/abi/hypermap.abi.json:8-14).
  val SigMint: String     = EvmCodec.keccakUtf8("Mint(bytes32,bytes32,bytes,bytes)")
  val SigFact: String     = EvmCodec.keccakUtf8("Fact(bytes32,bytes32,bytes,bytes,bytes)")
  val SigNote: String     = EvmCodec.keccakUtf8("Note(bytes32,bytes32,bytes,bytes,bytes)")
  val SigGene: String     = EvmCodec.keccakUtf8("Gene(bytes32,address)")
  val SigZero: String     = EvmCodec.keccakUtf8("Zero(address)")
  val SigTransfer: String = EvmCodec.keccakUtf8("Transfer(address,address,uint256)")
  val SigUpgraded: String = EvmCodec.keccakUtf8("Upgraded(address)")

  /** topics arity per type: 1 + number of indexed args. */
  val topicArity: Map[String, Int] = Map(
    "Mint" -> 4, "Fact" -> 4, "Note" -> 4, "Gene" -> 3,
    "Zero" -> 2, "Transfer" -> 4, "Upgraded" -> 2)

  /** Decode raw logs; optionally enrich with the blocks timestamp dimension
    * (S3 — broadcast left join replaces the reference's per-event getBlock).
    */
  def decode(rawLogs: DataFrame, blocks: Option[DataFrame] = None): DataFrame = {
    val topic0 = col("topics").getItem(0)
    val t1 = col("topics").getItem(1)
    val t2 = col("topics").getItem(2)
    val t3 = col("topics").getItem(3)
    val nTopics = size(col("topics"))

    val eventType =
      when(topic0 === SigMint && nTopics === 4, "Mint")
        .when(topic0 === SigFact && nTopics === 4, "Fact")
        .when(topic0 === SigNote && nTopics === 4, "Note")
        .when(topic0 === SigGene && nTopics === 3, "Gene")
        .when(topic0 === SigZero && nTopics === 2, "Zero")
        .when(topic0 === SigTransfer && nTopics === 4, "Transfer")
        .when(topic0 === SigUpgraded && nTopics === 2, "Upgraded")
        .otherwise(lit(null))

    val isMFN = col("eventType").isin("Mint", "Fact", "Note")
    val isFN = col("eventType").isin("Fact", "Note")
    // Mint data = [label]; Fact/Note data = [label, data]
    val labelBytes =
      when(col("eventType") === "Mint", evm.abi_bytes_arg(col("data"), 0, 1))
        .when(isFN, evm.abi_bytes_arg(col("data"), 0, 2))
    val dataBytes = when(isFN, evm.abi_bytes_arg(col("data"), 1, 2))

    val decoded = rawLogs
      .where(lower(col("address")) === Schemas.ContractAddress.toLowerCase)
      .withColumn("eventType", eventType)
      .where(col("eventType").isNotNull) // T6 validity filter / silent skip
      .withColumn("event_id", concat_ws("_", col("transactionHash"), col("logIndex")))
      .withColumn("parenthash", when(isMFN, t1))
      .withColumn("childhash", when(col("eventType") === "Mint", t2))
      .withColumn("facthash", when(col("eventType") === "Fact", t2))
      .withColumn("notehash", when(col("eventType") === "Note", t2))
      // indexed dynamic bytes: the topic IS the keccak of the value — stored
      // verbatim (events.ts:132 keeps args[2] as-is)
      .withColumn("labelhash", when(isMFN, t3))
      .withColumn("label", when(isMFN, evm.utf8_strict(labelBytes)))
      .withColumn("data", dataBytes)
      .withColumn("entry", when(col("eventType") === "Gene", t1))
      .withColumn("gene", when(col("eventType") === "Gene", evm.topic_address(t2)))
      .withColumn("from", when(col("eventType") === "Transfer", evm.topic_address(t1)))
      .withColumn("to", when(col("eventType") === "Transfer", evm.topic_address(t2)))
      .withColumn("id", when(col("eventType") === "Transfer", evm.topic_uint_dec(t3)))
      .withColumn("zeroTba", when(col("eventType") === "Zero", evm.topic_address(t1)))
      .withColumn("implementation", when(col("eventType") === "Upgraded", evm.topic_address(t1)))
      // whole-log skip on malformed ABI data / invalid UTF-8 label:
      // Mint/Fact/Note must have decoded a label; Fact/Note must have data.
      .where(!isMFN || col("label").isNotNull)
      .where(!isFN || col("data").isNotNull)

    val withTs = blocks match {
      case Some(b) =>
        // blocks dim is tiny relative to events → broadcast left join;
        // missing block ⇒ null timestamp (events.ts:101-107 fallback)
        decoded.join(broadcast(b.select(col("blockNumber").as("b_bn"),
          col("timestamp"))), decoded("blockNumber") === col("b_bn"), "left")
          .drop("b_bn")
      case None => decoded.withColumn("timestamp", lit(null).cast("long"))
    }

    withTs.select(
      col("event_id"), col("eventType"), col("blockNumber"), col("blockHash"),
      col("transactionHash"), col("transactionIndex"), col("logIndex"),
      col("timestamp"), col("parenthash"), col("childhash"), col("facthash"),
      col("notehash"), col("labelhash"), col("label"), col("data"),
      col("entry"), col("gene"), col("from"), col("to"), col("id"),
      col("zeroTba"), col("implementation"))
  }
}
