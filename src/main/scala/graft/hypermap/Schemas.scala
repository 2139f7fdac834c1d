package graft.hypermap

import org.apache.spark.sql.types._

/** Fixed schemas for the hypermap pipeline (FIXTURES.md §1-4; mirrors
  * /root/reference/src/schemas/index.ts:4-60). Explicit StructTypes — no
  * inference — so scans bind columnar readers deterministically.
  */
object Schemas {

  /** Hypermap contract address (reference src/constants.ts:6). */
  val ContractAddress = "0x000000000044C6B8Cb4d8f0F889a3E47664EAeda"

  /** Root namehash: 32 zero bytes (reference src/constants.ts:7). */
  val RootHash: String = "0x" + "0" * 64

  /** Shape of captured eth_getLogs output (ethers v6 Log). */
  val rawLogs: StructType = StructType(Seq(
    StructField("address", StringType, nullable = false),
    StructField("topics", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("data", StringType, nullable = false),
    StructField("blockNumber", LongType, nullable = false),
    StructField("blockHash", StringType, nullable = false),
    StructField("transactionHash", StringType, nullable = false),
    StructField("transactionIndex", IntegerType, nullable = false),
    StructField("logIndex", IntegerType, nullable = false)))

  /** Block-timestamp dimension (replaces per-event getBlock N+1). */
  val blocks: StructType = StructType(Seq(
    StructField("blockNumber", LongType, nullable = false),
    StructField("timestamp", LongType, nullable = true)))

  /** Decoded wide events table: one sparse row per log, all 7 types. */
  val events: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("eventType", StringType, nullable = false),
    StructField("blockNumber", LongType, nullable = false),
    StructField("blockHash", StringType, nullable = false),
    StructField("transactionHash", StringType, nullable = false),
    StructField("transactionIndex", IntegerType, nullable = false),
    StructField("logIndex", IntegerType, nullable = false),
    StructField("timestamp", LongType, nullable = true),
    StructField("parenthash", StringType, nullable = true),
    StructField("childhash", StringType, nullable = true),
    StructField("facthash", StringType, nullable = true),
    StructField("notehash", StringType, nullable = true),
    StructField("labelhash", StringType, nullable = true),
    StructField("label", StringType, nullable = true),
    StructField("data", StringType, nullable = true),
    StructField("entry", StringType, nullable = true),
    StructField("gene", StringType, nullable = true),
    StructField("from", StringType, nullable = true),
    StructField("to", StringType, nullable = true),
    StructField("id", StringType, nullable = true),
    StructField("zeroTba", StringType, nullable = true),
    StructField("implementation", StringType, nullable = true)))

  /** Derived entries table (namespace nodes). */
  val entries: StructType = StructType(Seq(
    StructField("namehash", StringType, nullable = false),
    StructField("label", StringType, nullable = false),
    StructField("parentHash", StringType, nullable = false),
    StructField("fullName", StringType, nullable = true),
    StructField("owner", StringType, nullable = true),
    StructField("gene", StringType, nullable = true),
    StructField("notes", MapType(StringType, StringType), nullable = false),
    StructField("facts", MapType(StringType, StringType), nullable = false),
    StructField("children", ArrayType(StringType), nullable = false),
    StructField("creationBlock", LongType, nullable = false),
    StructField("lastUpdateBlock", LongType, nullable = false)))
}
