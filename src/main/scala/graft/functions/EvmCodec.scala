package graft.functions

import java.math.BigInteger
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

/** Static EVM decode helpers — the runtime behind the custom Catalyst
  * expressions in EvmExpressions.scala. Kept as plain static-style methods so
  * generated (whole-stage codegen) Java can call them directly.
  *
  * Semantics mirror ethers v6 as exercised by the reference
  * (/root/reference/src/lib/services/events.ts:83-245):
  *   - addresses are EIP-55 checksummed (ethers getAddress);
  *   - indexed dynamic bytes topics are kept verbatim (the keccak of the
  *     value — events.ts:132 stores args[2] as-is);
  *   - uint256 args become base-10 strings (events.ts:185);
  *   - invalid UTF-8 labels abort the whole log (silent skip,
  *     events.ts:242-244) — modeled as null here, filtered upstream;
  *   - malformed ABI data aborts the log the same way.
  */
object EvmCodec {

  /** keccak256 over the bytes encoded by a 0x-hex string → 0x-hex digest. */
  def keccakHex(hex: String): String = Keccak.hashHexToHex(hex)

  /** keccak256 over UTF-8 bytes of the input → 0x-hex digest. */
  def keccakUtf8(s: String): String = Keccak.hashUtf8ToHex(s)

  /** EIP-55 checksummed address from any-case 40-hex-digit input. */
  def checksumAddress(addr: String): String = Keccak.toChecksumAddress(addr)

  /** Indexed address topic (32-byte word) → checksummed 20-byte address.
    * ethers reads the low 20 bytes of the topic word.
    */
  def topicToAddress(topic: String): String = {
    if (topic == null) return null
    val s = if (topic.startsWith("0x") || topic.startsWith("0X")) topic.substring(2) else topic
    if (s.length != 64) return null
    Keccak.toChecksumAddress(s.substring(24))
  }

  /** Indexed uint256 topic → base-10 string (BigInt.toString semantics). */
  def topicToUintDec(topic: String): String = {
    if (topic == null) return null
    val s = if (topic.startsWith("0x") || topic.startsWith("0X")) topic.substring(2) else topic
    if (s.length != 64 || !isHex(s)) return null
    new BigInteger(s, 16).toString
  }

  /** Base-10 uint256 string → 0x-prefixed 32-byte hex (the E7 normalizing
    * variant: Transfer.id ↔ namehash join key, SURVEY.md §2.4 E7).
    */
  def uintDecToBytes32(dec: String): String = {
    if (dec == null) return null
    try {
      val bi = new BigInteger(dec, 10)
      if (bi.signum() < 0 || bi.bitLength() > 256) return null
      val hex = bi.toString(16)
      "0x" + ("0" * (64 - hex.length)) + hex
    } catch { case _: NumberFormatException => null }
  }

  /** Decode the `argIndex`-th (0-based) dynamic `bytes` argument from the
    * non-indexed data section of a log. `nArgs` is the number of words in
    * the head (= number of non-indexed args, all dynamic here). Returns
    * 0x-hex of the raw bytes, or null if the encoding is malformed.
    */
  def abiBytesArg(dataHex: String, argIndex: Int, nArgs: Int): String = {
    val bytes = Keccak.hexToBytes(dataHex)
    if (bytes == null) return null
    if (argIndex < 0 || argIndex >= nArgs) return null
    if (bytes.length < nArgs * 32) return null
    // all bounds math in Long: a malformed offset/length word near
    // Int.MaxValue must fall into the null path, never wrap and crash
    // (Decode's contract is silent whole-log skip)
    val offset = wordToLong(bytes, argIndex * 32)
    if (offset < 0 || offset > bytes.length.toLong - 32) return null
    val len = wordToLong(bytes, offset.toInt)
    if (len < 0 || len > bytes.length.toLong - offset - 32) return null
    val out = new Array[Byte](len.toInt)
    System.arraycopy(bytes, offset.toInt + 32, out, 0, len.toInt)
    "0x" + Keccak.bytesToHex(out)
  }

  /** Strict UTF-8 decode of 0x-hex bytes; null on invalid UTF-8 (ethers
    * toUtf8String throws → reference drops the log).
    */
  def utf8Strict(hexBytes: String): String = {
    val bytes = Keccak.hexToBytes(hexBytes)
    if (bytes == null) return null
    val decoder = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try decoder.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: CharacterCodingException => null }
  }

  /** Hypermap namehash step: keccak256(parent ++ keccak256(labelUtf8)). */
  def namehash(parentHex: String, label: String): String =
    Keccak.namehash(parentHex, label)

  // ------------------------------------------------------------------ utils

  private def isHex(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (Character.digit(s.charAt(i), 16) < 0) return false
      i += 1
    }
    true
  }

  /** Read a 32-byte big-endian word as a non-negative Long; -1 if it
    * exceeds Int range (treated as malformed — no real log is >2 GiB, and
    * callers compare in Long so nothing can wrap).
    */
  private def wordToLong(bytes: Array[Byte], at: Int): Long = {
    if (at < 0 || at.toLong + 32 > bytes.length) return -1L
    var i = at
    while (i < at + 28) { // high 28 bytes must be zero to fit in Int
      if (bytes(i) != 0) return -1L
      i += 1
    }
    var v = 0L
    while (i < at + 32) {
      v = (v << 8) | (bytes(i) & 0xffL)
      i += 1
    }
    if (v > Int.MaxValue) -1L else v
  }
}
