package graft.functions

/** Keccak-256 (the pre-NIST-padding variant used by Ethereum).
  *
  * Implemented from the public Keccak specification (FIPS 202 §3 /
  * keccak.team reference): Keccak-f[1600] permutation, rate 1088 bits
  * (136-byte blocks), multi-rate padding with domain byte 0x01 (original
  * Keccak, NOT SHA-3's 0x06).
  *
  * Static methods are JVM-codegen-friendly: custom Catalyst expressions
  * call them from generated code (see HexExpressions.scala).
  */
object Keccak {

  private val ROUND_CONSTANTS: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // rotation offsets r[x][y] laid out in the (x + 5y) order used below
  private val ROTATIONS: Array[Int] = Array(
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14)

  private def keccakF(a: Array[Long]): Unit = {
    val c = new Array[Long](5)
    val b = new Array[Long](25)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        val dx = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= dx; y += 1 }
        x += 1
      }
      // rho + pi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          // B[y, 2x+3y] = rot(A[x, y], r[x, y])
          b(y + 5 * ((2 * x + 3 * y) % 5)) =
            java.lang.Long.rotateLeft(a(x + 5 * y), ROTATIONS(x + 5 * y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^
            (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      a(0) ^= ROUND_CONSTANTS(round)
      round += 1
    }
  }

  /** Keccak-256 digest of raw bytes. */
  def hash(input: Array[Byte]): Array[Byte] = {
    val rate = 136 // bytes, for 256-bit output
    val state = new Array[Long](25)
    // absorb
    var offset = 0
    val len = input.length
    while (len - offset >= rate) {
      var i = 0
      while (i < rate / 8) {
        state(i) ^= littleEndianLong(input, offset + i * 8)
        i += 1
      }
      keccakF(state)
      offset += rate
    }
    // final block with multi-rate padding (0x01 ... 0x80)
    val block = new Array[Byte](rate)
    System.arraycopy(input, offset, block, 0, len - offset)
    block(len - offset) = 0x01.toByte
    block(rate - 1) = (block(rate - 1) | 0x80).toByte
    var i = 0
    while (i < rate / 8) {
      state(i) ^= littleEndianLong(block, i * 8)
      i += 1
    }
    keccakF(state)
    // squeeze 32 bytes
    val out = new Array[Byte](32)
    i = 0
    while (i < 4) {
      val v = state(i)
      var j = 0
      while (j < 8) {
        out(i * 8 + j) = ((v >>> (8 * j)) & 0xff).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  private def littleEndianLong(bytes: Array[Byte], offset: Int): Long = {
    var v = 0L
    var j = 7
    while (j >= 0) {
      v = (v << 8) | (bytes(offset + j) & 0xffL)
      j -= 1
    }
    v
  }

  // ----------------------------------------------------------- hex helpers

  private val HEX = "0123456789abcdef".toCharArray

  def bytesToHex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      sb.append(HEX((bytes(i) >> 4) & 0xf)).append(HEX(bytes(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  /** Parse hex (with or without 0x prefix) to bytes; null if malformed. */
  def hexToBytes(hex: String): Array[Byte] = {
    if (hex == null) return null
    val s = if (hex.startsWith("0x") || hex.startsWith("0X")) hex.substring(2) else hex
    if (s.length % 2 != 0) return null
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      val hi = Character.digit(s.charAt(2 * i), 16)
      val lo = Character.digit(s.charAt(2 * i + 1), 16)
      if (hi < 0 || lo < 0) return null
      out(i) = ((hi << 4) | lo).toByte
      i += 1
    }
    out
  }

  /** keccak256 of a UTF-8 string → 0x-prefixed lowercase hex. */
  def hashUtf8ToHex(s: String): String =
    if (s == null) null else "0x" + bytesToHex(hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** keccak256 of 0x-hex input bytes → 0x-prefixed lowercase hex; null on bad hex. */
  def hashHexToHex(hex: String): String = {
    val b = hexToBytes(hex)
    if (b == null) null else "0x" + bytesToHex(hash(b))
  }

  /** EIP-55 checksummed form of a 20-byte address (with or without 0x).
    * Matches ethers' getAddress: uppercase hex digit where the
    * corresponding nibble of keccak(lowercase_hex_ascii) >= 8.
    */
  def toChecksumAddress(addr: String): String = {
    if (addr == null) return null
    val s = (if (addr.startsWith("0x") || addr.startsWith("0X")) addr.substring(2) else addr).toLowerCase
    if (s.length != 40 || !s.forall(c => Character.digit(c, 16) >= 0)) return null
    val digest = hash(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val sb = new java.lang.StringBuilder("0x")
    var i = 0
    while (i < 40) {
      val c = s.charAt(i)
      val nibble = (digest(i / 2) >> (if (i % 2 == 0) 4 else 0)) & 0xf
      sb.append(if (c >= 'a' && nibble >= 8) c.toUpper else c)
      i += 1
    }
    sb.toString
  }

  /** Hypermap/ENS-style namehash step: keccak256(parenthash ++ keccak256(label)). */
  def namehash(parentHex: String, label: String): String = {
    val parent = hexToBytes(parentHex)
    if (parent == null || label == null) return null
    val labelHash = hash(label.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val combined = new Array[Byte](parent.length + labelHash.length)
    System.arraycopy(parent, 0, combined, 0, parent.length)
    System.arraycopy(labelHash, 0, combined, parent.length, labelHash.length)
    "0x" + bytesToHex(hash(combined))
  }
}
