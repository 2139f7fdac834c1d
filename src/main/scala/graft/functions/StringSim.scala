package graft.functions

/** Jaro / Jaro-Winkler string similarity, matching DuckDB's
  * `jaro_winkler_similarity` semantics exactly (probed empirically):
  * empty-vs-anything → 0 (including empty-vs-empty), match window
  * max(0, ⌈max(|a|,|b|)/2⌉−1), transpositions = ⌊mismatched-matches/2⌋,
  * Winkler boost p=0.1 with prefix capped at 4 applied only when
  * jaro > 0.7. Static so the Catalyst expression's generated code calls
  * it directly (EvmCodec discipline — no UDF serialization, stays in
  * whole-stage codegen).
  */
object StringSim {

  def jaro(a: String, b: String): Double = {
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of order, halved (integer)
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - tr).toDouble / m) / 3.0
  }

  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (l < max && a.charAt(l) == b.charAt(l)) l += 1
    j + 0.1 * l * (1.0 - j)
  }
}
