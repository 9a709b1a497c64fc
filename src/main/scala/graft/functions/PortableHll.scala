package graft.functions

/** JVM-side implementation of the PORTABLE HyperLogLog contract shared
  * with the SQL/DataFrame twin in `graft.queries.SketchOps` (q176/q178)
  * and replayed by the DuckDB oracle. Every step mirrors the SQL form
  * exactly, so a register vector built here is bit-identical to one
  * built by either engine:
  *  - hash = lowercase md5 hex of the member's UTF-8 bytes (Spark
  *    `md5()`, DuckDB `md5()`, and MessageDigest agree byte-for-byte);
  *  - bucket = first hex digit (m=16 registers, p=4);
  *  - rho = 1 + leading zero BITS of the next 48 bits, capped at 49;
  *  - register sum carried in fixed point: Σ 2^(50-M), empty
  *    registers contributing 2^50;
  *  - raw estimate = (α₁₆·m²·2⁵⁰)/S with the numerator as ONE IEEE
  *    literal — a single correctly-rounded double divide;
  *  - the small-range (linear counting) branch is a 16-entry integer
  *    lookup of round(16·ln(16/V)·1e6), because libm's ln is NOT
  *    guaranteed bit-identical across engines;
  *  - final estimate floor-quantized at 1e6 after both sides hold the
  *    identical double.
  * Used by the streaming processor (`Streams.portableHllStream`) so
  * live state converges to EXACTLY the batch/oracle registers — the
  * parity is asserted in `SketchSpec`/`StreamsSpec`.
  */
object PortableHll {

  val Registers = 16
  val Two50 = 1125899906842624L // 2^50
  val RawNumerator = 1.93979043150102e17 // 0.673 * 256.0 * 2^50, IEEE
  /** round(16 * ln(16/V) * 1e6) for V = 1..16. */
  val LcFp: Array[Long] = Array(44361420L, 33271065L, 26783623L,
    22180710L, 18610413L, 15693268L, 13226857L, 11090355L, 9205826L,
    7520058L, 5995095L, 4602913L, 3322230L, 2136502L, 1032616L, 0L)

  /** lowercase md5 hex of a string's UTF-8 bytes — THE portable hash
    * (identical to Spark `md5()` and DuckDB `md5()`); shared by the
    * CMS twin so the contract lives in exactly one place. */
  private[functions] def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** (bucket, rho) of one member — the row-level sketch update. */
  def bucketRho(member: String): (Int, Int) = {
    val hex = md5Hex(member)
    val bucket = Character.digit(hex.charAt(0), 16)
    val tail = hex.substring(1, 13)
    val z = tail.takeWhile(_ == '0').length
    val rho =
      if (z == 12) 49
      else {
        val dv = Character.digit(tail.charAt(z), 16)
        val lz = if (dv >= 8) 0 else if (dv >= 4) 1 else if (dv >= 2) 2 else 3
        4 * z + lz + 1
      }
    (bucket, rho)
  }

  /** (n_filled, v_zero, s_fp, est_fp) from a 16-register vector
    * (0 = empty) — the exact estimator the SQL twin runs. */
  def estimate(m: Seq[Int]): (Long, Long, Long, Long) = {
    require(m.length == Registers, s"expected $Registers registers")
    val nFilled = m.count(_ > 0).toLong
    val vZero = Registers - nFilled
    val sFilled = m.iterator.filter(_ > 0).map(r => 1L << (50 - r)).sum
    val sFp = sFilled + vZero * Two50
    val eRaw = RawNumerator / sFp.toDouble
    val estFp =
      if (eRaw <= 40.0 && vZero > 0) LcFp(vZero.toInt - 1)
      else math.floor(math.min(eRaw, 1.0e9) * 1000000.0).toLong
    (nFilled, vZero, sFp, estFp)
  }
}
