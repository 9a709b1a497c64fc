package graft.functions

/** JVM-side implementation of the PORTABLE count-min-sketch contract
  * shared with the SQL/DataFrame twin in `graft.queries.SketchOps`
  * (q175) and replayed by the DuckDB oracle: d=4 hash rows × w=1024
  * buckets, row j's bucket = first 16 bits of md5("j:key") mod w.
  * A (row, bucket) pair is flattened to one CELL id `j*w + b`, the
  * unit of streaming state: counters are additive longs, so a
  * cell-keyed streaming count converges to EXACTLY the batch counter
  * table regardless of partitioning or micro-batch chopping
  * (asserted in `SketchSpec`).
  */
object PortableCms {

  val Rows = 4
  val Width = 1024L

  /** bucket of `key` under hash row `j` — mirrors the SQL
    * `conv(substr(md5(concat(j, ':', key)), 1, 4), 16, 10) % 1024`.
    * The hash itself is [[PortableHll.md5Hex]] — one definition of
    * the portable-hash contract for both sketch families. */
  def bucket(j: Int, key: String): Long = {
    val hex = PortableHll.md5Hex(s"$j:$key")
    val v16 = (0 until 4).foldLeft(0L)((acc, i) =>
      acc * 16 + Character.digit(hex.charAt(i), 16))
    v16 % Width
  }

  /** flattened cell id of (row j, key). */
  def cell(j: Int, key: String): Long = j * Width + bucket(j, key)

  /** all d cells one observation of `key` increments. */
  def cells(key: String): Seq[Long] = (0 until Rows).map(cell(_, key))

  /** CMS estimate of `key` given a cell→count lookup (min over the
    * d rows; absent cells count 0). */
  def estimate(key: String, counts: Long => Long): Long =
    cells(key).map(counts).min
}
