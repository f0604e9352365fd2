package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered parquet layout — multi-dimensional
  * file skipping.
  *
  * [[ClusteredWrite]] clusters on ONE key: files are range-disjoint in
  * that key, but a predicate on any OTHER column still touches every
  * file (each file spans that column's full range). Z-ordering
  * interleaves the bits of two keys into one Morton code and clusters
  * on that, so every file covers a small rectangle of the (a, b) space
  * — predicates on EITHER column (or both) prune files via parquet
  * min/max stats. This is the standard lakehouse layout trick for
  * "filter by either dimension" tables (e.g. documents by
  * (source, date), events by (user, day)); at 100 TB it turns a
  * full-corpus scan on the second column into touching ~√F of F files.
  *
  * The Morton code is pure codegen'd bitwise built-ins (shiftleft /
  * bitwiseAND / bitwiseOR) — no UDF, no custom expression needed;
  * Catalyst sees one long column, and the write path is the same
  * repartitionByRange + sortWithinPartitions shape as [[ClusteredWrite]]
  * (range boundaries found by sampling the z values, one shuffle).
  */
object ZOrderWrite {

  /** Spreads the low 32 bits of `x` to the even bit positions of a
    * 64-bit long (classic Morton spread via five shift-mask rounds). */
  private def spread(x: Column): Column = {
    val m: Seq[(Int, Long)] = Seq(
      16 -> 0x0000FFFF0000FFFFL,
      8  -> 0x00FF00FF00FF00FFL,
      4  -> 0x0F0F0F0F0F0F0F0FL,
      2  -> 0x3333333333333333L,
      1  -> 0x5555555555555555L)
    m.foldLeft(x.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
      case (v, (s, mask)) => v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(mask))
    }
  }

  /** The 64-bit Morton code of two non-negative 32-bit keys: bits of
    * `a` on even positions, bits of `b` on odd. Adjacent z values are
    * adjacent in BOTH dimensions, which is what makes contiguous
    * z-ranges (= output files) cover small (a, b) rectangles. Keys
    * outside [0, 2³¹) must be rank- or scale-normalized by the caller
    * first (negative/wider keys would fold into the low 32 bits). */
  def zvalue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Writes `df` as `numFiles` parquet files clustered on the Morton
    * code of `(a, b)` — each file a contiguous z-range, internally
    * sorted, so min/max stats are tight in both `a` and `b`. */
  def parquet(df: DataFrame, path: String, numFiles: Int,
              a: Column, b: Column): Unit = {
    // withColumn would silently REPLACE a caller column of this name and
    // drop would then erase it from the written output
    require(!df.columns.contains("__graft_z"),
      "input already has a __graft_z column")
    df.withColumn("__graft_z", zvalue(a, b))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
  }
}
