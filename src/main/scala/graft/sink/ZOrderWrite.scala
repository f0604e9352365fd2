package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered parquet layout — multi-dimensional
  * file skipping.
  *
  * [[ClusteredWrite]] clusters on ONE key: files are range-disjoint in
  * that key, but a predicate on any OTHER column still touches every
  * file (each file spans that column's full range). Z-ordering
  * interleaves the bits of 2-4 keys into one Morton code and clusters
  * on that, so every file covers a small hyper-rectangle of the key
  * space — predicates on ANY clustered column (or several) prune files
  * via parquet min/max stats. This is the standard lakehouse layout
  * trick for "filter by any dimension" tables (e.g. documents by
  * (source, date, lang), events by (user, day)); at 100 TB it turns a
  * full-corpus scan on a secondary column into touching ~F^((k-1)/k)
  * of F files.
  *
  * The Morton code is pure codegen'd bitwise built-ins (shiftleft /
  * bitwiseAND / bitwiseOR) — no UDF, no custom expression needed;
  * Catalyst sees one long column, and the write path is the same
  * repartitionByRange + sortWithinPartitions shape as [[ClusteredWrite]]
  * (range boundaries found by sampling the z values, one shuffle).
  */
object ZOrderWrite {

  /** Bits available per key at stride k (64 / k, floored). */
  def bitsPerDim(k: Int): Int = {
    require(k >= 2 && k <= 4, s"z-order supports 2-4 dimensions, got $k")
    Seq(32, 21, 16)(k - 2)
  }

  // Classic Morton spread tables: after masking the input to
  // bitsPerDim(k) bits, each (shift, mask) round doubles the gap until
  // consecutive input bits sit k positions apart.
  private val spreadRounds: Map[Int, Seq[(Int, Long)]] = Map(
    2 -> Seq(
      16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
      4  -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
      1  -> 0x5555555555555555L),
    3 -> Seq(
      32 -> 0x001F00000000FFFFL, 16 -> 0x001F0000FF0000FFL,
      8  -> 0x100F00F00F00F00FL, 4  -> 0x10C30C30C30C30C3L,
      2  -> 0x1249249249249249L),
    4 -> Seq(
      24 -> 0x000000FF000000FFL, 12 -> 0x000F000F000F000FL,
      6  -> 0x0303030303030303L, 3  -> 0x1111111111111111L))

  /** Spreads the low bitsPerDim(k) bits of `x` to every k-th bit
    * position (shift-mask rounds). */
  private def spread(x: Column, k: Int): Column = {
    val keep = (1L << bitsPerDim(k)) - 1
    spreadRounds(k).foldLeft(x.cast("long").bitwiseAND(lit(keep))) {
      case (v, (s, mask)) => v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(mask))
    }
  }

  /** The Morton code of 2-4 non-negative keys: bit i of `cols(c)` lands
    * at position i·k + c, so adjacent z values are adjacent in EVERY
    * dimension — that is what makes contiguous z-ranges (= output
    * files) cover small key-space hyper-rectangles. Keys outside
    * [0, 2^bitsPerDim(k)) must be rank- or scale-normalized by the
    * caller first (wider/negative keys would fold into the low bits):
    * 32 bits each at k=2, 21 at k=3, 16 at k=4. */
  def zvalue(cols: Column*): Column = {
    require(cols.size >= 2 && cols.size <= 4,
      s"z-order supports 2-4 dimensions, got ${cols.size}")
    cols.zipWithIndex
      .map { case (c, i) => shiftleft(spread(c, cols.size), i) }
      .reduce(_ bitwiseOR _)
  }

  /** Writes `df` as `numFiles` parquet files clustered on the Morton
    * code of `cols` — each file a contiguous z-range, internally
    * sorted, so min/max stats are tight in every clustered dimension. */
  def parquet(df: DataFrame, path: String, numFiles: Int,
              cols: Column*): Unit = {
    // withColumn would silently REPLACE a caller column of this name and
    // drop would then erase it from the written output
    require(!df.columns.contains("__graft_z"),
      "input already has a __graft_z column")
    // XOR the sign bit so the SIGNED range partitioning orders z values
    // in UNSIGNED order: full-width keys at k=2/k=4 can set bit 63, and
    // without the flip those rows sort FIRST — one file then straddles
    // the wrap and covers both corners of the key space, pruning nothing
    df.withColumn("__graft_z",
        zvalue(cols: _*).bitwiseXOR(lit(Long.MinValue)))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
  }
}
