package graft.sink

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file BLOOM-FILTER manifest — point-lookup file skipping on an
  * UNCLUSTERED column, the pruning family's missing member: q133
  * prunes on the partition value, q220's min/max manifest and q108/
  * q110 footers prune the CLUSTERED dimension, but none of them can
  * skip a file for `o_custkey = K` on a date-clustered layout — every
  * file's custkey bounding box spans the whole domain. A per-file
  * bloom over the lookup column restores skipping for point predicates
  * without re-clustering the data (the Delta/Iceberg bloom-filter
  * story reduced to its primitive), at the cost of a manifest column
  * instead of a second physical sort order.
  *
  * Construction (one extra scan at write time, exactly like the stats
  * manifest): each row contributes [[BloomK]] probe positions
  * `md5(key ':' i)` → first 15 hex digits → mod [[BloomM]]; the
  * per-file filter is the distinct-position SET, stored as a sorted
  * int array (membership-equivalent to the packed bitset; production
  * packs the same positions into ⌈m/64⌉ longs — the array form keeps
  * the filter driver-inspectable and spec-reproducible). The md5 chain
  * is the repo's standard cross-engine ticket (q89/q129), computed
  * identically by Spark's `md5`/`conv` and the driver-side probe
  * below, so false negatives are impossible BY CONSTRUCTION: a key's
  * probe positions at read time are bit-for-bit the positions its rows
  * inserted at build time.
  *
  * Probe: driver-side over the file-count-sized manifest (the
  * [[Manifest.prunedFiles]] metadata-scale argument) — a file is a
  * candidate iff ALL k positions are present. False-positive rate per
  * file ≈ (fill)^k; sizing rule in RUNBOOK (m per file ∝ rows per
  * file). The pruned read then applies the predicate as usual — the
  * bloom skips files, it never replaces the row filter.
  */
object BloomManifest {

  private[sink] val BloomM = 8192L
  private[sink] val BloomK = 3

  /** The probe-position expression for probe index `i` over `keyCol` —
    * Spark side of the shared ticket chain. */
  private def posExpr(keyCol: String, i: Int) =
    expr(s"cast(conv(substring(md5(concat(cast($keyCol as string), ':$i')), " +
      s"1, 15), 16, 10) as bigint) % $BloomM")

  /** Driver side of the SAME chain — used by the probe (and pinned
    * against the Spark expression by BloomManifestSpec). */
  private[sink] def probePositions(key: Long): Seq[Long] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until BloomK).map { i =>
      val hex = md.digest(s"$key:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % BloomM
    }
  }

  /** One scan → (file, sorted distinct probe positions). */
  private[sink] def build(s: SparkSession, dataDir: String,
                          keyCol: String, manifestOut: String): Unit = {
    val probes = (0 until BloomK).map(i => posExpr(keyCol, i))
    s.read.parquet(dataDir)
      .select(input_file_name().as("file"),
        explode(array(probes: _*)).as("pos"))
      .groupBy("file")
      .agg(sort_array(collect_set(col("pos").cast("int"))).as("bloom"))
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestOut)
  }

  /** Files whose bloom contains ALL of `key`'s probe positions. */
  private[sink] def candidateFiles(s: SparkSession, manifestPath: String,
                                   key: Long): Seq[String] = {
    val probes = probePositions(key)
    s.read.parquet(manifestPath).collect().toSeq
      .filter { r =>
        val bloom = r.getSeq[Int](r.fieldIndex("bloom")).toSet
        probes.forall(p => bloom.contains(p.toInt))
      }
      .map(_.getString(0))
  }

  /** Built once per (JVM, dataset): q220's date-ranged 48-file layout
    * (SHARED — the bloom manifest is an additional index over the same
    * physical table, the q152 adopt-don't-rebuild argument) plus the
    * custkey bloom manifest. */
  private[sink] def ensureBloom(s: SparkSession,
                                dir: String): (String, String) =
    ScratchExport.once(s"bloom:$dir") {
      val (data, _) = Manifest.ensureRangedOrders(s, dir)
      val man = ScratchExport.scratchDir("graft-bloom-")
      build(s, data, "o_custkey", man)
      (data, man)
    }

  /** The probe key, derived not hardcoded (scale-invariant): the middle
    * of the customer key domain. Driver-side one-row aggregate; the
    * oracle states the same scalar subquery. */
  private def probeKey(s: SparkSession, dir: String): Long =
    graft.ops.T(s, dir, "orders")
      .agg((max("o_custkey") / 2).cast("long")).collect()(0).getLong(0)

  /** q251: a customer's full order history through the bloom-pruned
    * file set — the scan receives ONLY candidate files (BloomSpec pins
    * ≪ 48 on this layout), then filters exactly as usual. The oracle
    * reads the RAW table: a hash match proves bloom pruning lost no
    * qualifying row — q220's discipline on the UNCLUSTERED dimension
    * min/max can't serve. */
  def q251BloomPrune(s: SparkSession, dir: String): DataFrame = {
    val (data, man) = ensureBloom(s, dir)
    val key = probeKey(s, dir)
    val files = candidateFiles(s, man, key)
    // empty candidates = the key provably has no rows anywhere (no
    // false negatives); one file keeps the schema and the empty
    // aggregate row identical to the oracle's
    val src = if (files.nonEmpty) s.read.parquet(files: _*)
      else s.read.parquet(data).limit(0)
    src
      .filter(col("o_custkey") === key)
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"),
        min(expr("cast(o_orderdate as date)")).as("first_date"),
        max(expr("cast(o_orderdate as date)")).as("last_date"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q251_bloom_prune" -> q251BloomPrune _,
  )

  val oracle: Map[String, String] = Map(
    // raw-table recompute under the same derived point key — the
    // oracle never sees the layout, the bloom, or the pruning
    "q251_bloom_prune" ->
      """SELECT count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c2,
        |       CAST(min(o_orderdate) AS DATE) AS first_date,
        |       CAST(max(o_orderdate) AS DATE) AS last_date
        |FROM orders
        |WHERE o_custkey = (SELECT CAST(max(o_custkey) // 2 AS BIGINT) FROM orders)""".stripMargin,
  )
}
