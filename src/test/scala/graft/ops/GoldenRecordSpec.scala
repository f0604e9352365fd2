package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q236 (golden-record survivorship) beyond the DuckDB oracle: a
  * driver-side per-key recomputation of the three-source fixture and
  * the per-field picks, the provenance-consistency invariant, and the
  * discriminating case — a key where whole-row latest-wins and
  * per-field survivorship genuinely differ. */
class GoldenRecordSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  /** One source record: per-field Options model the partial fields. */
  private case class Rec(src: String, rank: Int, name: Option[String],
                         nkey: Option[Long], bal: Option[Long],
                         seg: Option[String])

  /** The fixture, rebuilt driver-side from the raw customer rows. */
  private lazy val sources: Map[Long, Seq[Rec]] = {
    import org.apache.spark.sql.functions._
    T(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey").cast("long").as("nk"),
        expr("cast(round(c_acctbal * 100) as bigint)").as("cents"),
        col("c_mktsegment"))
      .collect().map { r =>
        val (k, name, nk, cents, seg) =
          (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
            r.getString(4))
        k -> (Seq(Rec("legacy", 1, Some(name), Some(nk),
            Some(cents - 7), Some(seg))) ++
          (if (k % 3 == 0)
            Seq(Rec("billing", 2, None, None, Some(cents), Some(seg)))
          else Nil) ++
          (if (k % 2 == 0)
            Seq(Rec("crm", 3, Some(name.toUpperCase), Some(nk),
              None, None))
          else Nil))
      }.toMap
  }

  /** Highest-rank non-null pick for one field: (value, source). */
  private def pick[A](recs: Seq[Rec], f: Rec => Option[A]): (A, String) = {
    val r = recs.filter(f(_).nonEmpty).maxBy(_.rank)
    (f(r).get, r.src)
  }

  test("q236 equals the driver-side survivorship brute force (full " +
    "table, every field, every provenance)") {
    val got = Curation.q236GoldenRecord(spark, dir).collect().map { r =>
      (r.getLong(0), (r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getString(5), r.getLong(6), r.getString(7),
        r.getString(8), r.getString(9)))
    }.toMap
    assert(got.keySet == sources.keySet)
    sources.foreach { case (k, recs) =>
      val (name, nameSrc) = pick(recs, _.name)
      val (nk, nkSrc) = pick(recs, _.nkey)
      val (bal, balSrc) = pick(recs, _.bal)
      val (seg, segSrc) = pick(recs, _.seg)
      assert(got(k) == ((recs.size.toLong, name, nameSrc, nk, nkSrc,
        bal, balSrc, seg, segSrc)), s"key $k")
    }
  }

  test("the discriminating case exists: on some key, whole-row " +
    "latest-wins keeps a null that survivorship fills from an older " +
    "source — the semantics q71/q183 cannot express") {
    // any even key: the newest record (crm) has no balance/segment, so
    // latest-wins would emit nulls there; survivorship fills both
    val k = sources.keys.filter(_ % 2 == 0).min
    val newest = sources(k).maxBy(_.rank)
    assert(newest.src == "crm" && newest.bal.isEmpty && newest.seg.isEmpty)
    val row = Curation.q236GoldenRecord(spark, dir)
      .filter(org.apache.spark.sql.functions.col("custkey") === k)
      .collect().head
    assert(!row.isNullAt(6) && !row.isNullAt(8),
      "survivorship left a fillable field null")
    assert(row.getString(7) != "crm" && row.getString(9) != "crm",
      "balance/segment provenance cannot be the source that lacks them")
  }

  test("provenance is consistent: every picked value equals that " +
    "source's own value for the key, and no output field is null " +
    "(legacy covers every key and field)") {
    val rows = Curation.q236GoldenRecord(spark, dir).collect()
    rows.foreach { r =>
      (0 until r.length).foreach(i => assert(!r.isNullAt(i)))
      val k = r.getLong(0)
      val bySrc = sources(k).map(x => x.src -> x).toMap
      assert(bySrc(r.getString(3)).name.contains(r.getString(2)))
      assert(bySrc(r.getString(5)).nkey.contains(r.getLong(4)))
      assert(bySrc(r.getString(7)).bal.contains(r.getLong(6)))
      assert(bySrc(r.getString(9)).seg.contains(r.getString(8)))
    }
  }
}
