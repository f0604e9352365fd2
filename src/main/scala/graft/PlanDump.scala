package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode

/** Optimization-round evidence tool: dump `.explain("formatted")` for a
  * named set of declared queries into one file per query, so plan-shape
  * claims in OPTIMIZATION_rNN.md are checkable without running Spark.
  *
  * Usage:
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> q1,q2,..."
  * writes `<outDir>/<query>_<suffix>.txt` (suffix = before|after).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <comma-separated query ids>")
    val Array(sfDir, outDir, suffix, names) = args
    val ids = names.split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = ids.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    ids.foreach { id =>
      val df = SparkEntry.queries(id)(spark, sfDir)
      val plan = df.queryExecution.explainString(FormattedMode)
      Files.writeString(Paths.get(outDir, s"${id}_$suffix.txt"), plan)
      println(s"[plandump] wrote $outDir/${id}_$suffix.txt")
    }
    spark.stop()
  }
}
