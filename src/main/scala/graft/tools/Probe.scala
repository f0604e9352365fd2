package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for round-3 perf work (not part of the
  * library surface; deleted once the investigation lands). */
object Probe {
  def time(name: String)(f: => DataFrame): Double = {
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[probe] $name%-28s $s%8.2f s")
    s
  }

  // current 3-shuffle shingle build (lead windows + distinct)
  def shinglesOld(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    graft.ops.T(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "word")
      .withColumn("w1", lead("word", 1).over(w))
      .withColumn("w2", lead("word", 2).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("word"), col("w1"), col("w2")).as("sh"))
      .distinct()
  }

  // candidate 1-shuffle shingle build: collect per doc, HOF shingle
  def docsetsNew(s: SparkSession, dir: String): DataFrame =
    graft.ops.T(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "word")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("word")))).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), expr(
        """array_sort(array_distinct(transform(slice(ws, 1, size(ws) - 2),
          |  (x, i) -> concat_ws(' ', x.word, ws[i + 1].word, ws[i + 2].word))))"""
          .stripMargin).as("ss"))
      .withColumn("n", size(col("ss")))

  def docsetsOld(s: SparkSession, dir: String): DataFrame =
    shinglesOld(s, dir)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("sh"))).as("ss"))
      .withColumn("n", size(col("ss")))

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.Relational.q30AggQ1(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val rounds = 3
    val results = collection.mutable.Map.empty[String, List[Double]]
    def run(name: String)(f: => DataFrame): Unit =
      results(name) = time(name)(f) :: results.getOrElse(name, Nil)
    graft.ops.TrainingData.q93AnnIvf(spark, dir).show(10, false)
    for (_ <- 1 to rounds) {
      run("q93_full")(graft.ops.TrainingData.q93AnnIvf(spark, dir))
    }
    println("[probe] === medians ===")
    results.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"[probe] $k%-28s ${v.sorted.apply(v.size / 2)}%8.2f s median of ${v.size}")
    }
    spark.stop()
  }
}
