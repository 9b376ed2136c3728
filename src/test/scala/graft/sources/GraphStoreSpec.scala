package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketed graph store: same content as the derived view, pushdown
  * on the literal id column, and a pinned regression for the Spark 4.1.2
  * union-of-bucketed-scans planner fault (see GraphStore scaladoc).
  */
class GraphStoreSpec extends SparkSpec {

  test("store content equals the derived view") {
    val stored = GraphStore.nodesAttrs(spark, sfDir)
    val derived = graft.graph.GraphView.nodesAttrs(spark, sfDir)
    assert(stored.count() == derived.count())
    assert(stored.exceptAll(derived).isEmpty)
    assert(derived.exceptAll(stored).isEmpty)
  }

  test("point lookup pushes the id filter to the stored scan") {
    val plan = GraphStore.nodesAttrs(spark, sfDir)
      .where(col("id") === "customer/1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,customer/1)]"),
      s"no pushdown:\n$plan")
  }

  test("traversal point path pushes the frontier IN-filter to the scan") {
    val edges = GraphStore.edges(spark, sfDir)
    val plan = edges
      .where(col("src_id").isInCollection(Seq("customer/1", "customer/2")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(src_id, [customer/1,customer/2])]"),
      s"frontier filter not pushed:\n$plan")
  }

  test("store files carry a parquet bloom filter on the bucket column") {
    import spark.implicits._
    // high-cardinality ids: parquet only writes a bloom once the column
    // falls back from dictionary encoding (the dictionary itself filters
    // row-groups on small data) — which is exactly the 100 TB regime
    val wide = spark.range(0, 120000)
      .select(concat(lit("node/with/a/long/prefix/"), col("id")).as("id"),
        col("id").as("payload"))
    GraphStore.materialize(spark, "graft_test_bloom", "id", wide)
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val dir = new java.io.File(s"$warehouse/graft_test_bloom")
    val pq = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .maxBy(_.length)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(pq.getAbsolutePath),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val rg = reader.getRowGroups.get(0)
      val idCol = rg.getColumns.asScala
        .find(_.getPath.toDotString == "id").get
      assert(idCol.getBloomFilterOffset > 0,
        "no bloom filter written for id")
      assert(reader.getBloomFilterDataReader(rg)
        .readBloomFilter(idCol) != null)
    } finally reader.close()
    spark.sql("DROP TABLE IF EXISTS graft_test_bloom")
  }

  test("bucketed append + merge-on-read: re-put dedups, new attrs land") {
    import graft.api.Engine
    val e1 = Engine.forEmpty(spark)
      .put("""put "ap/1" { "name": "first", "knows": ^"ap/2" }""", ts = 1L)
    val stored = GraphStore.materialize(
      spark, "graft_test_append", "id", e1.nodes)
    assert(stored.count() == 2)
    // second batch re-puts one identical attr and adds a new one —
    // fragments append as new bucket files, dedup happens on read
    val e2 = Engine.forEmpty(spark)
      .put("""put "ap/1" { "name": "first", "age": 9 }""", ts = 2L)
    val appended = GraphStore.append(
      spark, "graft_test_append", "id", e2.nodes)
    assert(appended.count() == 4) // raw fragments, dup still visible
    val merged = e1.merge(appended, Engine.emptyAttrs(spark))
    assert(merged.count() == 3) // name deduped; knows + age distinct
    val nameTs = merged.where(col("key") === "name")
      .select("ts").collect().map(_.getLong(0)).toSeq
    assert(nameTs == Seq(1L)) // first-write timestamp wins
    spark.sql("DROP TABLE IF EXISTS graft_test_append")
  }

  test("repeated appends + killed-mid-append debris converge under merge") {
    // the reference's idempotence property (Tests.fs:694-748: repeated
    // flush/add converges) over the APPEND + merge-on-read path: the
    // same batch appended 3x, plus the debris a mid-append kill leaves
    // behind (an uncommitted _temporary task file — Spark's commit
    // protocol only promotes files on job commit, and scans skip
    // _/.-prefixed paths), must merge to the identical frame.
    import graft.api.Engine
    val e = Engine.forEmpty(spark)
      .put("""put "cv/1" { "name": "n", "knows": ^"cv/2", "size": 3 }""",
        ts = 1L)
    GraphStore.materialize(spark, "graft_test_chaos", "id", e.nodes)
    val clean = e.merge(spark.table("graft_test_chaos"),
        Engine.emptyAttrs(spark))
      .orderBy("id", "key").collect().toSeq

    (1 to 3).foreach { _ =>
      GraphStore.append(spark, "graft_test_chaos", "id", e.nodes)
    }
    // simulate the kill: a partial parquet left under _temporary (never
    // committed). If the reader ever picked it up, the corrupt footer
    // would fail the scan — invisibility IS the crash-safety property.
    val loc = spark.sql("DESCRIBE EXTENDED graft_test_chaos")
      .where(col("col_name") === "Location")
      .select("data_type").first().getString(0).stripPrefix("file:")
    val tmp = new java.io.File(s"$loc/_temporary/0/_temporary/attempt_0")
    assert(tmp.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(tmp, "part-00000-killed.parquet").toPath,
      Array.fill[Byte](128)(0x42))
    spark.sql("REFRESH TABLE graft_test_chaos")

    assert(spark.table("graft_test_chaos").count() == 12,
      "3 appended fragment sets + original should be visible raw")
    val merged = e.merge(spark.table("graft_test_chaos"),
        Engine.emptyAttrs(spark))
      .orderBy("id", "key").collect().toSeq
    assert(merged == clean,
      "merge-on-read did not converge to the pre-append frame")
    spark.sql("DROP TABLE IF EXISTS graft_test_chaos")
  }

  test("compaction folds appended fragments into one merged generation") {
    import graft.api.Engine
    val e = Engine.forEmpty(spark)
      .put("""put "cp/1" { "name": "n", "knows": ^"cp/2" }""", ts = 1L)
    GraphStore.materialize(spark, "graft_test_compact", "id", e.nodes)
    (1 to 3).foreach { _ =>
      GraphStore.append(spark, "graft_test_compact", "id", e.nodes)
    }
    assert(spark.table("graft_test_compact").count() == 8) // 4 generations
    val before = spark.table("graft_test_compact").inputFiles.length
    val compacted = GraphStore.compact(spark, "graft_test_compact", "id",
      df => e.merge(df, Engine.emptyAttrs(spark)))
    assert(compacted.count() == 2, "merge-dedup must collapse fragments")
    assert(spark.table("graft_test_compact").inputFiles.length < before,
      "compaction should shrink the file count")
    // content equals the reader's merge-on-read view, now materialized
    val expect = e.nodes.orderBy("id", "key").collect().toSeq
    assert(spark.table("graft_test_compact").orderBy("id", "key")
      .collect().toSeq == expect)
    spark.sql("DROP TABLE IF EXISTS graft_test_compact")
  }

  test("self-union aggregate needs restructure (Spark 4.1.2 planner fault)") {
    val a = GraphStore.nodesAttrs(spark, sfDir)
    val base = a.count()
    // the fault: two scans of the same bucketed table unioned, aggregated
    // on keys including the bucket column — planner inserts no exchange.
    // If a Spark upgrade makes this == base, the workarounds (and this
    // pin) can be dropped.
    val broken = a.unionAll(a)
      .groupBy("graph", "id", "key", "value").count().count()
    assert(broken == 2 * base,
      s"planner fault no longer reproduces (got $broken, base $base) — " +
        "workarounds in g08/GraphStore scaladoc can be removed")
    // the two safe shapes
    val exploded = a.select(col("graph"), col("id"), col("key"), col("value"),
        explode(array(col("ts"), col("ts") + 1000L)).as("ts"))
      .groupBy("graph", "id", "key", "value").count().count()
    assert(exploded == base)
    val repartitioned = a.unionAll(a).repartition(col("id"))
      .groupBy("graph", "id", "key", "value").count().count()
    assert(repartitioned == base)
  }
}
