package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.v2.{GraftTable, StoreManifest}

/** The `graft` DataSource V2 table format: filter pushdown + bucket
  * pruning visible in the scan, murmur3-correct bucket files from the
  * V2 writer, storage-partitioned joins with zero Exchange through the
  * catalog, and generation time travel that survives compaction.
  */
class GraftDsv2Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-dsv2").toString

  private def sampleDf: DataFrame = Seq(
    ("customer/1", "name", "Alice", 10L),
    ("customer/1", "acct", "77", 10L),
    ("customer/2", "name", "Bob", 11L),
    ("nation/1", "name", "FRANCE", 12L),
    ("orders/9", "total", "123", 13L))
    .toDF("id", "key", "value", "ts")

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketOf replicates Spark's HashPartitioning routing exactly") {
    // the on-disk routing must be bit-identical to pmod(hash(col), n)
    // (murmur3 seed 42) or V2 files would interleave wrongly with the
    // V1 bucketBy layout and bucket pruning would read the wrong file
    val ids = Seq("customer/1", "nation/25", "orders/123456", "", "a",
      "doc/é世界")
    val sparkSide = ids.toDF("id")
      .select(col("id"), pmod(hash(col("id")), lit(32)).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    ids.foreach { id =>
      assert(GraftTable.bucketOf(id, 32) == sparkSide(id), s"id=$id")
    }
    val longs = Seq(0L, 1L, -5L, 123456789L)
    val sparkL = longs.toDF("k")
      .select(col("k"), pmod(hash(col("k")), lit(16)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    longs.foreach { k =>
      assert(GraftTable.bucketOf(k, 16) == sparkL(k), s"k=$k")
    }
  }

  test("create + append + read round-trips; files land in murmur3 buckets") {
    val root = tmp()
    GraftTable.create(root, sampleDf.schema, "id")
    sampleDf.write.format("graft").mode("append").save(root)
    val back = spark.read.format("graft").load(root)
    assert(back.orderBy("id", "key").collect().toSeq ==
      sampleDf.orderBy("id", "key").collect().toSeq)
    // every committed file's NAME bucket must equal the murmur3 bucket
    // of every row inside it — the writer re-derives the bucket per
    // row, so this holds no matter how Spark satisfied the clustering
    val gen = StoreManifest.readLatest(root).get
    assert(gen.files.nonEmpty)
    gen.files.foreach { f =>
      val b = "_([0-9]{5})\\.parquet$".r.findFirstMatchIn(f).get.group(1).toInt
      val ids = spark.read.parquet(s"$root/$f").select("id")
        .as[String].collect()
      assert(ids.nonEmpty && ids.forall(GraftTable.bucketOf(_, 32) == b),
        s"file $f holds rows outside bucket $b")
    }
  }

  test("point lookup: bucket pruning + pushed filters visible in the scan") {
    val root = tmp()
    GraftTable.create(root, sampleDf.schema, "id")
    sampleDf.write.format("graft").mode("append").save(root)
    val got = spark.read.format("graft").load(root)
      .where(col("id") === "customer/1").select("key", "value")
    val plan = planString(got)
    assert(plan.contains("SelectedBuckets: 1/32"),
      s"bucket pruning missing from scan:\n$plan")
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo(id"),
      s"pushed filter missing from scan:\n$plan")
    assert(got.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("acct", "name"))
    // projection reaches the reader: ReadSchema shows only id/key/value
    assert(!plan.replaceAll("(?s).*ReadSchema: ", "").contains("ts"),
      s"column pruning missing:\n$plan")
  }

  test("append after create: new generation, point-get still prunes + finds") {
    val root = tmp()
    GraftTable.create(root, sampleDf.schema, "id")
    sampleDf.write.format("graft").mode("append").save(root)
    Seq(("customer/999", "name", "Zed", 20L)).toDF("id", "key", "value", "ts")
      .write.format("graft").mode("append").save(root)
    assert(StoreManifest.latest(root).contains(2L)) // create, append, append
    val got = spark.read.format("graft").load(root)
      .where(col("id") === "customer/999")
    assert(planString(got).contains("SelectedBuckets: 1/32"))
    assert(got.count() == 1L)
  }

  test("storage-partitioned join through the catalog: zero Exchange") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.graft_spj",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_spj.warehouse", wh)
    val nodes = (1 to 200)
      .map(i => (s"node/$i", s"name-$i")).toDF("id", "name")
    val edges = (1 to 600)
      .map(i => (s"node/${i % 200 + 1}", s"node/${(i * 7) % 200 + 1}"))
      .toDF("id", "dst")
    GraftTable.create(s"$wh/g/nodes", nodes.schema, "id")
    GraftTable.create(s"$wh/g/edges", edges.schema, "id")
    nodes.write.format("graft").mode("append").save(s"$wh/g/nodes")
    edges.write.format("graft").mode("append").save(s"$wh/g/edges")
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val j = spark.sql(
        """SELECT e.id, e.dst, n.name FROM graft_spj.g.edges e
          |JOIN graft_spj.g.nodes n ON e.id = n.id""".stripMargin)
      val plan = planString(j)
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join still shuffles:\n$plan")
      // and it returns exactly what a plain shuffled join returns
      assert(j.count() == 600L)
      val expect = edges.join(nodes, "id").count()
      assert(j.count() == expect)
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("runtime bucket pruning: a filtered-dim join reads only its buckets") {
    // dynamic partition pruning over the hash-bucket layout: the dim
    // side's join-key values reach the fact scan at EXECUTION time
    // (SupportsRuntimeFiltering), hash through the same murmur3
    // routing, and whole buckets of files are never opened
    val root = tmp()
    val fact = (1 to 2000)
      .map(i => (s"customer/$i", s"payload-$i")).toDF("id", "name")
    GraftTable.create(root, fact.schema, "id")
    fact.write.format("graft").mode("append").save(root)
    val totalFiles = StoreManifest.readLatest(root).get.files.size
    assert(totalFiles >= 16, s"want many bucket files, got $totalFiles")
    // DPP's planner gate wants a LIKELY-SELECTIVE predicate on a
    // non-foldable dim side (an In filter over a file scan — a local
    // Seq would constant-fold the filter away and never qualify)
    val dim = graft.Tables(spark, sfDir, "customer")
      .where(col("c_custkey").isin(7, 123))
      .select(concat(lit("customer/"), col("c_custkey")).as("id"),
        col("c_name").as("tag"))
    val keys = Seq(
      // DPP must inject the filter even without a reusable broadcast
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly"
        -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio"
        -> "100.0")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = spark.read.format("graft").load(root)
        .join(dim, "id").select("id", "name", "tag")
      v2.GraftScanStats.filesOpened.set(0L)
      val rows = joined.collect().map(_.getString(0)).sorted.toSeq
      assert(rows == Seq("customer/123", "customer/7"))
      val opened = v2.GraftScanStats.filesOpened.get()
      // the two dim keys hash to at most 2 buckets — with ~1 file per
      // bucket the scan must open far fewer files than the store holds
      val wanted = Seq("customer/7", "customer/123")
        .map(GraftTable.bucketOf(_, 32)).distinct.size
      assert(opened <= wanted.toLong * 2,
        s"runtime pruning read $opened of $totalFiles files " +
          s"(expected ~$wanted buckets)")
      // and the plan carries the injected runtime filter
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no runtime filter on the graft scan:\n$plan")
    } finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("generation time travel: asOf(N) stable across append AND compaction") {
    val root = tmp()
    val s0 = sampleDf // gen 1 (gen 0 = empty create)
    val s1 = Seq(("customer/1", "name", "Alice-v2", 30L),
      ("part/5", "color", "red", 31L)).toDF("id", "key", "value", "ts")
    GraftTable.create(root, s0.schema, "id")
    s0.write.format("graft").mode("append").save(root)
    s1.write.format("graft").mode("append").save(root) // gen 2
    def rows(gen: Long) = spark.read.format("graft")
      .option("generation", gen).load(root)
      .orderBy("id", "key", "ts").collect().toSeq
    val snap1 = rows(1L)
    val snap2 = rows(2L)
    assert(snap1.size == 5 && snap2.size == 7)
    // compaction: rewrite latest as one merged generation (here:
    // last-write-wins per (id, key) — the Engine merge contract)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id", "key").orderBy(col("ts").desc)
    spark.read.format("graft").load(root)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .drop("rn")
      .write.format("graft").mode("overwrite").save(root) // gen 3
    val compacted = rows(3L)
    assert(compacted.size == 6) // customer/1 name deduped
    assert(compacted.exists(r => r.getString(2) == "Alice-v2"))
    assert(!compacted.exists(r => r.getString(2) == "Alice"))
    // THE pin: pre-compaction generations read byte-identically after
    // the compaction commit — history is never rewritten
    assert(rows(1L) == snap1, "asOf(1) changed after compact")
    assert(rows(2L) == snap2, "asOf(2) changed after compact")
    // and the live table reads the compacted generation
    assert(spark.read.format("graft").load(root).count() == 6)
  }

  test("VERSION AS OF + TIMESTAMP AS OF through the catalog SQL surface") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.graft_tt",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_tt.warehouse", wh)
    val root = s"$wh/g/attrs"
    GraftTable.create(root, sampleDf.schema, "id")
    sampleDf.write.format("graft").mode("append").save(root)
    Seq(("extra/1", "k", "v", 99L)).toDF("id", "key", "value", "ts")
      .write.format("graft").mode("append").save(root)
    assert(spark.sql(
      "SELECT * FROM graft_tt.g.attrs VERSION AS OF 1").count() == 5)
    assert(spark.sql(
      "SELECT * FROM graft_tt.g.attrs VERSION AS OF 2").count() == 6)
    assert(spark.sql("SELECT * FROM graft_tt.g.attrs").count() == 6)
    // TIMESTAMP AS OF: a timestamp at/after gen 2's commit reads gen 2
    val t2 = new java.sql.Timestamp(
      StoreManifest.read(root, 2L).commitMs)
    val got = spark.sql(
      s"SELECT * FROM graft_tt.g.attrs TIMESTAMP AS OF '$t2'").count()
    assert(got == 6, s"timestamp travel read $got rows")
    // a snapshot is read-only
    val err = intercept[Exception] {
      sampleDf.writeTo("graft_tt.g.attrs").overwritePartitions()
      spark.read.format("graft").option("generation", "1").load(root)
        .write.format("graft").mode("append")
        .option("generation", "1").save(root)
    }
    assert(err != null)
  }

  test("aggregate pushdown: COUNT/MIN/MAX answered from footers, zero data read") {
    val root = tmp()
    val df = (1 to 5000)
      .map(i => (s"k/$i", i.toLong * 3, if (i % 7 == 0) null
        else s"v$i"))
      .toDF("id", "n", "s")
    GraftTable.create(root, df.schema, "id")
    df.write.format("graft").mode("append").save(root)
    df.where(col("n") > 9000).write.format("graft").mode("append")
      .save(root) // second generation: the fold spans generations
    val store = spark.read.format("graft").load(root)
    val q = store.agg(count(lit(1)).as("c"), min("n").as("mn"),
      max("n").as("mx"), count(col("s")).as("cs"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"),
      s"aggregate not pushed to the footer scan:\n$plan")
    v2.GraftScanStats.filesOpened.set(0L)
    val r = q.collect().head
    assert(v2.GraftScanStats.filesOpened.get() == 0L,
      "footer aggregate opened data files")
    val dupHi = 5000L - 3000L // rows with n > 9000 appended twice
    assert(r.getLong(0) == 5000L + dupHi)
    assert(r.getLong(1) == 3L && r.getLong(2) == 15000L)
    // count(s): nulls excluded, per footers' null counts
    val sNulls = (1 to 5000).count(_ % 7 == 0) +
      (3001 to 5000).count(_ % 7 == 0)
    assert(r.getLong(3) == (5000L + dupHi) - sNulls)
    // a FILTERED aggregate must fall back to the real scan
    val qf = store.where(col("n") > 600).agg(count(lit(1)))
    v2.GraftScanStats.filesOpened.set(0L)
    val cf = qf.collect().head.getLong(0)
    assert(v2.GraftScanStats.filesOpened.get() > 0L,
      "filtered aggregate wrongly served from footers")
    assert(cf == store.collect().count(_.getLong(1) > 600))
    // string MIN/MAX must fall back (binary stats may be truncated
    // BOUNDS, not values)
    val qs = store.agg(min("s"))
    v2.GraftScanStats.filesOpened.set(0L)
    qs.collect()
    assert(v2.GraftScanStats.filesOpened.get() > 0L,
      "string min wrongly served from footer bounds")
  }

  test("streaming read: generations arrive incrementally, restart resumes") {
    val root = tmp() + "/s"
    val ck = tmp() + "/ck"
    def rows(lo: Int, hi: Int) = (lo until hi)
      .map(i => (s"k/$i", i.toLong)).toDF("id", "v")
    GraftTable.create(root, rows(0, 1).schema, "id")
    rows(0, 50).write.format("graft").mode("append").save(root) // gen 1
    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(root)
        .writeStream.format("parquet")
        .option("path", s"$root-out")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(s"$root-out").count() == 50L)
    // new generations land while the stream is down; a compaction
    // rewrite in between must stay INVISIBLE to the resumed stream
    rows(50, 80).write.format("graft").mode("append").save(root) // gen 2
    spark.read.format("graft").load(root).localCheckpoint()
      .write.format("graft").mode("overwrite").save(root) // gen 3: rewrite
    rows(80, 100).write.format("graft").mode("append").save(root) // gen 4
    drain() // resume from the SAME checkpoint
    val got = spark.read.parquet(s"$root-out")
    assert(got.count() == 100L,
      s"stream emitted ${got.count()} rows (dup or loss across restart)")
    assert(got.select("id").distinct().count() == 100L,
      "a row was emitted twice — the compaction leaked into the stream")
  }

  test("generation expiry: history shortens, retained snapshots intact") {
    val root = tmp()
    def gen(lo: Int, hi: Int) = (lo until hi)
      .map(i => (s"e/$i", i.toLong)).toDF("id", "v")
    GraftTable.create(root, gen(0, 1).schema, "id")
    gen(0, 40).write.format("graft").mode("append").save(root)  // 1
    gen(40, 80).write.format("graft").mode("append").save(root) // 2
    // gen 3: compaction rewrite — makes gens 1-2's files droppable
    spark.read.format("graft").load(root).localCheckpoint()
      .write.format("graft").mode("overwrite").save(root)
    gen(80, 100).write.format("graft").mode("append").save(root) // 4
    // plus an OLD orphan no manifest references (aborted-write
    // residue, past the grace window) and a FRESH one (a racing
    // in-flight write's data file, manifest commit imminent) — the
    // sweep must take the first and leave the second
    val orphan = new java.io.File(s"$root/data/part-orphan_00003.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    orphan.setLastModified(System.currentTimeMillis() - 3600L * 1000)
    val fresh = new java.io.File(s"$root/data/part-fresh_00004.parquet")
    java.nio.file.Files.write(fresh.toPath, Array[Byte](4, 5, 6))
    val filesBefore = new java.io.File(s"$root/data").listFiles().length
    val snap3 = spark.read.format("graft").option("generation", 3)
      .load(root).orderBy("id").collect().toSeq
    val (dropped, deleted) = v2.GraftMaintenance.expire(root, keepGens = 2)
    assert(dropped == Seq(0L, 1L, 2L), s"dropped $dropped")
    assert(deleted.nonEmpty && deleted.contains(
      "data/part-orphan_00003.parquet"), s"deleted $deleted")
    assert(!deleted.contains("data/part-fresh_00004.parquet") &&
      fresh.exists(), "grace window violated: in-flight-aged file swept")
    fresh.delete()
    assert(new java.io.File(s"$root/data").listFiles().length
      < filesBefore)
    // retained generations read byte-identically; live table intact
    assert(spark.read.format("graft").option("generation", 3)
      .load(root).orderBy("id").collect().toSeq == snap3)
    assert(spark.read.format("graft").load(root).count() == 100L)
    // expired history is a loud error, not silent bad data
    intercept[Exception] {
      spark.read.format("graft").option("generation", 2).load(root)
        .count()
    }
  }

  test("catalog CTAS: writeTo(...).create() routes bucket spec + data") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.graft_ct",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ct.warehouse", wh)
    sampleDf.writeTo("graft_ct.g2.t1")
      .partitionedBy(org.apache.spark.sql.functions.bucket(32, col("id")))
      .create()
    val back = spark.sql("SELECT * FROM graft_ct.g2.t1")
    assert(back.count() == 5)
    val gen = StoreManifest.readLatest(s"$wh/g2/t1").get
    assert(gen.bucketCol == "id" && gen.numBuckets == 32)
  }
}
