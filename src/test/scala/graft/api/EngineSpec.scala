package graft.api

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Engine façade + extension-point coverage: first(), metrics listener,
  * the SQL-registered native cosine_sim, approx_count_distinct bounds,
  * csv/text sources, foreachBatch sink — the §2.2 rows that don't fit
  * the oracle registry.
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  test("Engine.first returns the first matching node in id order") {
    val e = Engine.forDir(spark, sfDir)
    val f = e.first("""get "*" |> filter "name" == "ASIA"""").get
    assert(f.select("id").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("region/2"))
    assert(e.first("""get "*" |> filter "name" == "NO_SUCH"""").isEmpty)
  }

  test("TMD metadata round-trips through the bucketed store") {
    import graft.ingest.NTriplesReader
    // @lang + ^^type value metadata from N-Triples, key metadata from an
    // AHGHEE ^"key" fedge — write the merged graph as a bucketed table
    // (the real ingest path) and read everything back from the store
    val nt = spark.createDataset(Seq(
      "<m/1> <label> \"Bonjour\"@fr .",
      "<m/1> <size> \"7\"^^<http://www.w3.org/2001/XMLSchema#integer> ."))
      .flatMap(l => NTriplesReader.parseLine(l))
    val eng = Engine.forEmpty(spark)
      .load(nt)
      .put("""put "m/2" { ^"m/1": ^"m/3" }""")
    val stored = graft.sources.GraphStore.materialize(
      spark, "graft_test_tmd", "id", eng.nodes)
    val fr = stored.where(col("value_meta.str") === "lang:@fr")
      .select("id", "key", "value.str").collect()
    assert(fr.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      == Seq(("m/1", "label", "Bonjour")))
    val typed = stored.where(col("value_meta.vtype") === graft.model.Value.NODEID)
      .select("value_meta.iri").collect().map(_.getString(0)).toSeq
    assert(typed == Seq("http://www.w3.org/2001/XMLSchema#integer"))
    val kref = stored.where(col("key_meta").isNotNull)
      .select("id", "key", "key_meta.iri", "value.iri").collect()
    assert(kref.map(r => (r.getString(0), r.getString(1), r.getString(2),
      r.getString(3))).toSeq == Seq(("m/2", "^m/1", "m/1", "m/3")))
    spark.sql("DROP TABLE IF EXISTS graft_test_tmd")
  }

  test("typed Dataset[Node] round-trip: put → getNodes → Node equality") {
    import graft.ingest.{Node, NodeAttr, ValueRow}
    val e = Engine.forEmpty(spark)
      .put("""put "n/1" { "b": 2, "a": "x", "e": ^"n/2" } "n/2" { "a": "y" }""")
    val nodes = e.getNodes("""get "n/1" "n/2"""").collect().sortBy(_.id)
    assert(nodes.toSeq == Seq(
      Node("n/1", Seq(
        NodeAttr("a", ValueRow.str("x")),
        NodeAttr("b", ValueRow.i32(2)),
        NodeAttr("e", ValueRow.nodeid("n/2")))),
      Node("n/2", Seq(NodeAttr("a", ValueRow.str("y"))))))
  }

  test("merge algebra: idempotent, commutative, associative on random batches") {
    // the storage contract: fragments may arrive in ANY grouping and
    // order (concurrent appends, retried batches, compaction passes)
    // and the merged graph must be identical. Random attr batches with
    // deliberate overlap (small key space) and conflicting timestamps.
    import org.scalacheck.Gen
    import graft.ingest.{AttrRow, ValueRow}
    val genRow: Gen[AttrRow] = for {
      id <- Gen.choose(1, 5).map(i => s"m/$i")
      key <- Gen.oneOf("a", "b", "c")
      v <- Gen.oneOf(ValueRow.str("x"), ValueRow.str("y"), ValueRow.i32(1))
      ts <- Gen.choose(0L, 3L)
    } yield AttrRow("", id, key, v, ts, None, None)
    def frame(rows: Seq[AttrRow]) = {
      import spark.implicits._
      Engine.withMeta(spark.createDataset(rows).toDF()
        .withColumn("graph", lit(""))
        .select("graph", "id", "key", "value", "ts", "key_meta", "value_meta"))
    }
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val e = Engine.forEmpty(spark)
    val batches = Gen.listOfN(3, Gen.listOfN(15, genRow)).sample.get
      .map(frame)
    val Seq(a, b, c) = batches
    val leftFold = e.merge(e.merge(a, b), c)
    val rightFold = e.merge(a, e.merge(b, c))
    val reversed = e.merge(c, e.merge(b, a))
    assert(canon(leftFold) == canon(rightFold), "merge not associative")
    assert(canon(leftFold) == canon(reversed), "merge not commutative")
    assert(canon(e.merge(leftFold, leftFold)) == canon(leftFold),
      "merge not idempotent")
    // replaying any single batch into the merged whole changes nothing
    assert(canon(e.merge(leftFold, b)) == canon(leftFold),
      "replayed fragment changed the merged graph")
  }

  test("merge keeps metadata in the dedup key but collapses true duplicates") {
    import graft.ingest.NTriplesReader
    val nt = spark.createDataset(Seq(
      "<d/1> <t> \"X\"@en .",
      "<d/1> <t> \"X\"@fr .",
      "<d/1> <t> \"X\"@en .",   // exact duplicate of the first
      "<d/1> <t> \"X\" ."))     // no metadata — distinct from both
      .flatMap(l => NTriplesReader.parseLine(l))
    val n = Engine.forEmpty(spark).load(nt).nodes
    assert(n.count() == 3)
    assert(n.where(col("value_meta").isNull).count() == 1)
  }

  test("metrics listener records completed query executions") {
    val m = Metrics.attach(spark)
    try {
      spark.range(10).count()
      // listener delivery is async; poll briefly
      var snap = m.snapshot()
      val deadline = System.nanoTime() + 10_000_000_000L
      while (snap.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(100); snap = m.snapshot()
      }
      assert(snap.nonEmpty && snap.forall(_.error.isEmpty))
      assert(snap.exists(_.durationNs > 0))
    } finally m.close()
  }

  test("cosine_sim is callable from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c1, " +
      "cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c0").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("cosine_sim expression matches the composed zip_with/aggregate form") {
    val e = graft.Tables(spark, sfDir, "embeddings").limit(50)
      .select(col("vec_id"), graft.llm.VectorOps.toDouble(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("a_id"), col("v").as("av"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("bv"))
    val both = a.crossJoin(b).where(col("a_id") < col("b_id"))
      .select(graft.llm.VectorOps.cosine(col("av"), col("bv")).as("slow"),
        graft.llm.VectorOps.cosineFast(col("av"), col("bv")).as("fast"))
    assert(both.where(col("slow") =!= col("fast")).count() == 0)
  }

  test("jaccard_sorted matches array_intersect/union on random sets") {
    import graft.llm.TextOps
    // random token sets → hashed sorted longs; the native merge-walk
    // must equal the composed built-in formula on every pair
    val docs = graft.Tables(spark, sfDir, "documents").limit(60)
      .select(col("doc_id"),
        array_sort(transform(
          array_distinct(TextOps.tokens(col("text"))),
          t => xxhash64(t))).as("sh"))
      .localCheckpoint()
    val a = docs.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = docs.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val both = a.crossJoin(b).where(col("a_id") < col("b_id"))
      .select(TextOps.jaccard(col("a_sh"), col("b_sh")).as("slow"),
        TextOps.jaccardSorted(col("a_sh"), col("b_sh")).as("fast"))
    assert(both.where(col("slow") =!= col("fast")).count() == 0)
    // SQL registration + empty∪empty = 0.0 (the defined corner)
    val r = spark.sql(
      "SELECT jaccard_sorted(array(1L,2L,3L), array(2L,3L,4L)) AS j, " +
      "jaccard_sorted(array(), array()) AS z").head()
    assert(r.getDouble(0) == 0.5 && r.getDouble(1) == 0.0)
  }

  test("approx_count_distinct within documented relative error") {
    val li = graft.Tables(spark, sfDir, "lineitem")
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.05))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.15,
      s"approx $approx vs exact $exact")
  }

  test("registerViews exposes the graph to spark.sql") {
    Engine.forEmpty(spark)
      .put("""put "v/1" { "name": "Ada", "knows": ^"v/2" } "v/2" { "name": "Bob" }""")
      .registerViews("sqlv")
    val names = spark.sql(
      """SELECT n.value.str AS who FROM sqlv_edges e
        |JOIN sqlv_nodes n ON e.dst_id = n.id AND n.key = 'name'
        |WHERE e.label = 'knows'""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("Bob"))
  }

  test("forDir auto-registers the default SQL views") {
    Engine.forDir(spark, sfDir)
    assert(spark.catalog.tableExists("graft_nodes") &&
      spark.catalog.tableExists("graft_edges"))
    assert(spark.sql("SELECT count(*) FROM graft_nodes").first().getLong(0) > 0)
  }

  test("csv, text, and json sources round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("srcs")
    java.nio.file.Files.writeString(dir.resolve("d.csv"), "a,b\n1,x\n2,y\n")
    val csv = spark.read.option("header", "true").csv(dir.toString + "/d.csv")
    assert(csv.count() == 2 && csv.columns.toSeq == Seq("a", "b"))
    val txt = spark.read.textFile(dir.toString + "/d.csv")
    assert(txt.count() == 3)
    java.nio.file.Files.writeString(dir.resolve("d.jsonl"),
      """{"a":1,"b":"x"}""" + "\n" + """{"a":2,"b":"y"}""" + "\n")
    val js = spark.read.json(dir.toString + "/d.jsonl")
    assert(js.count() == 2 && js.columns.sorted.toSeq == Seq("a", "b"))
    // ORC round-trip (columnar alternative; same DataFrameReader surface)
    val orcPath = dir.resolve("d.orc").toString
    js.write.mode("overwrite").orc(orcPath)
    val orc = spark.read.orc(orcPath)
    assert(orc.count() == 2 &&
      orc.columns.sorted.toSeq == Seq("a", "b"), "orc round-trip")
  }

  test("loadStream: continuous NT put merges each micro-batch into the graph") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_nt_cput")
    // duplicate triple across files: merge-on-write must collapse it
    java.nio.file.Files.writeString(dir.resolve("a.nt"),
      "<s/1> <name> \"a\" .\n<s/1> <tag> \"t\"@en .\n")
    java.nio.file.Files.writeString(dir.resolve("b.nt"),
      "<s/2> <name> \"b\" .\n<s/1> <name> \"a\" .\n")
    val e = Engine.forEmpty(spark)
    val q = e.loadStream(dir.toString, maxFilesPerTrigger = 1)
    q.awaitTermination(60000)
    val rows = e.nodes.select("id", "key").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.length == 3, s"merged rows: ${rows.toSeq}") // dup collapsed
    assert(rows.count(_._1 == "s/1") == 2 && rows.count(_._1 == "s/2") == 1)
    // metadata survived the streaming path into the merged graph
    assert(e.nodes.where(col("value_meta").isNotNull).count() == 1)
  }

  test("foreachBatch sink receives every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    src.addData(1 to 10: _*)
    val seen = new java.util.concurrent.atomic.AtomicLong
    val q = src.toDS().writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[Int], _: Long) =>
        seen.addAndGet(batch.count()): Unit)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(seen.get() == 10)
  }
}
