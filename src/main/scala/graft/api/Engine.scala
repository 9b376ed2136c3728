package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ingest.AhgheePut
import graft.lang.{AhgheeParser, StepCompiler}
import graft.model.Value

/** Driver-side façade — the Spark twin of the reference's storage/query
  * API surface (reference: IStorage in src/core/FileStoreCommon.fs plus
  * the gRPC service types.proto:231-239):
  *
  *   put   ≙ WatDbService.Put   — AHGHEE node literals → attr rows
  *   query ≙ WatDbService.Get   — `get ... |> steps` → attribute rows
  *   nodes ≙ IStorage.Nodes()   — full scan
  *   current/history            — temporal views (Printers.cs:139-152)
  *
  * Streaming a result to a caller (the gRPC stream) is
  * `query(q).toLocalIterator` — pull-based, nothing collects.
  */
final class Engine(val spark: SparkSession, attrs0: DataFrame,
                   edges0: Option[DataFrame] = None) {

  /** Current attribute table (long form, TMD metadata columns added if
    * the caller's frame predates them). */
  @volatile private var attrsDf: DataFrame = Engine.withMeta(attrs0)
  /** Pre-derived edge view; invalidated by mutation. */
  @volatile private var edgesHint: Option[DataFrame] = edges0

  def nodes: DataFrame = attrsDf

  /** Run an AHGHEE `get` query; returns surviving attribute rows. */
  def query(q: String): DataFrame =
    StepCompiler.run(spark, attrsDf, AhgheeParser.parse(q), edgesHint)

  /** Run an AHGHEE `get` query and group the surviving rows into typed
    * Nodes — the reference's return shape (stream of Node messages,
    * types.proto:66-70; node assembly from fragments Tests.fs:354-373).
    * Attrs sort by (key, value) so Node equality is deterministic. */
  def getNodes(q: String): org.apache.spark.sql.Dataset[graft.ingest.Node] = {
    import spark.implicits._
    query(q)
      .groupBy("id")
      .agg(sort_array(collect_list(struct(
        col("key"), col("value"), col("ts"),
        col("key_meta"), col("value_meta")))).as("attrs"))
      .as[graft.ingest.Node]
  }

  /** Execute a whole AHGHEE script — any mix of `put` / `load` / `get`
    * statements in order (reference: AHGHEE.g4:5-9; the CLI REPL's
    * stream, Program.cs:25-228). Mutations apply as they appear; the
    * LAST `get`'s result is returned (empty frame if the script has no
    * get). */
  def run(script: String): DataFrame = {
    var last: Option[DataFrame] = None
    graft.lang.ScriptRunner.parse(script).foreach { st =>
      runStatement(st).foreach(df => last = Some(df))
    }
    last.getOrElse(Engine.emptyAttrs(spark).drop("graph"))
  }

  /** Execute one parsed statement; Some(result) for a `get`. */
  def runStatement(st: graft.lang.ScriptRunner.Statement): Option[DataFrame] = {
    import graft.lang.ScriptRunner._
    st match {
      case PutStmt(text) => put(text); None
      case LoadStmt("graphml", path) =>
        load(graft.ingest.GraphMlReader.read(spark, path)); None
      case LoadStmt(_, path) =>
        load(graft.ingest.NTriplesReader.read(spark, path)); None
      case GetStmt(q) =>
        Some(StepCompiler.run(spark, attrsDf, q, edgesHint))
    }
  }

  /** Ingest AHGHEE `put` literals: append + merge-dedup keeping the
    * first-write timestamp (reference FileStore.fs:82-89 stamps at
    * write; NodeAttrIndex.cs:221 dedups identical attributes). */
  def put(script: String, ts: Long = 0L): Engine = {
    import spark.implicits._
    load(spark.createDataset(AhgheePut.parse(script)), ts)
  }

  /** Ingest pre-parsed attribute rows (the N-Triples / GraphML readers'
    * output) — the `Load` half of the reference service quartet
    * (types.proto:231-239). Metadata rides along: `@lang` / `^^<type>`
    * in value_meta, `^"key"` references in key_meta. */
  def load(rows: org.apache.spark.sql.Dataset[graft.ingest.AttrRow],
           ts: Long = 0L): Engine = {
    val fresh = rows.toDF()
      .select(lit("").as("graph"), col("id"), col("key"),
        col("value").cast(Value.schema).as("value"),
        lit(ts).as("ts"),
        col("key_meta").cast(Value.schema).as("key_meta"),
        col("value_meta").cast(Value.schema).as("value_meta"))
    attrsDf = merge(attrsDf, fresh)
    // sustained ingest (loadStream) would otherwise stack one
    // union+aggregate lineage layer per micro-batch — cut it periodically
    if (loadSeq.incrementAndGet() % 8 == 0)
      attrsDf = attrsDf.localCheckpoint()
    edgesHint = None // graph mutated — derive edges from attrs again
    this
  }

  private val loadSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Continuous put: stream an N-Triples directory into the graph, one
    * merge per micro-batch — the reference's chunked `Load` with
    * backpressure and a progress stream (WatService.cs:241-300;
    * `maxFilesPerTrigger` ≙ the bounded Channel(1000), attach
    * [[graft.ingest.LoadProgress]] for the 1 s ticks). AvailableNow
    * drains everything present, then terminates — callers wanting a
    * forever-tailing load pass a ProcessingTime trigger instead. */
  def loadStream(dir: String, maxFilesPerTrigger: Int = 10,
                 trigger: org.apache.spark.sql.streaming.Trigger =
                   org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.ingest.NTriplesReader
      .stream(spark, dir, maxFilesPerTrigger = maxFilesPerTrigger)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[graft.ingest.AttrRow],
         _: Long) =>
          // materialize INSIDE the micro-batch: the merge consumes the
          // rows lazily, and an unexecuted batch would read its source
          // after the trigger (fine for files, wrong for queues) and
          // report numInputRows=0 to the progress stream
          load(batch.localCheckpoint()); ()
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft_load_ck").toString)
      .trigger(trigger)
      .start()

  /** Merge-on-write dedup: identical (id, key+key_meta, value+value_meta)
    * keeps min ts. Metadata is part of the dedup key — the reference
    * compares whole TMD pairs (NodeAttrIndex.cs:221), so `"x"@en` and
    * `"x"@fr` are distinct attributes. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    Engine.withMeta(a).unionByName(Engine.withMeta(b))
      .groupBy("graph", "id", "key", "key_meta", "value", "value_meta")
      .agg(min("ts").as("ts"))

  /** Register the graph as SQL temp views (`graft_nodes` long-form
    * attrs, `graft_edges`) so `spark.sql("SELECT ...")` composes with
    * the full relational surface over the same data. Re-call after
    * mutations to refresh the snapshot the views capture. */
  def registerViews(prefix: String = "graft"): Engine = {
    attrsDf.createOrReplaceTempView(s"${prefix}_nodes")
    edgesView.createOrReplaceTempView(s"${prefix}_edges")
    this
  }

  private def edgesView: DataFrame = edgesHint.getOrElse(
    attrsDf.where(col("value.vtype") === Value.NODEID)
      .select(col("id").as("src_id"), col("key").as("label"),
        col("value.iri").as("dst_id")))

  /** Graph statistics in one aggregate pass — the reference's
    * GetStats/ListStats surface (types.proto:231-239;
    * FileStore.fs:415-485 serializes its registry the same way):
    * long-form [stat, value] rows for attrs / nodes / keys / edges. */
  def stats: DataFrame = {
    attrsDf.agg(
      count(lit(1)).as("attrs"),
      countDistinct(col("id")).as("nodes"),
      countDistinct(col("key")).as("keys"),
      sum(when(col("value.vtype") === Value.NODEID, 1L).otherwise(0L))
        .as("edges"))
      .select(explode(map(
        lit("attrs"), col("attrs"),
        lit("edges"), coalesce(col("edges"), lit(0L)),
        lit("keys"), col("keys"),
        lit("nodes"), col("nodes"))).as(Seq("stat", "value")))
  }

  /** Latest value per (id, key) — the printer's "current" view. */
  def current: DataFrame = {
    val w = Window.partitionBy("id", "key")
      .orderBy(col("ts").desc, Value.sortKey(col("value")).desc)
    attrsDf.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
  }

  /** All versions ordered by write time — the "history" view. */
  def history: DataFrame = attrsDf.orderBy("id", "key", "ts")

  /** First node matching a query (reference First,
    * MemoryStore.fs:38-43): the id of the first surviving node in id
    * order plus its attributes. */
  def first(q: String): Option[DataFrame] = {
    val res = query(q)
    // materialize ONLY the winning id (limit-pushdown keeps this job
    // cheap), then semi-join: the attribute query runs once when the
    // caller acts, instead of an eager collect + a from-scratch re-run
    val firstId = res.select("id").orderBy("id").limit(1).localCheckpoint()
    if (firstId.isEmpty) None
    else Some(res.join(broadcast(firstId), Seq("id"), "left_semi"))
  }

  /** Export a query's surviving subgraph as N-Triples text files —
    * the write half of `load` (default: the whole graph). */
  def export(path: String, q: String = """get "*""""): Engine = {
    graft.ingest.NTriplesWriter.write(query(q), path)
    this
  }

  /** Delete nodes by id (reference Remove, MemoryStore.fs:18-22). */
  def remove(ids: Seq[String]): Engine = {
    import spark.implicits._
    attrsDf = attrsDf.join(ids.toDF("id"), Seq("id"), "left_anti")
    edgesHint = None
    this
  }
}

object Engine {
  /** Engine over the bucketed graph store of a testdata dir: point
    * lookups and traversal hops filter a literal id column (pushdown +
    * bucket pruning), and id-joins co-locate on the bucket hash.
    * Registers the `graft_nodes`/`graft_edges` SQL views so
    * `spark.sql` composes with the relational surface immediately
    * (latest forDir wins the names; call registerViews(prefix) for
    * several engines side by side). */
  def forDir(spark: SparkSession, dir: String): Engine =
    new Engine(spark, graft.sources.GraphStore.nodesAttrs(spark, dir),
      Some(graft.sources.GraphStore.edges(spark, dir)
        .select("src_id", "label", "dst_id")))
      .registerViews()

  /** Engine over an empty graph — populated purely by put/load. */
  def forEmpty(spark: SparkSession): Engine =
    new Engine(spark, emptyAttrs(spark))

  /** Full nodes_attrs schema including the TMD metadata columns. */
  val attrsSchema: StructType = StructType(Seq(
    StructField("graph", StringType),
    StructField("id", StringType),
    StructField("key", StringType),
    StructField("value", Value.schema),
    StructField("ts", LongType),
    StructField("key_meta", Value.schema),
    StructField("value_meta", Value.schema)))

  /** An empty attribute table — the seed for an Engine populated purely
    * by put/load. */
  def emptyAttrs(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      attrsSchema)

  /** Add NULL TMD metadata columns to a pre-metadata attribute frame so
    * old and new schemas merge byName. */
  def withMeta(df: DataFrame): DataFrame = {
    var out = df
    if (!out.columns.contains("key_meta"))
      out = out.withColumn("key_meta", Value.nullValue)
    if (!out.columns.contains("value_meta"))
      out = out.withColumn("value_meta", Value.nullValue)
    out
  }
}
