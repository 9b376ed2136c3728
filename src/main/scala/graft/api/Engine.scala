package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  /** Current attribute table (long form). */
  @volatile private var attrsDf: DataFrame = attrs0
  /** Pre-derived edge view; invalidated by mutation. */
  @volatile private var edgesHint: Option[DataFrame] = edges0

  def nodes: DataFrame = attrsDf

  /** Run an AHGHEE `get` query; returns surviving attribute rows. */
  def query(q: String): DataFrame =
    StepCompiler.run(spark, attrsDf, AhgheeParser.parse(q), edgesHint)

  /** Ingest AHGHEE `put` literals: append + merge-dedup keeping the
    * first-write timestamp (reference FileStore.fs:82-89 stamps at
    * write; NodeAttrIndex.cs:221 dedups identical attributes). */
  def put(script: String, ts: Long = 0L): Engine = {
    import spark.implicits._
    val fresh = AhgheePut.parse(script)
      .map(r => (r.graph, r.id, r.key, r.value, ts))
      .toDF("graph", "id", "key", "value_row", "ts")
      .select(lit("").as("graph"), col("id"), col("key"),
        rowToValue(col("value_row")).as("value"), col("ts"))
    attrsDf = merge(attrsDf.select("graph", "id", "key", "value", "ts"),
      fresh)
    edgesHint = None // graph mutated — derive edges from attrs again
    this
  }

  private def rowToValue(c: org.apache.spark.sql.Column) =
    struct(c.getField("vtype").as("vtype"), c.getField("str").as("str"),
      c.getField("i64").as("i64"), c.getField("num").as("num"),
      c.getField("b").as("b"), c.getField("iri").as("iri"),
      c.getField("type_iri").as("type_iri"), c.getField("bytes").as("bytes"))

  /** Merge-on-write dedup: identical (id,key,value) keeps min ts. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("graph", "id", "key", "value")
      .agg(min("ts").as("ts"))

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
    res.select("id").orderBy("id").limit(1).collect().headOption
      .map(r => res.where(col("id") === r.getString(0)))
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
    * bucket pruning), and id-joins co-locate on the bucket hash. */
  def forDir(spark: SparkSession, dir: String): Engine =
    new Engine(spark, graft.sources.GraphStore.nodesAttrs(spark, dir),
      Some(graft.sources.GraphStore.edges(spark, dir)
        .select("src_id", "label", "dst_id")))
}
