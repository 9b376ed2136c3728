package graft.sources.v2

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference, Transform}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A V2 catalog exposing graft stores as SQL-addressable tables —
  * `SELECT * FROM graft_cat.ns.tbl [VERSION AS OF n]` — closing the
  * "SQL user cannot reach the store without the Scala API" seam.
  *
  * Register: `spark.conf.set("spark.sql.catalog.graft_cat",
  * "graft.sources.v2.GraftCatalog")` +
  * `spark.sql.catalog.graft_cat.warehouse = <dir>` (catalogs load
  * lazily, so setting the conf mid-session works). Each table lives at
  * `<warehouse>/<namespace>/<name>` in the [[StoreManifest]] layout.
  *
  * Also a [[FunctionCatalog]]: it serves the `bucket` transform the
  * scans report, which is what lets the planner reason about
  * [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
  * compatibility and run storage-partitioned joins with no Exchange
  * (the function body is [[GraftTable.bucketOf]] — identical murmur3
  * routing to the files on disk).
  *
  * Time travel: `VERSION AS OF <gen>` pins a committed generation;
  * `TIMESTAMP AS OF <ts>` resolves the last generation committed at
  * or before it.
  */
class GraftCatalog extends TableCatalog with FunctionCatalog
  with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = GraftTable.norm(Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse is required")))
  }

  override def name(): String = catalogName

  private def tableDir(ident: Identifier): String =
    (ident.namespace() :+ ident.name())
      .foldLeft(warehouse)((p, seg) => s"$p/$seg")

  // ------------------------------------------------------------ tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new File(namespace.foldLeft(warehouse)((p, s) => s"$p/$s"))
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && StoreManifest.latest(f.getPath).nonEmpty)
      .map(f => Identifier.of(namespace, f.getName)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (StoreManifest.latest(dir).isEmpty) throw new NoSuchTableException(ident)
    new GraftTable(dir, None, None)
  }

  /** VERSION AS OF <generation>. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (StoreManifest.latest(dir).isEmpty) throw new NoSuchTableException(ident)
    new GraftTable(dir, Some(version.toLong), None)
  }

  /** TIMESTAMP AS OF — Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = tableDir(ident)
    if (StoreManifest.latest(dir).isEmpty) throw new NoSuchTableException(ident)
    new GraftTable(dir, None, Some(timestampMicros / 1000L))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    // bucket spec from the declared partitioning (partitionedBy(
    // bucket(n, col))) or properties; default 32 x "id"
    val spec = partitions.collectFirst {
      case t if t.name() == "bucket" =>
        val n = t.arguments().collectFirst {
          case l: Literal[_] => l.value().toString.toInt }.getOrElse(32)
        val c = t.arguments().collectFirst {
          case r: NamedReference => r.fieldNames().mkString(".") }
        (n, c.getOrElse("id"))
    }
    val numBuckets = spec.map(_._1)
      .orElse(Option(properties.get("numBuckets")).map(_.toInt))
      .getOrElse(32)
    val bucketCol = spec.map(_._2)
      .orElse(Option(properties.get("bucketCol")))
      .getOrElse("id")
    GraftTable.create(tableDir(ident), schema, bucketCol, numBuckets)
    new GraftTable(tableDir(ident), None, None)
  }

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft: ALTER not supported")

  override def dropTable(ident: Identifier): Boolean = {
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    val d = new File(tableDir(ident))
    val existed = d.exists()
    rm(d)
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft: RENAME not supported")

  // -------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] =
    Option(new File(warehouse).listFiles()).toSeq.flatten
      .filter(_.isDirectory).map(f => Array(f.getName)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean = true

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] =
    if (namespaceExists(namespace)) java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(
      namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    new File(namespace.foldLeft(warehouse)((p, s) => s"$p/$s")).mkdirs(): Unit
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft: namespace alter")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = false

  // --------------------------------------------------------- functions

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) GraftBucketFunction
    else throw new NoSuchFunctionException(ident)
}

/** The `bucket(numBuckets, key)` V2 function — the transform the graft
  * scans report as their partitioning. Serving it from the catalog is
  * what allows Spark to bind the two sides of a storage-partitioned
  * join to the same canonical function and elide the Exchange. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, key): murmur3(seed 42) pmod numBuckets — " +
      "Spark HashPartitioning routing"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket expects (numBuckets, key), got ${inputType.catalogString}")
    new GraftBucketBound(inputType.fields(1).dataType)
  }
}

class GraftBucketBound(keyType: DataType)
  extends ScalarFunction[java.lang.Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): java.lang.Integer = {
    val n = input.getInt(0)
    val key: Any = keyType match {
      case StringType => input.getUTF8String(1)
      case LongType => input.getLong(1)
      case IntegerType => input.getInt(1)
      case other => throw new IllegalArgumentException(s"bucket($other)")
    }
    Int.box(GraftTable.bucketOf(key, n))
  }
}
