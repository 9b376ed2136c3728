package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.model.Value

/** The engine's canonical graph representation: one long-form attribute
  * table (SURVEY.md §1.2). Schemaless multimap semantics — a node is the
  * set of rows sharing (graph, id); duplicate keys coexist (multimap);
  * every row carries a write timestamp for temporal views.
  *
  *   nodes_attrs [graph, id, key, value VALUE, ts,
  *                key_meta VALUE, value_meta VALUE]
  *
  * key_meta/value_meta mirror the reference's TMD: every key and value
  * is a (metadata, data) pair (reference: types.proto:55-59). N-Triples
  * `^^<type>` / `@lang` land in value_meta; `^"key"` node-reference keys
  * land in key_meta. The derived relational view carries NULL metadata.
  *
  * Edges are not a separate type: an edge is any attribute whose value is
  * a nodeid (reference: src/core/FileStore.fs:384-388). The `edges` view
  * is just a filter+projection of nodes_attrs, so it inherits pushdown.
  *
  * At 100 TB this table is stored partitioned/bucketed by `id` (murmur3
  * hash — Spark's HashPartitioning — same routing as the reference's
  * GetPartitionFromHash, src/core/Types.fs:23-24), so point lookups prune
  * to one bucket and self-joins for traversal co-locate.
  *
  * Here the view derives from the driver's relational testdata
  * (FIXTURES.md §B1) so graph queries stay DuckDB-checkable:
  *   customer/N --nation-->  nation/N --region--> region/N
  *   orders/N   --customer-> customer/N
  */
object GraphView {

  /** Long-form attribute rows derived from the relational tables.
    * Each branch is a narrow projection of one parquet scan — column
    * pruning reaches the reader; the union is append-only friendly. */
  def nodesAttrs(spark: SparkSession, dir: String): DataFrame = {
    def attr(df: DataFrame, id: Column, key: String, value: Column): DataFrame =
      df.select(
        lit("").as("graph"),
        id.as("id"),
        lit(key).as("key"),
        value.as("value"),
        lit(0L).as("ts"),
        Value.nullValue.as("key_meta"),
        Value.nullValue.as("value_meta"))

    val cust = Tables(spark, dir, "customer")
    val nat = Tables(spark, dir, "nation")
    val ord = Tables(spark, dir, "orders")
    val reg = Tables(spark, dir, "region")

    val custId = concat(lit("customer/"), col("c_custkey"))
    val natId = concat(lit("nation/"), col("n_nationkey"))
    val ordId = concat(lit("orders/"), col("o_orderkey"))
    val regId = concat(lit("region/"), col("r_regionkey"))

    attr(cust, custId, "name", Value.str(col("c_name")))
      .unionAll(attr(cust, custId, "acctbal", Value.d(col("c_acctbal"))))
      .unionAll(attr(cust, custId, "nation",
        Value.nodeid(concat(lit("nation/"), col("c_nationkey")))))
      .unionAll(attr(nat, natId, "name", Value.str(col("n_name"))))
      .unionAll(attr(nat, natId, "region",
        Value.nodeid(concat(lit("region/"), col("n_regionkey")))))
      .unionAll(attr(reg, regId, "name", Value.str(col("r_name"))))
      .unionAll(attr(ord, ordId, "totalprice", Value.d(col("o_totalprice"))))
      .unionAll(attr(ord, ordId, "customer",
        Value.nodeid(concat(lit("customer/"), col("o_custkey")))))
  }

  /** Edge view: attributes whose value is a nodeid —
    * [src_id, label, dst_id, ts]. Semantically identical to
    * `nodesAttrs.where(value.vtype = NODEID)`, but constructed straight
    * from the three edge-bearing scans so the non-edge branches never
    * touch disk (the union-then-filter form still scanned all 8
    * branches; measured 2× on the traversal queries). */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    def e(df: DataFrame, src: Column, label: String, dst: Column): DataFrame =
      df.select(src.as("src_id"), lit(label).as("label"),
        dst.as("dst_id"), lit(0L).as("ts"))

    e(Tables(spark, dir, "customer"),
      concat(lit("customer/"), col("c_custkey")), "nation",
      concat(lit("nation/"), col("c_nationkey")))
      .unionAll(e(Tables(spark, dir, "nation"),
        concat(lit("nation/"), col("n_nationkey")), "region",
        concat(lit("region/"), col("n_regionkey"))))
      .unionAll(e(Tables(spark, dir, "orders"),
        concat(lit("orders/"), col("o_orderkey")), "customer",
        concat(lit("customer/"), col("o_custkey"))))
  }
}
