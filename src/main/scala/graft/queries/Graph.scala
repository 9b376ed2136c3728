package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.Traversal
import graft.sources.GraphStore
import graft.model.Value

/** Graph-operator surface (SURVEY.md §2.1 #1-#13, §2.3 G1-G4) on the
  * long-form nodes_attrs view (GraphView) derived from the relational
  * testdata, so every query stays DuckDB-oracle-checkable.
  *
  * Reference semantics covered here:
  *  - point lookup / get             (FileStore.fs:281-298)      g01
  *  - filter-exists as semi-join     (FileStore.fs:94-101)       g02
  *  - follow (1-hop / bounded any)   (FileStore.fs:166-220)      g03,g04
  *  - fields/clude projection        (FileStore.fs:103-138)      g05
  *  - skip/limit paging              (FileStore.fs:271-278)      g06
  *  - temporal current-view          (Printers.cs:144-152)       g07
  *  - put-merge dedup                (NodeAttrIndex.cs:183-232)  g08
  *  - remove (anti-join)             (MemoryStore.fs:18-22)      g09
  *  - temporal history-view          (Printers.cs:139-143)       g10
  *  - first(predicate)               (MemoryStore.fs:38-43)      g11
  */
object Graph {

  val registry: Seq[RegQuery] = Seq(

    // ---- g01: point get + projection (ref #2, #6) ----------------------
    RegQuery("g01_point_get",
      (s, d) => GraphStore.nodesAttrs(s, d)
        .where(col("id") === "customer/1")
        .select(col("id"), col("key").as("attr_key"),
          col("value.str").as("value_str"),
          col("value.num").as("value_num"),
          col("value.iri").as("value_iri"))
        .orderBy("attr_key"),
      Some("""SELECT * FROM (
             |SELECT 'customer/1' AS id, 'acctbal' AS attr_key,
             |  CAST(NULL AS VARCHAR) AS value_str, c_acctbal AS value_num,
             |  CAST(NULL AS VARCHAR) AS value_iri
             |  FROM customer WHERE c_custkey = 1
             |UNION ALL
             |SELECT 'customer/1', 'name', c_name, NULL, NULL
             |  FROM customer WHERE c_custkey = 1
             |UNION ALL
             |SELECT 'customer/1', 'nation', NULL, NULL, 'nation/' || c_nationkey
             |  FROM customer WHERE c_custkey = 1
             |) ORDER BY attr_key""".stripMargin)),

    // ---- g02: filter == on attribute value (ref #5, semi-join form) ----
    RegQuery("g02_filter_exists",
      (s, d) => GraphStore.nodesAttrs(s, d)
        .where(col("key") === "nation" &&
               col("value.vtype") === Value.NODEID &&
               col("value.iri") === "nation/1")
        .select("id").distinct()
        .orderBy("id"),
      Some("""SELECT 'customer/' || c_custkey AS id FROM customer
             |WHERE c_nationkey = 1 ORDER BY id""".stripMargin)),

    // ---- g03: 1-hop labeled follow (ref #9) -----------------------------
    RegQuery("g03_follow_1hop",
      (s, d) => {
        import s.implicits._
        Traversal.follow(s, GraphStore.edges(s, d),
            Seq("customer/1").toDF("id"), Some("nation"), 0, 1)
          .select("id").orderBy("id")
      },
      Some("""SELECT id FROM (
             |SELECT 'customer/1' AS id
             |UNION SELECT 'nation/' || c_nationkey FROM customer WHERE c_custkey = 1
             |) ORDER BY id""".stripMargin)),

    // ---- g04: bounded follow-any with visited dedup (ref #9, Tests.fs:882-900)
    RegQuery("g04_follow_bounded",
      (s, d) => {
        import s.implicits._
        Traversal.follow(s, GraphStore.edges(s, d),
            Seq("customer/1").toDF("id"), None, 0, 2)
          .select("id").orderBy("id")
      },
      Some("""SELECT id FROM (
             |SELECT 'customer/1' AS id
             |UNION SELECT 'nation/' || c_nationkey FROM customer WHERE c_custkey = 1
             |UNION SELECT 'region/' || n_regionkey FROM nation
             |  JOIN customer ON n_nationkey = c_nationkey WHERE c_custkey = 1
             |) ORDER BY id""".stripMargin)),

    // ---- g05: fields/clude projection — include edges only (ref #6, `^`)
    RegQuery("g05_fields_edges",
      (s, d) => GraphStore.nodesAttrs(s, d)
        .where(col("id") === "customer/1" &&
               col("value.vtype") === Value.NODEID)
        .select(col("id"), col("key").as("attr_key"),
          col("value.iri").as("value_iri"))
        .orderBy("attr_key"),
      Some("""SELECT 'customer/1' AS id, 'nation' AS attr_key,
             |'nation/' || c_nationkey AS value_iri
             |FROM customer WHERE c_custkey = 1""".stripMargin)),

    // ---- g06: deterministic paging (ref #7, #8; SURVEY §7.3 risk 2) ----
    RegQuery("g06_paging",
      (s, d) => GraphStore.nodesAttrs(s, d)
        .select("id").distinct()
        .orderBy("id")
        .offset(5).limit(10),
      Some("""SELECT DISTINCT id FROM (
             |SELECT 'customer/' || c_custkey AS id FROM customer
             |UNION ALL SELECT 'nation/' || n_nationkey FROM nation
             |UNION ALL SELECT 'region/' || r_regionkey FROM region
             |UNION ALL SELECT 'orders/' || o_orderkey FROM orders
             |) ORDER BY id LIMIT 10 OFFSET 5""".stripMargin)),

    // ---- g07: temporal current-view = latest value per (id,key) (ref #18)
    RegQuery("g07_temporal_current",
      (s, d) => {
        val versioned = Tables(s, d, "orders").select(
          concat(lit("customer/"), col("o_custkey")).as("id"),
          lit("last_total").as("key"),
          col("o_totalprice").as("num"),
          unix_timestamp(col("o_orderdate")).as("ts"))
        val w = Window.partitionBy("id", "key")
          .orderBy(col("ts").desc, col("num").desc)
        versioned.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("id"), col("num").as("latest_total"))
          .orderBy("id")
      },
      Some("""SELECT id, latest_total FROM (
             |SELECT 'customer/' || o_custkey AS id, o_totalprice AS latest_total,
             |ROW_NUMBER() OVER (PARTITION BY o_custkey
             |  ORDER BY o_orderdate DESC, o_totalprice DESC) AS rn
             |FROM orders) WHERE rn = 1 ORDER BY id""".stripMargin)),

    // ---- g08: put-merge dedup — repeated writes collapse, first-write ts
    // wins (ref #1, #11: NodeAttrIndex.cs Distinct + FileStore.fs:82-89) --
    RegQuery("g08_merge_dedup",
      (s, d) => {
        // each attribute "written twice" at ts and ts+1000 — via explode
        // over ONE scan, not a self-union: unioning two scans of the same
        // bucketed table and aggregating on keys ⊇ the bucket key hits a
        // Spark 4.1.2 planner fault (no exchange inserted; see
        // GraphStoreSpec "self-union" regression), and single-scan
        // explode is the better plan regardless
        val a = GraphStore.nodesAttrs(s, d)
        a.select(col("graph"), col("id"), col("key"), col("value"),
            explode(array(col("ts"), col("ts") + 1000L)).as("ts"))
          .groupBy("graph", "id", "key", "value").agg(min("ts").as("ts"))
          .groupBy(col("key").as("attr_key"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy("attr_key")
      },
      Some("""SELECT attr_key, cnt FROM (
             |SELECT 'acctbal' AS attr_key, (SELECT count(*) FROM customer) AS cnt
             |UNION ALL SELECT 'customer', (SELECT count(*) FROM orders)
             |UNION ALL SELECT 'name', (SELECT count(*) FROM customer)
             |  + (SELECT count(*) FROM nation) + (SELECT count(*) FROM region)
             |UNION ALL SELECT 'nation', (SELECT count(*) FROM customer)
             |UNION ALL SELECT 'region', (SELECT count(*) FROM nation)
             |UNION ALL SELECT 'totalprice', (SELECT count(*) FROM orders)
             |) ORDER BY attr_key""".stripMargin)),

    // ---- g09: remove nodes by id (ref #12: anti-join) -------------------
    RegQuery("g09_remove",
      (s, d) => {
        val attrs = GraphStore.nodesAttrs(s, d)
        val toRemove = attrs.where(col("id").startsWith("nation/"))
          .select("id").distinct()
        attrs.join(toRemove, Seq("id"), "left_anti")
          .withColumn("kind", split(col("id"), "/").getItem(0))
          .groupBy("kind").agg(countDistinct(col("id")).as("cnt"))
          .orderBy("kind")
      },
      Some("""SELECT kind, cnt FROM (
             |SELECT 'customer' AS kind, count(*) AS cnt FROM customer
             |UNION ALL SELECT 'orders', count(*) FROM orders
             |UNION ALL SELECT 'region', count(*) FROM region
             |) ORDER BY kind""".stripMargin)),

    // ---- g10: temporal history-view — every version ordered by ts
    // (ref #18: Printers.cs history mode keeps all versions; ordering is
    // (ts, key, value) per MemoryPointer.partial.cs:32-43) ---------------
    RegQuery("g10_temporal_history",
      (s, d) => Tables(s, d, "orders")
        .where(col("o_custkey") <= 5)
        .select(
          concat(lit("customer/"), col("o_custkey")).as("id"),
          lit("last_total").as("attr_key"),
          col("o_totalprice").as("num"),
          unix_timestamp(col("o_orderdate")).as("ts"))
        .withColumn("version", row_number().over(
          Window.partitionBy("id", "attr_key")
            .orderBy(col("ts"), col("num"))))
        .orderBy("id", "version"),
      Some("""SELECT 'customer/' || o_custkey AS id, 'last_total' AS attr_key,
             |o_totalprice AS num, epoch(o_orderdate)::BIGINT AS ts,
             |ROW_NUMBER() OVER (PARTITION BY o_custkey
             |  ORDER BY epoch(o_orderdate), o_totalprice) AS version
             |FROM orders WHERE o_custkey <= 5
             |ORDER BY id, version""".stripMargin)),

    // ---- g11: first(predicate) — first matching node on the id-ordered
    // stream (ref #13: MemoryStore.fs:38-43; order defined per SURVEY
    // §7.3 risk 2 — reference storage order is arbitrary, ours is id) ----
    RegQuery("g11_first",
      (s, d) => GraphStore.nodesAttrs(s, d)
        .where(col("key") === "acctbal" && col("value.num") > 9000.0)
        .select("id")
        .orderBy("id")
        .limit(1),
      Some("""SELECT 'customer/' || c_custkey AS id FROM customer
             |WHERE c_acctbal > 9000 ORDER BY id LIMIT 1""".stripMargin)),

    // ---- g12: grouped Node view — long form → one row per node with its
    // attribute multiset (SURVEY §1.2 "grouped view": groupBy(id) +
    // collect_list; ref Node = id + repeated KeyValue, types.proto:66-70).
    // sort_array makes the collected multiset deterministic; collect_set
    // dedups repeated keys (multimap → distinct key count) -------------
    RegQuery("g12_grouped_nodes",
      (s, d) => GraphStore.nodesAttrs(s, d)
        .where(col("id").startsWith("nation/") ||
               col("id").startsWith("region/"))
        .groupBy("id")
        .agg(
          concat_ws(",", sort_array(collect_list(col("key")))).as("keys"),
          size(collect_set(col("key"))).as("n_distinct_keys"))
        .orderBy("id"),
      Some("""SELECT id, keys, n_distinct_keys FROM (
             |SELECT 'nation/' || n_nationkey AS id, 'name,region' AS keys,
             |       2 AS n_distinct_keys FROM nation
             |UNION ALL
             |SELECT 'region/' || r_regionkey, 'name', 1 FROM region
             |) ORDER BY id""".stripMargin)),

    // ---- g13: TMD value metadata through ingest + merge (ref
    // types.proto:55-59: every key/value is a (metadata, data) pair;
    // lang/type mapping ContextExtensions.cs:70-102). N-Triples `@lang`
    // and `^^<type>` annotations survive the Engine's merge-dedup, and
    // metadata is PART of the dedup key: "X"@en / "X"@fr stay distinct
    // rows while a repeated "X"@en collapses -------------------------
    RegQuery("g13_value_meta",
      (s, d) => {
        import s.implicits._
        val nt = Seq(
          "<doc/1> <title> \"Hello\"@en .",
          "<doc/1> <title> \"Bonjour\"@fr .",
          "<doc/2> <title> \"Hi there\"@en .",
          "<doc/2> <size> \"42\"^^<http://www.w3.org/2001/XMLSchema#integer> .",
          "<doc/3> <title> \"Plain, no metadata\" .",
          "<doc/4> <title> \"X\"@en .",
          "<doc/4> <title> \"X\"@fr .",
          "<doc/4> <title> \"X\"@en .")
        val rows = s.createDataset(nt)
          .flatMap(l => graft.ingest.NTriplesReader.parseLine(l))
        graft.api.Engine
          .forEmpty(s).load(rows)
          .nodes
          .where(col("value_meta").isNotNull)
          .select(col("id"), col("key").as("attr_key"),
            col("value.str").as("value_str"),
            when(col("value_meta.vtype") === Value.NODEID, lit("type"))
              .otherwise(lit("lang")).as("meta_kind"),
            coalesce(col("value_meta.iri"), col("value_meta.str"))
              .as("meta_val"))
          .orderBy("id", "attr_key", "value_str", "meta_val")
      },
      Some("""SELECT * FROM (VALUES
             |('doc/1','title','Bonjour','lang','lang:@fr'),
             |('doc/1','title','Hello','lang','lang:@en'),
             |('doc/2','size','42','type','http://www.w3.org/2001/XMLSchema#integer'),
             |('doc/2','title','Hi there','lang','lang:@en'),
             |('doc/4','title','X','lang','lang:@en'),
             |('doc/4','title','X','lang','lang:@fr')
             |) AS t(id, attr_key, value_str, meta_kind, meta_val)
             |ORDER BY id, attr_key, value_str, meta_val""".stripMargin)),

    // ---- g14: graph statistics (ref GetStats/ListStats,
    // types.proto:231-239) — one aggregate pass over the store ---------
    RegQuery("g14_stats",
      (s, d) => graft.api.Engine.forDir(s, d).stats.orderBy("stat"),
      Some("""SELECT stat, value FROM (
             |SELECT 'attrs' AS stat,
             |  3*(SELECT count(*) FROM customer) + 2*(SELECT count(*) FROM nation)
             |  + (SELECT count(*) FROM region) + 2*(SELECT count(*) FROM orders)
             |  AS value
             |UNION ALL SELECT 'edges',
             |  (SELECT count(*) FROM customer) + (SELECT count(*) FROM nation)
             |  + (SELECT count(*) FROM orders)
             |UNION ALL SELECT 'keys', 6
             |UNION ALL SELECT 'nodes',
             |  (SELECT count(*) FROM customer) + (SELECT count(*) FROM nation)
             |  + (SELECT count(*) FROM region) + (SELECT count(*) FROM orders)
             |) ORDER BY stat""".stripMargin)),

    // ---- g15: DataSource V2 point get (the storage seam, first-class) --
    // g01 re-run through the `graft` CONNECTOR instead of the catalog
    // bucketed table: the store is a path-managed generation log
    // (sources/v2) a SQL-text user can address directly. The scan
    // prunes to 1-of-32 buckets from the manifest AND pushes id= into
    // the parquet row groups (GraftDsv2Spec pins both in the plan);
    // the oracle is g01's VERBATIM — the provider must lose nothing.
    RegQuery("g15_dsv2_point_get",
      (s, d) => {
        val root = Scratch.path(s, "dsv2_attrs", d)
        Scratch.clear(s, root)
        val attrs = graft.graph.GraphView.nodesAttrs(s, d)
        graft.sources.v2.GraftTable.create(root, attrs.schema, "id")
        attrs.write.format("graft").mode("append").save(root)
        s.read.format("graft").load(root)
          .where(col("id") === "customer/1")
          .select(col("id"), col("key").as("attr_key"),
            col("value.str").as("value_str"),
            col("value.num").as("value_num"),
            col("value.iri").as("value_iri"))
          .orderBy("attr_key")
      },
      Some("""SELECT * FROM (
             |SELECT 'customer/1' AS id, 'acctbal' AS attr_key,
             |  CAST(NULL AS VARCHAR) AS value_str, c_acctbal AS value_num,
             |  CAST(NULL AS VARCHAR) AS value_iri
             |  FROM customer WHERE c_custkey = 1
             |UNION ALL
             |SELECT 'customer/1', 'name', c_name, NULL, NULL
             |  FROM customer WHERE c_custkey = 1
             |UNION ALL
             |SELECT 'customer/1', 'nation', NULL, NULL, 'nation/' || c_nationkey
             |  FROM customer WHERE c_custkey = 1
             |) ORDER BY attr_key""".stripMargin)),

    // ---- g16: storage-partitioned join over two graft V2 tables --------
    // The q61 discipline carried through the connector: both stores
    // are murmur3-bucketed 32 ways on the join key, their scans report
    // KeyGroupedPartitioning(bucket(32, id)), and the GraftCatalog
    // serves the bucket function — so the fact-to-dim join plans with
    // ZERO Exchange under storage-partitioned-join rules, in PURE SQL
    // text against catalog-addressed tables (GraftDsv2Spec pins the
    // Exchange-free plan; the oracle joins the raw parquet, proving
    // the V2 write+read round-trips every row).
    RegQuery("g16_dsv2_spj_join",
      (s, d) => {
        val (cat, wh) = dsv2Catalog(s)
        val tag = d.replaceAll("[^0-9a-zA-Z]", "_")
        val nRoot = s"$wh/g/nodes_$tag"; val eRoot = s"$wh/g/edges_$tag"
        Scratch.clear(s, nRoot, eRoot)
        val nodes = Tables(s, d, "customer").select(
          concat(lit("customer/"), col("c_custkey")).as("id"),
          concat(lit("nation/"), col("c_nationkey")).as("nation"))
        val edges = Tables(s, d, "orders").select(
          concat(lit("customer/"), col("o_custkey")).as("id"),
          expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
            .as("total_cents"))
        graft.sources.v2.GraftTable.create(nRoot, nodes.schema, "id")
        graft.sources.v2.GraftTable.create(eRoot, edges.schema, "id")
        nodes.write.format("graft").mode("append").save(nRoot)
        edges.write.format("graft").mode("append").save(eRoot)
        val confs = Seq(
          "spark.sql.sources.v2.bucketing.enabled" -> "true",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
        val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        try s.sql(
          s"""SELECT n.nation, count(*) AS n_orders,
             |  sum(e.total_cents) AS sum_cents
             |FROM $cat.g.edges_$tag e JOIN $cat.g.nodes_$tag n
             |  ON e.id = n.id
             |GROUP BY n.nation ORDER BY n.nation""".stripMargin)
          // materialize while the SPJ confs are in force
          .localCheckpoint()
        finally saved.foreach { case (k, vOpt) =>
          vOpt.fold(s.conf.unset(k))(s.conf.set(k, _)) }
      },
      Some("""SELECT 'nation/' || c_nationkey AS nation,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |    AS BIGINT) AS sum_cents
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY nation""".stripMargin)),

    // ---- g17: generation time travel (read the PRE-compaction past) ----
    // The store's whole history is addressable: three committed
    // generations (names@ts1, renames+orders@ts2, then a last-write-
    // wins COMPACTION that rewrites the live set), and the engine
    // reads `VERSION AS OF 2` — the snapshot BEFORE compaction — in
    // pure SQL text AFTER the compaction committed. The oracle
    // reconstructs epochs 1+2 from the raw parquet, so the hash proves
    // compaction never rewrites history (manifests are append-only;
    // GraftDsv2Spec pins byte-stability of every prior generation).
    RegQuery("g17_dsv2_time_travel",
      (s, d) => {
        val (cat, wh) = dsv2Catalog(s)
        val tag = d.replaceAll("[^0-9a-zA-Z]", "_")
        val root = s"$wh/g/hist_$tag"
        Scratch.clear(s, root)
        buildHistoryStore(s, d, root)
        s.sql(
          s"""SELECT id, attr_key, value, ts
             |FROM $cat.g.hist_$tag VERSION AS OF 2
             |ORDER BY id, attr_key, ts""".stripMargin)
      },
      Some(historyEpoch12Oracle)),

    // ---- g18: compaction = merge-on-read made durable -------------------
    // The same three-generation store, reading the LIVE table after
    // the compaction commit: last-write-wins per (id, attr_key) — the
    // Engine.merge contract applied at rewrite time (the reference
    // checkpoints FASTER stores for the same reason,
    // NodeAttrIndex.cs:74,115-121). The oracle recomputes the merged
    // view from raw parquet: compaction must equal merge-on-read.
    RegQuery("g18_dsv2_compact_merge",
      (s, d) => {
        val (cat, wh) = dsv2Catalog(s)
        val tag = d.replaceAll("[^0-9a-zA-Z]", "_")
        val root = s"$wh/g/merged_$tag"
        Scratch.clear(s, root)
        buildHistoryStore(s, d, root)
        s.sql(
          s"""SELECT id, attr_key, value, ts
             |FROM $cat.g.merged_$tag
             |ORDER BY id, attr_key""".stripMargin)
      },
      Some("""SELECT * FROM (
             |SELECT 'customer/' || c_custkey AS id, 'name' AS attr_key,
             |  upper(c_name) AS value, CAST(2 AS BIGINT) AS ts
             |FROM customer WHERE c_custkey <= 200
             |UNION ALL
             |SELECT 'orders/' || o_orderkey, 'total',
             |  CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |    AS VARCHAR), CAST(2 AS BIGINT)
             |FROM orders WHERE o_orderkey <= 400
             |) ORDER BY id, attr_key""".stripMargin)),

    // ---- g19: footer-only aggregates over the V2 store ------------------
    // The metadata-scan discipline at 100 TB: an unfiltered COUNT /
    // COUNT(col) / integral MIN / MAX over a graft table is answered
    // ENTIRELY from parquet footers (complete aggregate pushdown —
    // GraftDsv2Spec pins zero data files opened and the fallback
    // cases); the oracle recomputes from raw rows, so the hash proves
    // the footer arithmetic — row counts, null counts, bound folds
    // across generations — is exact, not approximate.
    RegQuery("g19_dsv2_footer_agg",
      (s, d) => {
        val root = Scratch.path(s, "dsv2_fagg", d)
        Scratch.clear(s, root)
        val rows = Tables(s, d, "orders").select(
          concat(lit("orders/"), col("o_orderkey")).as("id"),
          col("o_orderkey").cast("long").as("okey"),
          expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
            .as("total_cents"),
          // a nullable column exercises the null-count path
          when(col("o_orderkey") % 5 === 0, col("o_custkey"))
            .cast("long").as("maybe_cust"))
        graft.sources.v2.GraftTable.create(root, rows.schema, "id")
        // two generations: the footer fold must span the commit log
        rows.where(col("okey") % 2 === 0)
          .write.format("graft").mode("append").save(root)
        rows.where(col("okey") % 2 =!= 0)
          .write.format("graft").mode("append").save(root)
        s.read.format("graft").load(root)
          .agg(count(lit(1)).as("n"), min("okey").as("min_okey"),
            max("okey").as("max_okey"),
            min("total_cents").as("min_cents"),
            max("total_cents").as("max_cents"),
            count(col("maybe_cust")).as("n_cust"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(min(o_orderkey) AS BIGINT) AS min_okey,
             |  CAST(max(o_orderkey) AS BIGINT) AS max_okey,
             |  CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |    AS BIGINT) AS min_cents,
             |  CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |    AS BIGINT) AS max_cents,
             |  CAST(count(CASE WHEN o_orderkey % 5 = 0 THEN o_custkey END)
             |    AS BIGINT) AS n_cust
             |FROM orders""".stripMargin))
  )

  /** Epochs 1+2 reconstructed from raw parquet — what VERSION AS OF 2
    * must read after the compaction commit. */
  private def historyEpoch12Oracle: String =
    """SELECT * FROM (
      |SELECT 'customer/' || c_custkey AS id, 'name' AS attr_key,
      |  c_name AS value, CAST(1 AS BIGINT) AS ts
      |FROM customer WHERE c_custkey <= 200
      |UNION ALL
      |SELECT 'customer/' || c_custkey, 'name', upper(c_name),
      |  CAST(2 AS BIGINT)
      |FROM customer WHERE c_custkey <= 200
      |UNION ALL
      |SELECT 'orders/' || o_orderkey, 'total',
      |  CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR),
      |  CAST(2 AS BIGINT)
      |FROM orders WHERE o_orderkey <= 400
      |) ORDER BY id, attr_key, ts""".stripMargin

  /** Register the graft V2 catalog once per session (fixed warehouse
    * under spark.sql.warehouse.dir; per-sf-dir table names keep scale
    * factors apart). Returns (catalogName, warehouse). */
  private def dsv2Catalog(s: SparkSession): (String, String) = {
    val wh = s.conf.get("spark.sql.warehouse.dir").stripSuffix("/")
      .stripPrefix("file:") + "/graft_dsv2_cat"
    s.conf.set("spark.sql.catalog.graft_store",
      "graft.sources.v2.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft_store.warehouse", wh)
    ("graft_store", wh)
  }

  /** The shared g17/g18 fixture: gen 1 = customer names (ts 1), gen 2
    * += upper-cased renames and order totals (ts 2), gen 3 = the
    * last-write-wins compaction rewrite (old generations retained). */
  private def buildHistoryStore(s: SparkSession, d: String,
                                root: String): Unit = {
    val rows1 = Tables(s, d, "customer").where(col("c_custkey") <= 200)
      .select(concat(lit("customer/"), col("c_custkey")).as("id"),
        lit("name").as("attr_key"), col("c_name").as("value"),
        lit(1L).as("ts"))
    val rows2 = Tables(s, d, "customer").where(col("c_custkey") <= 200)
      .select(concat(lit("customer/"), col("c_custkey")).as("id"),
        lit("name").as("attr_key"), upper(col("c_name")).as("value"),
        lit(2L).as("ts"))
      .unionAll(Tables(s, d, "orders").where(col("o_orderkey") <= 400)
        .select(concat(lit("orders/"), col("o_orderkey")).as("id"),
          lit("total").as("attr_key"),
          expr("cast(cast(floor(o_totalprice * 100 + 0.5) as bigint) " +
            "as string)").as("value"),
          lit(2L).as("ts")))
    graft.sources.v2.GraftTable.create(root, rows1.schema, "id")
    rows1.write.format("graft").mode("append").save(root) // gen 1
    rows2.write.format("graft").mode("append").save(root) // gen 2
    // gen 3: compaction — merge-on-read made durable (last write wins
    // per (id, attr_key)), rewriting the live file set only
    val w = Window.partitionBy("id", "attr_key").orderBy(col("ts").desc)
    s.read.format("graft").load(root)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .drop("rn")
      .localCheckpoint() // never read the store you are replacing
      .write.format("graft").mode("overwrite").save(root)
  }
}
