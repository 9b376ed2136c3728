package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.GraphStore
import graft.graphx.GraphAnalytics

/** Whole-graph analytics queries (SURVEY.md §7.1 M7) on the derived
  * edges view. Connected components is oracle-checkable (components of
  * the customer→nation→region ∪ orders→customer graph are exactly the
  * five region trees); PageRank is fixed-point float — rows-only here,
  * invariants pinned in GraphXSpec.
  */
object GraphXQueries {

  val registry: Seq[RegQuery] = Seq(

    RegQuery("x01_connected_components",
      (s, d) => GraphAnalytics.connectedComponents(GraphStore.edges(s, d))
        .groupBy("component").agg(count(lit(1)).as("cnt"))
        .orderBy("component"),
      Some("""WITH mem AS (
             |  SELECT r_regionkey AS rk, 'region/' || r_regionkey AS id FROM region
             |  UNION ALL SELECT n_regionkey, 'nation/' || n_nationkey FROM nation
             |  UNION ALL SELECT n_regionkey, 'customer/' || c_custkey
             |    FROM customer JOIN nation ON c_nationkey = n_nationkey
             |  UNION ALL SELECT n_regionkey, 'orders/' || o_orderkey
             |    FROM orders JOIN customer ON o_custkey = c_custkey
             |    JOIN nation ON c_nationkey = n_nationkey)
             |SELECT min(id) AS component, count(*) AS cnt
             |FROM mem GROUP BY rk ORDER BY component""".stripMargin)),

    RegQuery("x02_pagerank",
      (s, d) => GraphAnalytics.pageRank(GraphStore.edges(s, d), tol = 1e-4)
        .orderBy(col("rank").desc, col("id"))
        .limit(20),
      None), // iterative float fixed-point → rows-only; invariants in GraphXSpec

    // directed hop distances TO two landmarks — exercises direction
    // semantics (orders→customer→nation, never the reverse) and
    // reachability filtering; exact, so fully oracle-checked
    RegQuery("x03_shortest_paths",
      (s, d) => GraphAnalytics.shortestPaths(GraphStore.edges(s, d),
          Seq("nation/1", "customer/7"))
        .orderBy("id", "landmark"),
      Some("""SELECT id, landmark, dist FROM (
             |SELECT 'nation/1' AS id, 'nation/1' AS landmark, 0 AS dist
             |UNION ALL SELECT 'customer/' || c_custkey, 'nation/1', 1
             |  FROM customer WHERE c_nationkey = 1
             |UNION ALL SELECT 'orders/' || o_orderkey, 'nation/1', 2
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  WHERE c_nationkey = 1
             |UNION ALL SELECT 'customer/7', 'customer/7', 0
             |UNION ALL SELECT 'orders/' || o_orderkey, 'customer/7', 1
             |  FROM orders WHERE o_custkey = 7
             |) ORDER BY id, landmark""".stripMargin))
  )
}
