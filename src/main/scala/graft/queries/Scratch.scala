package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-query scratch management under the warehouse dir, shared by
  * every registry query that persists a layout/index/summary (q61,
  * q62, q64, p77, p78, p79, s21…). Sandbox-only move, centralized so
  * the caveat lives once: a real deployment owns table and view
  * lifecycle through its catalog (Hive metastore / catalog API) and
  * a production materialized view or index would be a managed table
  * with its own retention — never raw filesystem deletes under the
  * warehouse. Here, registry queries must be re-runnable in one
  * ephemeral session, and a fresh session can inherit ORPHAN
  * warehouse directories (table dir on disk, no catalog entry) that
  * make overwrite/append modes double data or refuse the managed
  * location — so each run clears its scratch explicitly. */
object Scratch {
  /** Warehouse-rooted scratch path for `name`, keyed by the sf dir so
    * different scale factors never collide. */
  def path(s: SparkSession, name: String, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^0-9a-zA-Z]", "_")
    s.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
      s"/graft_${name}_$tag"
  }

  /** Delete the given paths recursively (no-op when absent). */
  def clear(s: SparkSession, paths: String*): Unit =
    paths.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(hp, true)
    }

  /** Drop a managed table AND its possibly-orphaned directory. */
  def dropTable(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    clear(s, s.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
      "/" + table.toLowerCase)
  }
}
