package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Multiply}
import org.apache.spark.sql.types.LongType

/** A test plugin: registers the NATIVE expression `plugin_double(x)`
  * (a Catalyst Multiply — codegen'd, not a boxed UDF) and a temp view,
  * exactly what a runtime-delivered extension would do. */
class TestDoublerPlugin extends Plugin {
  override def register(spark: SparkSession): Unit = {
    Plugins.registerExpression(spark, "plugin_double",
      (args: Seq[Expression]) => Multiply(Cast(args.head, LongType),
        org.apache.spark.sql.catalyst.expressions.Literal(2L)))
    spark.sql("SELECT 'loaded' AS status")
      .createOrReplaceTempView("plugin_status")
  }
}

/** Runtime plugin loading (the reference's WASM-hook analog): a class
  * loaded BY NAME into a live session registers a native expression
  * callable from SQL immediately — no restart, no extensions conf. */
class PluginsSpec extends SparkSpec {

  test("load by name registers a native expression into the live session") {
    val cls = Plugins.load(spark, "graft.TestDoublerPlugin")
    assert(cls == "graft.TestDoublerPlugin")
    val got = spark.sql("SELECT plugin_double(21) AS x").collect()
    assert(got.head.getLong(0) == 42L)
    assert(spark.table("plugin_status").count() == 1)
    // the registered function composes with the rest of the engine:
    // use it inside a hinted statement's subquery
    graft.Tables(spark, sfDir, "events")
      .createOrReplaceTempView("plugin_events")
    val n = spark.sql("""
      SELECT count(*) AS n FROM (
        SELECT plugin_double(user_id) AS u2 FROM plugin_events)
      WHERE u2 % 2 = 0""").collect().head.getLong(0)
    assert(n == graft.Tables(spark, sfDir, "events").count())
  }

  test("actionable failures: missing class, wrong type, missing jar") {
    val e1 = intercept[IllegalArgumentException] {
      Plugins.load(spark, "graft.NoSuchPlugin")
    }
    assert(e1.getMessage.contains("not found"))
    val e2 = intercept[IllegalArgumentException] {
      // real instantiable class, but not a Plugin
      Plugins.load(spark, "graft.GraftExtensions")
    }
    assert(e2.getMessage.contains("does not implement"))
    val e2b = intercept[IllegalArgumentException] {
      Plugins.load(spark, "graft.Plugins") // object — no public ctor
    }
    assert(e2b.getMessage.contains("no-arg constructor"))
    val e3 = intercept[IllegalArgumentException] {
      Plugins.load(spark, "x.Y", jar = Some("/nope/missing.jar"))
    }
    assert(e3.getMessage.contains("jar not found"))
  }

  test("jar loading: a plugin class served from a standalone jar file") {
    // package the already-compiled TestDoublerPlugin class into a jar
    // at a fresh path — proves the URLClassLoader arm end to end
    val clsRes = "graft/TestDoublerPlugin.class"
    val in = getClass.getClassLoader.getResourceAsStream(clsRes)
    assume(in != null)
    val bytes = in.readAllBytes(); in.close()
    val jar = java.nio.file.Files.createTempFile("graft_plugin", ".jar")
    val jo = new java.util.jar.JarOutputStream(
      java.nio.file.Files.newOutputStream(jar))
    jo.putNextEntry(new java.util.zip.ZipEntry(clsRes))
    jo.write(bytes); jo.closeEntry(); jo.close()
    // the jar classloader's parent (this classloader) also has the
    // class; the point of the arm is the loading path resolves and
    // registration still lands in the live session
    Plugins.load(spark, "graft.TestDoublerPlugin",
      jar = Some(jar.toString))
    assert(spark.sql("SELECT plugin_double(5) AS x")
      .collect().head.getLong(0) == 10L)
  }
}
