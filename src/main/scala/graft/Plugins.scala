package graft

import org.apache.spark.sql.SparkSession

/** RUNTIME-loadable plugins — the reference's experimental WASM hook
  * (reference src/serverlib/WasmInterop.cs:7-97: load a module at
  * runtime, call its exports) mapped to the JVM: a plugin is any class
  * with a no-arg constructor implementing [[Plugin]], loaded BY NAME
  * into a LIVE session — from the classpath or from a jar file via an
  * isolated URLClassLoader — and handed the session to register
  * native expressions, views, or confs. No restart, no
  * `spark.sql.extensions` edit: this closes the "dynamic loading
  * remains absent" gap the compile-time GraftExtensions tier left
  * open. Honest scope note: like the reference's WASM experiment this
  * is a LOADING seam, not a sandbox — a JVM plugin runs with the
  * engine's privileges (WASM would isolate; the JVM does not).
  */
trait Plugin {
  /** Called once at load with the live session. */
  def register(spark: SparkSession): Unit
}

object Plugins {

  /** Instantiate `className` (no-arg ctor, must implement [[Plugin]])
    * and hand it the session. With `jar` set, the class loads from
    * that jar through a child-first-free URLClassLoader (parent = this
    * classloader, so Spark/graft types are shared). Returns the loaded
    * class name; throws with an actionable message on any failure. */
  def load(spark: SparkSession, className: String,
      jar: Option[String] = None): String = {
    val loader = jar match {
      case Some(j) =>
        val f = new java.io.File(j)
        require(f.isFile, s"plugin jar not found: $j")
        new java.net.URLClassLoader(Array(f.toURI.toURL),
          getClass.getClassLoader)
      case None => getClass.getClassLoader
    }
    val cls = try loader.loadClass(className) catch {
      case e: ClassNotFoundException => throw new IllegalArgumentException(
        s"plugin class '$className' not found" +
          jar.fold(" on the classpath")(j => s" in $j"), e)
    }
    val inst = try cls.getDeclaredConstructor().newInstance() catch {
      case e: ReflectiveOperationException =>
        throw new IllegalArgumentException(
          s"plugin '$className' needs a public no-arg constructor " +
            s"(${e.getClass.getSimpleName})", e)
    }
    inst match {
      case p: Plugin => p.register(spark); className
      case other => throw new IllegalArgumentException(
        s"'$className' (${other.getClass.getName}) does not implement " +
          "graft.Plugins' Plugin trait")
    }
  }

  /** Register a NATIVE Catalyst expression into the live session's
    * function registry (temp function; survives for the session) — the
    * call a [[Plugin]] uses to expose codegen'd expressions at runtime,
    * where `spark.udf.register` could only add boxed UDFs. */
  def registerExpression(spark: SparkSession, name: String,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
    org.apache.spark.sql.GraftInternals
      .registerFunction(spark, name, builder)
}
