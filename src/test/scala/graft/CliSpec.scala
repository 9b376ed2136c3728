package graft

import java.io.{BufferedReader, PrintWriter, StringReader, StringWriter}

import graft.api.Engine

/** REPL loop: multi-line buffering, per-statement status lines, grouped
  * node printing, error recovery (reference: the cli `wat>` session,
  * Program.cs:25-228).
  */
class CliSpec extends SparkSpec {

  private def session(input: String): String = {
    val out = new StringWriter
    Cli.repl(Engine.forEmpty(spark),
      new BufferedReader(new StringReader(input)),
      new PrintWriter(out, true))
    out.toString
  }

  test("multi-line put buffers until braces close, then get prints nodes") {
    val o = session(
      """put "c/1" {
        |  "name": "Ada",
        |  "knows": ^"c/2"
        |}
        |get "c/1"
        |exit""".stripMargin)
    assert(o.contains("...> "), o) // continuation prompt mid-statement
    assert(o.contains("status> put.done"), o)
    assert(o.contains("node> c/1"), o)
    assert(o.contains("name: Ada"), o)
    assert(o.contains("knows: ^c/2"), o)
    assert(o.contains("status> get.done 1 nodes"), o)
  }

  test("export command writes the subgraph as N-Triples") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_exp")
    val o = session(
      s"""put "x/1" { "name": "Exp", "knows": ^"x/2" }
         |export "$dir/out" get "x/1"
         |exit""".stripMargin)
    assert(o.contains("status> export.done"), o)
    val lines = graft.ingest.NTriplesReader
      .read(spark, s"$dir/out").collect()
    assert(lines.length == 2, lines.mkString("\n"))
    assert(lines.exists(_.value.iri.contains("x/2")))
  }

  test("sql command streams rows; the hinted custom tier works at the prompt") {
    graft.Tables(spark, sfDir, "events")
      .createOrReplaceTempView("cli_events")
    val o = session(
      """sql SELECT 1 AS one, 'x' AS tag
        |sql SELECT count(*) AS n FROM (
        |  SELECT /*+ SESSIONIZE('user_id', 'ts,event_id', 'tsec', 1800, 'sid') */ *
        |  FROM (SELECT user_id, ts, event_id,
        |               CAST(floor(unix_millis(ts) / 1000.0) AS BIGINT) AS tsec
        |        FROM cli_events))
        |sql SELEC broken
        |exit""".stripMargin)
    assert(o.contains("cols> one, tag"), o)
    assert(o.contains("row> 1, x"), o)
    assert(o.contains("status> sql.done 1 rows"), o)
    // the hinted statement ran and returned the event count
    val evN = graft.Tables(spark, sfDir, "events").count()
    assert(o.contains(s"row> $evN"), o)
    // malformed SQL reports and the loop keeps going (exit reached)
    assert(o.contains("status> err("), o)
  }

  test("a parse error reports and the loop keeps going") {
    val o = session(
      """put oops
        |put "c/3" { "k": 1 }
        |get "c/3"
        |exit""".stripMargin)
    assert(o.contains("status> err("), o)
    assert(o.contains("node> c/3"), o)
  }

  test("statement completeness scanner") {
    assert(Cli.complete("""get "a" """))
    assert(!Cli.complete("""put "a" { "k": """))
    assert(!Cli.complete("""put "a" { "k: 1 }"""))   // unclosed quote
    assert(Cli.complete("""put "a" { "k": 1 } # { comment"""))
  }
}
