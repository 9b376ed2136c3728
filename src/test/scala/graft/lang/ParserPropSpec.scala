package graft.lang

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{AhgheePut, ValueRow}
import graft.model.Value

/** Property tests for the two hand-rolled parsers: generated scripts
  * must round-trip (put literals → rows; get chains → step IR), and
  * junk must fail with the parser's own ParseException — never a hang
  * or an internal error. Pure-JVM (no SparkSession): the sampled-Gen
  * style ValueSpec uses, at parser speed.
  */
class ParserPropSpec extends AnyFunSuite {

  private val ident = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  private sealed trait Lit { def render: String }
  private case class LInt(v: Long) extends Lit { def render = v.toString }
  private case class LStr(v: String) extends Lit { def render = s""""$v"""" }
  private case class LBool(v: Boolean) extends Lit { def render = v.toString }
  private case class LEdge(id: String) extends Lit { def render = s"""^"$id"""" }

  private val genLit: Gen[Lit] = Gen.oneOf(
    Gen.choose(Long.MinValue, Long.MaxValue).map(LInt),
    ident.map(LStr), Gen.oneOf(true, false).map(LBool),
    ident.map(i => LEdge(s"e/$i")))

  private val genNode: Gen[(String, List[(String, Lit)])] = for {
    id <- ident
    n <- Gen.choose(1, 6)
    pairs <- Gen.listOfN(n, Gen.zip(ident, genLit))
  } yield (s"n/$id", pairs)

  test("put scripts round-trip: every generated pair comes back typed") {
    val nodes = Gen.listOfN(30, genNode).sample.get
    val script = nodes.map { case (id, pairs) =>
      s"""put "$id" { ${pairs.map { case (k, v) =>
        s""""$k": ${v.render}""" }.mkString(", ")} }"""
    }.mkString("\n")
    val rows = AhgheePut.parse(script)
    assert(rows.length == nodes.map(_._2.length).sum)
    val byNode = rows.groupBy(_.id)
    nodes.foreach { case (id, pairs) =>
      val got = byNode(id)
      pairs.foreach { case (k, lit) =>
        val r = got.find(a => a.key == k &&
          (lit match {
            case LInt(v) => Seq(Value.I32, Value.I64)
              .contains(a.value.vtype) && a.value.i64.contains(v)
            case LStr(v) => a.value.vtype == Value.STR &&
              a.value.str.contains(v)
            case LBool(v) => a.value.vtype == Value.B && a.value.b.contains(v)
            case LEdge(i) => a.value.vtype == Value.NODEID &&
              a.value.iri.contains(i)
          }))
        assert(r.isDefined, s"pair $k=${lit.render} of $id lost or mistyped")
      }
    }
  }

  test("number sniffing: parse order i32→i64→ui64→float family") {
    Gen.listOfN(200, Gen.choose(Long.MinValue, Long.MaxValue))
      .sample.get.foreach { v =>
        val sniffed = AhgheePut.sniffNumber(v.toString)
        val expected =
          if (v >= Int.MinValue && v <= Int.MaxValue) Value.I32 else Value.I64
        assert(sniffed.vtype == expected && sniffed.i64.contains(v),
          s"$v sniffed as $sniffed")
      }
    // beyond Long.MaxValue rides the unsigned carrier
    assert(AhgheePut.sniffNumber("18446744073709551615") ==
      ValueRow.ui64(-1L))
    assert(AhgheePut.sniffNumber("1.5").vtype == Value.F)
  }

  test("get chains parse to the same number of steps they render") {
    val genStep: Gen[String] = Gen.oneOf(
      ident.map(k => s"""filter "$k" == "x""""),
      ident.map(k => s"""fields "$k""""),
      Gen.choose(0, 99).map(n => s"skip $n"),
      Gen.choose(1, 99).map(n => s"limit $n"),
      Gen.choose(1, 5).map(n => s"follow * $n"))
    Gen.listOfN(40, Gen.zip(ident, Gen.listOfN(4, genStep))).sample.get
      .foreach { case (id, steps) =>
        val q = (s"""get "n/$id"""" +: steps).mkString(" |> ")
        val parsed = AhgheeParser.parse(q)
        assert(parsed.steps.length == steps.length, q)
      }
  }

  test("truncated input fails typed: unterminated strings and escapes") {
    // regression: the junk generator found `get " ...` (an unterminated
    // string) driving the cursor past the end — a raw
    // StringIndexOutOfBoundsException instead of the parser's typed
    // error. Pin the exact shape plus the related truncations.
    val cases = Seq(
      """get " get ^ { ^ filter |> } ^ filter : get { put { put filte""",
      """get "a""", // unterminated id string
      """get "unterminated""" + "\\", // trailing escape
      """get "a" |> filter""", // eof where a compare must start
      """get "a" |> filter "k""", // unterminated compare key
      """get "a" |> fields""", // eof where a clude must start
      """get "a" |> follow""") // eof where an edge pred must start
    cases.foreach { q =>
      try { AhgheeParser.parse(q); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"non-parser error on $q: $e")
      }
    }
    val putCases = Seq(
      """put "a" { "k": "unterminated""",
      """put "a" { "k": "x\""" + "\\",
      """put "a" { "cfg": {"x": "y\""" + "\\",
      """put "a" {""",
      """put "a" { "k":""")
    putCases.foreach { q =>
      try { graft.ingest.AhgheePut.parse(q); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"non-parser error on $q: $e")
      }
    }
  }

  test("junk input fails with ParseException, never hangs or leaks") {
    val junk = Gen.listOfN(200, Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.nonEmptyListOf(Gen.oneOf("put", "get", "{", "}", "\"", "|>",
        "^", ":", "filter")).map(_.mkString(" ")))).sample.get
    junk.foreach { s =>
      // either parses (some junk IS valid) or throws the parser's
      // typed error (IllegalArgumentException with position context)
      try { AhgheeParser.parse(s); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"non-parser error on ${s.take(60)}: $e")
      }
      try { AhgheePut.parse(s); () }
      catch {
        case _: Exception => () // put parser throws typed errors too
      }
    }
  }
}
