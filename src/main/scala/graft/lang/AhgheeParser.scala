package graft.lang

import scala.collection.mutable

import graft.ingest.{AhgheePut, ValueRow}

/** Recursive-descent parser for AHGHEE `get` queries (reference grammar
  * src/cli-grammer/AHGHEE.g4:92-190; AST build src/server/
  * ContextExtensions.cs:339-527). Same accepted language, no ANTLR.
  *
  *   get "id" ["id2"...] |> filter "k" == v |> fields "k": ^
  *     |> skip n |> take n |> follow ("label" || *) [from..]to
  */
object AhgheeParser {

  def parse(q: String): GetQuery = new Q(q).getQuery()

  private final class Q(s: String) {
    private var i = 0
    private def eof = i >= s.length
    private def peek = s.charAt(i)
    private def ws(): Unit = while (!eof && peek.isWhitespace) i += 1
    private def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"AHGHEE query parse error at $i: $msg (near '${s.slice(i, i + 25)}')")

    private def word(w: String): Boolean = {
      ws()
      if (s.startsWith(w, i) &&
          (i + w.length >= s.length || !s.charAt(i + w.length).isLetterOrDigit)) {
        i += w.length; true
      } else false
    }
    private def ch(c: Char): Boolean = {
      ws(); if (!eof && peek == c) { i += 1; true } else false
    }
    private def expect(cond: Boolean, what: String): Unit =
      if (!cond) fail(s"expected $what")

    private def str(): String = {
      ws(); expect(!eof && peek == '"', "string")
      i += 1
      val sb = new StringBuilder
      while (peek != '"') {
        if (peek == '\\') { i += 1 }
        sb.append(peek); i += 1
      }
      i += 1
      sb.toString
    }

    private def number(): Int = {
      ws()
      val st = i
      if (!eof && (peek == '-' || peek == '+')) i += 1
      while (!eof && peek.isDigit) i += 1
      expect(i > st, "number")
      s.substring(st, i).toInt
    }

    def getQuery(): GetQuery = {
      expect(word("get"), "'get'")
      val ids = mutable.ArrayBuffer[String]()
      var scan = false
      ws()
      while (!eof && peek == '"') {
        val v = str()
        if (v == "*") scan = true else ids += v
        ws()
      }
      val steps = mutable.ArrayBuffer[Step]()
      while (ch('|')) {
        expect(ch('>'), "'>' after '|'")
        steps += pipecmd()
      }
      ws()
      expect(eof, "end of query")
      GetQuery(ids.toSeq, scan, steps.toSeq)
    }

    private def pipecmd(): Step = {
      if (word("filter")) Filter(compare())
      else if (word("fields")) Fields(clude())
      else if (word("skip") || word("offset")) Skip(number())
      else if (word("limit") || word("take")) Limit(number())
      else if (word("follow")) follow()
      else if (ch('-')) Fields(negate(clude())) // grammar's bare `- clude`
      else fail("pipe command")
    }

    // compare: '(' compare BOOLOP compare ')' | key OP value
    private def compare(): FilterExpr = {
      ws()
      if (peek == '(') {
        val save = i
        i += 1
        // try boolean combo first; fall back to parenthesized cmp
        try {
          val l = compare()
          ws()
          val op = if (s.startsWith("&&", i)) { i += 2; "&&" }
                   else if (s.startsWith("||", i)) { i += 2; "||" }
                   else fail("boolop")
          val r = compare()
          expect(ch(')'), "')'")
          if (op == "&&") FAnd(l, r) else FOr(l, r)
        } catch {
          case _: IllegalArgumentException =>
            i = save; i += 1
            val c = cmp()
            expect(ch(')'), "')'")
            c
        }
      } else cmp()
    }

    private def cmp(): FilterExpr = {
      val k = str()
      ws()
      val op = Seq("==", "<=", ">=", "!=", "<", ">")
        .find(o => s.startsWith(o, i)).getOrElse(fail("comparison op"))
      i += op.length
      Cmp(k, op, filterValue())
    }

    private def filterValue(): ValueRow = {
      ws()
      peek match {
        case '^' => i += 1; ValueRow.nodeid(str())
        case '"' => ValueRow.str(str())
        case 't' if word("true") => ValueRow.bool(true)
        case 'f' if word("false") => ValueRow.bool(false)
        case _ =>
          val st = i
          while (!eof && (peek.isDigit || "+-.eE".indexOf(peek) >= 0)) i += 1
          expect(i > st, "filter literal")
          AhgheePut.sniffNumber(s.substring(st, i))
      }
    }

    // clude: '(' clude (',' clude)* ')' | [+|-] cludeop
    private def clude(): Clude = {
      ws()
      if (peek == '(') {
        i += 1
        val items = mutable.ArrayBuffer(clude())
        while (ch(',')) items += clude()
        expect(ch(')'), "')'")
        CludeList(items.toSeq)
      } else if (ch('-')) negate(clude())
      else if (ch('+')) clude()
      else Include(cludeop())
    }

    private def negate(c: Clude): Clude = c match {
      case Include(m) => Exclude(m)
      case Exclude(m) => Include(m)
      case CludeList(xs) => CludeList(xs.map(negate))
    }

    // cludeop: cludepart ':' cludepart  (bare part ⇒ any value side)
    private def cludeop(): Matcher = {
      val k = cludepart()
      ws()
      if (ch(':')) Matcher(k, cludepart()) else Matcher(k, AnyPart)
    }

    private def cludepart(): Part = {
      ws()
      if (peek == '^') {
        i += 1; ws()
        if (!eof && peek == '"') EdgeToPart(str()) else EdgePart
      }
      else if (peek == '*') { i += 1; AnyPart }
      else if (peek == '"') StrPart(str())
      else if (word("int")) IntPart
      else if (word("float")) FloatPart
      else if (word("string")) StringPart
      else fail("clude part")
    }

    // follow: (anynum | edgenum) with optional range `[from..]to`
    private def follow(): Follow = {
      val pred = edgePred()
      ws()
      val (from, to) =
        if (!eof && peek.isDigit) {
          val a = number()
          ws()
          if (s.startsWith("..", i)) { i += 2; (a, number()) } else (0, a)
        } else (0, 1)
      Follow(pred, from, to)
    }

    private def edgePred(): EdgePred = {
      ws()
      if (peek == '*') { i += 1; AnyEdge }
      else if (peek == '"') LabelEdge(str())
      else if (peek == '(') {
        i += 1
        var l = edgePred()
        ws()
        while (s.startsWith("||", i)) { i += 2; l = OrEdge(l, edgePred()); ws() }
        expect(ch(')'), "')'")
        l
      } else fail("edge predicate")
    }
  }
}
