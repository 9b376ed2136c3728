package graft.ingest

import scala.collection.mutable

/** Parser for AHGHEE `put` node literals (reference: grammar
  * src/cli-grammer/AHGHEE.g4:37-90; AST build src/server/
  * ContextExtensions.cs:135-281). Recursive descent — same accepted
  * language, no ANTLR dependency.
  *
  * Pair forms: `"k": v` (kvp), `"k": ^"id"` (edge), `^"k": v` (fedge —
  * the KEY is a node reference), `^"k": ^"id"` (dedge). `put "id"` with
  * no body is an empty node (no attribute rows).
  *
  * Number sniffing replicates ContextExtensions.cs:196-213 exactly:
  * i32 → i64 → ui64 → f32 → f64, first parse that fits wins (SURVEY.md
  * §7.3 risk 7 — the winning type decides the vtype and therefore
  * cross-type ordering).
  *
  * Nested objects/arrays serialize to JSON `TypeBytes(application/json)`
  * — the reference's own fallback for values its scalar model can't
  * hold (ContextExtensions.cs:269-278); our flat VALUE row does the
  * same one level earlier.
  */
object AhgheePut {

  def parse(script: String, graph: String = ""): Seq[AttrRow] = {
    val p = new P(script)
    val rows = mutable.ArrayBuffer[AttrRow]()
    p.ws()
    while (!p.eof) {
      p.expectWord("put")
      var more = true
      while (more) {
        val id = p.string()
        p.ws()
        if (!p.eof && p.peek == '{') rows ++= p.body(graph, id)
        p.ws()
        more = !p.eof && p.peek == '"' // consecutive node literals
      }
      p.ws()
    }
    rows.toSeq
  }

  /** i32 → i64 → ui64 → f32 → f64 (first fit wins). */
  def sniffNumber(s: String): ValueRow = {
    s.toIntOption.map(ValueRow.i32).orElse(
      s.toLongOption.map(ValueRow.i64)).orElse {
      val big = try Some(BigInt(s)) catch { case _: Exception => None }
      big.collect {
        case b if b >= 0 && b <= BigInt("18446744073709551615") =>
          ValueRow.ui64(b.longValue) // two's-complement carrier
      }
    }.getOrElse {
      val f = s.toFloat
      if (f.isFinite) ValueRow.f32(f) else ValueRow.d(s.toDouble)
    }
  }

  private final class P(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    // total at EOF — same hardening as AhgheeParser.Q.peek: truncated
    // input must surface the parser's typed error, not the JDK's
    def peek: Char = if (eof) ' ' else s.charAt(i)
    def ws(): Unit = {
      while (!eof && (peek.isWhitespace || peek == '#')) {
        if (peek == '#') while (!eof && peek != '\n') i += 1
        else i += 1
      }
    }
    def expectWord(w: String): Unit = {
      ws()
      if (!s.startsWith(w, i)) fail(s"expected '$w'")
      i += w.length
    }
    def expect(c: Char): Unit = {
      ws()
      if (eof || peek != c) fail(s"expected '$c'")
      i += 1
    }
    def string(): String = {
      ws(); expect('"')
      val sb = new StringBuilder
      while (!eof && peek != '"') {
        if (peek == '\\') {
          i += 1
          if (eof) fail("escaped char in string")
          sb.append(peek match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case c => c
          })
        } else sb.append(peek)
        i += 1
      }
      if (eof) fail("closing '\"'")
      i += 1
      sb.toString
    }

    def body(graph: String, id: String): Seq[AttrRow] = {
      expect('{')
      val rows = mutable.ArrayBuffer[AttrRow]()
      ws()
      while (peek != '}') {
        // key: plain string or ^"node-ref" (fedge/dedge — key IS a node)
        val keyIsRef = peek == '^'
        if (keyIsRef) i += 1
        val key = string()
        expect(':')
        ws()
        val value = valueRow()
        // flat long form carries the key as a string; a reference-key
        // keeps the ^ prefix (so the clude algebra's `^` selector stays
        // a plain string prefix test) AND records the referenced node as
        // key metadata — the reference's TMD key form (types.proto:55-59:
        // keys are (metadata, data) pairs; a fedge key IS a NodeID)
        rows += AttrRow(graph, id, if (keyIsRef) "^" + key else key, value,
          key_meta = if (keyIsRef) Some(ValueRow.nodeid(key)) else None)
        ws()
        if (peek == ',') { i += 1; ws() }
      }
      i += 1
      rows.toSeq
    }

    def valueRow(): ValueRow = {
      ws()
      peek match {
        case '^' => i += 1; ValueRow.nodeid(string())
        case '"' => ValueRow.str(string())
        case '{' | '[' => ValueRow.typedBytes("application/json",
          rawJson().getBytes("UTF-8"))
        case 't' => expectWord("true"); ValueRow.bool(true)
        case 'f' => expectWord("false"); ValueRow.bool(false)
        case _ =>
          val st = i
          while (!eof && (peek.isDigit || "+-.eE".indexOf(peek) >= 0)) i += 1
          if (i == st) fail("expected value")
          sniffNumber(s.substring(st, i))
      }
    }

    /** Capture a balanced {...} / [...] block verbatim (JSON fallback). */
    def rawJson(): String = {
      val st = i
      var depth = 0
      var inStr = false
      do {
        if (inStr) {
          if (peek == '\\') i += 1
          else if (peek == '"') inStr = false
        } else peek match {
          case '{' | '[' => depth += 1
          case '}' | ']' => depth -= 1
          case '"' => inStr = true
          case _ =>
        }
        i += 1
      } while (depth > 0 && !eof)
      // a trailing backslash inside a string can step i one past the
      // end before the eof check — clamp so truncated input yields the
      // partial block, not StringIndexOutOfBounds
      i = math.min(i, s.length)
      s.substring(st, i)
    }

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"AHGHEE parse error at ${i}: $msg (near '${s.slice(i, i + 20)}')")
  }
}
