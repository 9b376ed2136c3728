package graft.lang

import scala.collection.mutable

/** Whole-script surface for the AHGHEE language (reference grammar
  * src/cli-grammer/AHGHEE.g4:5-9: a script is a sequence of `put` /
  * `get` / `load` commands; the CLI REPL feeds exactly this stream,
  * src/cli/Program.cs:25-228). The three statement parsers already
  * exist (AhgheePut, AhgheeParser, and the readers behind `load`); this
  * splitter lets a canonical session execute verbatim through one
  * entry point — `Engine.run(script)`.
  *
  * Statement boundaries: a top-level `put` / `get` / `load` keyword
  * outside string literals and outside `{...}` bodies starts a new
  * statement (string escapes honored; a quoted "put" inside a node
  * body or id never splits).
  */
object ScriptRunner {

  sealed trait Statement
  /** Raw text of one `put ...` command (AhgheePut parses it). */
  case class PutStmt(text: String) extends Statement
  /** Parsed `get` query. */
  case class GetStmt(q: GetQuery) extends Statement
  /** `load nt "path-or-url"` / `load graphml "path"`
    * (reference: LoadFile type+path, types.proto:196-199). */
  case class LoadStmt(format: String, path: String) extends Statement

  def parse(script: String): Seq[Statement] =
    split(script).map { case (kw, text) =>
      kw match {
        case "put" => PutStmt(text)
        case "get" => GetStmt(AhgheeParser.parse(text))
        case "load" => parseLoad(text)
      }
    }

  private def parseLoad(text: String): LoadStmt = {
    // load (nt | graphml) "path"
    val m = """(?s)\s*load\s+(nt|ntriples|graphml)\s+"([^"]*)"\s*""".r
    text match {
      case m(fmt, path) =>
        LoadStmt(if (fmt == "ntriples") "nt" else fmt, path)
      case _ => throw new IllegalArgumentException(
        s"""load syntax: load (nt|graphml) "<path>" — got: $text""")
    }
  }

  /** Split a script into (keyword, statementText) pairs. */
  private[lang] def split(script: String): Seq[(String, String)] = {
    val starts = mutable.ArrayBuffer.empty[(Int, String)]
    var i = 0
    var depth = 0
    var inStr = false
    while (i < script.length) {
      val c = script.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' => depth += 1
        case '}' => depth -= 1
        case '#' => // comment to end of line
          while (i < script.length && script.charAt(i) != '\n') i += 1
        case _ if depth == 0 && c.isLetter =>
          val boundary = i == 0 || !script.charAt(i - 1).isLetterOrDigit
          if (boundary) {
            Seq("put", "get", "load").find(k =>
              script.startsWith(k, i) &&
                (i + k.length >= script.length ||
                  !script.charAt(i + k.length).isLetterOrDigit))
              .foreach { k => starts += ((i, k)); i += k.length - 1 }
          }
        case _ =>
      }
      i += 1
    }
    if (starts.isEmpty) {
      if (script.trim.isEmpty) Seq.empty
      else throw new IllegalArgumentException(
        "script has no put/get/load statement")
    } else {
      if (script.substring(0, starts.head._1).trim.nonEmpty)
        throw new IllegalArgumentException(
          s"unparsed text before first statement: '${script.substring(0, starts.head._1).trim.take(25)}'")
      starts.toSeq.zipWithIndex.map { case ((pos, kw), idx) =>
        val end = if (idx + 1 < starts.length) starts(idx + 1)._1
          else script.length
        (kw, script.substring(pos, end))
      }
    }
  }
}
