package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Static HTML benchmark + correctness report — the Spark-side analog
  * of the reference's report generator (reference: src/report/
  * program.fs renders its JSON metrics via XPlot/Google Charts); this
  * one is a self-contained offline page (inline CSS bars, no CDN).
  *
  * Inputs are the two per-round artifacts, both flat known-shape JSON,
  * parsed with anchored regexes — the sandbox's dependency budget has
  * no JSON library and Spark isn't needed to read two small files.
  *
  * Usage: runMain graft.Report [benchJson] [correctnessJson] [outHtml]
  * Defaults: bench_out.json, newest CORRECTNESS_r*.json, report.html
  */
object Report {

  private case class Row(name: String, sec: Option[Double],
                         status: String, samples: Seq[Double])

  /** Extract the balanced {...} body following `"key":`. */
  private def objectBody(json: String, key: String): String = {
    val start = json.indexOf("\"" + key + "\"")
    if (start < 0) return ""
    val open = json.indexOf('{', start)
    if (open < 0) return ""
    var depth = 0
    var i = open
    while (i < json.length) {
      json(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) return json.substring(open + 1, i)
        case _ =>
      }
      i += 1
    }
    ""
  }

  private val numPair = """"([A-Za-z0-9_]+)"\s*:\s*([0-9.]+)""".r
  private val arrPair = """"([A-Za-z0-9_]+)"\s*:\s*\[([0-9.,\s]*)\]""".r
  private val corrBlock = """"([A-Za-z0-9_]+)"\s*:\s*\{([^}]*)\}""".r

  def main(args: Array[String]): Unit = {
    val benchPath = args.lift(0).getOrElse("bench_out.json")
    val corrPath = args.lift(1).getOrElse {
      val rs = Files.list(Paths.get(".")).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("CORRECTNESS_r") && n.endsWith(".json"))
        .toSeq.sorted
      rs.lastOption.getOrElse("")
    }
    val outPath = args.lift(2).getOrElse("report.html")

    val bench = if (Files.exists(Paths.get(benchPath)))
      new String(Files.readAllBytes(Paths.get(benchPath))) else "{}"
    val corr = if (corrPath.nonEmpty && Files.exists(Paths.get(corrPath)))
      new String(Files.readAllBytes(Paths.get(corrPath))) else "{}"

    val times = numPair.findAllMatchIn(objectBody(bench, "queries"))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val samples = arrPair.findAllMatchIn(objectBody(bench, "samples"))
      .map(m => m.group(1) -> m.group(2).split(",").toSeq
        .map(_.trim).filter(_.nonEmpty).map(_.toDouble)).toMap
    val status = corrBlock.findAllMatchIn(corr).map { m =>
      val body = m.group(2)
      val st =
        if (body.contains("\"no_oracle\"")) "no-oracle"
        else if (body.contains("\"hash_match\": true") ||
          body.contains("\"hash_match\":true")) "pass"
        else "fail"
      m.group(1) -> st
    }.toMap

    val names = (times.keySet ++ status.keySet).toSeq.sorted
    val rows = names.map(n =>
      Row(n, times.get(n), status.getOrElse(n, "untimed"),
        samples.getOrElse(n, Nil)))
    val maxSec = (rows.flatMap(_.sec) :+ 0.001).max
    val total = rows.flatMap(_.sec).sum
    val nPass = rows.count(_.status == "pass")
    val nFail = rows.count(_.status == "fail")
    val nNoOr = rows.count(_.status == "no-oracle")

    def family(n: String): String = n.take(1) match {
      case "a" if n.matches("a\\d.*") => "lang (a)"
      case "g" if n.matches("g\\d.*") => "graph (g)"
      case "p" if n.matches("p\\d.*") => "pipeline (p)"
      case "q" if n.matches("q\\d.*") => "relational (q)"
      case "s" if n.matches("s\\d.*") => "streaming (s)"
      case "x" if n.matches("x\\d.*") => "graph-analytics (x)"
      case _ => "harness"
    }

    val sb = new StringBuilder
    sb ++= s"""<!DOCTYPE html>
<html><head><meta charset="UTF-8"><title>graft benchmark report</title>
<style>
 body { font-family: system-ui, sans-serif; margin: 2rem; color: #222; }
 h1 { font-size: 1.4rem; } h2 { font-size: 1.1rem; margin-top: 1.6rem; }
 .sum { color: #555; margin-bottom: 1rem; }
 table { border-collapse: collapse; width: 100%; max-width: 70rem; }
 td, th { padding: 2px 8px; font-size: 0.85rem; text-align: left; }
 th { border-bottom: 1px solid #999; }
 .bar { background: #4a78c6; height: 10px; display: inline-block; }
 .sec { text-align: right; font-variant-numeric: tabular-nums; }
 .pass { color: #1a7f37; } .fail { color: #c0392b; font-weight: bold; }
 .no-oracle { color: #888; } .untimed { color: #888; }
 .samples { color: #999; font-size: 0.75rem; }
</style></head><body>
<h1>graft benchmark report</h1>
<div class="sum">bench: $benchPath &middot; correctness: ${if (corrPath.isEmpty) "&mdash;" else corrPath}<br>
${rows.count(_.sec.isDefined)} timed queries, total ${f"$total%.1f"} s &middot;
correctness: $nPass pass, $nFail fail, $nNoOr no-oracle</div>
"""
    rows.groupBy(r => family(r.name)).toSeq.sortBy(_._1).foreach {
      case (fam, rs) =>
        val famTotal = rs.flatMap(_.sec).sum
        sb ++= s"""<h2>$fam &mdash; ${f"$famTotal%.1f"} s</h2>
<table><tr><th>query</th><th class="sec">sec</th><th style="width:45%"></th><th>correctness</th><th></th></tr>
"""
        rs.foreach { r =>
          val sec = r.sec.map(s => f"$s%.2f").getOrElse("&mdash;")
          val w = r.sec.map(s => math.max(1, (s / maxSec * 100).toInt)).getOrElse(0)
          val smp = if (r.samples.nonEmpty)
            r.samples.map(s => f"$s%.2f").mkString("[", ", ", "]") else ""
          sb ++= s"""<tr><td>${r.name}</td><td class="sec">$sec</td>
<td><span class="bar" style="width:$w%"></span></td>
<td class="${r.status}">${r.status}</td><td class="samples">$smp</td></tr>
"""
        }
        sb ++= "</table>\n"
    }
    sb ++= "</body></html>\n"
    Files.write(Paths.get(outPath), sb.toString.getBytes)
    println(s"wrote $outPath (${rows.size} rows)")
  }
}
