package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The report generator parses both per-round artifacts with anchored
  * regexes (no JSON lib) — pin the three parse paths (times, samples,
  * correctness states incl. no_oracle) and that the HTML carries them. */
class ReportSpec extends AnyFunSuite {

  test("report renders times, samples, and all three correctness states") {
    val dir = Files.createTempDirectory("graft-report")
    val bench = dir.resolve("bench.json")
    val corr = dir.resolve("corr.json")
    val out = dir.resolve("report.html")
    Files.write(bench,
      """{"metric":"total","value":3.5,"unit":"sec",
        |"queries":{"q01_scan":1.25,"p05_lsh":2.25},
        |"samples":{"q01_scan":[2.0,1.25]},"sf":"/tmp/sf"}""".stripMargin.getBytes)
    Files.write(corr,
      """{"q01_scan": {"rows_match": true, "schema_match": true,
        |  "hash_match": true, "err": null},
        |"p05_lsh": {"rows_match": null, "hash_match": null,
        |  "err": "no_oracle"},
        |"q99_gone": {"rows_match": false, "hash_match": false,
        |  "err": null}}""".stripMargin.getBytes)
    Report.main(Array(bench.toString, corr.toString, out.toString))
    val html = new String(Files.readAllBytes(out))
    assert(html.contains("q01_scan") && html.contains("1.25"))
    assert(html.contains("[2.00, 1.25]"), "samples column missing")
    assert(html.contains("""class="pass">pass"""), "pass badge missing")
    assert(html.contains("""class="no-oracle">no-oracle"""),
      "no-oracle badge missing")
    // q99_gone is in correctness but not the bench — untimed FAIL row
    assert(html.contains("""class="fail">fail"""), "fail badge missing")
    assert(html.contains("2 pass") || html.contains("1 pass"),
      "summary line missing")
  }
}
