package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native poly_hash expression must be bit-identical to the
  * composable lambda form it replaced (every mirrored oracle depends on
  * these exact integers), in both interpreted eval and codegen, on
  * ASCII and multi-byte input.
  */
class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  private val P = 1000000007L

  test("poly_hash == the split/transform/aggregate lambda fold") {
    val docs = Seq("a", "key agg row scan", "zz top 42 !@#",
      "the quick brown fox jumps over the lazy dog").toDF("s")
    val lambda = aggregate(
      transform(split(col("s"), ""), c => ascii(c).cast("long")),
      lit(7L), (acc, x) => (acc * 131 + x) % P)
    val rows = docs.select(
        graft.llm.TextOps.polyHash(col("s")).as("native"),
        lambda.as("lam"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("empty string folds to the seed — the DuckDB semantics") {
    // Spark's split('', '') yields [''] and ascii('') = 0, so the old
    // lambda hashed a phantom element ((7·131+0) mod P = 917); DuckDB's
    // string_split('', '') is [] and folds to the bare seed. The native
    // expression sides with the ORACLE (no caller hashes empty strings
    // — tokens/grams are non-empty — but if one ever does, the mirror
    // now agrees instead of silently diverging).
    val got = Seq("").toDF("s")
      .select(graft.llm.TextOps.polyHash(col("s")).as("h"))
      .collect()(0).getLong(0)
    assert(got == 7L)
  }

  test("poly_hash with p37's (seed, mult) variants matches the lambda") {
    val docs = Seq("gram one", "gram two", "x").toDF("s")
    for ((seed, mult) <- Seq((7L, 131), (11L, 137))) {
      val lambda = aggregate(
        transform(split(col("s"), ""), c => ascii(c).cast("long")),
        lit(seed), (acc, x) => (acc * mult + x) % P)
      val rows = docs.select(
          graft.llm.TextOps.polyHash(col("s"), seed, mult).as("native"),
          lambda.as("lam"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"seed=$seed mult=$mult: $r"))
    }
  }

  test("multi-byte input folds codepoints (== ascii() per BMP char)") {
    // é (U+00E9) and 漢 (U+6F22) take the codepoint fallback; the
    // lambda form agrees because ascii() also returns the codepoint
    val docs = Seq("café", "漢字 kanji").toDF("s")
    val lambda = aggregate(
      transform(split(col("s"), ""), c => ascii(c).cast("long")),
      lit(7L), (acc, x) => (acc * 131 + x) % P)
    val rows = docs.select(
        graft.llm.TextOps.polyHash(col("s")).as("native"),
        lambda.as("lam"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("poly_hash is registered in SQL via GraftExtensions") {
    val got = spark.sql("SELECT poly_hash('abc', 7, 131) AS h")
      .collect()(0).getLong(0)
    var acc = 7L
    for (c <- "abc") acc = (acc * 131 + c.toLong) % P
    assert(got == acc)
  }
}
