package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native xxhash64 signature must be bit-identical to the k-pass
  * lambda chain (hashInt(i, hashLong(h, 42)) per permutation — the
  * exact fold Spark's multi-arg xxhash64 performs), and the rewritten
  * bandsPerRow must emit the same band hashes as the pre-rewrite form.
  */
class XxMinhashSigsSpec extends SparkSpec {
  import spark.implicits._

  test("xx_minhash_sigs == the transform/array_min xxhash64 chain") {
    val rows = Seq(
      Seq(5L, -99L, Long.MinValue, Long.MaxValue, 0L),
      Seq(42L),
      (1L to 300L).map(_ * 2654435761L).toSeq)
      .toDF("hs")
    val lambda = transform(sequence(lit(0), lit(31)), i =>
      array_min(transform(col("hs"), x => xxhash64(x, i))))
    val got = rows.select(
        graft.llm.TextOps.xxMinhashSigs(col("hs"), 32).as("native"),
        lambda.as("lam"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("rewritten bandsPerRow == the literal k-column band build") {
    val docs = Seq("alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven")
      .toDF("text")
      .select(graft.llm.TextOps.shingles(
        graft.llm.TextOps.tokens(col("text")), 3).as("sh"))
    // the pre-rewrite form, inlined: k separate min columns, explicit
    // per-band concat_ws over them
    val hashed = transform(col("sh"), s => xxhash64(s))
    val mh = (0 until 32).map(i =>
      array_min(transform(hashed, x => xxhash64(x, lit(i)))))
    val legacy = array((0 until 8).map(bi =>
      xxhash64(concat_ws(",",
        (0 until 4).map(ri => mh(bi * 4 + ri)): _*))): _*)
    val got = docs.select(
        graft.llm.TextOps.bandsPerRow(col("sh"), 32, 8, 4).as("now"),
        legacy.as("legacy"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }
}
