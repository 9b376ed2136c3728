package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native one-pass MinHash signature must be bit-identical to the
  * k-pass lambda form it replaced (the mirrored oracles hash these
  * exact integers), including on single-element and colliding inputs;
  * empty input degenerates to NULL (zero band candidates either way).
  */
class MinhashSigsSpec extends SparkSpec {
  import spark.implicits._

  private val P = 1000000007L

  test("minhash_sigs == the transform/array_min lambda chain") {
    val rows = Seq(
      Seq(5L, 99L, 1000000006L, 0L, 123456789L),
      Seq(7L),
      Seq(3L, 3L, 3L),
      (1L to 200L).map(i => i * 104729L % P).toSeq)
      .toDF("hs")
    val lambda = transform(sequence(lit(0), lit(15)), i =>
      array_min(transform(col("hs"), h =>
        (h * (i * 2 + 3) + (i * 5 + 7)) % P)))
    val got = rows.select(
        graft.llm.TextOps.minhashSigs(col("hs"), 16).as("native"),
        lambda.as("lam"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("empty input yields NULL — zero band candidates, like the lambda") {
    // the lambda form yields an all-null signature whose band values
    // are null (joins never match); the native form nulls the whole
    // signature (posexplode emits nothing) — both produce zero
    // candidates, and callers filter size >= 3 before signing anyway
    val got = Seq(Seq.empty[Long]).toDF("hs")
      .select(graft.llm.TextOps.minhashSigs(col("hs"), 16).as("native"))
      .collect()(0)
    assert(got.isNullAt(0), got.toString)
  }

  test("minhash_sigs is registered in SQL via GraftExtensions") {
    val got = spark.sql(
        "SELECT minhash_sigs(array(5, 99), 3) AS mh")
      .collect()(0).getSeq[Long](0)
    def perm(h: Long, i: Int) = (h * (2 * i + 3) + (5 * i + 7)) % P
    val want = (0 until 3).map(i => math.min(perm(5L, i), perm(99L, i)))
    assert(got == want, s"$got vs $want")
  }
}
