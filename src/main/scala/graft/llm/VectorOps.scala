package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-similarity primitives over ARRAY<FLOAT> columns: exact
  * cosine (built from zip_with/aggregate — codegen'd, no UDF), and a
  * random-hyperplane LSH for the approximate path.
  *
  * Scale shape: brute-force top-k is a broadcast of the (small) query
  * set against the full corpus — one pass, no shuffle of the corpus.
  * The LSH path buckets both sides on (table, signature) so candidate
  * generation is an equi-join; only candidates pay the O(dim) cosine.
  */
object VectorOps {

  /** Cast float vector to double for stable arithmetic. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product — deterministic summation order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine via the native CosineSim expression — one fused codegen
    * loop instead of three zip_with/aggregate lambda folds; identical
    * results (same double summation order). */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftInternals
    GraftInternals.column(graft.functions.CosineSim(
      GraftInternals.expression(a.cast("array<double>")),
      GraftInternals.expression(b.cast("array<double>"))))
  }

  /** Deterministic pseudo-random hyperplanes: `tables` independent LSH
    * tables of `planes` hyperplanes each, components from a fixed-seed
    * generator. Returned as literal arrays — they ship inside the plan
    * (tiny), no broadcast needed. */
  def hyperplanes(tables: Int, planes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(tables)(Seq.fill(planes)(Array.fill(dim)(rnd.nextGaussian())))
  }

  /** Signature of vector v in one table: one bit per hyperplane (sign of
    * the projection), packed to a long. */
  def signature(v: Column, tablePlanes: Seq[Array[Double]]): Column =
    tablePlanes.zipWithIndex.map { case (plane, i) =>
      val proj = dot(v, array(plane.map(lit(_)): _*))
      when(proj >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Explode a vector df into (id, table_idx, sig) LSH bucket rows. */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: Column,
                 planes: Seq[Seq[Array[Double]]]): DataFrame = {
    val sigs = array(planes.map(tp => signature(vecCol, tp)): _*)
    df.select(col(idCol), posexplode(sigs).as(Seq("table_idx", "sig")))
  }
}
