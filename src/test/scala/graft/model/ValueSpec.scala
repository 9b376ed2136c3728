package graft.model

import org.apache.spark.sql.functions._
import org.scalacheck.{Arbitrary, Gen}

import graft.SparkSpec

/** Property tests for the VALUE total order (SURVEY.md §5.2 item 5):
  * cross-type ordering follows the proto case number, same-type compares
  * natively (reference: src/ahghee.grpc/MemoryPointer.partial.cs:377-414).
  * Ordering goes through Value.sortKey — never raw column comparison
  * (SURVEY.md §7.3 risk 1).
  */
class ValueSpec extends SparkSpec {
  import spark.implicits._

  // scala-side model of a dynamic value, mapped to (vtype, payload col)
  sealed trait V { def vtype: Int }
  case class VStr(s: String) extends V { val vtype = Value.STR }
  case class VI64(i: Long) extends V { val vtype = Value.I64 }
  case class VD(d: Double) extends V { val vtype = Value.D }
  case class VB(b: Boolean) extends V { val vtype = Value.B }
  case class VNode(iri: String) extends V { val vtype = Value.NODEID }

  private val genV: Gen[V] = Gen.oneOf(
    Gen.alphaNumStr.map(VStr),
    Arbitrary.arbitrary[Long].map(VI64),
    Gen.choose(-1e6, 1e6).map(VD),
    Arbitrary.arbitrary[Boolean].map(VB),
    Gen.alphaNumStr.map(s => VNode(s"n/$s")))

  /** Expected reference order: vtype first, then native payload. */
  private def refLt(a: V, b: V): Boolean =
    if (a.vtype != b.vtype) a.vtype < b.vtype
    else (a, b) match {
      case (VStr(x), VStr(y)) => x < y
      case (VI64(x), VI64(y)) => x < y
      case (VD(x), VD(y)) => x < y
      case (VB(x), VB(y)) => !x && y
      case (VNode(x), VNode(y)) => x < y
      case _ => false
    }

  private def toCol(v: V) = v match {
    case VStr(s) => Value.str(lit(s))
    case VI64(i) => Value.i64(lit(i))
    case VD(d) => Value.d(lit(d))
    case VB(b) => Value.bool(lit(b))
    case VNode(i) => Value.nodeid(lit(i))
  }

  /** Engine comparison via sortKey on a 1-row DataFrame. */
  private def engineLt(a: V, b: V): Boolean =
    spark.range(1)
      .select((Value.sortKey(toCol(a)) < Value.sortKey(toCol(b))).as("lt"))
      .head().getBoolean(0)

  test("sortKey matches the reference total order (sampled pairs)") {
    // batch the check: one DataFrame with many pairs beats 100 Spark jobs
    val pairs = Gen.listOfN(60, Gen.zip(genV, genV)).sample.get
    val expr = pairs.map { case (a, b) =>
      (Value.sortKey(toCol(a)) < Value.sortKey(toCol(b)))
    }
    val row = spark.range(1).select(expr: _*).head()
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      assert(row.getBoolean(i) == refLt(a, b), s"pair $a < $b")
    }
  }

  test("antisymmetry: a<b and b<a never both hold") {
    val pairs = Gen.listOfN(30, Gen.zip(genV, genV)).sample.get
    val expr = pairs.flatMap { case (a, b) => Seq(
      (Value.sortKey(toCol(a)) < Value.sortKey(toCol(b))),
      (Value.sortKey(toCol(b)) < Value.sortKey(toCol(a)))) }
    val row = spark.range(1).select(expr: _*).head()
    pairs.indices.foreach { i =>
      assert(!(row.getBoolean(2 * i) && row.getBoolean(2 * i + 1)))
    }
  }

  test("ordering a mixed-type column groups by vtype in proto-case order") {
    val vs: Seq[V] = Seq(VD(1.5), VStr("zzz"), VI64(-5), VB(false),
      VNode("n/a"), VStr("aaa"), VI64(7))
    val df = vs.zipWithIndex.map { case (_, i) => i }.toDF("i")
    val withV = df.select(
      map_from_arrays(array(vs.indices.map(lit(_)): _*),
        array(vs.map(toCol): _*))(col("i")).as("v"))
    val sorted = withV.orderBy(Value.sortKey(col("v")))
      .select(col("v.vtype")).collect().map(_.getInt(0))
    assert(sorted.sameElements(sorted.sorted), "vtypes not grouped in order")
    assert(sorted.head == Value.NODEID && sorted.last == Value.B)
  }
}
