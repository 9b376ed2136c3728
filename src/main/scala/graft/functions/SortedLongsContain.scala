package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen-native membership probe against a broadcast SORTED long
  * array: `binarySearch(set, child) >= 0` as a Catalyst expression.
  *
  * Built for the k-truss removed-set arm (GraphAnalytics.trussPeel):
  * the dying-triangle tag tests each of a triangle's three packed edge
  * keys against the round's removed set. As a Scala UDF the probe
  * forced per-row ser/de through ScalaUDF inside an otherwise fully
  * codegen-able stage over the materialized triangle list (the
  * heaviest frame in the registry); this expression keeps the stage in
  * whole-stage codegen — the generated code calls
  * `java.util.Arrays.binarySearch` on the broadcast primitive array
  * directly, the same probe the LongHashedRelation broadcast-join
  * compiles to, without materializing exploded rows.
  *
  * The broadcast is captured by the expression instance (the plan
  * ships it by reference; executors read the array once per task via
  * the broadcast machinery). The array MUST be sorted ascending —
  * callers sort before broadcasting.
  */
case class SortedLongsContain(child: Expression,
                              set: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(e: Any): Any =
    java.util.Arrays.binarySearch(set.value, e.asInstanceOf[Long]) >= 0

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedLongs", set,
      classOf[Broadcast[Array[Long]]].getName)
    // hoist the broadcast deref: one array fetch per task, not per row
    val arr = ctx.addMutableState("long[]", "sortedLongsArr",
      v => s"$v = (long[]) $ref.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = java.util.Arrays.binarySearch($arr, $c) >= 0;")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SortedLongsContain = copy(child = newChild)
}
