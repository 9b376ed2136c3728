package graft.lang

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.graph.Traversal
import graft.ingest.ValueRow
import graft.model.Value

/** Compiles a parsed AHGHEE step chain into DataFrame transformations
  * over the long-form nodes_attrs table (SURVEY.md §3.1 "Spark
  * equivalent"). Catalyst then does the optimizing the reference did by
  * hand (step fusion FileStore.fs:221-269 ≙ CombineFilters/CombineLimits)
  * and the ones it never had (pushdown, pruning).
  *
  * Semantics notes (deviations documented in SURVEY.md §7.3):
  *  - skip/limit page over ids ORDERED BY id — the reference pages in
  *    arbitrary storage order (risk 2);
  *  - a node whose attributes are all projected away drops out of the
  *    long-form result (the reference emits an empty node shell);
  *  - `!=` executes (the reference parses it but throws,
  *    FileStore.fs:164);
  *  - value comparisons are vtype-tagged: cross-type orders by proto
  *    case number, same-type natively (MemoryPointer.partial.cs:377-402)
  *    — all through Value.sortKey, never raw column compare (risk 1).
  */
object StepCompiler {

  /** VALUE literal → struct column matching Value.schema. */
  def valueLit(v: ValueRow): Column = {
    def n(dt: DataType) = lit(null).cast(dt)
    struct(
      lit(v.vtype).as("vtype"),
      v.str.map(lit(_)).getOrElse(n(StringType)).as("str"),
      v.i64.map(lit(_)).getOrElse(n(LongType)).as("i64"),
      v.num.map(lit(_)).getOrElse(n(DoubleType)).as("num"),
      v.b.map(lit(_)).getOrElse(n(BooleanType)).as("b"),
      v.iri.map(lit(_)).getOrElse(n(StringType)).as("iri"),
      v.type_iri.map(lit(_)).getOrElse(n(StringType)).as("type_iri"),
      v.bytes.map(lit(_)).getOrElse(n(BinaryType)).as("bytes"))
  }

  private val numericTypes =
    Seq(Value.I32, Value.I64, Value.UI32, Value.UI64, Value.D, Value.F)

  /** The VALUE's magnitude on one shared numeric axis: `num` for D/F,
    * `i64` for the int family (ui64 rides two's-complement — fold the
    * wraparound back). Intent semantics (docs/index.md:202-206): `42`,
    * `42.0f` and `42.0` are the same number to `filter`. */
  private def numAxis(value: Column): Column = {
    val asInt = when(value.getField("vtype") === Value.UI64 &&
        value.getField("i64") < 0,
      value.getField("i64").cast(DoubleType) + lit(1.8446744073709552E19))
      .otherwise(value.getField("i64").cast(DoubleType))
    coalesce(value.getField("num"), asInt)
  }

  private def cmpCol(op: String, value: Column, litV: ValueRow): Column = {
    def bin(l: Column, r: Column): Column = op match {
      case "==" => l === r
      case "!=" => l =!= r
      case "<" => l < r
      case "<=" => l <= r
      case ">" => l > r
      case ">=" => l >= r
    }
    if (numericTypes.contains(litV.vtype)) {
      // numeric literals compare ACROSS the numeric family — a sniffed
      // i32/f32 literal must still order against stored i64/double
      // attrs (sortKey puts vtype first, which would order by type tag)
      value.getField("vtype").isin(numericTypes.map(x => x: Any): _*) &&
        bin(numAxis(value), numAxis(valueLit(litV)))
    } else bin(Value.sortKey(value), Value.sortKey(valueLit(litV)))
  }

  /** Run a query against the full nodes_attrs table; returns the
    * surviving attribute rows [id, key, value, ts (, key_meta,
    * value_meta)] — TMD metadata columns ride along when the input
    * carries them (the reference's Get returns whole TMD pairs).
    * `edgesHint` short-circuits edge derivation with a pre-built
    * [src_id, label, dst_id] view (skips scanning the non-edge attribute
    * branches — Engine passes GraphView.edges while the graph is
    * unmodified). */
  def run(spark: SparkSession, nodesAttrs: DataFrame, q: GetQuery,
          edgesHint: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val metaCols =
      Seq("key_meta", "value_meta").filter(nodesAttrs.columns.contains)
    val all = nodesAttrs.select(
      (Seq("id", "key", "value", "ts") ++ metaCols).map(col): _*)

    var ids: DataFrame =
      if (q.scan) all.select("id").distinct()
      else q.ids.toDF("id").distinct()
    // scan roots at every node ⇒ the root semi-join is the identity
    var attrs: DataFrame =
      if (q.scan) all else all.join(ids, Seq("id"), "left_semi")

    q.steps.foreach {
      case Filter(pred) =>
        // one flag per Cmp leaf, one aggregate, boolean tree over flags.
        // Rows whose key matches no leaf can't set a flag, and an
        // all-flags-false node never passes a monotone AND/OR tree over
        // `flag === 1` leaves — so pre-filtering to the leaf keys is
        // semantics-preserving and shrinks the aggregate input to the
        // touched keys only (matters when the filter names 1 key of 50).
        val leaves = collectLeaves(pred)
        val leafKeys = leaves.map(_.key).distinct
        val flags = leaves.zipWithIndex.map { case (c, i) =>
          max(when(col("key") === c.key &&
            cmpCol(c.op, col("value"), c.value), 1).otherwise(0)).as(s"f$i")
        }
        val flagged = attrs.where(col("key").isin(leafKeys: _*))
          .groupBy("id").agg(flags.head, flags.tail: _*)
        // materialize the surviving ids ONCE: DataFrame plans don't share
        // common subtrees, so without the barrier this aggregate is
        // re-inlined at every later reference (the attrs semi-join plus
        // each subsequent skip/limit/follow step — measured 3× = 17 s on
        // a07 at sf0.1, vs 2 s for the single-pass a01)
        ids = flagged.where(boolCol(pred, leaves)).select("id")
          .localCheckpoint()
        attrs = attrs.join(ids, Seq("id"), "left_semi")

      case Fields(clude) =>
        attrs = attrs.where(cludeCol(clude))
        ids = attrs.select("id").distinct()

      case Skip(n) =>
        ids = ids.orderBy("id").offset(n)
        attrs = attrs.join(ids, Seq("id"), "left_semi")

      case Limit(n) =>
        ids = ids.orderBy("id").limit(n)
        attrs = attrs.join(ids, Seq("id"), "left_semi")

      case Follow(pred, from, to) =>
        // edges come from the FULL table: traversal loads each newly
        // reached node fresh from storage (the reference's QueryNodes
        // recursion re-enters LoadNode, FileStore.fs:389), so a prior
        // fields projection does not amputate the frontier's edges
        val base = edgesHint.getOrElse(
          all.where(col("value.vtype") === Value.NODEID)
            .select(col("id").as("src_id"), col("key").as("label"),
              col("value.iri").as("dst_id")))
        val edges = base.where(edgeCol(pred))
        ids = Traversal.followEdges(spark, edges, ids, from, to).select("id")
        attrs = all.join(ids, Seq("id"), "left_semi")
    }
    attrs
  }

  private def collectLeaves(f: FilterExpr): Seq[Cmp] = f match {
    case c: Cmp => Seq(c)
    case FAnd(l, r) => collectLeaves(l) ++ collectLeaves(r)
    case FOr(l, r) => collectLeaves(l) ++ collectLeaves(r)
  }

  private def boolCol(f: FilterExpr, leaves: Seq[Cmp]): Column = f match {
    case c: Cmp => col(s"f${leaves.indexWhere(_ eq c)}") === 1
    case FAnd(l, r) => boolCol(l, leaves) && boolCol(r, leaves)
    case FOr(l, r) => boolCol(l, leaves) || boolCol(r, leaves)
  }

  /** include ∪ / exclude ∖ algebra over matched attribute sets
    * (FileStore.fs:103-138): keep = (∪ includes, or all if none) ∖
    * (∪ excludes). */
  private def cludeCol(c: Clude): Column = {
    def collect(c: Clude): (Seq[Matcher], Seq[Matcher]) = c match {
      case Include(m) => (Seq(m), Nil)
      case Exclude(m) => (Nil, Seq(m))
      case CludeList(xs) =>
        val parts = xs.map(collect)
        (parts.flatMap(_._1), parts.flatMap(_._2))
    }
    val (inc, exc) = collect(c)
    val included = if (inc.isEmpty) lit(true)
      else inc.map(matcherCol).reduce(_ || _)
    val excluded = if (exc.isEmpty) lit(false)
      else exc.map(matcherCol).reduce(_ || _)
    included && !excluded
  }

  private def matcherCol(m: Matcher): Column =
    partCol(m.key, isKey = true) && partCol(m.value, isKey = false)

  private def partCol(p: Part, isKey: Boolean): Column = p match {
    case AnyPart => lit(true)
    case StrPart(s) =>
      if (isKey) col("key") === s
      else col("value.vtype") === Value.STR && col("value.str") === s
    case EdgePart =>
      if (isKey) col("key").startsWith("^") // reference-keyed attribute
      else col("value.vtype") === Value.NODEID
    case EdgeToPart(iri) =>
      if (isKey) col("key") === s"^$iri"
      else col("value.vtype") === Value.NODEID && col("value.iri") === iri
    case IntPart =>
      lit(!isKey) && col("value.vtype")
        .isin(Value.I32, Value.I64, Value.UI32, Value.UI64)
    case FloatPart =>
      lit(!isKey) && col("value.vtype").isin(Value.D, Value.F)
    case StringPart => lit(!isKey) && col("value.vtype") === Value.STR
  }

  private def edgeCol(p: EdgePred): Column = p match {
    case AnyEdge => lit(true)
    case LabelEdge(l) => col("label") === l
    case OrEdge(a, b) => edgeCol(a) || edgeCol(b)
  }
}
