package graft.lang

import graft.ingest.ValueRow

/** Step-chain IR for the AHGHEE query language — case-class mirror of
  * the reference's protobuf Step chain (reference:
  * src/ahghee.grpc/types.proto:83-178; grammar src/cli-grammer/
  * AHGHEE.g4:92-190). The parser builds this; StepCompiler folds it
  * into DataFrame transformations.
  */
sealed trait Step

/** `|> filter <compare>` — keep a node iff the boolean tree over
  * "∃ attribute (key, OP, literal)" leaves holds
  * (FileStore.fs:94-101,140-164). */
final case class Filter(pred: FilterExpr) extends Step

sealed trait FilterExpr
final case class Cmp(key: String, op: String, value: ValueRow) extends FilterExpr
final case class FAnd(l: FilterExpr, r: FilterExpr) extends FilterExpr
final case class FOr(l: FilterExpr, r: FilterExpr) extends FilterExpr

/** `|> fields <clude>` / `|> - <clude>` — attribute projection algebra
  * (FileStore.fs:103-138). Matchers pair a key-part with a value-part
  * (grammar cludeop `cludepart ':' cludepart`). */
final case class Fields(clude: Clude) extends Step

sealed trait Clude
final case class Include(m: Matcher) extends Clude
final case class Exclude(m: Matcher) extends Clude
final case class CludeList(items: Seq[Clude]) extends Clude

final case class Matcher(key: Part, value: Part)
sealed trait Part
case object AnyPart extends Part                       // *
case object EdgePart extends Part                      // ^
final case class EdgeToPart(iri: String) extends Part  // ^"iri"
final case class StrPart(s: String) extends Part       // "key" / "value"
case object IntPart extends Part                       // int
case object FloatPart extends Part                     // float
case object StringPart extends Part                    // string

/** `|> skip n` / `|> limit n` (FileStore.fs:271-278). */
final case class Skip(n: Int) extends Step
final case class Limit(n: Int) extends Step

/** `|> follow (* | "label" | (e || e)) [from..]to`
  * (FileStore.fs:166-220). */
final case class Follow(pred: EdgePred, from: Int, to: Int) extends Step

sealed trait EdgePred
case object AnyEdge extends EdgePred
final case class LabelEdge(label: String) extends EdgePred
final case class OrEdge(l: EdgePred, r: EdgePred) extends EdgePred

/** A parsed `get`: root ids (or `*` scan) plus the step chain. */
final case class GetQuery(ids: Seq[String], scan: Boolean, steps: Seq[Step])
