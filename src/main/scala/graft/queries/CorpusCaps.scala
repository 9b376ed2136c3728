package graft.queries

/** The bounded-corpus knobs for registry queries that deliberately run
  * on a SLICE of the documents/embeddings tables — in one auditable
  * place instead of per-query literals.
  *
  * Two distinct reasons a query is capped, with different scale
  * stories:
  *
  *  - '''Exact witnesses''' (p04, p30, p11's LshSpec twin): an
  *    all-pairs O(n²) baseline kept SMALL ON PURPOSE so the scaled
  *    path (banding / blocking / prefix filter) has a hash-checked
  *    ground truth. These never scale up — at 100 TB the bounded
  *    witness still runs on a fixed sample while the linear arm does
  *    the work.
  *  - '''Bounded demo corpora''' (p53's prefix join, the p11/p22
  *    embedding sets): the algorithm is the linear-candidate scale
  *    path itself; the cap only keeps the sf0.01 driver gate fast.
  *    Raising the cap changes volume, not plan shape —
  *    ScaleRehearsalSpec runs the same code on 10× corpora.
  *
  * Doc slices select with `doc_id % 1000000 < cap` so each planted
  * twin/excerpt (id + 1M/2M) rides with its base doc; embedding slices
  * use `vec_id < cap`. The same literal is interpolated into the
  * DuckDB oracle SQL, so Spark and oracle can never disagree on the
  * slice.
  */
object CorpusCaps {
  /** Exact all-pairs witness sets: ~100 base docs → ≤ ~20k pairs. */
  val ExactWitness = 100L

  /** p53 prefix-filter join corpus (base docs; twins ride along). */
  val PrefixJoin = 500L

  /** Embedding-side corpora (p11/p22 and the ANN family's rerank
    * witnesses): base vectors; planted twins ride at id + 1M. */
  val Vectors = 500L
}
