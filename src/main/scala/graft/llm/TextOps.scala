package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for large-scale training-data curation:
  * tokenization, shingling, MinHash signatures, SimHash, and the LSH
  * band/chunk blocking that makes near-dup detection O(n) instead of
  * O(n²). Everything is built from codegen'd built-in functions (no
  * Scala UDFs) so whole-stage codegen spans the hot path and the
  * expressions survive column pruning / pushdown at 100 TB.
  */
object TextOps {

  /** Whitespace tokens. NOTE: `\\s+` collapses runs of whitespace while
    * the DuckDB oracles split on a single space (`string_split(text,
    * ' ')`) — identical on the single-spaced generator corpus the
    * driver contract runs on, divergent on real text with tabs or
    * doubled spaces (where the oracle would emit empty tokens). The
    * regex form is the one you want at 100 TB; only the oracle SQL
    * would need `regexp_split_to_array` on a messier corpus. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** BPE-style pre-tokenization regex (the GPT-2 family's shape:
    * contraction suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs). ASCII classes only so the same pattern means the
    * same thing in Java regex (Spark) and RE2 (DuckDB oracle). */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  /** BPE-ish tokens via one codegen'd regexp pass. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Word n-gram shingles (distinct). Docs shorter than n collapse to a
    * single whole-text shingle. */
  def shingles(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))
    array_distinct(when(size(toks) >= n, grams)
      .otherwise(array(concat_ws(" ", toks))))
  }

  /** MinHash signature: each shingle string is hashed ONCE, then the k
    * family members rehash the resulting fixed-width long with the seed
    * index (`xxhash64(h, i)`) — k cheap word hashes instead of k
    * string-concat+hash passes over the shingle text. (Not a·h+b
    * arithmetic: long overflow throws under ANSI mode.) One explode +
    * one hash-aggregate (map-side partial min → tiny shuffle).
    * Returns df[idCol, mh0..mh{k-1}]. */
  def minhash(df: DataFrame, idCol: String, shinglesCol: Column, k: Int): DataFrame = {
    val exploded = df.select(col(idCol), explode(shinglesCol).as("sh"))
      .select(col(idCol), xxhash64(col("sh")).as("h"))
    val aggs = (0 until k).map(i =>
      min(xxhash64(col("h"), lit(i))).as(s"mh$i"))
    exploded.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding of a minhash signature: b bands of r rows each
    * (k = b*r). Returns df[idCol, band_idx, band_hash] — candidates for
    * near-dup are pairs sharing any (band_idx, band_hash). */
  def bands(sig: DataFrame, idCol: String, b: Int, r: Int): DataFrame = {
    val bandHashes = array((0 until b).map(bi =>
      xxhash64(concat_ws(",", (0 until r).map(ri => col(s"mh${bi * r + ri}")): _*))): _*)
    sig.select(col(idCol), posexplode(bandHashes).as(Seq("band_idx", "band_hash")))
  }

  /** Per-row MinHash banding: identical math to `minhash` + `bands`
    * (hash each shingle, k seeded rehashes, min per seed, bands of r)
    * but as one array expression per document — no explode, no
    * aggregate, no shuffle. The streaming-friendly form: a stateless
    * row transform whose band hashes equal the batch pipeline's
    * exactly, so a stream can band docs as they arrive and only the
    * tiny bucket-state lookup is stateful. Returns an array of b band
    * hashes. */
  def bandsPerRow(shinglesCol: Column, k: Int, b: Int, r: Int): Column = {
    val hashed = transform(shinglesCol, s => xxhash64(s))
    // native one-pass signature (XxMinhashSigs) instead of k
    // array_min(transform(...)) passes; band hashes are bit-identical
    // (same xxhash64 chain, same comma-joined decimal strings) —
    // pinned in XxMinhashSigsSpec and by s08's batch-equality tests.
    // mh appears ONCE in the tree (bands slice it in a lambda), so the
    // 32-references CollapseProject hazard the barrier comment below
    // describes can't re-emerge here.
    val mh = xxMinhashSigs(hashed, k)
    transform(sequence(lit(0), lit(b - 1)), bi =>
      xxhash64(concat_ws(",", transform(
        slice(mh, bi * r + 1, lit(r)), v => v.cast("string")))))
  }

  /** One-pass k-permutation xxhash64 MinHash signature via the native
    * [[graft.functions.XxMinhashSigs]] expression. */
  def xxMinhashSigs(hashed: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftInternals
    import org.apache.spark.sql.catalyst.expressions.Literal
    GraftInternals.column(graft.functions.XxMinhashSigs(
      GraftInternals.expression(hashed), Literal(k)))
  }

  /** Candidate pairs (a < b) sharing an LSH bucket. The bucket-size cap
    * guards against degenerate buckets (stopword-only docs) exploding
    * quadratically — the standard spam guard at scale. Bucket members
    * collect into one row (bounded by the cap) and pairs explode from
    * it — one aggregate instead of a windowed self-join. */
  def candidatePairs(bandsDf: DataFrame, idCol: String, maxBucket: Int = 1000): DataFrame = {
    val buckets = bandsDf.groupBy("band_idx", "band_hash")
      .agg(collect_list(col(idCol)).as("ids"))
      .where(size(col("ids")).between(2, maxBucket))
    buckets.select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
          struct(least(a, b).as("a_id"), greatest(a, b).as("b_id"))))))
        .as("p"))
      .select(col("p.a_id"), col("p.b_id")).distinct()
  }

  /** Exact set Jaccard between two array columns (deduped). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact set Jaccard between two SORTED deduped long arrays via the
    * native [[graft.functions.JaccardSorted]] expression — one fused
    * merge-walk per pair instead of array_intersect + array_union each
    * building a hash set. Callers `array_sort` once at materialization;
    * the per-pair op (the inner loop of every verify join) gets cheap. */
  def jaccardSorted(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftInternals
    GraftInternals.column(graft.functions.JaccardSorted(
      GraftInternals.expression(a), GraftInternals.expression(b)))
  }

  /** The engine's mirrorable rolling hash, via the native
    * [[graft.functions.PolyHash]] expression — one codegen'd fold per
    * string instead of the split→transform→aggregate lambda chain that
    * allocates a per-character UTF8String array on every call (the
    * DuckDB mirror stays `list_reduce(list_prepend(seed, ...))`, same
    * integers). */
  def polyHash(s: Column, seed: Long = 7L, mult: Long = 131L): Column = {
    import org.apache.spark.sql.GraftInternals
    import org.apache.spark.sql.catalyst.expressions.Literal
    GraftInternals.column(graft.functions.PolyHash(
      GraftInternals.expression(s), Literal(seed), Literal(mult)))
  }

  /** k-permutation MinHash signature of a hashed-shingle array via the
    * native [[graft.functions.MinhashSigs]] expression — one array
    * traversal with k running minima instead of k transform+array_min
    * passes each allocating an intermediate array (the map-side cost
    * of every mirrored banding stage). Same integers as the lambda
    * form and the DuckDB mirror. */
  def minhashSigs(hs: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftInternals
    import org.apache.spark.sql.catalyst.expressions.Literal
    GraftInternals.column(graft.functions.MinhashSigs(
      GraftInternals.expression(hs), Literal(k)))
  }

  /** 64-bit SimHash over whitespace tokens (term-frequency weighted):
    * bit j of the fingerprint is the sign of Σ_tokens tf·(±1) where the
    * sign is bit j of xxhash64(token). One explode + 64 conditional sums
    * in a single hash aggregate. Returns df[idCol, simhash]. */
  def simhash(df: DataFrame, idCol: String, toks: Column): DataFrame = {
    val exploded = df.select(col(idCol), explode(toks).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$j"))
    val agg = exploded.groupBy(idCol).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map(j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    agg.select(col(idCol), fp.as("simhash"))
  }

  /** SimHash blocking: split the 64-bit fingerprint into 4 chunks of 16
    * bits; by pigeonhole, any pair within Hamming distance ≤ 3 (and most
    * ≤ 6) shares at least one exact chunk. Returns
    * df[idCol, simhash, chunk_idx, chunk_val]. */
  def simhashChunks(sig: DataFrame, idCol: String): DataFrame = {
    val chunks = array((0 until 4).map(c =>
      shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)
    sig.select(col(idCol), col("simhash"),
      posexplode(chunks).as(Seq("chunk_idx", "chunk_val")))
  }

  /** English-stopword hit ratio — the n-gram-free language-ID heuristic
    * (deterministic; the same formula is expressible in the oracle). */
  val enStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  def stopwordRatio(toks: Column): Column =
    size(filter(toks, t => t.isin(enStopwords.map(x => x: Any): _*)))
      .cast("double") / size(toks)
}
