package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{TextOps, VectorOps}

/** LLM-training-data pipeline surface (north star; SURVEY.md §2.2 last
  * row): deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
  * embedding near-dup), similarity search (brute-force cosine top-k and
  * an LSH-bucketed scale path), and text analysis (language-ID
  * heuristic, quality scoring, token stats, fingerprinting).
  *
  * The synthetic corpus has no real duplicates, so near-dup queries
  * plant positives deterministically: every doc gets a perturbed twin
  * (last 3 tokens dropped; embeddings get +0.05 on component 0) with
  * id+1_000_000 — the operator must recover exactly those pairs.
  *
  * Scale notes: MinHash/SimHash candidate generation is an equi-join on
  * LSH buckets (linear), never an all-pairs cross join; the only O(n²)
  * queries (p04, p11) are correctness baselines bounded to fixed-size
  * subsets. Cosine/hash math is all built-in expressions — one
  * whole-stage-codegen span, no UDFs.
  */
object Pipeline {

  /** documents ∪ perturbed twins (id+1M, last 3 tokens dropped). */
  /** The PPJoin-shaped prefix-filter candidate stage exposed for the
    * 10× scale rehearsal: docs [doc_id, text] → (candidates (a_id,
    * b_id), checkpointed token frame for the verify join). Rarest-first
    * global token order (df, tok); prefix length n − ceil(0.7n) + 1;
    * length-ratio pruning rides the join condition. */
  private[graft] def prefixJoinCandidates(
      docsRaw: DataFrame): (DataFrame, DataFrame) = {
    val docs = docsRaw
      .select(col("doc_id"),
        array_sort(array_distinct(TextOps.tokens(col("text")))).as("toks"))
      .withColumn("n", size(col("toks")))
      .localCheckpoint() // token arrays feed df-rank, prefix AND both
                         // verify sides — materialize the split once
    val tok = docs.select(col("doc_id"), col("n"),
      explode(col("toks")).as("tok"))
    val dfreq = tok.groupBy("tok").agg(count(lit(1)).as("df"))
    // rarest-first global order (df, tok); prefix = n - ceil(0.7n) + 1
    val pr = tok.join(dfreq, "tok")
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("tok"))))
      .where(col("rk") <= col("n") - expr("(7*n + 9) div 10") + 1)
      .select(col("doc_id"), col("n"), col("tok"))
      .localCheckpoint() // both sides of the candidate self-join:
                         // inlined, the df-rank window ran twice
                         // (measured 8.7 s -> ~3 s for the query)
    val cand = pr.as("a").join(pr.as("b"),
        col("a.tok") === col("b.tok") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("b.n") * 10 >= col("a.n") * 7 &&
        col("a.n") * 10 >= col("b.n") * 7)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    (cand, docs)
  }

  private[graft] def prefixJoinDedupFrom(docsRaw: DataFrame): DataFrame = {
    val (cand, docs) = prefixJoinCandidates(docsRaw)
    // pinned exchanges on both verification joins: the candidate rows
    // are a few bytes each, so AQE coalesces the join exchanges to ~1
    // task while every surviving row pays an array_intersect over two
    // full token arrays — the exact compute-bound-barrier shape Part
    // documents (measured 18 tasks / ~12 s near-serial at sf0.1)
    cand.transform(graft.Part.pin(col("a_id")))
      .join(docs.select(col("doc_id").as("a_id"), col("toks").as("ta"),
        col("n").as("na")), "a_id")
      .transform(graft.Part.pin(col("b_id")))
      .join(docs.select(col("doc_id").as("b_id"), col("toks").as("tb"),
        col("n").as("nb")), "b_id")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .where(col("inter") * 10 >= col("uni") * 7)
      .select(col("a_id"), col("b_id"),
        expr("cast(inter as bigint) * 1000000 div uni").as("jac_ppm"))
      .orderBy("a_id", "b_id")
  }

  private[queries] def docsWithTwins(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val t = TextOps.tokens(col("text"))
    val pert = docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(t, lit(1), greatest(size(t) - 3, lit(1)))).as("text"),
      col("lang"), col("source"), col("n_chars"))
    docs.unionAll(pert)
  }

  /** documents ∪ excerpt docs (doc_id + 2M, the first half of the
    * tokens, floor ≥ 3): planted one-sided containment — an excerpt's
    * shingle set is a SUBSET of its source's, so containment is 1.0
    * while Jaccard sits near 0.5, under p04's near-dup radar. */
  private[queries] def docsWithExcerpts(s: SparkSession,
      d: String): DataFrame = {
    val docs = Tables(s, d, "documents").select("doc_id", "text")
    val t = TextOps.tokens(col("text"))
    val exc = docs.select(
      (col("doc_id") + 2000000L).as("doc_id"),
      concat_ws(" ", slice(t, lit(1),
        greatest((size(t).cast("double") / 2).cast("int"), lit(3)))).as("text"))
    docs.unionAll(exc)
  }

  /** Matching DuckDB CTE for docsWithExcerpts. */
  private[queries] val excerptsCte =
    """WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t
      |  FROM documents),
      |alldocs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |    array_to_string(t[1:greatest(len(t)//2, 3)], ' ') FROM toks)
      |""".stripMargin

  /** Matching DuckDB CTE for docsWithTwins. */
  private[queries] val twinsCte =
    """WITH toks AS (SELECT *, string_split(text, ' ') AS t FROM documents),
      |alldocs AS (
      |  SELECT doc_id, text, lang, source, n_chars FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, array_to_string(t[1:greatest(len(t)-3,1)], ' '),
      |         lang, source, n_chars FROM toks)
      |""".stripMargin

  /** Three-generation corpus for p77: documents ∪ batch 1 (+1M: every
    * 5th doc a first-THIRD excerpt — Jaccard ≈ 1/3, reliably novel and
    * so admitted to the index; the rest drop-3-token twins, reliably
    * corpus dups) ∪ a byte-identical REPLAY of batch 1 at +3M (the
    * second incremental batch). Mirrors [[batch1Text]] exactly. */
  private[queries] val twins3Cte =
    """WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t
      |  FROM documents),
      |b1docs AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0
      |    THEN array_to_string(t[1:greatest(len(t)//3, 3)], ' ')
      |    ELSE array_to_string(t[1:greatest(len(t)-3, 1)], ' ') END
      |    AS text FROM toks),
      |alldocs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000, text FROM b1docs
      |  UNION ALL SELECT doc_id + 3000000, text FROM b1docs)
      |""".stripMargin

  /** Batch-1 text for p77 — the Spark twin of `twins3Cte`'s b1. */
  private def batch1Text(t: Column): Column =
    when(col("doc_id") % 5 === 0,
      concat_ws(" ", slice(t, lit(1),
        greatest(floor(size(t) / 3).cast("int"), lit(3)))))
      .otherwise(concat_ws(" ",
        slice(t, lit(1), greatest(size(t) - 3, lit(1)))))

  /** embeddings ∪ perturbed twins (id+1M, +0.05 on component 0), as
    * double vectors, optionally capped to ids < cap for O(n²) baselines. */
  private def vecsWithTwins(s: SparkSession, d: String, cap: Long): DataFrame = {
    val e = Tables(s, d, "embeddings")
      .where(col("vec_id") < cap)
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    val pert = e.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("v"), (x, i) => x + when(i === 0, lit(0.05)).otherwise(lit(0.0))).as("v"))
    e.unionAll(pert)
  }

  private def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000

  /** Verified LSH near-dup pairs (a_id < b_id, exact Jaccard ≥ 0.5)
    * over the planted-twins corpus — the p05 pipeline as a reusable
    * pair source (p32 composes it with connected components).
    *
    * Shingle arrays feed three consumers (signature build + both sides
    * of the verify join) — hash each 3-gram to a long FIRST (set
    * Jaccard is hash-invariant modulo 2^-64 collisions), then
    * materialize once: long arrays checkpoint and intersect far cheaper
    * than 3-gram strings. Token barrier first: the shingle lambda reads
    * the token array 3× per position, and CollapseProject would inline
    * the regex split into every read (the p16 blowup — measured ~2×
    * here). Verify joins shingles back; arrays were sorted at the
    * checkpoint so each pair is one native merge-walk, not two hash-set
    * builds. */
  private[queries] def lshVerifiedPairs(s: SparkSession, d: String,
      k: Int = 32, b: Int = 8, r: Int = 4): DataFrame =
    lshVerifiedPairsFrom(docsWithTwins(s, d), k, b, r)

  /** The banding stage of [[lshVerifiedPairsFrom]] exposed for the 10×
    * scale rehearsal: (docs [doc_id, text]) → distinct candidate pairs
    * (a_id, b_id) from the (band_idx, band_hash) equi-join, plus the
    * checkpointed shingle frame the verify stage reuses. Candidate
    * volume is the quantity that must grow LINEARLY with corpus size
    * for the dedup spine to survive 100 TB — ScaleRehearsalSpec pins it
    * on disjoint token-renamed copies. */
  private[graft] def lshCandidatesFrom(docsRaw: DataFrame,
      k: Int, b: Int, r: Int): (DataFrame, DataFrame) = {
    val docs = docsRaw
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .transform(graft.Part.pin(col("doc_id")))
      .select(col("doc_id"),
        array_sort(transform(TextOps.shingles(col("tk"), 3),
          sh => xxhash64(sh))).as("sh"))
      .localCheckpoint()
    // per-row signatures (native one-pass XxMinhashSigs) instead of the
    // old explode → k-min-aggregate: same band hashes bit-for-bit (the
    // aggregate's min(xxhash64(h, i)) IS this fold), but the whole
    // explode+groupBy shuffle of the shingle stream disappears — the
    // banding stage is map-side until the bucket aggregate. The
    // signature materializes behind its own checkpoint so the band
    // lambda (b references) can't re-inline the k-pass fold per band —
    // the same re-evaluation hazard the hs barrier already guards.
    val sigs = docs.select(col("doc_id"),
        TextOps.xxMinhashSigs(
          transform(col("sh"), x => xxhash64(x)), k).as("mh"))
      .localCheckpoint()
    // null mh = shingle-less doc: the old explode form simply emitted
    // no rows for it — keep that (otherwise every empty doc would share
    // the xxhash64('') bucket)
    val bands = sigs.where(col("mh").isNotNull)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), lit(b - 1)), bi =>
          xxhash64(concat_ws(",", transform(
            slice(col("mh"), bi * r + 1, lit(r)),
            v => v.cast("string"))))))
        .as(Seq("band_idx", "band_hash")))
    (TextOps.candidatePairs(bands, "doc_id"), docs)
  }

  private[graft] def lshVerifiedPairsFrom(docsRaw: DataFrame,
      k: Int = 32, b: Int = 8, r: Int = 4): DataFrame = {
    val (cand, docs) = lshCandidatesFrom(docsRaw, k, b, r)
    cand
      .join(docs.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .withColumn("jac", TextOps.jaccardSorted(col("a_sh"), col("b_sh")))
      .where(col("jac") >= 0.5)
      .select("a_id", "b_id")
  }

  /** p40's fully-MIRRORED verified pair source (polyhash shingles →
    * 16 minhashes → 8×2 bands → exact-Jaccard ≥ 0.5 verify), returned
    * raw (a_id, b_id, jac) for composition: p40 emits it rounded, p60
    * feeds it to connected components. Every stage is deterministic
    * integer arithmetic both engines share — unlike lshVerifiedPairs
    * (xxhash64), this source is DuckDB-expressible end to end. */
  /** The mirrored pair source's shingle-hash + banding stage, shared by
    * [[mirrorVerifiedPairs]] and p72's incremental probe: (hs [doc_id,
    * sorted poly-hash shingles], bands [doc_id, bi, bv]). */
  private[queries] def mirrorHsBands(s: SparkSession,
      d: String): (DataFrame, DataFrame) =
    mirrorHsBandsOf(docsWithTwins(s, d))

  /** [[mirrorHsBands]] over an arbitrary (doc_id, text, …) corpus —
    * p77 runs the same mirrored family over three generations. */
  private[queries] def mirrorHsBandsOf(docs: DataFrame)
      : (DataFrame, DataFrame) = {
    val P = 1000000007L
    def polyH(g: Column): Column = TextOps.polyHash(g) // native codegen fold
    val hs = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 3)
      .transform(graft.Part.pin(col("doc_id")))
      .select(col("doc_id"), array_sort(array_distinct(
        transform(TextOps.shingles(col("tk"), 3), g => polyH(g)))).as("hs"))
      .localCheckpoint()
    // native one-pass signature (MinhashSigs): 16 running minima in a
    // single hs traversal vs 16 transform+array_min passes — same
    // integers as the DuckDB mirror's list_transform chain
    val mh = hs.select(col("doc_id"), col("hs"),
      TextOps.minhashSigs(col("hs"), 16).as("mh"))
    val bands = mh.select(col("doc_id"), posexplode(
        transform(sequence(lit(0), lit(7)), j =>
          element_at(col("mh"), j * 2 + 1) * P +
            element_at(col("mh"), j * 2 + 2))).as(Seq("bi", "bv")))
    (hs, bands)
  }

  private[queries] def mirrorVerifiedPairs(s: SparkSession,
      d: String): DataFrame = {
    val (hs, bands) = mirrorHsBands(s, d)
    val cand = bands.select(col("bi"), col("bv"), col("doc_id").as("a_id"))
      .join(bands.select(col("bi"), col("bv"), col("doc_id").as("b_id")),
        Seq("bi", "bv"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    cand
      .join(hs.select(col("doc_id").as("a_id"), col("hs").as("a_hs")), "a_id")
      .join(hs.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), "b_id")
      .withColumn("jac", TextOps.jaccardSorted(col("a_hs"), col("b_hs")))
      .where(col("jac") >= 0.5)
      .select("a_id", "b_id", "jac")
  }

  /** The shared CTE chain of the mirrored pair source (everything up to
    * verified pairs `pr`), appended to [[twinsCte]] by p40 and p60. */
  private[queries] val mirrorPairsCte =
    """, tt AS (SELECT doc_id, string_split(text,' ') AS tk FROM alldocs
      |  WHERE len(string_split(text,' ')) >= 3),
      |sh AS (SELECT doc_id, list_sort(list_distinct(list_transform(
      |    list_distinct(list_transform(range(1, len(tk)-1),
      |      i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])),
      |    g -> list_reduce(list_prepend(CAST(7 AS BIGINT),
      |      list_transform(string_split(g,''),
      |        c -> CAST(ord(c) AS BIGINT))),
      |      (acc, x) -> (acc*131 + x) % 1000000007)))) AS hs FROM tt),
      |mh AS (SELECT doc_id, hs, list_transform(range(0, 16),
      |    i -> list_min(list_transform(hs,
      |      h -> (h*(2*i+3) + (5*i+7)) % 1000000007))) AS mh FROM sh),
      |bands AS (SELECT doc_id, unnest(range(0, 8)) AS bi,
      |  unnest(list_transform(range(0, 8),
      |    j -> mh[2*j+1]*1000000007 + mh[2*j+2])) AS bv FROM mh),
      |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv
      |    AND a.doc_id < b.doc_id),
      |jj AS (SELECT c.a_id, c.b_id,
      |  CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
      |    / len(list_distinct(list_concat(x.hs, y.hs))) AS jac
      |  FROM cand c JOIN sh x ON c.a_id = x.doc_id
      |  JOIN sh y ON c.b_id = y.doc_id),
      |pr AS (SELECT a_id, b_id, jac FROM jj WHERE jac >= 0.5)
      |""".stripMargin

  /** ONE oracle for the whole BM25 family — p34 (per-run postings),
    * p78 (persisted term-bucketed index probe), and s29 (the index
    * maintained BY a stream) all hash-check against this same SQL:
    * Okapi BM25 over the `documents` corpus, integer micro-unit
    * scoring, top-10 per query. */
  private[queries] val bm25ProbeOracle =
    """WITH docs AS (SELECT doc_id,
      |    CAST(len(string_split(text,' ')) AS BIGINT) AS dl,
      |    string_split(text,' ') AS t FROM documents),
      |post AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, dl, unnest(t) AS term FROM docs)
      |  GROUP BY doc_id, dl, term),
      |q(q_id, term) AS (VALUES (1,'spark'),(1,'join'),(2,'hash'),
      |  (2,'table'),(2,'scan'),(3,'window'),(3,'agg'),(3,'data')),
      |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post
      |  WHERE term IN (SELECT term FROM q) GROUP BY term),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(dl) AS BIGINT) AS sum_dl FROM docs),
      |sc AS (SELECT q.q_id, p.doc_id,
      |  CAST(floor(ln(1.0 + (st.n_docs - f.df + 0.5)/(f.df + 0.5))
      |    * (p.tf*2.2/(p.tf + 1.2*(0.25 + 0.75*p.dl
      |        /(CAST(st.sum_dl AS DOUBLE)/st.n_docs))))
      |    * 10000 + 0.5) AS BIGINT) AS u
      |  FROM post p JOIN q ON p.term = q.term
      |  JOIN dfreq f ON p.term = f.term CROSS JOIN st),
      |a AS (SELECT q_id, doc_id, CAST(sum(u) AS BIGINT) AS score_u
      |  FROM sc GROUP BY q_id, doc_id),
      |r AS (SELECT q_id, doc_id, score_u, ROW_NUMBER() OVER
      |  (PARTITION BY q_id ORDER BY score_u DESC, doc_id) AS rn FROM a)
      |SELECT CAST(q_id AS INTEGER) AS q_id, CAST(rn AS INTEGER) AS rank,
      |  doc_id, score_u
      |FROM r WHERE rn <= 10 ORDER BY q_id, rank""".stripMargin

  /** WordPiece trainer shared by p89 (batch apply) and s30 (streamed
    * apply): top-512 corpus-weighted substrings (len 2-6, distinct per
    * word) + every single char, compiled to the greedy-MaxMatch regex —
    * an alternation ordered longest-first, which under leftmost-first
    * semantics (identical in Java regex and RE2) picks the longest
    * vocab piece at every position. Two bounded collects (512 + the
    * charset), the p76 page discipline. */
  private[queries] def wordpiecePattern(s: SparkSession,
      d: String): String = {
    import s.implicits._
    val words = graft.Tables(s, d, "documents")
      .select(explode(graft.llm.TextOps.tokens(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds the substring page AND the charset
    val freq = words
      .select(col("cnt"), explode(expr(
        "array_distinct(filter(flatten(transform(" +
          "sequence(1, char_length(w)), i -> transform(" +
          "sequence(2, 6), l -> substring(w, i, l)))), " +
          "p -> char_length(p) >= 2))")).as("s"))
      .groupBy("s").agg(sum("cnt").as("freq"))
    val top = freq.orderBy(col("freq").desc, col("s").asc)
      .limit(512).select("s").as[String].collect() // bounded page
    val chars = words.select(explode(split(col("w"), "")).as("c"))
      .where(col("c") =!= "").distinct().as[String].collect()
    // [a-z0-9] corpus — no metacharacters to escape; longest-first,
    // then lexicographic, so both engines build the same pattern. The
    // alternation is interpolated UNQUOTED into Java regex here and
    // into RE2 in the oracle; a regex metacharacter in a vocab piece
    // would silently change match semantics (and differently per
    // engine), so a corpus drift must fail loudly instead.
    val vocab = (top.toSet ++ chars.toSet).toSeq
      .sortBy(p => (-p.length, p))
    val offender = vocab.find(!_.matches("[a-z0-9]+"))
    require(offender.isEmpty, s"wordpiece vocab piece ${offender.get} " +
      "contains non-[a-z0-9] chars — quote the alternation (\\Q...\\E) " +
      "in BOTH engines before lifting this guard")
    "(" + vocab.mkString("|") + ")"
  }

  /** ONE oracle for the WordPiece family — p89 (batch train+apply) and
    * s30 (the stream-served tokenizer) hash-check against this same
    * SQL: trained top-512+chars vocab, greedy MaxMatch as the ordered
    * alternation under RE2, corpus token frequencies top-100. */
  private[queries] val wordpieceOracle =
    """WITH w0 AS (SELECT unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |words AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
      |  FROM w0 WHERE w <> '' GROUP BY w),
      |subs AS (SELECT unnest(list_filter(list_distinct(flatten(
      |    list_transform(range(1, CAST(len(w) AS BIGINT) + 1),
      |      i -> list_transform(range(2, 7), l -> w[i:i+l-1])))),
      |    p -> len(p) >= 2)) AS s, cnt FROM words),
      |freq AS (SELECT s, CAST(sum(cnt) AS BIGINT) AS freq
      |  FROM subs GROUP BY s),
      |top AS (SELECT s FROM freq ORDER BY freq DESC, s LIMIT 512),
      |chars AS (SELECT DISTINCT unnest(string_split(w, '')) AS s
      |  FROM words),
      |vocab AS (SELECT DISTINCT s FROM
      |  (SELECT s FROM top UNION ALL SELECT s FROM chars)),
      |pat AS MATERIALIZED (SELECT '(' ||
      |    string_agg(s, '|' ORDER BY len(s) DESC, s ASC)
      |    || ')' AS p FROM vocab),
      |tk AS (SELECT unnest(regexp_extract_all(w,
      |    (SELECT p FROM pat))) AS token, cnt FROM words),
      |agg AS (SELECT token, CAST(sum(cnt) AS BIGINT) AS n
      |  FROM tk GROUP BY token)
      |SELECT token, n FROM agg
      |ORDER BY n DESC, token LIMIT 100""".stripMargin

  val registry: Seq[RegQuery] = Seq(

    // ---- p01: exact dedup by content hash ------------------------------
    RegQuery("p01_exact_dedup",
      (s, d) => docsWithTwins(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("total"),
             countDistinct(md5(col("text"))).as("uniq"))
        .orderBy("source"),
      Some(twinsCte +
        """SELECT source, count(*) AS total, count(DISTINCT md5(text)) AS uniq
          |FROM alldocs GROUP BY source ORDER BY source""".stripMargin)),

    // ---- p02: document fingerprint (normalized content hash) -----------
    RegQuery("p02_fingerprint",
      (s, d) => Tables(s, d, "documents")
        .where(col("doc_id") < 50)
        .select(col("doc_id"),
          md5(regexp_replace(lower(col("text")), "[^a-z0-9 ]", "")).as("fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fp
             |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin)),

    // ---- p03: token statistics -----------------------------------------
    RegQuery("p03_text_stats",
      (s, d) => {
        val t = TextOps.tokens(col("text"))
        Tables(s, d, "documents")
          .select(col("doc_id"),
            size(t).as("n_tok"),
            size(array_distinct(t)).as("n_uniq"),
            r4(size(array_distinct(t)).cast("double") / size(t)).as("ttr"),
            array_max(transform(t, x => length(x))).as("max_len"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |CAST(len(t) AS INTEGER) AS n_tok,
             |CAST(len(list_distinct(t)) AS INTEGER) AS n_uniq,
             |floor(CAST(len(list_distinct(t)) AS DOUBLE)/len(t)*10000 + 0.5)/10000 AS ttr,
             |CAST(list_max(list_transform(t, x -> length(x))) AS INTEGER) AS max_len
             |FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // ---- p04: n-gram Jaccard near-dup (exact all-pairs baseline) -------
    RegQuery("p04_ngram_jaccard",
      (s, d) => {
        // materialize the 200 shingle arrays once — inlined into the
        // cross join they'd be rebuilt (split + concat per position)
        // for every pair comparison. Hashed to SORTED longs so the
        // pairwise op is the native merge-walk (jaccard_sorted) — set
        // Jaccard is hash-invariant, so the value the oracle computes
        // on strings is identical (modulo 2^-64 collisions)
        val sub = docsWithTwins(s, d)
          .where(col("doc_id") % 1000000 < CorpusCaps.ExactWitness)
          .select(col("doc_id"),
            array_sort(transform(
              TextOps.shingles(TextOps.tokens(col("text")), 3),
              sh => xxhash64(sh))).as("sh"))
          .localCheckpoint()
        val a = sub.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
        val b = sub.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
        a.crossJoin(b).where(col("a_id") < col("b_id"))
          .withColumn("jac", TextOps.jaccardSorted(col("a_sh"), col("b_sh")))
          .where(col("jac") >= 0.5)
          .select("a_id", "b_id", "jac")
          .orderBy("a_id", "b_id")
      },
      Some(twinsCte +
        s""", sub AS (
          |  SELECT doc_id, list_distinct(list_transform(
          |    range(1, greatest(len(string_split(text,' '))-1, 2)),
          |    i -> string_split(text,' ')[i] || ' ' ||
          |         string_split(text,' ')[i+1] || ' ' ||
          |         string_split(text,' ')[i+2])) AS sh
          |  FROM alldocs WHERE doc_id % 1000000 < ${CorpusCaps.ExactWitness})
          |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jac
          |FROM sub a JOIN sub b ON a.doc_id < b.doc_id
          |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
          |ORDER BY a_id, b_id""".stripMargin)),

    // ---- p05: MinHash + LSH near-dup (the linear scale path) -----------
    RegQuery("p05_minhash_lsh",
      (s, d) => lshVerifiedPairs(s, d).orderBy("a_id", "b_id"),
      None), // LSH banding not SQL-expressible → driver rows-only check

    // ---- p06: SimHash near-dup (Hamming ≤ 6, chunk blocking) ------------
    RegQuery("p06_simhash_neardup",
      (s, d) => {
        val docs = docsWithTwins(s, d)
        val sig = TextOps.simhash(docs, "doc_id", TextOps.tokens(col("text")))
        val chunks = TextOps.simhashChunks(sig, "doc_id")
        val a = chunks.select(col("chunk_idx"), col("chunk_val"),
          col("doc_id").as("a_id"), col("simhash").as("a_sim"))
        val b = chunks.select(col("chunk_idx"), col("chunk_val"),
          col("doc_id").as("b_id"), col("simhash").as("b_sim"))
        a.join(b, Seq("chunk_idx", "chunk_val"))
          .where(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).as("hamming"))
          .distinct()
          .where(col("hamming") <= 6)
          .orderBy("a_id", "b_id")
      },
      None),

    // ---- p07: language-ID heuristic (stopword-ratio) --------------------
    RegQuery("p07_langid",
      (s, d) => {
        val t = TextOps.tokens(col("text"))
        val ratio = TextOps.stopwordRatio(t)
        Tables(s, d, "documents")
          .select(col("doc_id"),
            when(ratio >= 0.08, "en").otherwise("unk").as("pred"),
            r4(ratio).as("stop_ratio"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |CASE WHEN r >= 0.08 THEN 'en' ELSE 'unk' END AS pred,
             |floor(r*10000 + 0.5)/10000 AS stop_ratio
             |FROM (SELECT doc_id,
             |  CAST(len(list_filter(string_split(text,' '),
             |    x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
             |    / len(string_split(text,' ')) AS r
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // ---- p08: quality score (length / diversity / stopword mix) ---------
    RegQuery("p08_quality_score",
      (s, d) => {
        val t = TextOps.tokens(col("text"))
        val nTok = size(t).cast("double")
        val ttr = size(array_distinct(t)).cast("double") / size(t)
        val stop = TextOps.stopwordRatio(t)
        val score = least(nTok / 100.0, lit(1.0)) * 0.4 + ttr * 0.3 + stop * 0.3
        Tables(s, d, "documents")
          .select(col("doc_id"), r4(score).as("quality"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, floor((least(n_tok/100.0, 1.0)*0.4 + ttr*0.3 + stop*0.3)
             |  *10000 + 0.5)/10000 AS quality
             |FROM (SELECT doc_id,
             |  CAST(len(t) AS DOUBLE) AS n_tok,
             |  CAST(len(list_distinct(t)) AS DOUBLE)/len(t) AS ttr,
             |  CAST(len(list_filter(t,
             |    x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)/len(t) AS stop
             |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents))
             |ORDER BY doc_id""".stripMargin)),

    // ---- p09: brute-force cosine top-k (exact ANN baseline) -------------
    RegQuery("p09_ann_topk",
      (s, d) => {
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
        val q = e.where(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val scored = e.select(col("vec_id").as("n_id"), col("v").as("nv"))
          .crossJoin(broadcast(q))
          .where(col("q_id") =!= col("n_id"))
          .withColumn("cos_r",
            floor(VectorOps.cosineFast(col("qv"), col("nv")) * 1000000 + 0.5) / 1000000)
        scored.withColumn("rank", row_number().over(
            Window.partitionBy("q_id").orderBy(col("cos_r").desc, col("n_id"))))
          .where(col("rank") <= 5)
          .select("q_id", "rank", "n_id", "cos_r")
          .orderBy("q_id", "rank")
      },
      Some(p09Oracle)),

    // ---- p10: LSH-bucketed ANN (the linear scale path) -------------------
    RegQuery("p10_ann_lsh",
      (s, d) => {
        val planes = VectorOps.hyperplanes(tables = 4, planes = 8, dim = 64)
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
        val buckets = VectorOps.lshBuckets(e, "vec_id", col("v"), planes)
        val q = buckets.where(col("vec_id") < 10)
          .select(col("table_idx"), col("sig"), col("vec_id").as("q_id"))
        val cand = q.join(buckets, Seq("table_idx", "sig"))
          .where(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("n_id")).distinct()
        val scored = cand
          .join(e.select(col("vec_id").as("q_id"), col("v").as("qv")), "q_id")
          .join(e.select(col("vec_id").as("n_id"), col("v").as("nv")), "n_id")
          .withColumn("cos_r",
            floor(VectorOps.cosineFast(col("qv"), col("nv")) * 1000000 + 0.5) / 1000000)
        scored.withColumn("rank", row_number().over(
            Window.partitionBy("q_id").orderBy(col("cos_r").desc, col("n_id"))))
          .where(col("rank") <= 3)
          .select("q_id", "rank", "n_id", "cos_r")
          .orderBy("q_id", "rank")
      },
      None), // approximate by construction → rows-only; recall vs p09 in tests

    // ---- p11: embedding near-dup (cosine > 0.9; planted twins) ----------
    // BUCKETED headline plan: candidates come from an equi-join on the
    // p48 deterministic hyperplane buckets (4 tables × 8 sign bits),
    // never all-pairs — linear in corpus size like every other dedup
    // spine entry. The identical banding runs in the DuckDB oracle
    // (mirrorSigs arithmetic), so the result — including which
    // near-threshold pairs the banding recalls — stays hash-checked.
    // The bounded exact all-pairs form survives as the WITNESS (p04
    // pattern): LshSpec pins this plan's recall against it and asserts
    // no CartesianProduct/BroadcastNestedLoopJoin in this plan.
    RegQuery("p11_embed_neardup",
      (s, d) => {
        val all = vecsWithTwins(s, d, cap = CorpusCaps.Vectors)
          .localCheckpoint() // feeds buckets + both sides of the verify
        val buckets = all.select(col("vec_id"),
          posexplode(mirrorSigs(col("v"))).as(Seq("t", "sig")))
        val cand = buckets
          .join(buckets.select(col("t"), col("sig"),
            col("vec_id").as("b_id")), Seq("t", "sig"))
          .where(col("vec_id") < col("b_id"))
          .select(col("vec_id").as("a_id"), col("b_id")).distinct()
        cand
          .join(all.select(col("vec_id").as("a_id"), col("v").as("av")),
            "a_id")
          .join(all.select(col("vec_id").as("b_id"), col("v").as("bv")),
            "b_id")
          .where(VectorOps.cosineFast(col("av"), col("bv")) > 0.9)
          .select("a_id", "b_id")
          .orderBy("a_id", "b_id")
      },
      Some(p11BucketedOracle)),

    // ---- p12: multimodal binary column + REAL batched image decode ------
    // ImageIO encodes a gray PNG per doc in the executors, then the
    // decode side recovers dims + mean luminance from the actual bytes;
    // the oracle recomputes both arithmetically from doc_id. A failed
    // decode would yield (-1,-1,-1) and hash-mismatch — the oracle
    // genuinely gates the codec path.
    RegQuery("p12_multimodal_decode",
      (s, d) => graft.llm.Multimodal
        .decodeImages(graft.llm.Multimodal.imageTable(s, d))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |CAST(8 + doc_id % 16 AS INTEGER) AS width,
             |CAST(8 + doc_id % 8 AS INTEGER) AS height,
             |CAST(doc_id % 256 AS INTEGER) AS mean_lum
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- p17: multimodal audio column + REAL batched WAV decode ---------
    // javax.sound.sampled writes a genuine RIFF/WAVE per doc in the
    // executors; the decode recovers rate/channels/frames from the
    // container header and the exact peak from the PCM stream. The
    // square-wave corpus makes every feature integer arithmetic on
    // doc_id, so the oracle genuinely gates the codec path.
    RegQuery("p17_audio_decode",
      (s, d) => graft.llm.Multimodal
        .decodeAudio(graft.llm.Multimodal.audioTable(s, d))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, 8000 AS sample_rate, 1 AS channels,
             |CAST(400 + doc_id % 100 AS BIGINT) AS n_samples,
             |CAST(1000 + doc_id % 1000 AS INTEGER) AS peak
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- p15: multimodal frame-sample + resize (generator fan-out) ------
    // REAL end-to-end: videoTable encodes genuine JPEG frame sequences
    // (motion-JPEG), sampleFrames demuxes by SOI/EOI scan, ImageIO
    // decodes, Graphics2D resizes to 64×64, and fhash is the resized
    // frame's measured mean luminance. The oracle can still predict it
    // because uniform gray at quality 1.0 round-trips bit-exact
    // (pinned in MultimodalSpec) — the hash gates the whole
    // encode→demux→decode→resize arithmetic, not a stub.
    RegQuery("p15_frame_sample",
      (s, d) => graft.llm.Multimodal
        .sampleFrames(graft.llm.Multimodal.videoTable(s, d),
          every = 10, w = 64, h = 64)
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH s AS (SELECT doc_id,
             |    unnest(range(0, 25 + doc_id % 10, 10)) AS fi
             |  FROM documents)
             |SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
             |  64 AS width, 64 AS height,
             |  CAST((doc_id * 31 + fi * 17) % 256 AS INTEGER) AS fhash
             |FROM s ORDER BY doc_id, frame_idx""".stripMargin)),

    // ---- p13: BPE-ish regex token counting (vs whitespace) --------------
    // One regexp_extract_all pass per doc — codegen'd, no UDF; the ratio
    // is the standard tokens-per-word fertility metric.
    RegQuery("p13_bpe_tokens",
      (s, d) => {
        val ws = TextOps.tokens(col("text"))
        val bpe = TextOps.bpeTokens(col("text"))
        Tables(s, d, "documents")
          .select(col("doc_id"),
            size(ws).as("n_ws"),
            size(bpe).as("n_bpe"),
            r4(size(bpe).cast("double") / size(ws)).as("fertility"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws,
             |CAST(len(regexp_extract_all(text,
             |  '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))
             |  AS INTEGER) AS n_bpe,
             |floor(CAST(len(regexp_extract_all(text,
             |  '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))
             |  AS DOUBLE) / len(string_split(text, ' ')) * 10000 + 0.5)/10000
             |  AS fertility
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- p14: IVF ANN with a TRAINED coarse quantizer -------------------
    // Inverted-file structure: K=8 deterministic seeds (vec_id < 8) are
    // TRAINED with 2 k-means Lloyd steps — assign is one broadcast×scan
    // pass, update is the VectorCentroid partial-agg UDAF (map-side
    // combine ships (sums, count) per cell, not vectors) — then the
    // corpus is assigned once and each query brute-forces only its
    // nprobe=2 nearest cells. Sims AND centroid components round at 1e-6
    // so the DuckDB mirror (per-dim avg lists generated in ivfOracle) is
    // bit-identical. At 100 TB: train on a sample, write the corpus
    // bucketed by cell — the probe is then a bucket-pruned scan (proven
    // in ScaleSpec "IVF probe scans only the probed cells' buckets").
    RegQuery("p14_ann_ivf",
      (s, d) => {
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
        def sim6(a: Column, b: Column) =
          floor(VectorOps.cosineFast(a, b) * 1000000 + 0.5) / 1000000
        def nearest(vecs: DataFrame, cents: DataFrame, keep: Int) =
          vecs.crossJoin(broadcast(cents))
            .withColumn("rn", row_number().over(Window.partitionBy("vec_id")
              .orderBy(sim6(col("v"), col("cv")).desc, col("c_id"))))
            .where(col("rn") <= keep)
        var cents = e.where(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("v").as("cv"))
        val centroid = udaf(graft.functions.VectorCentroid)
        for (_ <- 1 to 2) // Lloyd: assign → per-cell mean, rounded 1e-6
          cents = nearest(e, cents, 1)
            .groupBy("c_id")
            .agg(transform(centroid(col("v")),
              x => floor(x * 1000000 + 0.5) / 1000000).as("cv"))
        cents = cents.localCheckpoint() // train once; reused by both scans
        val assigned = nearest(e, cents, 1)
          .select(col("vec_id"), col("v"), col("c_id").as("cell"))
        val probes = nearest(e.where(col("vec_id") < 3), cents, 2)
          .select(col("vec_id").as("q_id"), col("v").as("qv"),
            col("c_id").as("cell"))
        // NOT salted (r10): only 3 probe vectors — the salted join's
        // ×width build replication and task floor measured SLOWER than
        // the single-task pair scan (A/B warm 1.49 → 1.56 s); the salt
        // stays where pair volume is corpus-sized (p83/s26)
        probes.join(assigned, "cell")
          .where(col("q_id") =!= col("vec_id"))
          .withColumn("cos_r", sim6(col("qv"), col("v")))
          .withColumn("rank", row_number().over(Window.partitionBy("q_id")
            .orderBy(col("cos_r").desc, col("vec_id"))))
          .where(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
            col("cos_r"))
          .orderBy("q_id", "rank")
      },
      Some(ivfOracle)),

    // ---- p31: product-quantization ANN (see pqQuery scaladoc) ----------
    RegQuery("p31_ann_pq", (s, d) => pqQuery(s, d), Some(pqOracle)),

    // ---- p16: winnowing document fingerprints ---------------------------
    // Winnowing (Schleimer et al., SIGMOD'03 — the MOSS algorithm): slide
    // a w=4 window over the positional 3-gram sequence, keep each
    // window's min hash; any shared substring of >= w+2 tokens is
    // guaranteed to share a fingerprint. The rolling min is ONE window
    // pass (no self-join); fingerprints are md5 hex strings so the
    // DuckDB mirror's lexicographic min picks identical values
    // (fixed-width hex ⇒ string order == numeric order).
    RegQuery("p16_winnow_fingerprint",
      (s, d) => {
        // everything stays INSIDE the row — grams, rolling mins, and the
        // distinct-count are array expressions in one codegen pass, so
        // the only shuffle is the final orderBy (the first cut windowed
        // over posexploded shingles: ~2M rows through an exchange for
        // the same answer, 6.8 s vs ~1 s at sf0.1)
        val w = 4
        val toks = TextOps.tokens(col("text"))
        val tk = col("tk")
        val grams = transform(
          sequence(lit(1), greatest(size(tk) - 2, lit(0))),
          i => md5(concat_ws(" ", element_at(tk, i),
            element_at(tk, i + 1), element_at(tk, i + 2))))
        // materialization barriers: CollapseProject would otherwise
        // inline the token split into every element_at reference of the
        // gram lambda (3× per position) and the gram build into every
        // try_element_at of the window lambda (4× per position) — an
        // O(w·n) blowup of md5/split work per doc (measured 12 s vs
        // ~1.5 s at sf0.1). Each barrier shuffles only 5000 array rows.
        Tables(s, d, "documents")
          .where(size(toks) >= 3)
          .select(col("doc_id"), toks.as("tk"))
          .transform(graft.Part.pin(col("doc_id")))
          .select(col("doc_id"), grams.as("gs"))
          .transform(graft.Part.pin(col("doc_id")))
          // full windows i=1..n-w+1; least() skips the nulls
          // try_element_at yields past the end, so a doc shorter than w
          // keeps its single clamped whole-doc window (no per-position
          // slice allocation — measured 2× over array_min∘slice)
          .select(col("doc_id"), transform(
            sequence(lit(1), greatest(size(col("gs")) - (w - 1), lit(1))),
            i => least((0 until w).map(j =>
              try_element_at(col("gs"), i + j)): _*)).as("fp"))
          .select(col("doc_id"),
            size(array_distinct(col("fp"))).cast("long").as("n_fp"),
            array_min(col("fp")).as("min_fp"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
             |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
             |g AS (SELECT doc_id, list_transform(range(1, len(tk)-1),
             |    i -> md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gs
             |  FROM t),
             |f AS (SELECT doc_id,
             |    list_transform(range(1, greatest(len(gs)-4+1, 1)+1),
             |      i -> list_min(gs[i:i+3])) AS fp FROM g)
             |SELECT doc_id, CAST(len(list_distinct(fp)) AS BIGINT) AS n_fp,
             |  list_min(fp) AS min_fp
             |FROM f ORDER BY doc_id""".stripMargin)),

    // ---- p34: BM25 top-k retrieval over inverted postings ---------------
    // Okapi BM25 (Robertson et al., TREC-3; k1=1.2, b=0.75): the corpus
    // becomes an inverted-postings frame — one explode + hash-agg, the
    // exact layout a 100 TB engine would bucket by term — and each query
    // is a broadcast join against it. Scores are summed as BIGINT
    // micro-units (floor at 1e-4 per term contribution) so the
    // aggregation is exact integer math — float sum order can never
    // break rank stability or oracle parity; the 1e-4 floor also
    // absorbs cross-engine ln() ulps (the p26 trick). At scale: postings
    // are hash-partitioned by term, df/avgdl are tiny broadcast sides,
    // and per-query top-k is one window over the matched docs only.
    RegQuery("p34_bm25_search",
      (s, d) => bm25TopK(s, d, 10)
        .select("q_id", "rank", "doc_id", "score_u")
        .orderBy("q_id", "rank"),
      Some(bm25ProbeOracle)),

    // ---- p35: exact duplicated-span detection (substring dedup) ---------
    // Lee et al., "Deduplicating Training Data Makes Language Models
    // Better" (ACL'22): find exact K-token spans shared across documents
    // and score each doc by its duplicated-span fraction. Spans hash to
    // a long (xxhash64) AT BIRTH inside the row — the corpus-wide state
    // is (hash, count), never span text (the oracle groups the strings
    // themselves; identical modulo 2^-64 collisions, the p04 contract).
    // One explode + one hash-agg + one co-partitioned join back — all
    // linear, the suffix-array result at Spark cost. Runs over the
    // planted-twins corpus so real cross-doc duplicates exist.
    RegQuery("p35_span_dedup",
      (s, d) => {
        val K = 8
        val tk = col("tk")
        val sp = docsWithTwins(s, d)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
          .where(size(col("tk")) >= K)
          .transform(graft.Part.pin(col("doc_id"))) // token barrier: span lambda reads tk K×/pos
          .select(col("doc_id"), explode(array_distinct(transform(
            sequence(lit(1), size(tk) - (K - 1)),
            i => xxhash64(concat_ws(" ", slice(tk, i, lit(K))))))).as("h"))
          .localCheckpoint() // feeds the span-count agg AND the join back
        val dup = sp.groupBy("h").agg(count(lit(1)).as("nd"))
        sp.join(dup, "h") // co-partitioned with the agg above (same key)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_spans"),
            sum((col("nd") >= 2).cast("long")).as("n_dup"))
          .select(col("doc_id"), col("n_spans"), col("n_dup"),
            r4(col("n_dup").cast("double") / col("n_spans")).as("dup_frac"))
          .orderBy("doc_id")
      },
      Some(twinsCte +
        """, tt AS (SELECT doc_id, string_split(text,' ') AS tk FROM alldocs
          |  WHERE len(string_split(text,' ')) >= 8),
          |sp AS (SELECT doc_id, unnest(list_distinct(list_transform(
          |    range(1, len(tk)-6),
          |    i -> array_to_string(tk[i:i+7], ' ')))) AS h FROM tt),
          |dup AS (SELECT h, CAST(count(*) AS BIGINT) AS nd FROM sp GROUP BY h)
          |SELECT sp.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
          |  CAST(sum(CASE WHEN dup.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
          |  floor(CAST(sum(CASE WHEN dup.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
          |    /count(*)*10000 + 0.5)/10000 AS dup_frac
          |FROM sp JOIN dup USING(h) GROUP BY sp.doc_id
          |ORDER BY doc_id""".stripMargin)),

    // ---- p36: bigram-LM perplexity scoring (KenLM-style filter) ---------
    // The CCNet quality gate: train an add-one-smoothed bigram model ON
    // the corpus (two hash-aggs: c(w1,w2) and context totals c(w1·)),
    // then score every doc by average negative log-likelihood. Per-bigram
    // log-probs floor to BIGINT 1e-4 units before the weighted sum, so
    // the per-doc total is exact integer math (no float-sum order, ln()
    // ulps absorbed — the p34 discipline). At 100 TB the count tables
    // are vocab-bounded (≪ corpus), shuffle-joined on (w1,w2) with
    // map-side partial aggs; the vocab size is one broadcast scalar.
    RegQuery("p36_bigram_lm",
      (s, d) => {
        val tk = col("tk")
        val base = Tables(s, d, "documents")
          .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
          .where(size(col("tk")) >= 2)
          .transform(graft.Part.pin(col("doc_id"))) // token barrier (lambda reads tk 2×/pos)
          .select(col("doc_id"), explode(transform(
            sequence(lit(1), size(tk) - 1),
            i => struct(element_at(tk, i).as("w1"),
              element_at(tk, i + 1).as("w2")))).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
          .localCheckpoint() // feeds c12, c1, and the per-doc side
        val c12 = base.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val c1 = base.groupBy("w1").agg(count(lit(1)).as("c1"))
        val vocab = Tables(s, d, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("w"))
          .agg(countDistinct(col("w")).as("vsz"))
        val u = floor(log((col("c12") + lit(1.0)) / (col("c1") + col("vsz")))
          * 10000 + 0.5).cast("long")
        base.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("n"))
          .join(c12, Seq("w1", "w2"))
          .join(c1, Seq("w1"))
          .crossJoin(broadcast(vocab))
          .withColumn("u", u)
          .groupBy("doc_id")
          .agg(sum(col("n")).as("n_bg"), (-sum(col("u") * col("n"))).as("nll_u"))
          .select(col("doc_id"), col("n_bg"), col("nll_u"),
            r4(col("nll_u").cast("double") / col("n_bg") / 10000).as("avg_nll"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS tk
             |  FROM documents WHERE len(string_split(text,' ')) >= 2),
             |bb AS (SELECT doc_id,
             |  unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
             |  unnest(list_transform(range(1, len(tk)), i -> tk[i+1])) AS w2
             |  FROM t),
             |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bb
             |  GROUP BY w1, w2),
             |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bb
             |  GROUP BY w1),
             |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vsz FROM
             |  (SELECT unnest(string_split(text,' ')) AS w FROM documents)),
             |dt AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS n
             |  FROM bb GROUP BY doc_id, w1, w2),
             |sc AS (SELECT dt.doc_id, dt.n,
             |  CAST(floor(ln((c12.c12 + 1.0)/(c1.c1 + v.vsz))*10000 + 0.5)
             |    AS BIGINT) AS u
             |  FROM dt JOIN c12 USING(w1, w2) JOIN c1 USING(w1) CROSS JOIN v)
             |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bg,
             |  CAST(-sum(u*n) AS BIGINT) AS nll_u,
             |  floor(CAST(-sum(u*n) AS DOUBLE)/sum(n)/10000*10000 + 0.5)/10000
             |    AS avg_nll
             |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- p39: sequence packing (context-window assignment) --------------
    // The last hop of a pretraining pipeline: concatenate documents and
    // chunk into fixed 2048-token sequences. "Concat then chunk" is
    // pure running-sum arithmetic — each doc's sequence id and offset
    // fall out of the cumulative token count before it — so packing is
    // a WINDOW, not a sequential loop. Packing is per-shard (source),
    // the way a 1000-executor job does it: each shard packs
    // independently in parallel (window partitioned by source — no
    // global ordering bottleneck), at the cost of at most one
    // part-filled tail sequence per shard. Integers end to end: the
    // oracle is bit-trivially identical.
    RegQuery("p39_seq_packing",
      (s, d) => {
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, d, "documents")
          .select(col("doc_id"), col("source"),
            size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
          .withColumn("cum_before", sum(col("n_tok")).over(w) - col("n_tok"))
          .select(col("doc_id"), col("source"), col("n_tok"),
            (col("cum_before") / 2048).cast("long").as("seq_id"),
            (col("cum_before") % 2048).as("off"))
          .orderBy("source", "doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, source,
             |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |c AS (SELECT doc_id, source, n_tok,
             |  sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
             |    ROWS UNBOUNDED PRECEDING) - n_tok AS cum_before FROM t)
             |SELECT doc_id, source, n_tok,
             |  CAST(cum_before // 2048 AS BIGINT) AS seq_id,
             |  CAST(cum_before % 2048 AS BIGINT) AS off
             |FROM c ORDER BY source, doc_id""".stripMargin)),

    // ---- p40: MinHash-LSH near-dup, hash-checked END TO END -------------
    // p05's pipeline (shingle → MinHash signature → banded candidates →
    // exact-Jaccard verify) is rows-only because xxhash64 has no DuckDB
    // analog. This is the SAME algorithm built from mirrorable pieces —
    // p37's polynomial shingle hash, an affine rehash family
    // ((2i+3)·h + 5i+7 mod 1e9+7, no overflow possible), band keys as
    // exact BIGINT pairs (mh₂ⱼ·P + mh₂ⱼ₊₁) — so every stage, including
    // which near-miss candidates the bands happen to emit, hash-matches
    // the DuckDB mirror. Recovers 499/500 planted twins at sf0.01 plus
    // the genuine near-dup tail, same as p05. The fast path stays p05
    // (native codegen'd xxhash64); this is its correctness witness —
    // the banding/verify structure is now oracle-proven, not just
    // invariant-bounded. k=16, b=8, r=2 (recall at J=0.5:
    // 1-(1-J²)⁸ ≈ 0.90, ≈1 for the J≈0.9 twins).
    RegQuery("p40_lsh_mirror",
      (s, d) =>
        // token barrier + hash/sort shingles once behind a checkpoint
        // (the p05/p16 CollapseProject blowup) live in
        // mirrorVerifiedPairs, shared with p60's composition
        mirrorVerifiedPairs(s, d)
          .select(col("a_id"), col("b_id"),
            (floor(col("jac") * 10000 + 0.5) / 10000).as("jac"))
          .orderBy("a_id", "b_id"),
      Some(twinsCte + mirrorPairsCte +
        """SELECT a_id, b_id, floor(jac*10000 + 0.5)/10000 AS jac
          |FROM pr ORDER BY a_id, b_id""".stripMargin)),

    // ---- p41: TF-IDF keyword extraction ---------------------------------
    // Top-3 characteristic terms per document — the classic corpus
    // statistic behind search indexing, topic labeling, and keyword
    // metadata columns. idf = ln(N/df) floors to BIGINT micro-units
    // BEFORE the tf multiply (p34 discipline: exact integer scores, ln()
    // ulps absorbed), so ranking and oracle parity are bit-stable. Two
    // vocab-bounded hash-aggs (tf, then df over the tf frame — the
    // second is co-partitioned once tf shuffles on its group key) + one
    // per-doc window over that doc's distinct terms only: all linear,
    // the df side is vocabulary-sized (≪ corpus) like p36's count
    // tables, and N is one broadcast scalar row.
    RegQuery("p41_tfidf_keywords",
      (s, d) => tfidfKeywords(Tables(s, d, "documents"), topK = 3)
        .orderBy("doc_id", "rk"),
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS tk
             |  FROM documents),
             |tok AS (SELECT doc_id, unnest(tk) AS tok FROM t),
             |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
             |  FROM tok GROUP BY doc_id, tok),
             |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf
             |  GROUP BY tok),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs
             |  FROM documents),
             |sc AS (SELECT tf.doc_id, tf.tok, tf.tf,
             |  tf.tf * CAST(floor(1000000.0 *
             |    ln(CAST(st.n_docs AS DOUBLE)/dfq.df)) AS BIGINT)
             |    AS score_micro
             |  FROM tf JOIN dfq USING (tok) CROSS JOIN st),
             |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             |  ORDER BY score_micro DESC, tok) AS rk FROM sc)
             |SELECT doc_id, CAST(rk AS INTEGER) AS rk, tok, tf, score_micro
             |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // ---- p43: containment dedup (one-sided near-dup) --------------------
    // Quoted/excerpted/subset documents: containment C = |A∩B| / min(|A|,
    // |B|) over 3-shingle sets catches a short doc embedded in a long one
    // (C = 1.0) where symmetric Jaccard sits at |A|/|B| ≈ 0.5, under
    // p04/p05's radar — the asymmetric second pass every serious dedup
    // stack runs next to MinHash. Pure integer: cont_bp = shared·10000
    // div min-size basis points, so the gate and the output hash exactly.
    // Scale shape: inverted shingle index (explode + self-equi-join on
    // the shingle hash — shared count IS the intersection size) instead
    // of p04's crossJoin; a df ≤ 50 stop-shingle cap bounds any bucket's
    // pair fan-out to df² (the standard index-pruning move — dropped
    // shingles vanish from BOTH numerator and denominators, so the
    // planted subset pairs stay at exactly 10000 bp).
    RegQuery("p43_containment_dedup",
      (s, d) => containmentPairs(docsWithExcerpts(s, d),
          dfCap = 50, minBp = 9000)
        .orderBy("a_id", "b_id"),
      Some(excerptsCte +
        """, sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(
          |    range(1, greatest(len(string_split(text,' '))-1, 2)),
          |    i -> string_split(text,' ')[i] || ' ' ||
          |         string_split(text,' ')[i+1] || ' ' ||
          |         string_split(text,' ')[i+2]))) AS sh FROM alldocs),
          |keep AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 50),
          |idx AS (SELECT sh0.doc_id, sh0.sh FROM sh0 JOIN keep USING (sh)),
          |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM idx
          |  GROUP BY doc_id),
          |pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          |    CAST(count(*) AS BIGINT) AS shared
          |  FROM idx a JOIN idx b ON a.sh = b.sh AND a.doc_id < b.doc_id
          |  GROUP BY a.doc_id, b.doc_id)
          |SELECT a_id, b_id, shared,
          |  least(sa.sz, sb.sz) AS min_sz,
          |  CAST(shared * 10000 // least(sa.sz, sb.sz) AS BIGINT) AS cont_bp
          |FROM pr JOIN sz sa ON pr.a_id = sa.doc_id
          |  JOIN sz sb ON pr.b_id = sb.doc_id
          |WHERE shared * 10000 // least(sa.sz, sb.sz) >= 9000
          |ORDER BY a_id, b_id""".stripMargin)),

    // ---- p45: deterministic weighted priority sampling ------------------
    // Weighted sampling without replacement, the Efraimidis–Spirakis
    // priority shape: each doc draws a pseudo-random priority and the
    // k smallest priorities per stratum win, with P(win) increasing in
    // the weight. The "draw" is an affine hash of doc_id (Knuth
    // multiplicative, mod 1e9+7) and the priority is hash·1e6 div
    // weight — EXACT BIGINT end to end (integer truncating division,
    // no ln()/pow() whose libm rounding differs across engines), so the
    // sample is a pure function of the data and the DuckDB oracle
    // reproduces it bit-for-bit. Per-source top-k via one window whose
    // rank filter Spark turns into a WindowGroupLimit: every map task
    // keeps only its local top-10 per source BEFORE the exchange, so
    // the shuffle moves O(k·partitions), not the corpus — the property
    // that makes "sample 10 of 25 TB" one cheap pass (pinned in
    // ScaleSpec).
    RegQuery("p45_weighted_sample",
      (s, d) => {
        Tables(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            expr("((doc_id * 2654435761 + 104729) % 1000000007)" +
              " * 1000000 div n_chars").as("prio"))
          .withColumn("rk", row_number().over(Window.partitionBy("source")
            .orderBy(col("prio"), col("doc_id"))))
          .where(col("rk") <= 10)
          .select(col("source"), col("rk"), col("doc_id"), col("n_chars"),
            col("prio"))
          .orderBy("source", "rk")
      },
      Some("""WITH p AS (SELECT source, doc_id, n_chars,
             |  ((doc_id * 2654435761 + 104729) % 1000000007) * 1000000
             |    // n_chars AS prio FROM documents),
             |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
             |  ORDER BY prio, doc_id) AS rk FROM p)
             |SELECT source, CAST(rk AS INTEGER) AS rk, doc_id, n_chars,
             |  prio
             |FROM r WHERE rk <= 10 ORDER BY source, rk""".stripMargin)),

    // ---- p46: RAG sliding-window chunking -------------------------------
    // The retrieval-corpus builder: fixed-size token windows (C=64) with
    // overlap (stride S=48), each chunk carrying its provenance (start
    // token, length) and a polynomial content hash for downstream
    // chunk-level dedup (p25 consumes exactly this shape). All per-row
    // array arithmetic in one codegen span after the token barrier —
    // chunking 100 TB is map-only, no shuffle until someone aggregates
    // the chunks. Short docs (n ≤ C) emit one whole-doc chunk; the
    // last window is allowed to be short rather than re-reading the
    // tail twice (chunk count = 1 + ceil(max(n-C,0)/S), identical
    // integer formula both engines).
    RegQuery("p46_rag_chunks",
      (s, d) => ragChunks(Tables(s, d, "documents"), chunkTok = 64,
          stride = 48)
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS tk
             |  FROM documents),
             |n AS (SELECT doc_id, tk, len(tk) AS n,
             |  1 + (greatest(len(tk) - 64, 0) + 47) // 48 AS nch FROM t),
             |c AS (SELECT doc_id, unnest(range(0, nch)) AS chunk_idx, tk, n
             |  FROM n),
             |ch AS (SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
             |  CAST(chunk_idx*48 + 1 AS INTEGER) AS start_tok,
             |  tk[chunk_idx*48 + 1 : least(chunk_idx*48 + 64, n)] AS ck
             |  FROM c)
             |SELECT doc_id, chunk_idx, start_tok,
             |  CAST(len(ck) AS INTEGER) AS n_tok,
             |  list_reduce(list_prepend(CAST(7 AS BIGINT),
             |    list_transform(string_split(array_to_string(ck, ' '),''),
             |      x -> CAST(ord(x) AS BIGINT))),
             |    (acc, x) -> (acc*131 + x) % 1000000007) AS chunk_hash
             |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ---- p48: hyperplane-LSH ANN, fully mirrored ------------------------
    // p40's move applied to the EMBEDDING side: p10 stays the fast
    // xxhash64 hyperplane path (no DuckDB analog), and this twin runs
    // the identical algorithm with deterministic integer-derived planes
    // so every stage — plane weights, sign bits, bucket signatures,
    // candidate set, exact-cosine re-rank — hash-matches DuckDB. Plane
    // weights are integers in [-500, 500] from an affine congruence of
    // (table, plane, dim); the dot products are the same left-fold of
    // double·integer products on both engines, so even the sign of a
    // near-zero projection agrees bit-for-bit. Scale shape is p10's:
    // signature build is per-row arithmetic, candidates come from an
    // equi-join on (table, signature) — linear, never all-pairs — and
    // only the candidate set touches raw vectors again.
    RegQuery("p48_ann_lsh_mirror",
      (s, d) => {
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
          .localCheckpoint() // feeds buckets, queries, and both rerank sides
        val buckets = e.select(col("vec_id"),
          posexplode(mirrorSigs(col("v"))).as(Seq("t", "sig")))
        val q = buckets.where(col("vec_id") < 3)
          .select(col("t"), col("sig"), col("vec_id").as("q_id"))
        val cand = q.join(buckets, Seq("t", "sig"))
          .where(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("n_id")).distinct()
        cand
          .join(e.select(col("vec_id").as("q_id"), col("v").as("qv")), "q_id")
          .join(e.select(col("vec_id").as("n_id"), col("v").as("nv")), "n_id")
          .withColumn("cos_r", floor(
            VectorOps.cosineFast(col("qv"), col("nv")) * 1000000 + 0.5)
            / 1000000)
          .withColumn("rank", row_number().over(Window.partitionBy("q_id")
            .orderBy(col("cos_r").desc, col("n_id"))))
          .where(col("rank") <= 3)
          .select("q_id", "rank", "n_id", "cos_r")
          .orderBy("q_id", "rank")
      },
      Some(lshMirrorOracle)),

    // ---- p49: SimHash near-dup, fully mirrored --------------------------
    // p40's move applied to the SIMHASH family: p06 stays the fast
    // xxhash64 64-bit path (no DuckDB analog), and this twin runs the
    // identical algorithm — tf-weighted bit votes, sign fingerprint,
    // chunk blocking, Hamming verify — from integer-only pieces, so
    // every stage including which chance collisions the chunks emit
    // hash-matches DuckDB. The poly fold alone is NOT enough here:
    // tokens differing in one trailing char hash Δ apart, so their bit
    // patterns correlate and every doc pair collapses toward Hamming 0
    // (measured: 116k pairs at sf0.01, 11.5M at sf0.1). SimHash needs
    // avalanche, which MinHash never did (only order matters there) —
    // one multiply-mod round by a large odd constant sends Δ=1 to
    // Δ≈6.5e8 and restores the separation (422/500 twins ≤ 6, chance
    // rate 1.3e-5). Two such rounds with different multipliers give 60
    // independent bits; blocking = 6 chunks of 10 bits (pigeonhole:
    // any pair at Hamming ≤ 5 must share a chunk — recall at the ≤ 6
    // gate is structural, not luck). Scale shape is p06's: one explode
    // + 60 conditional sums in a single hash aggregate (linear),
    // candidates from an equi-join on (chunk_idx, chunk_val) — never
    // all-pairs; the signature frame is one row per doc, checkpointed
    // once because three consumers (chunk explode + both join sides)
    // would otherwise re-run the corpus aggregate per reference.
    RegQuery("p49_simhash_mirror",
      (s, d) => {
        val P = 1000000007L
        def polyH(g: Column): Column = TextOps.polyHash(g) // native codegen fold
        val occ = docsWithTwins(s, d)
          // token barrier (p16 rule, added r10): without it the
          // explode + poly fold + 60-way bit sums all run at the
          // 1-2-task parquet scan width (profiled: the whole signature
          // pass on ONE task)
          .transform(graft.Part.pin(col("doc_id")))
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
          .select(col("doc_id"), polyH(col("tok")).as("h"))
          .select(col("doc_id"),
            (col("h") * 2654435761L % P).as("h1"),
            ((col("h") * 1779033703L + 104729L) % P).as("h2"))
        val bitSums = (0 until 60).map { j =>
          val bit =
            if (j < 30) shiftright(col("h1"), j)
            else shiftright(col("h2"), j - 30)
          sum(when(bit.bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
            .as(s"b$j")
        }
        val fp = (0 until 60).map(j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _)
        val sig = occ.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
          .select(col("doc_id"), fp.as("simhash"))
          .localCheckpoint()
        val chunks = sig.select(col("doc_id"), col("simhash"),
          posexplode(array((0 until 6).map(c =>
            shiftright(col("simhash"), c * 10).bitwiseAND(lit(1023L))): _*))
            .as(Seq("chunk_idx", "chunk_val")))
        val a = chunks.select(col("chunk_idx"), col("chunk_val"),
          col("doc_id").as("a_id"), col("simhash").as("a_sim"))
        val b = chunks.select(col("chunk_idx"), col("chunk_val"),
          col("doc_id").as("b_id"), col("simhash").as("b_sim"))
        a.join(b, Seq("chunk_idx", "chunk_val"))
          .where(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).as("hamming"))
          .distinct()
          .where(col("hamming") <= 6)
          .orderBy("a_id", "b_id")
      },
      Some(twinsCte +
        s""", tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
          |  FROM alldocs),
          |th0 AS (SELECT doc_id, list_reduce(list_prepend(CAST(7 AS BIGINT),
          |    list_transform(string_split(tok,''),
          |      c -> CAST(ord(c) AS BIGINT))),
          |    (acc, x) -> (acc*131 + x) % 1000000007) AS h FROM tok),
          |th AS (SELECT doc_id, (h * 2654435761) % 1000000007 AS h1,
          |  (h * 1779033703 + 104729) % 1000000007 AS h2 FROM th0),
          |bs AS (SELECT doc_id, j, sum(CASE WHEN j < 30
          |    THEN (CASE WHEN (h1 >> j) & 1 = 1 THEN 1 ELSE -1 END)
          |    ELSE (CASE WHEN (h2 >> (j-30)) & 1 = 1 THEN 1 ELSE -1 END)
          |  END) AS s
          |  FROM (SELECT doc_id, h1, h2, unnest(range(0,60)) AS j FROM th)
          |  GROUP BY doc_id, j),
          |fp AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0
          |    THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
          |  FROM bs GROUP BY doc_id),
          |ch AS (SELECT doc_id, simhash, unnest(range(0,6)) AS chunk_idx,
          |  unnest(list_transform(range(0,6),
          |    c -> (simhash >> (c*10)) & 1023)) AS chunk_val FROM fp)
          |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
          |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
          |FROM ch a JOIN ch b ON a.chunk_idx = b.chunk_idx
          |  AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
          |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
          |ORDER BY a_id, b_id""".stripMargin)),

    // ---- p50: perceptual image dedup (dHash + Hamming blocking) ---------
    // Multimodal near-dup — the image-side answer to p05/p49: a REAL
    // codec path (ImageIO PNG decode in executors) feeding the standard
    // difference-hash, then the p49 blocking shape (4×15-bit chunks,
    // pigeonhole: any pair at Hamming ≤ 3 shares a chunk) and a
    // Hamming ≤ 2 verify. The corpus is textured 9×8 PNGs whose pixel
    // luminance is hash arithmetic on (doc_id, x, y) with a planted
    // one-pixel twin per doc — so the DuckDB oracle recomputes every
    // pixel, every comparison bit, and every emitted pair from pure
    // integer math while the engine goes through genuine PNG bytes:
    // the decode→hash→block→join plumbing is what's being gated
    // (p12/p15 discipline). An exact dedup (p01) scores 0 here — the
    // twin's bytes differ — which is exactly why perceptual hashing
    // exists. Linear shape: per-image work is bounded, candidates come
    // from the chunk equi-join, never all-pairs.
    RegQuery("p50_image_phash_dedup",
      (s, d) => {
        val sig = graft.llm.Multimodal.dHash(
            graft.llm.Multimodal.texturedImageTable(s, d))
          .localCheckpoint() // decode once; chunks + both join sides read it
        val chunks = sig.select(col("doc_id"), col("dhash"),
          posexplode(array((0 until 4).map(c =>
            shiftright(col("dhash"), c * 15).bitwiseAND(lit(32767L))): _*))
            .as(Seq("chunk_idx", "chunk_val")))
        val a = chunks.select(col("chunk_idx"), col("chunk_val"),
          col("doc_id").as("a_id"), col("dhash").as("a_h"))
        val b = chunks.select(col("chunk_idx"), col("chunk_val"),
          col("doc_id").as("b_id"), col("dhash").as("b_h"))
        a.join(b, Seq("chunk_idx", "chunk_val"))
          .where(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            bit_count(col("a_h").bitwiseXOR(col("b_h"))).as("hamming"))
          .distinct()
          .where(col("hamming") <= 2)
          .orderBy("a_id", "b_id")
      },
      Some(p50Oracle)),

    // ---- p51: cluster-balanced diversity sampling -----------------------
    // The D4 selection move (Tirumala et al. 2023: dedup + diversify):
    // after near-dup removal, training mixes want REPRESENTATIVE
    // coverage of embedding space, not the head of one dense region.
    // Cells come from the sign pattern of the first 4 dimensions —
    // data-independent hyperplanes (axis planes), so cell assignment is
    // map-only with no trained artifact to ship — and each cell keeps
    // its top-3 by micro-norm (the deterministic stand-in for a quality
    // model's score; same integer-rounding contract as p09's cosine).
    // Per-cell top-k goes through row_number + rank≤k, the p45 shape
    // Spark rewrites to WindowGroupLimit (partial top-k before the
    // exchange), and cell sizes ride a separate 16-row aggregate joined
    // back by broadcast — NOT a second unordered window, which would
    // defeat the group-limit pushdown. At 100 TB: one shuffle keyed by
    // cell carrying ≤ k rows per partition per cell, plus one broadcast.
    RegQuery("p51_diverse_sample",
      (s, d) => {
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
        val cellExpr = (0 until 4).map(i =>
            when(element_at(col("v"), i + 1) >= 0, lit(1 << i))
              .otherwise(lit(0)))
          .reduce(_ + _)
        val scored = e.select(col("vec_id"), cellExpr.as("cell"),
          floor(aggregate(col("v"), lit(0.0d), (acc, x) => acc + x * x)
            * 1000000 + 0.5).cast("long").as("norm_micro"))
        val sizes = scored.groupBy("cell").agg(count(lit(1)).as("cell_n"))
        scored
          .withColumn("rank", row_number().over(Window.partitionBy("cell")
            .orderBy(col("norm_micro").desc, col("vec_id"))))
          .where(col("rank") <= 3)
          .join(broadcast(sizes), "cell")
          .select("cell", "rank", "vec_id", "norm_micro", "cell_n")
          .orderBy("cell", "rank")
      },
      Some("""WITH e AS (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |sc AS (SELECT vec_id,
             |  (CASE WHEN v[1] >= 0 THEN 1 ELSE 0 END)
             |  + (CASE WHEN v[2] >= 0 THEN 2 ELSE 0 END)
             |  + (CASE WHEN v[3] >= 0 THEN 4 ELSE 0 END)
             |  + (CASE WHEN v[4] >= 0 THEN 8 ELSE 0 END) AS cell,
             |  CAST(floor(list_sum(list_transform(v, x -> x*x))
             |    * 1000000 + 0.5) AS BIGINT) AS norm_micro FROM e),
             |sz AS (SELECT cell, count(*) AS cell_n FROM sc GROUP BY cell),
             |r AS (SELECT vec_id, cell, norm_micro, ROW_NUMBER() OVER (
             |  PARTITION BY cell ORDER BY norm_micro DESC, vec_id) AS rank
             |  FROM sc)
             |SELECT r.cell, CAST(rank AS INTEGER) AS rank, vec_id,
             |  norm_micro, cell_n
             |FROM r JOIN sz ON r.cell = sz.cell
             |WHERE rank <= 3 ORDER BY r.cell, rank""".stripMargin)),

    // ---- p52: perceptual audio dedup (frame-energy hash + blocking) -----
    // p50's real-codec discipline on the audio axis: javax.sound writes
    // and parses genuine RIFF/WAVE containers in the executors, the
    // fingerprint is a frame-energy difference hash over the decoded
    // PCM (all integer — samples are integers, energies exact Σs²),
    // and candidates come from the p49/p50 chunk blocking (4×8-bit
    // chunks over a 31-bit hash; 2 flipped bits leave ≥2 chunks
    // intact) with a Hamming ≤ 2 verify. The corpus plants one
    // +7-at-one-sample twin per doc — inaudible to the energy hash's
    // comparisons except the two bits around the nudged frame
    // (Hamming ≤ 2 by construction, so recall is exact), invisible to
    // exact dedup. The DuckDB oracle recomputes every sample, energy,
    // comparison bit, and emitted pair from pure integer math while
    // the engine goes through real WAV bytes — the decode plumbing is
    // what's gated. Linear shape: bounded per-row work, chunk
    // equi-join candidates, never all-pairs.
    RegQuery("p52_audio_fp_dedup",
      (s, d) => {
        val sig = graft.llm.Multimodal.audioEnergyHash(
            graft.llm.Multimodal.texturedAudioTable(s, d))
          .localCheckpoint() // decode once; both join sides read it
        val chunks = sig.select(col("doc_id"), col("ahash"),
          posexplode(array((0 until 4).map(c =>
            shiftright(col("ahash"), c * 8).bitwiseAND(lit(255L))): _*))
            .as(Seq("chunk_idx", "chunk_val")))
        val a = chunks.select(col("chunk_idx"), col("chunk_val"),
          col("doc_id").as("a_id"), col("ahash").as("a_h"))
        val b = chunks.select(col("chunk_idx"), col("chunk_val"),
          col("doc_id").as("b_id"), col("ahash").as("b_h"))
        a.join(b, Seq("chunk_idx", "chunk_val"))
          .where(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            bit_count(col("a_h").bitwiseXOR(col("b_h"))).as("hamming"))
          .distinct()
          .where(col("hamming") <= 2)
          .orderBy("a_id", "b_id")
      },
      Some(p52Oracle)),

    // ---- p53: prefix-filtered EXACT similarity self-join (AllPairs) ----
    // The LSH family (p05/p06/p40/p48) finds near-dups approximately;
    // this is the EXACT counterpart that still scales: AllPairs/PPJoin
    // prefix filtering (Bayardo et al. WWW'07, Xiao et al. WWW'08 —
    // public similarity-join literature). Order each doc's distinct
    // tokens rarest-first by global document frequency; a pair with
    // Jaccard >= t MUST share its globally-smallest common token inside
    // the first n - ceil(t*n) + 1 tokens of BOTH prefixes (if all
    // common tokens hid in a's suffix of ceil(t*n)-1 slots, overlap
    // < t*n <= overlap — contradiction). So the candidate generator is
    // an equi-join on PREFIX tokens only: frequent tokens (the 'the'
    // problem that makes a naive token join quadratic) sort to the END
    // of every doc and never become join keys. Candidates then pass the
    // size filter 10*min(n) >= 7*max(n) before the exact verify.
    // Jaccard is kept in integers end to end (array_intersect count,
    // ppm via bigint div) so the pair set AND the scores hash-match
    // DuckDB's unfiltered exact computation. 100 TB story: df ranking
    // is one agg + one join; candidates are |prefix| explodes joined on
    // rare keys (bounded fan-out by construction); verify touches only
    // surviving pairs — no stage is all-pairs. Unlike LSH this misses
    // NOTHING at the threshold: it's the audit-grade dedup arm.
    // Corpus bound (doc_id % 10⁶ < 1000, both sides): the synthetic
    // ~30-token vocabulary is prefix filtering's designed-against worst
    // case — EVERY token is globally frequent, so prefixes can't prune
    // and candidates degrade toward all-pairs (measured: the unbounded
    // sf0.1 run stalls on ~10⁸ candidate rows). Real Zipfian text is
    // the designed case; like p04's bounded exact baseline this arm
    // stays the audit oracle (identity at sf0.01, where doc_ids run
    // 0..499) while p05/p40 LSH remain the unbounded scale path.
    RegQuery("p53_prefix_join_dedup",
      (s, d) => prefixJoinDedupFrom(docsWithTwins(s, d)
        .where(col("doc_id") % 1000000L < CorpusCaps.PrefixJoin)),
      Some(twinsCte +
        s""", tok AS (SELECT doc_id,
          |    unnest(list_distinct(string_split(text, ' '))) AS tok
          |  FROM alldocs WHERE doc_id % 1000000 < ${CorpusCaps.PrefixJoin}),
          |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
          |ov AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          |    count(*) AS inter
          |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |j AS (SELECT a_id, b_id, inter, sa.n + sb.n - inter AS uni
          |  FROM ov JOIN sz sa ON a_id = sa.doc_id
          |          JOIN sz sb ON b_id = sb.doc_id)
          |SELECT a_id, b_id, inter * 1000000 // uni AS jac_ppm
          |FROM j WHERE inter * 10 >= uni * 7
          |ORDER BY a_id, b_id""".stripMargin)),

    // ---- p54: blocked record linkage (entity resolution) ---------------
    // The STRUCTURED-data counterpart of the document dedup family:
    // classic Fellegi–Sunter-shaped entity resolution. Candidate pairs
    // come only from BLOCKING keys (nation × market segment) — the ER
    // scale move: candidates = Σ|block|², bounded per block, never n².
    // Within a block, field similarities: levenshtein on the name (both
    // engines implement classic edit distance) and account-balance
    // delta in exact cents (floor(x·100+0.5), the q32 tie-safe
    // rounding). score = lev·10⁵ + Δcents/100 keeps the whole ranking
    // in integers, and a per-nation window emits the 3 best candidate
    // pairs — deterministic tie-break on (score, a, b). 100 TB story:
    // one hash partition by block key + per-block bounded pair fan-out
    // + a per-nation top-k window; no global sort, no cross-block
    // compare. Swapping the toy features for real ones (phonetic keys,
    // TF-IDF fields) changes expressions, not the plan.
    RegQuery("p54_record_linkage",
      (s, d) => {
        val c = Tables(s, d, "customer").select(col("c_custkey").as("id"),
          col("c_name").as("nm"), col("c_nationkey").as("nat"),
          col("c_mktsegment").as("seg"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("cents"))
        // pin both sides of the blocked self-join: the block keys are
        // a handful of bytes, so AQE coalesces the join's exchanges to
        // ~one task and the per-pair levenshtein serializes (measured
        // 6 tasks / 6 s single-threaded at sf0.1) — the pinned
        // partitioning is reused by the join, levenshtein runs wide
        val cb = c.transform(graft.Part.pin(col("nat"), col("seg")))
        val cand = cb.as("a").join(cb.as("b"),
            col("a.nat") === col("b.nat") && col("a.seg") === col("b.seg") &&
            col("a.id") < col("b.id"))
          .select(col("a.nat").as("nation"),
            col("a.id").as("a_id"), col("b.id").as("b_id"),
            levenshtein(col("a.nm"), col("b.nm")).cast("long").as("name_lev"),
            abs(col("a.cents") - col("b.cents")).as("bal_diff_c"))
          .withColumn("score",
            col("name_lev") * 100000L + expr("bal_diff_c div 100"))
        cand.withColumn("rk", row_number().over(
            Window.partitionBy("nation")
              .orderBy(col("score"), col("a_id"), col("b_id"))))
          .where(col("rk") <= 3)
          .select(col("nation"), col("a_id"), col("b_id"),
            col("name_lev"), col("bal_diff_c"), col("score"), col("rk"))
          .orderBy("nation", "rk")
      },
      Some("""WITH c AS (SELECT c_custkey AS id, c_name AS nm,
             |    c_nationkey AS nat, c_mktsegment AS seg,
             |    CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS cents
             |  FROM customer),
             |cand AS (SELECT a.nat AS nation, a.id AS a_id, b.id AS b_id,
             |    CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS name_lev,
             |    abs(a.cents - b.cents) AS bal_diff_c
             |  FROM c a JOIN c b ON a.nat = b.nat AND a.seg = b.seg
             |    AND a.id < b.id),
             |sc AS (SELECT *, name_lev * 100000 + bal_diff_c // 100 AS score
             |  FROM cand),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY nation
             |    ORDER BY score, a_id, b_id) AS rk FROM sc)
             |SELECT nation, a_id, b_id, name_lev, bal_diff_c, score, rk
             |FROM rk WHERE rk <= 3 ORDER BY nation, rk""".stripMargin)),

    // ---- p55: video signature dedup (prefix keyframe hash) --------------
    // The video leg of the perceptual-dedup trio (p50 image, p52 audio):
    // a re-encoded cut with a trailing outro is the canonical video
    // near-dup, and byte hashing misses it. Signature = polyhash over
    // the first 5 SAMPLED frame hashes (every 5th frame, prefix ≤ 20) —
    // computed through the REAL path: JPEG encode at birth, SOI/EOI
    // demux, ImageIO decode, Graphics2D resize (the p15 machinery) —
    // then dedup is one hash aggregate + the in-row pair explode per
    // signature group, never all-pairs. The planted twins (same video
    // + 3 tail frames, every 100th doc) are exactly the groups that
    // emit. Per-frame luminance is the textured finalizer (sigLum), so
    // signatures collide only by 1e9-birthday chance — and since the
    // oracle recomputes the identical arithmetic, even a chance
    // collision hash-matches. At 100 TB: decode cost is bounded per
    // doc (5 frames whatever the video length), the signature
    // aggregate is map-side, and the group explode is bounded by copy
    // count — the same shape that makes p25/p50 linear.
    RegQuery("p55_video_sig_dedup",
      (s, d) => {
        val P = 1000000007L
        val frames = graft.llm.Multimodal.sampleFrames(
            graft.llm.Multimodal.videoSigTable(s, d), every = 5, w = 8, h = 8)
          .where(col("frame_idx") <= 20)
        val sig = frames.groupBy("doc_id")
          .agg(aggregate(
            transform(array_sort(collect_list(
              struct(col("frame_idx"), col("fhash")))),
              p => p.getField("fhash").cast("long")),
            lit(7L), (acc, x) => (acc * 131 + x) % P).as("sig"))
        sig.groupBy("sig")
          .agg(array_sort(collect_list(col("doc_id"))).as("ds"))
          .where(size(col("ds")) >= 2)
          .select(col("sig"), explode(flatten(transform(col("ds"), (a, i) =>
            transform(slice(col("ds"), i + 2, size(col("ds"))), b =>
              struct(a.as("a_id"), b.as("b_id")))))).as("p"))
          .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
            col("sig"))
          .orderBy("a_id", "b_id")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents
             |  UNION ALL SELECT doc_id + 1000000 FROM documents
             |    WHERE doc_id % 100 = 0),
             |fr AS (SELECT doc_id,
             |    CASE WHEN doc_id >= 1000000 THEN doc_id - 1000000
             |         ELSE doc_id END AS base,
             |    unnest([0, 5, 10, 15, 20]) AS f
             |  FROM ids),
             |l0 AS (SELECT doc_id, f,
             |    (base * 2654435761 + f * 104729) % 1000000007 AS v
             |  FROM fr),
             |l1 AS (SELECT doc_id, f,
             |    (xor(v, v >> 13) * 1779033703) % 1000000007 AS v2 FROM l0),
             |lh AS (SELECT doc_id, f,
             |    xor(v2, v2 >> 11) % 256 AS lum FROM l1),
             |sg AS (SELECT doc_id,
             |    list_reduce(list_prepend(CAST(7 AS BIGINT),
             |      list(lum ORDER BY f)),
             |      (acc, x) -> (acc * 131 + x) % 1000000007) AS sig
             |  FROM lh GROUP BY doc_id)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sig
             |FROM sg a JOIN sg b ON a.sig = b.sig AND a.doc_id < b.doc_id
             |ORDER BY a_id, b_id""".stripMargin)),

    // ---- p56: CCNet-style perplexity bucketing --------------------------
    // The CCNet curation move (Wenzek et al. 2020): score every doc by
    // LM perplexity, split each language into head/middle/tail
    // terciles, keep the head for training. The LM is p36's integer
    // add-one bigram model (nll_u is an exact integer, so bucketing is
    // deterministic); the bucket boundary is the explicit integer
    // formula (rn-1)·3 div n — NOT ntile(), whose remainder placement
    // is engine-defined. Windows partition by LANG — at bench SF that
    // is the natural per-language ranking; at 100 TB the ranking over
    // billions of per-doc score rows would come from sampled quantile
    // boundaries broadcast back (one pass + map-side bucket), the same
    // structure, coarser cutpoints.
    RegQuery("p56_perplexity_buckets",
      (s, d) => {
        val tk = col("tk")
        val base = Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("tk"))
          .where(size(col("tk")) >= 2)
          .repartition(col("doc_id")) // token barrier (p36 lesson)
          .select(col("doc_id"), col("lang"), explode(transform(
            sequence(lit(1), size(tk) - 1),
            i => struct(element_at(tk, i).as("w1"),
              element_at(tk, i + 1).as("w2")))).as("b"))
          .select(col("doc_id"), col("lang"),
            col("b.w1").as("w1"), col("b.w2").as("w2"))
          .localCheckpoint() // feeds c12, c1, and the per-doc side
        val c12 = base.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val c1 = base.groupBy("w1").agg(count(lit(1)).as("c1"))
        val vocab = Tables(s, d, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("w"))
          .agg(countDistinct(col("w")).as("vsz"))
        val u = floor(log((col("c12") + lit(1.0)) / (col("c1") + col("vsz")))
          * 10000 + 0.5).cast("long")
        val doc = base.groupBy("doc_id", "lang", "w1", "w2")
          .agg(count(lit(1)).as("n"))
          .join(c12, Seq("w1", "w2"))
          .join(c1, Seq("w1"))
          .crossJoin(broadcast(vocab))
          .withColumn("u", u)
          .groupBy("doc_id", "lang")
          .agg(sum(col("n")).as("n_bg"),
            (-sum(col("u") * col("n"))).as("nll_u"))
          .withColumn("nll_tok", expr("nll_u div n_bg"))
        doc
          .withColumn("rn", row_number().over(
            Window.partitionBy("lang").orderBy("nll_tok", "doc_id")))
          .withColumn("nl", count(lit(1)).over(Window.partitionBy("lang")))
          .select(col("doc_id"), col("lang"), col("n_bg"), col("nll_tok"),
            (expr("(rn - 1) * 3 div nl") + 1).cast("int").as("bucket"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, lang, string_split(text,' ') AS tk
             |  FROM documents WHERE len(string_split(text,' ')) >= 2),
             |bb AS (SELECT doc_id, lang,
             |  unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
             |  unnest(list_transform(range(1, len(tk)), i -> tk[i+1])) AS w2
             |  FROM t),
             |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bb
             |  GROUP BY w1, w2),
             |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bb
             |  GROUP BY w1),
             |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vsz FROM
             |  (SELECT unnest(string_split(text,' ')) AS w FROM documents)),
             |dt AS (SELECT doc_id, lang, w1, w2, CAST(count(*) AS BIGINT) AS n
             |  FROM bb GROUP BY doc_id, lang, w1, w2),
             |sc AS (SELECT dt.doc_id, dt.lang, dt.n,
             |  CAST(floor(ln((c12.c12 + 1.0)/(c1.c1 + v.vsz))*10000 + 0.5)
             |    AS BIGINT) AS u
             |  FROM dt JOIN c12 USING(w1, w2) JOIN c1 USING(w1) CROSS JOIN v),
             |doc AS (SELECT doc_id, lang, CAST(sum(n) AS BIGINT) AS n_bg,
             |    CAST(-sum(u*n) AS BIGINT) AS nll_u
             |  FROM sc GROUP BY doc_id, lang),
             |d2 AS (SELECT doc_id, lang, n_bg, nll_u // n_bg AS nll_tok
             |  FROM doc),
             |d3 AS (SELECT *, row_number() OVER (PARTITION BY lang
             |      ORDER BY nll_tok, doc_id) AS rn,
             |    count(*) OVER (PARTITION BY lang) AS nl
             |  FROM d2)
             |SELECT doc_id, lang, n_bg, nll_tok,
             |  CAST((rn - 1) * 3 // nl + 1 AS INTEGER) AS bucket
             |FROM d3 ORDER BY doc_id""".stripMargin)),

    // ---- p57: hashed-feature linear classifier (fastText shape) ---------
    // The production quality/topic filter at corpus scale is a linear
    // model over HASHED bag-of-ngram features (fastText, Joulin et al.
    // 2016; the vocabulary-free trick that makes the model shippable as
    // one dense weight array). Features = unigrams + bigrams, hashed
    // into 1024 buckets by the corpus polyhash; the weight vector is a
    // deterministic function of the bucket id (the stand-in for trained
    // weights, same contract as p26's fixed coefficients — at 100 TB
    // the weights arrive as a broadcast float array, identical plan).
    // Whole pipeline is one explode + one hash aggregate per doc —
    // map-side, join-free, codegen'd; the integer score makes the
    // sigmoid threshold an exact comparison.
    RegQuery("p57_hashed_linear_clf",
      (s, d) => {
        val P = 1000000007L
        def polyH(g: Column): Column = TextOps.polyHash(g) // native codegen fold
        val tk = col("tk")
        val feats = Tables(s, d, "documents")
          .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
          .transform(graft.Part.pin(col("doc_id"))) // token barrier (p43/s13 lesson)
          .select(col("doc_id"), explode(concat(
            col("tk"),
            // guarded: sequence(1, 0) DESCENDS in Spark, and
            // element_at(tk, 0) throws — single-token docs get no bigrams
            when(size(tk) >= 2,
              transform(sequence(lit(1), size(tk) - 1),
                i => concat_ws("_", element_at(tk, i), element_at(tk, i + 1))))
              .otherwise(array().cast("array<string>"))
          )).as("g"))
          .select(col("doc_id"), (polyH(col("g")) % 1024L).as("bkt"))
        feats
          .withColumn("wgt",
            (col("bkt") * 2654435761L + 104729L) % lit(P) % 2001L - 1000L)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_feat"), sum("wgt").as("score"))
          .select(col("doc_id"), col("n_feat"), col("score"),
            (col("score") > 0).as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
             |  FROM documents),
             |f AS (SELECT doc_id, unnest(list_concat(tk,
             |    list_transform(range(1, len(tk)),
             |      i -> tk[i] || '_' || tk[i+1]))) AS g
             |  FROM t),
             |h AS (SELECT doc_id,
             |    list_reduce(list_prepend(CAST(7 AS BIGINT),
             |      list_transform(string_split(g, ''),
             |        x -> CAST(ord(x) AS BIGINT))),
             |      (acc, x) -> (acc * 131 + x) % 1000000007) % 1024 AS bkt
             |  FROM f),
             |w AS (SELECT doc_id, bkt,
             |    ((bkt * 2654435761 + 104729) % 1000000007) % 2001 - 1000
             |      AS wgt
             |  FROM h)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
             |  CAST(sum(wgt) AS BIGINT) AS score, sum(wgt) > 0 AS keep
             |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- p58: n-gram novelty scoring (marginal contribution) ------------
    // "How much NEW text does this doc add?" — the marginal-contribution
    // statistic behind dedup-aware data valuation (and the per-doc view
    // of Lee et al.'s duplicate-text fraction): attribute every distinct
    // 3-gram to its FIRST document (min doc_id = ingest order), then
    // novelty = owned fraction of the doc's distinct grams. A fully
    // duplicated doc scores 0 bp against the earlier copy; fresh text
    // scores 10000. Shape: one distinct over (gram, doc), one min-agg
    // keyed by gram, one count-back join on gram — all shuffles keyed
    // by the gram hash (uniform by construction), nothing all-pairs,
    // no window. The first-occurrence join is the p25 chunk-dedup plan
    // with min-attribution instead of counting.
    RegQuery("p58_novelty",
      (s, d) => {
        val P = 1000000007L
        def polyH(g: Column): Column = TextOps.polyHash(g) // native codegen fold
        val dg = Tables(s, d, "documents")
          .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
          .where(size(col("tk")) >= 3)
          .transform(graft.Part.pin(col("doc_id"))) // token barrier (p40 lesson)
          .select(col("doc_id"), explode(array_distinct(
            transform(TextOps.shingles(col("tk"), 3), g => polyH(g)))).as("h"))
        val first = dg.groupBy("h").agg(min("doc_id").as("first_doc"))
        dg.join(first, "h")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
              .as("n_novel"))
          .select(col("doc_id"), col("n_grams"), col("n_novel"),
            expr("n_novel * 10000 div n_grams").as("novelty_bp"))
          .orderBy("doc_id")
      },
      Some("""WITH tt AS (SELECT doc_id, string_split(text,' ') AS tk
             |  FROM documents WHERE len(string_split(text,' ')) >= 3),
             |dg AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |    list_distinct(list_transform(range(1, len(tk)-1),
             |      i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])),
             |    g -> list_reduce(list_prepend(CAST(7 AS BIGINT),
             |      list_transform(string_split(g,''),
             |        c -> CAST(ord(c) AS BIGINT))),
             |      (acc, x) -> (acc*131 + x) % 1000000007)))) AS h
             |  FROM tt),
             |fst AS (SELECT h, min(doc_id) AS first_doc FROM dg GROUP BY h)
             |SELECT dg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             |  CAST(sum(CASE WHEN fst.first_doc = dg.doc_id
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
             |  CAST(sum(CASE WHEN fst.first_doc = dg.doc_id
             |    THEN 1 ELSE 0 END) AS BIGINT) * 10000
             |    // CAST(count(*) AS BIGINT) AS novelty_bp
             |FROM dg JOIN fst ON dg.h = fst.h
             |GROUP BY dg.doc_id ORDER BY dg.doc_id""".stripMargin)),

    // ---- p59: hard-negative mining for contrastive training -------------
    // The embedding-training data op (DPR/Contriever recipe): for each
    // anchor, the highest-cosine corpus vectors with a DIFFERENT label
    // — semantically-close-but-wrong examples, the negatives that
    // actually teach the margin. Same plan skeleton as p09 (anchors
    // broadcast across one corpus scan, integer-rounded cosine, per-
    // anchor top-k through the WindowGroupLimit partial top-k), plus
    // the label exclusion predicate pushed into the scan-side filter.
    // At 100 TB the anchor set rides the p14 IVF route (probe cells,
    // not the full scan); this is the exact-oracle form of that miner.
    RegQuery("p59_hard_negatives",
      (s, d) => {
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"), col("label"),
            VectorOps.toDouble(col("embedding")).as("v"))
        val q = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("label").as("q_label"),
            col("v").as("qv"))
        e.select(col("vec_id").as("n_id"), col("label").as("n_label"),
            col("v").as("nv"))
          .crossJoin(broadcast(q))
          .where(col("n_label") =!= col("q_label"))
          .withColumn("cos_r",
            floor(VectorOps.cosineFast(col("qv"), col("nv")) * 1000000 + 0.5)
              / 1000000)
          .withColumn("rank", row_number().over(
            Window.partitionBy("q_id").orderBy(col("cos_r").desc, col("n_id"))))
          .where(col("rank") <= 3)
          .select(col("q_id"), col("q_label"), col("rank"), col("n_id"),
            col("n_label"), col("cos_r"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv
             |  FROM e WHERE vec_id < 10),
             |p AS (SELECT q_id, q_label, e.vec_id AS n_id,
             |    e.label AS n_label,
             |  list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*e.v[i]))
             |    / (sqrt(list_sum(list_transform(qv, x -> x*x)))
             |       * sqrt(list_sum(list_transform(e.v, x -> x*x)))) AS c
             |  FROM q, e WHERE e.label != q_label),
             |r AS (SELECT q_id, q_label, n_id, n_label,
             |  floor(c*1000000 + 0.5)/1000000 AS cos_r,
             |  ROW_NUMBER() OVER (PARTITION BY q_id
             |    ORDER BY floor(c*1000000 + 0.5)/1000000 DESC, n_id) AS rn
             |  FROM p)
             |SELECT q_id, q_label, CAST(rn AS INTEGER) AS rank, n_id,
             |  n_label, cos_r
             |FROM r WHERE rn <= 3 ORDER BY q_id, rank""".stripMargin)),

    // ---- p60: the dedup pipeline, hash-checked END TO END ---------------
    // p32 executes the production MinHash→CC→canonical path but its
    // xxhash64 banding forces a rows-only check; this is the same
    // composition over the MIRRORED pair source (p40), so the ENTIRE
    // pipeline — shingle hash, minhash, banding, verify, connected
    // components, canonical resolution, per-doc disposition — is one
    // DuckDB hash compare (components via recursive CTE, the p28/x02
    // idiom). Same scale shape as p32: linear banding, the leaf-peel +
    // pointer-jump CC loop, two keyed joins for the report; the only
    // difference is which integer hash seeds the shingles.
    RegQuery("p60_dedup_report_mirror",
      (s, d) => {
        val edges = mirrorVerifiedPairs(s, d).select(
          lpad(col("a_id").cast("string"), 9, "0").as("src_id"),
          lpad(col("b_id").cast("string"), 9, "0").as("dst_id"))
        val cc = graft.graphx.GraphAnalytics.connectedComponents(edges)
          .select(col("id").cast("long").as("doc_id"),
            col("component").cast("long").as("canonical_id"))
        val all = docsWithTwins(s, d).select("doc_id")
          .join(cc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
        val sizes = all.groupBy("canonical_id")
          .agg(count(lit(1)).as("cluster_size"))
        all.join(sizes, "canonical_id")
          .select(col("doc_id"), col("canonical_id"), col("cluster_size"),
            (col("doc_id") === col("canonical_id")).as("keep"))
          .orderBy("doc_id")
      },
      Some((twinsCte + mirrorPairsCte +
        """, und AS (SELECT a_id AS u, b_id AS v FROM pr
          |  UNION SELECT b_id, a_id FROM pr),
          |reach AS (
          |  SELECT u, u AS v FROM (SELECT DISTINCT u FROM und)
          |  UNION
          |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
          |comp AS (SELECT u AS doc_id, min(v) AS canonical_id
          |  FROM reach GROUP BY u),
          |disp AS (SELECT a.doc_id,
          |    coalesce(c.canonical_id, a.doc_id) AS canonical_id
          |  FROM alldocs a LEFT JOIN comp c ON a.doc_id = c.doc_id),
          |sz AS (SELECT canonical_id, CAST(count(*) AS BIGINT)
          |    AS cluster_size
          |  FROM disp GROUP BY canonical_id)
          |SELECT disp.doc_id, disp.canonical_id, sz.cluster_size,
          |  disp.doc_id = disp.canonical_id AS keep
          |FROM disp JOIN sz USING (canonical_id)
          |ORDER BY doc_id""".stripMargin)
        // `reach` is recursive — flag the whole WITH chain
        .replaceFirst("WITH ", "WITH RECURSIVE "))),

    // ---- p61: vocabulary coverage / OOV rate ----------------------------
    // The tokenizer-design statistic: fix the corpus top-K vocabulary
    // (K=1000 by frequency, ties by token — deterministic), then score
    // every document's out-of-vocabulary token rate. High-OOV docs are
    // the ones a fixed vocab tokenizer shreds into bytes — flagged
    // before training, not discovered in loss spikes. Two corpus-keyed
    // hash aggregates build the vocab (token counts → top-K via one
    // window over DISTINCT TOKENS, not docs), then coverage is one
    // explode + broadcast semi-probe + per-doc aggregate — the p19/p37
    // membership shape. Integer bp output.
    RegQuery("p61_vocab_coverage",
      (s, d) => {
        val toks = Tables(s, d, "documents")
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
          .localCheckpoint() // feeds the vocab build and the coverage probe
        // top-K as orderBy+limit, NOT a global row_number window:
        // Spark plans this as TakeOrderedAndProject (per-partition
        // top-K, then a K-row merge on the driver) — the shape that
        // survives a 10⁸-token vocabulary where a one-partition window
        // would not
        val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("w")).limit(1000).select("w")
        val flagged = toks.join(broadcast(vocab).withColumn("iv", lit(1L)),
            Seq("w"), "left")
        flagged.groupBy("doc_id")
          .agg(count(lit(1)).as("n_tok"),
            sum(coalesce(col("iv"), lit(0L))).as("n_in_vocab"))
          .select(col("doc_id"), col("n_tok"), col("n_in_vocab"),
            expr("(n_tok - n_in_vocab) * 10000 div n_tok").as("oov_bp"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id,
             |    unnest(string_split(text, ' ')) AS w FROM documents),
             |tf AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM toks
             |  GROUP BY w),
             |vocab AS (SELECT w FROM tf ORDER BY cnt DESC, w LIMIT 1000),
             |fl AS (SELECT doc_id, toks.w,
             |    CASE WHEN vocab.w IS NULL THEN 0 ELSE 1 END AS iv
             |  FROM toks LEFT JOIN vocab ON toks.w = vocab.w)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
             |  CAST(sum(iv) AS BIGINT) AS n_in_vocab,
             |  CAST((count(*) - sum(iv)) * 10000 // count(*) AS BIGINT)
             |    AS oov_bp
             |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- p62: leakage-free train/eval split -----------------------------
    // Splitting by per-doc hash leaks near-duplicates across the
    // boundary (eval contains paraphrases of train — the classic
    // inflated-benchmark failure); the correct unit of assignment is
    // the DEDUP CLUSTER. Same mirrored pairs → CC spine as p60, then
    // split = hash of the CANONICAL id (canonical·2654435761 mod P mod
    // 10 < 8 → train), so every member of a cluster lands on the same
    // side by construction. One extra map over p60's disposition —
    // the whole leakage guarantee costs nothing beyond the dedup
    // pipeline the corpus already runs. Hash-checked end to end like
    // p60 (recursive-CTE components in the oracle).
    RegQuery("p62_leakage_free_split",
      (s, d) => {
        val edges = mirrorVerifiedPairs(s, d).select(
          lpad(col("a_id").cast("string"), 9, "0").as("src_id"),
          lpad(col("b_id").cast("string"), 9, "0").as("dst_id"))
        val cc = graft.graphx.GraphAnalytics.connectedComponents(edges)
          .select(col("id").cast("long").as("doc_id"),
            col("component").cast("long").as("canonical_id"))
        docsWithTwins(s, d).select("doc_id")
          .join(cc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
          .withColumn("split",
            when((col("canonical_id") * 2654435761L + 104729L)
              % 1000000007L % 10 < 8, lit("train")).otherwise(lit("eval")))
          .orderBy("doc_id")
      },
      Some((twinsCte + mirrorPairsCte +
        """, und AS (SELECT a_id AS u, b_id AS v FROM pr
          |  UNION SELECT b_id, a_id FROM pr),
          |reach AS (
          |  SELECT u, u AS v FROM (SELECT DISTINCT u FROM und)
          |  UNION
          |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
          |comp AS (SELECT u AS doc_id, min(v) AS canonical_id
          |  FROM reach GROUP BY u),
          |disp AS (SELECT a.doc_id,
          |    coalesce(c.canonical_id, a.doc_id) AS canonical_id
          |  FROM alldocs a LEFT JOIN comp c ON a.doc_id = c.doc_id)
          |SELECT doc_id, canonical_id,
          |  CASE WHEN (canonical_id * 2654435761 + 104729)
          |    % 1000000007 % 10 < 8 THEN 'train' ELSE 'eval' END AS split
          |FROM disp ORDER BY doc_id""".stripMargin)
        .replaceFirst("WITH ", "WITH RECURSIVE "))),

    // ---- p63: filter-calibration harness (classifier vs reference) ------
    // The eval loop every learned quality filter ships with: per-source
    // confusion matrix + precision/recall/F1 of the p26 logistic gate
    // against an independent reference labeling (metadata rule:
    // lang = 'en' AND n_chars >= 100 — the cheap-proxy stand-in for
    // human labels; swapping in real annotations changes one boolean
    // column, not the plan). The per-SOURCE breakdown is the
    // production view: it localizes where the filter over/under-kills
    // before a retrain. Metrics stay integer end to end (ppm by
    // truncating div, zero-denominator → 0), and the gate reuses
    // p26's 1e-4-rounded sigmoid, so the whole table hash-matches.
    // One codegen pass + one hash aggregate on ~20 source keys.
    RegQuery("p63_filter_calibration",
      (s, d) => {
        val tk = col("tk")
        val sr = TextOps.stopwordRatio(tk)
        val mw = aggregate(tk, lit(0L), (a, x) => a + length(x))
          .cast("double") / size(tk)
        val z = lit(-3.0) + lit(4.0) * sr + lit(0.5) * mw +
          lit(0.2) * log(2.0, size(tk))
        val scored = Tables(s, d, "documents")
          .select(col("source"), col("lang"), col("n_chars"),
            TextOps.tokens(col("text")).as("tk"))
          .select(col("source"),
            (r4(lit(1.0) / (lit(1.0) + exp(-z))) > 0.6).as("pred"),
            (col("lang") === "en" && col("n_chars") >= 100).as("ref"))
        def n(c: Column): Column = sum(c.cast("long"))
        scored.groupBy("source")
          .agg(n(col("pred") && col("ref")).as("tp"),
            n(col("pred") && !col("ref")).as("fp"),
            n(!col("pred") && col("ref")).as("fn"),
            n(!col("pred") && !col("ref")).as("tn"))
          .withColumn("prec_ppm", when(col("tp") + col("fp") === 0, 0L)
            .otherwise(expr("tp * 1000000 div (tp + fp)")))
          .withColumn("rec_ppm", when(col("tp") + col("fn") === 0, 0L)
            .otherwise(expr("tp * 1000000 div (tp + fn)")))
          .withColumn("f1_ppm", when(col("prec_ppm") + col("rec_ppm") === 0, 0L)
            .otherwise(expr(
              "2 * prec_ppm * rec_ppm div (prec_ppm + rec_ppm)")))
          .orderBy("source")
      },
      Some(s"""WITH t AS (SELECT source, lang, n_chars,
             |    string_split(text,' ') AS tk FROM documents),
             |f AS (SELECT source,
             |  floor(1.0/(1.0 + exp(-(
             |    -3.0 + 4.0 * (CAST(len(list_filter(tk, x -> list_contains(
             |      ${TextOps.enStopwords.mkString("['", "','", "']")}, x)))
             |      AS DOUBLE) / len(tk))
             |    + 0.5 * (CAST(list_sum(list_transform(tk, x -> length(x)))
             |      AS DOUBLE) / len(tk))
             |    + 0.2 * log2(len(tk)))))*10000 + 0.5)/10000 > 0.6 AS pred,
             |  lang = 'en' AND n_chars >= 100 AS ref FROM t),
             |cm AS (SELECT source,
             |    CAST(sum(CASE WHEN pred AND ref THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             |    CAST(sum(CASE WHEN pred AND NOT ref THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             |    CAST(sum(CASE WHEN NOT pred AND ref THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             |    CAST(sum(CASE WHEN NOT pred AND NOT ref THEN 1 ELSE 0 END) AS BIGINT) AS tn
             |  FROM f GROUP BY source),
             |pr AS (SELECT *,
             |    CASE WHEN tp + fp = 0 THEN 0 ELSE tp * 1000000 // (tp + fp)
             |      END AS prec_ppm,
             |    CASE WHEN tp + fn = 0 THEN 0 ELSE tp * 1000000 // (tp + fn)
             |      END AS rec_ppm
             |  FROM cm)
             |SELECT source, tp, fp, fn, tn, prec_ppm, rec_ppm,
             |  CASE WHEN prec_ppm + rec_ppm = 0 THEN 0
             |    ELSE 2 * prec_ppm * rec_ppm // (prec_ppm + rec_ppm)
             |    END AS f1_ppm
             |FROM pr ORDER BY source""".stripMargin)),

    // ---- p64: duplicate n-gram mass (corpus duplication accounting) -----
    // Lee et al. (ACL'22)'s corpus-level duplication statistic as an
    // accounting table: what fraction of each source's sliding 8-gram
    // OCCURRENCES belongs to a gram seen ≥ 2× corpus-WIDE. p25 answers
    // "how duplicated is each doc", p58 "what does each doc add" —
    // this is the per-SOURCE audit that says where the duplicated
    // mass comes from (the table that justifies dropping or
    // re-crawling a source). Grams hash to longs at birth (the p40
    // polynomial family, bit-identical in DuckDB); the explode stream
    // collapses to (source, gram) partial counts FIRST, so the wide
    // stream is aggregated map-side before any join — the global
    // gram-frequency side then joins on the already-shrunk keys.
    // Linear in corpus size, shuffles keyed by uniform gram hashes,
    // never all-pairs.
    RegQuery("p64_dup_gram_mass",
      (s, d) => {
        def polyH(g: Column): Column = TextOps.polyHash(g)
        val tk = col("tk")
        val grams = Tables(s, d, "documents")
          .select(col("source"), TextOps.tokens(col("text")).as("tk"))
          .where(size(tk) >= 8)
          .transform(graft.Part.pin(col("source"))) // token barrier (p40 lesson)
          .select(col("source"), explode(
            transform(sequence(lit(0), size(tk) - 8),
              i => polyH(concat_ws(" ", slice(tk, i + 1, lit(8)))))).as("h"))
        val perSrc = grams.groupBy("source", "h")
          .agg(count(lit(1)).as("c_sh"))
          .localCheckpoint() // feeds the global-count agg AND the join
        val global = perSrc.groupBy("h").agg(sum("c_sh").as("c_h"))
        perSrc.join(global, "h")
          .groupBy("source")
          .agg(sum("c_sh").as("n_occ"),
            count(lit(1)).as("n_distinct"),
            sum(when(col("c_h") >= 2, col("c_sh")).otherwise(0L))
              .as("n_dup_occ"))
          .withColumn("dup_ppm", expr("n_dup_occ * 1000000 div n_occ"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT source, string_split(text,' ') AS tk
             |  FROM documents WHERE len(string_split(text,' ')) >= 8),
             |g AS (SELECT source,
             |    unnest(list_transform(range(0, len(tk)-7),
             |      i -> list_reduce(list_prepend(CAST(7 AS BIGINT),
             |        list_transform(string_split(
             |          array_to_string(tk[i+1:i+8], ' '), ''),
             |          x -> CAST(ord(x) AS BIGINT))),
             |        (acc, x) -> (acc * 131 + x) % 1000000007))) AS h
             |  FROM t),
             |ps AS (SELECT source, h, count(*) AS c_sh FROM g GROUP BY 1, 2),
             |gl AS (SELECT h, sum(c_sh) AS c_h FROM ps GROUP BY h)
             |SELECT ps.source, CAST(sum(c_sh) AS BIGINT) AS n_occ,
             |  CAST(count(*) AS BIGINT) AS n_distinct,
             |  CAST(sum(CASE WHEN c_h >= 2 THEN c_sh ELSE 0 END) AS BIGINT)
             |    AS n_dup_occ,
             |  CAST(sum(CASE WHEN c_h >= 2 THEN c_sh ELSE 0 END) * 1000000
             |    // sum(c_sh) AS BIGINT) AS dup_ppm
             |FROM ps JOIN gl USING (h)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- p65: sequence-packing efficiency audit -------------------------
    // The decision table BEHIND p39/p44's packing choice: for each
    // candidate context length, how many sequences each strategy
    // yields and what fraction of the token budget is padding —
    // doc-boundary packing (no doc spans two sequences: pad every doc
    // to a multiple of L) vs concat-then-chunk (p39's strategy: only
    // the final partial chunk pads). All integer (ceil as (n+L-1) div
    // L, waste in ppm by truncating div). ONE pass over the corpus:
    // per-doc token counts fan out 4× against a broadcast literal of
    // candidate lengths and collapse map-side into 4 rows — the
    // whole audit costs one scan at any corpus size.
    RegQuery("p65_packing_efficiency",
      (s, d) => {
        import s.implicits._
        val docs = Tables(s, d, "documents")
          .select(size(TextOps.tokens(col("text"))).cast("long").as("n"))
        val ls = Seq(512L, 1024L, 2048L, 4096L).toDF("ctx")
        docs.crossJoin(broadcast(ls))
          .groupBy("ctx")
          .agg(count(lit(1)).as("n_docs"), sum("n").as("total_tokens"),
            sum(expr("(n + ctx - 1) div ctx")).as("docpad_seqs"))
          .withColumn("concat_seqs",
            expr("(total_tokens + ctx - 1) div ctx"))
          .withColumn("docpad_pad_ppm", expr(
            "(docpad_seqs * ctx - total_tokens) * 1000000" +
              " div (docpad_seqs * ctx)"))
          .withColumn("concat_pad_ppm", expr(
            "(concat_seqs * ctx - total_tokens) * 1000000" +
              " div (concat_seqs * ctx)"))
          .orderBy("ctx")
      },
      Some("""WITH n AS (SELECT CAST(len(string_split(text,' ')) AS BIGINT)
             |    AS n FROM documents),
             |ls AS (SELECT unnest([512, 1024, 2048, 4096]) AS ctx),
             |a AS (SELECT ctx, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(n) AS BIGINT) AS total_tokens,
             |    CAST(sum((n + ctx - 1) // ctx) AS BIGINT) AS docpad_seqs
             |  FROM n CROSS JOIN ls GROUP BY ctx),
             |b AS (SELECT *,
             |    (total_tokens + ctx - 1) // ctx AS concat_seqs FROM a)
             |SELECT ctx, n_docs, total_tokens, docpad_seqs, concat_seqs,
             |  (docpad_seqs * ctx - total_tokens) * 1000000
             |    // (docpad_seqs * ctx) AS docpad_pad_ppm,
             |  (concat_seqs * ctx - total_tokens) * 1000000
             |    // (concat_seqs * ctx) AS concat_pad_ppm
             |FROM b ORDER BY ctx""".stripMargin)),

    // ---- p66: dedup cluster-quality audit -------------------------------
    // The QA report a production dedup run ships with: after pairs →
    // CC clustering (p60/p62's mirrored spine), how big are the
    // clusters and how similar are their members REALLY? Per
    // cluster-size bucket: cluster count, verified-pair count, and
    // mean intra-cluster Jaccard (basis points, per-pair r4 rounding
    // then integer mean — so the whole table hash-matches). A healthy
    // near-dup run shows small clusters with high intra-similarity;
    // giant low-similarity clusters mean the banding threshold is
    // admitting transitive chains — THE dedup failure this table
    // exists to catch before a corpus ships. Cost: the pair source the
    // pipeline already runs + the CC spine + two bounded aggregates.
    RegQuery("p66_cluster_quality",
      (s, d) => {
        val pr = mirrorVerifiedPairs(s, d).localCheckpoint()
        val edges = pr.select(
          lpad(col("a_id").cast("string"), 9, "0").as("src_id"),
          lpad(col("b_id").cast("string"), 9, "0").as("dst_id"))
        val cc = graft.graphx.GraphAnalytics.connectedComponents(edges)
          .select(col("id").cast("long").as("doc_id"),
            col("component").cast("long").as("cid"))
          .localCheckpoint() // feeds sizes AND the pair-score join
        val sz = cc.groupBy("cid").agg(count(lit(1)).as("sz"))
        val ps = pr
          .join(cc.select(col("doc_id").as("a_id"), col("cid")), "a_id")
          .groupBy("cid")
          .agg(count(lit(1)).as("n_pairs"),
            sum(floor(col("jac") * 10000 + 0.5).cast("long")).as("sbp"))
        sz.join(ps, "cid")
          .groupBy("sz")
          .agg(count(lit(1)).as("n_clusters"),
            sum("n_pairs").as("n_pairs"),
            expr("sum(sbp) div sum(n_pairs)").as("mean_intra_jac_bp"))
          .orderBy("sz")
      },
      Some((twinsCte + mirrorPairsCte +
        """, und AS (SELECT a_id AS u, b_id AS v FROM pr
          |  UNION SELECT b_id, a_id FROM pr),
          |reach AS (
          |  SELECT u, u AS v FROM (SELECT DISTINCT u FROM und)
          |  UNION
          |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
          |cc AS (SELECT u AS doc_id, min(v) AS cid FROM reach GROUP BY u),
          |csz AS (SELECT cid, count(*) AS sz FROM cc GROUP BY cid),
          |cps AS (SELECT c.cid, count(*) AS n_pairs,
          |    sum(CAST(floor(jac*10000 + 0.5) AS BIGINT)) AS sbp
          |  FROM pr JOIN cc c ON pr.a_id = c.doc_id GROUP BY c.cid)
          |SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters,
          |  CAST(sum(n_pairs) AS BIGINT) AS n_pairs,
          |  CAST(sum(sbp) // sum(n_pairs) AS BIGINT)
          |    AS mean_intra_jac_bp
          |FROM csz JOIN cps USING (cid)
          |GROUP BY sz ORDER BY sz""".stripMargin)
        .replaceFirst("WITH ", "WITH RECURSIVE "))),

    // ---- p67: per-source distribution drift (total variation) ----------
    // Corpus drift detection — the monitoring table behind "did this
    // crawl/source shift under us": total-variation distance between
    // each source's hashed-unigram distribution and the corpus-wide
    // one, in ppm. TV (L1/2) rather than KL/JS keeps the whole
    // statistic INTEGER: per bucket |o·N − Ns·t| is exact in
    // decimal(38,0) (Ns·t passes int64 once a source holds ~3e9
    // tokens, so the products are widened BEFORE the abs/sum, matching
    // the oracle's HUGEINT arithmetic); the missing-bucket mass folds
    // in as Ns·(N − Σ t over touched buckets) without densifying. 256 poly-hash buckets (p42/p57's
    // hashed-feature move, bit-identical in DuckDB). Shape: one
    // explode collapsed map-side to (source, bucket) counts, two
    // bounded aggregates, one broadcast-sized join — linear, and the
    // drift table is ~sources rows forever.
    RegQuery("p67_source_drift",
      (s, d) => {
        def polyH(g: Column): Column = TextOps.polyHash(g)
        val occ = Tables(s, d, "documents")
          .select(col("source"), explode(TextOps.tokens(col("text")))
            .as("tok"))
          .select(col("source"), (polyH(col("tok")) % 256L).as("bkt"))
          .groupBy("source", "bkt").agg(count(lit(1)).as("o"))
          .localCheckpoint() // feeds bucket totals, source totals, join
        val tb = occ.groupBy("bkt").agg(sum("o").as("t"))
        val ns = occ.groupBy("source").agg(sum("o").as("ns"))
        val n = occ.agg(sum("o")).first().getLong(0)
        occ.join(tb, "bkt").join(ns, "source")
          .groupBy("source")
          .agg(max("ns").as("n_tokens"),
            // products in decimal(38,0): ns·t exceeds int64 once a
            // source holds ~3e9 tokens, and non-ANSI sum would wrap
            // silently while the DuckDB mirror (HUGEINT) stays exact
            sum(abs(col("o").cast("decimal(20,0)") * n -
              col("ns").cast("decimal(20,0)") * col("t"))).as("s1"),
            sum("t").as("tcov"))
          .select(col("source"), col("n_tokens"),
            expr(s"cast((cast(s1 as decimal(38,0)) +" +
              s" cast(n_tokens as decimal(38,0)) * ($n - tcov)) * 1000000" +
              s" div (2 * cast(n_tokens as decimal(38,0)) * $n)" +
              " as bigint)").as("tv_drift_ppm"))
          .orderBy("source")
      },
      Some("""WITH tk AS (SELECT source, unnest(string_split(text, ' '))
             |    AS tok FROM documents),
             |h AS (SELECT source,
             |    list_reduce(list_prepend(CAST(7 AS BIGINT),
             |      list_transform(string_split(tok, ''),
             |        x -> CAST(ord(x) AS BIGINT))),
             |      (acc, x) -> (acc * 131 + x) % 1000000007) % 256 AS bkt
             |  FROM tk),
             |occ AS (SELECT source, bkt, count(*) AS o FROM h GROUP BY 1, 2),
             |tb AS (SELECT bkt, sum(o) AS t FROM occ GROUP BY bkt),
             |ns AS (SELECT source, sum(o) AS ns FROM occ GROUP BY source),
             |nn AS (SELECT sum(o) AS n FROM occ),
             |j AS (SELECT occ.source, occ.o, tb.t, ns.ns, nn.n
             |  FROM occ JOIN tb USING (bkt) JOIN ns USING (source)
             |  CROSS JOIN nn),
             |a AS (SELECT source, max(ns) AS n_tokens, max(n) AS n,
             |    sum(abs(o * n - ns * t)) AS s1, sum(t) AS tcov
             |  FROM j GROUP BY source)
             |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST((CAST(s1 AS HUGEINT)
             |      + CAST(n_tokens AS HUGEINT) * (n - tcov)) * 1000000
             |    // (2 * CAST(n_tokens AS HUGEINT) * n) AS BIGINT)
             |    AS tv_drift_ppm
             |FROM a ORDER BY source""".stripMargin)),

    // ---- p68: ANN recall/MRR harness (IVF vs exact) ---------------------
    // The eval loop an ANN index ships with: per query, recall@5 and
    // the reciprocal rank of the TRUE nearest neighbor inside the
    // IVF shortlist — the table that decides nprobe/cell-count before
    // a corpus-scale index build. Composes two already-mirrored
    // registry queries (p09 exact brute force, p14 trained IVF) via a
    // left join on (query, neighbor); metrics are integer ppm, and the
    // ORACLE composes the same two DuckDB mirrors as subqueries — so
    // even the eval harness itself is hash-checked, not just the
    // things it evaluates. LSH/PQ arms (p48/p31) slot into the same
    // join by swapping the approximate side.
    RegQuery("p68_ann_recall",
      (s, d) => {
        def run(n: String): DataFrame =
          registry.find(_.name == n).get.fn(s, d)
        val ex = run("p09_ann_topk")
          .select(col("q_id"), col("rank").as("ex_rank"), col("n_id"))
        val iv = run("p14_ann_ivf")
          .select(col("q_id"), col("rank").as("iv_rank"), col("n_id"))
        ex.join(iv, Seq("q_id", "n_id"), "left")
          .groupBy("q_id")
          .agg(count(lit(1)).as("k"),
            sum(when(col("iv_rank").isNotNull, 1L).otherwise(0L))
              .as("n_hits"),
            max(when(col("ex_rank") === 1,
                coalesce(expr("1000000 div iv_rank"), lit(0L))))
              .as("rr_ppm"))
          .withColumn("recall_ppm", expr("n_hits * 1000000 div k"))
          .select("q_id", "k", "n_hits", "recall_ppm", "rr_ppm")
          .orderBy("q_id")
      },
      Some(s"""WITH ex0 AS ($p09Oracle),
             |iv0 AS ($ivfOracle),
             |ex AS (SELECT q_id, rank AS ex_rank, n_id FROM ex0),
             |iv AS (SELECT q_id, rank AS iv_rank, n_id FROM iv0),
             |j AS (SELECT ex.q_id, ex.ex_rank, ex.n_id, iv.iv_rank
             |  FROM ex LEFT JOIN iv
             |    ON ex.q_id = iv.q_id AND ex.n_id = iv.n_id),
             |a AS (SELECT q_id, CAST(count(*) AS BIGINT) AS k,
             |    CAST(sum(CASE WHEN iv_rank IS NOT NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_hits,
             |    CAST(max(CASE WHEN ex_rank = 1
             |      THEN coalesce(1000000 // iv_rank, 0) END) AS BIGINT)
             |      AS rr_ppm
             |  FROM j GROUP BY q_id)
             |SELECT q_id, k, n_hits, n_hits * 1000000 // k AS recall_ppm,
             |  rr_ppm
             |FROM a ORDER BY q_id""".stripMargin)),

    // ---- p69: boilerplate-line removal (CCNet-style) ---------------------
    // The web-corpus cleaning pass p25 only MEASURES: segment each doc
    // into consecutive 5-token lines, call a line boilerplate when it
    // recurs in >= 3 distinct docs of the SAME source (headers, nav
    // bars, cookie banners — per-site furniture), and emit the
    // RECONSTRUCTED document with those lines removed, in original
    // order, remainder tokens kept. A deterministic per-source header
    // is planted on every doc so the oracle gates real removal, not a
    // no-op. Scale shape: one explode + a (source, line) hash-agg with
    // a distinct-doc count (map-side combined), one anti-join back, one
    // per-doc ordered re-assembly (sort_array over collected (idx,
    // line) structs — a bounded per-doc array, no window) — linear,
    // never all-pairs, partitioned by the natural (source, line) and
    // doc_id keys.
    RegQuery("p69_boilerplate_removal",
      (s, d) => {
        val hdr = concat_ws(" ", (1 to 5).map(i =>
          concat(lit(s"h${i}_"), col("source"))): _*)
        val tk = Tables(s, d, "documents")
          .select(col("doc_id"), col("source"),
            TextOps.tokens(concat(hdr, lit(" "), col("text"))).as("tk"))
          .withColumn("nch", expr("size(tk) div 5"))
          .transform(graft.Part.pin(col("doc_id")))
          .localCheckpoint() // feeds lines, remainder, and the re-join
        val lines = tk.select(col("doc_id"), col("source"),
          posexplode(when(col("nch") >= 1,
            transform(sequence(lit(0), col("nch") - 1), i =>
              concat_ws(" ", slice(col("tk"), i * 5 + 1, lit(5)))))
            .otherwise(array().cast("array<string>")))
            .as(Seq("idx", "line")))
        // the boilerplate set is tiny (per-source furniture) — cut it
        // once so the anti-join side doesn't recompute the full
        // (source, line) aggregate; dropped count = n_chunks − kept,
        // so no second (semi) pass over the line stream is needed
        val bp = lines.groupBy("source", "line")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .where(col("nd") >= 3)
          .select("source", "line")
          .localCheckpoint()
        val body = lines.join(bp, Seq("source", "line"), "left_anti")
          .groupBy("doc_id")
          .agg(concat_ws(" ", transform(
            array_sort(collect_list(struct(col("idx"), col("line")))),
            x => x("line"))).as("body"),
            count(lit(1)).as("n_kept"))
        tk.select(col("doc_id"), col("nch").cast("long").as("n_chunks"),
            concat_ws(" ", slice(col("tk"), col("nch") * 5 + 1,
              size(col("tk")) - col("nch") * 5)).as("rem"))
          .join(body, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_chunks"),
            (col("n_chunks") - coalesce(col("n_kept"), lit(0L)))
              .as("n_bp"),
            trim(concat_ws(" ", col("body"), col("rem")))
              .as("cleaned_text"))
          .orderBy("doc_id")
      },
      Some("""WITH docs AS (SELECT doc_id, source,
             |    'h1_'||source||' h2_'||source||' h3_'||source||' h4_'
             |      ||source||' h5_'||source||' '||text AS text
             |  FROM documents),
             |t AS (SELECT doc_id, source, string_split(text, ' ') AS tk
             |  FROM docs),
             |n AS (SELECT *, len(tk)//5 AS nch FROM t),
             |ch AS (SELECT doc_id, source, i AS idx,
             |    array_to_string(tk[i*5+1:i*5+5], ' ') AS line
             |  FROM n, unnest(range(0, nch)) AS u(i)),
             |bp AS (SELECT source, line FROM ch GROUP BY source, line
             |  HAVING count(DISTINCT doc_id) >= 3),
             |kept AS (SELECT ch.doc_id, ch.idx, ch.line FROM ch
             |  LEFT JOIN bp ON ch.source = bp.source AND ch.line = bp.line
             |  WHERE bp.line IS NULL),
             |ka AS (SELECT doc_id, string_agg(line, ' ' ORDER BY idx)
             |    AS body FROM kept GROUP BY doc_id),
             |dr AS (SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_bp
             |  FROM ch JOIN bp ON ch.source = bp.source
             |    AND ch.line = bp.line
             |  GROUP BY ch.doc_id)
             |SELECT n.doc_id, CAST(n.nch AS BIGINT) AS n_chunks,
             |  COALESCE(dr.n_bp, 0) AS n_bp,
             |  trim(COALESCE(ka.body, '') || ' ' ||
             |    COALESCE(array_to_string(tk[nch*5+1:], ' '), ''))
             |    AS cleaned_text
             |FROM n LEFT JOIN ka USING (doc_id) LEFT JOIN dr USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // ---- p70: BPE merge induction (tokenizer training) -------------------
    // The train side of the tokenizer loop, distributed the way it
    // actually runs at corpus scale: the WORD-FREQUENCY table (distinct
    // words + counts — millions of rows at 100 TB, never the raw token
    // stream) carries a symbol array per word; each of the 10 rounds is
    // one adjacent-pair explode + hash aggregate (map-side combined)
    // and a TakeOrderedAndProject argmax — only the single winning
    // (lhs, rhs) row ever reaches the driver, which is exactly the
    // merge-table-lives-on-the-driver shape of real BPE training. The
    // merge applies as a per-word left fold (whole-symbol compare, so
    // greedy leftmost-first semantics — "aaaa" + (a,a) → [aa, aa]);
    // ties break on (count desc, lhs, rhs), making the learned table
    // deterministic and the DuckDB mirror (the same 10 rounds as
    // chained CTEs with a list_reduce fold) hash-exact.
    RegQuery("p70_bpe_merges",
      (s, d) => {
        import s.implicits._
        bpeLearn(s, d, rounds = 10)._1
          .toDF("mrank", "lhs", "rhs", "pair_freq")
          .orderBy("mrank")
      },
      Some(bpeOracle(10))),

    // ---- p71: BPE tokenization (the apply side of p70) -------------------
    // The serving half of the tokenizer loop, with the corpus-scale
    // structure: the 10 learned merges segment the DISTINCT-WORD table
    // once (a per-word fold over a vocab-sized frame — never the raw
    // token stream), and documents pick up their subword counts
    // through one explode + one equi-join on the word — so tokenizing
    // 100 TB costs one join against a vocab lookup side, exactly how a
    // trained tokenizer deploys. Emits per-doc word/subword/char
    // counts and chars-per-subword (compression) in basis points; the
    // DuckDB mirror reuses the p70 CTE chain's final vocab.
    RegQuery("p71_bpe_tokenize",
      (s, d) => {
        val seg = bpeLearn(s, d, rounds = 10)._2
          .select(col("w"), size(col("syms")).as("ns"),
            length(col("w")).as("nc"))
        Tables(s, d, "documents")
          .select(col("doc_id"), explode(TextOps.tokens(col("text")))
            .as("w"))
          .join(seg, "w")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tok"),
            sum(col("ns").cast("long")).as("n_sub"),
            sum(col("nc").cast("long")).as("n_chars"))
          .select(col("doc_id"), col("n_tok"), col("n_sub"),
            col("n_chars"),
            expr("n_chars * 10000 div n_sub").as("chars_per_sub_bp"))
          .orderBy("doc_id")
      },
      Some(bpeChain(10) + """
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |  CAST(sum(len(syms)) AS BIGINT) AS n_sub,
        |  CAST(sum(length(w)) AS BIGINT) AS n_chars,
        |  CAST(sum(length(w)) * 10000 // sum(len(syms)) AS BIGINT)
        |    AS chars_per_sub_bp
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |      FROM documents) t
        |JOIN w10 USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- p72: incremental dedup — new batch vs persisted corpus index ---
    // The OPERATIONAL dedup path at 100 TB: a daily increment is never
    // deduped by re-LSHing the whole corpus — the corpus's band index
    // is persisted, and only the NEW batch builds signatures and
    // PROBES it by equi-join (probe cost ~ |batch|, corpus never
    // self-joins), plus one bounded intra-batch self-join. Semantics
    // per new doc (the s08 admission-log shape, batch form):
    // corpus_dup (min matching corpus id) beats batch_dup (min smaller
    // matching batch id) beats novel (own id) — all from the same
    // mirrored polyhash/minhash/band family, so every stage including
    // chance band collisions is DuckDB-hash-checked. The oracle
    // derives the identical dispositions from the full mirrored pair
    // set; the Spark plan is the asymmetric probe.
    RegQuery("p72_incremental_dedup",
      (s, d) => {
        val (hs, bands) = mirrorHsBands(s, d)
        val idx = bands.where(col("doc_id") < 1000000L)
          .select(col("bi"), col("bv"), col("doc_id").as("a_id"))
        val nb = bands.where(col("doc_id") >= 1000000L)
        val candCorpus = nb.select(col("bi"), col("bv"),
            col("doc_id").as("b_id"))
          .join(idx, Seq("bi", "bv"))
        val candBatch = nb.select(col("bi"), col("bv"),
            col("doc_id").as("b_id"))
          .join(nb.select(col("bi"), col("bv"), col("doc_id").as("a_id")),
            Seq("bi", "bv"))
          .where(col("a_id") < col("b_id"))
        val cand = candCorpus.select("a_id", "b_id")
          .unionAll(candBatch.select("a_id", "b_id")).distinct()
        val hits = cand
          .join(hs.select(col("doc_id").as("a_id"), col("hs").as("a_hs")),
            "a_id")
          .join(hs.select(col("doc_id").as("b_id"), col("hs").as("b_hs")),
            "b_id")
          .where(TextOps.jaccardSorted(col("a_hs"), col("b_hs")) >= 0.5)
          .groupBy("b_id")
          .agg(min(when(col("a_id") < 1000000L, col("a_id")))
              .as("corpus_hit"),
            min(when(col("a_id") >= 1000000L, col("a_id")))
              .as("batch_hit"))
        docsWithTwins(s, d).where(col("doc_id") >= 1000000L)
          .select(col("doc_id"))
          .join(hits.withColumnRenamed("b_id", "doc_id"),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("corpus_hit").isNotNull, lit("corpus_dup"))
              .when(col("batch_hit").isNotNull, lit("batch_dup"))
              .otherwise(lit("novel")).as("status"),
            coalesce(col("corpus_hit"), col("batch_hit"), col("doc_id"))
              .as("canonical_id"))
          .orderBy("doc_id")
      },
      Some(twinsCte + mirrorPairsCte +
        """, nd AS (SELECT doc_id FROM alldocs WHERE doc_id >= 1000000),
          |hit AS (SELECT b_id AS doc_id,
          |    min(CASE WHEN a_id < 1000000 THEN a_id END) AS corpus_hit,
          |    min(CASE WHEN a_id >= 1000000 THEN a_id END) AS batch_hit
          |  FROM pr WHERE b_id >= 1000000 GROUP BY b_id)
          |SELECT nd.doc_id,
          |  CASE WHEN corpus_hit IS NOT NULL THEN 'corpus_dup'
          |       WHEN batch_hit IS NOT NULL THEN 'batch_dup'
          |       ELSE 'novel' END AS status,
          |  COALESCE(corpus_hit, batch_hit, nd.doc_id) AS canonical_id
          |FROM nd LEFT JOIN hit USING (doc_id)
          |ORDER BY nd.doc_id""".stripMargin)),

    // ---- p73: hybrid retrieval via reciprocal-rank fusion ---------------
    // The RAG-stack retrieval fusion: the lexical arm (p34's BM25
    // top-10) and the vector arm (exact cosine top-10 of the query
    // embedding, p09's determinization) merge by RRF —
    // rrf_u = Σ 1000000 div (60 + rank) over the arms listing the doc.
    // Rank fusion needs no score calibration between arms (the reason
    // production stacks prefer it to weighted-score sums), and because
    // it consumes RANKS, the fused score is pure integer arithmetic —
    // fully hash-checkable even though BM25 and cosine are float
    // internally. Scale: both arms end in bounded top-k frames (the
    // corpus-side work is each arm's own one-shuffle plan), so the
    // fusion join touches O(q·k) rows at any corpus size.
    RegQuery("p73_hybrid_rrf",
      (s, d) => {
        val lex = bm25TopK(s, d, 10)
          .select(col("q_id"), col("doc_id"), col("rank").as("lex_rank"))
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
        val q = e.where(col("vec_id").between(1, 3))
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val vec = e.select(col("vec_id").as("n_id"), col("v").as("nv"))
          .crossJoin(broadcast(q))
          .where(col("q_id") =!= col("n_id"))
          .withColumn("cos_u",
            floor(VectorOps.cosineFast(col("qv"), col("nv")) * 1000000 + 0.5))
          .withColumn("vec_rank", row_number().over(Window.partitionBy("q_id")
            .orderBy(col("cos_u").desc, col("n_id"))))
          .where(col("vec_rank") <= 10)
          .select(col("q_id").cast("int").as("q_id"),
            col("n_id").as("doc_id"), col("vec_rank"))
        lex.join(vec, Seq("q_id", "doc_id"), "full")
          .select(col("q_id"), col("doc_id"),
            coalesce(expr("1000000 div (60 + lex_rank)"), lit(0L)).as("lex_u"),
            coalesce(expr("1000000 div (60 + vec_rank)"), lit(0L)).as("vec_u"))
          .withColumn("rrf_u", col("lex_u") + col("vec_u"))
          .withColumn("rank", row_number().over(Window.partitionBy("q_id")
            .orderBy(col("rrf_u").desc, col("doc_id"))))
          .where(col("rank") <= 10)
          .select("q_id", "rank", "doc_id", "rrf_u", "lex_u", "vec_u")
          .orderBy("q_id", "rank")
      },
      Some("""WITH docs AS (SELECT doc_id,
             |    CAST(len(string_split(text,' ')) AS BIGINT) AS dl,
             |    string_split(text,' ') AS t FROM documents),
             |post AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
             |  FROM (SELECT doc_id, dl, unnest(t) AS term FROM docs)
             |  GROUP BY doc_id, dl, term),
             |q(q_id, term) AS (VALUES (1,'spark'),(1,'join'),(2,'hash'),
             |  (2,'table'),(2,'scan'),(3,'window'),(3,'agg'),(3,'data')),
             |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post
             |  WHERE term IN (SELECT term FROM q) GROUP BY term),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(dl) AS BIGINT) AS sum_dl FROM docs),
             |sc AS (SELECT q.q_id, p.doc_id,
             |  CAST(floor(ln(1.0 + (st.n_docs - f.df + 0.5)/(f.df + 0.5))
             |    * (p.tf*2.2/(p.tf + 1.2*(0.25 + 0.75*p.dl
             |        /(CAST(st.sum_dl AS DOUBLE)/st.n_docs))))
             |    * 10000 + 0.5) AS BIGINT) AS u
             |  FROM post p JOIN q ON p.term = q.term
             |  JOIN dfreq f ON p.term = f.term CROSS JOIN st),
             |a AS (SELECT q_id, doc_id, CAST(sum(u) AS BIGINT) AS score_u
             |  FROM sc GROUP BY q_id, doc_id),
             |lex AS (SELECT q_id, doc_id, ROW_NUMBER() OVER
             |  (PARTITION BY q_id ORDER BY score_u DESC, doc_id) AS lex_rank
             |  FROM a),
             |e AS (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |qv AS (SELECT vec_id AS q_id, v AS qv FROM e
             |  WHERE vec_id BETWEEN 1 AND 3),
             |pv AS (SELECT q_id, e.vec_id AS n_id,
             |  list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*e.v[i]))
             |    / (sqrt(list_sum(list_transform(qv, x -> x*x)))
             |       * sqrt(list_sum(list_transform(e.v, x -> x*x)))) AS c
             |  FROM qv, e WHERE e.vec_id != q_id),
             |vec AS (SELECT q_id, n_id AS doc_id, ROW_NUMBER() OVER
             |  (PARTITION BY q_id ORDER BY floor(c*1000000+0.5) DESC, n_id)
             |    AS vec_rank
             |  FROM pv),
             |lex10 AS (SELECT * FROM lex WHERE lex_rank <= 10),
             |vec10 AS (SELECT * FROM vec WHERE vec_rank <= 10),
             |f AS (SELECT coalesce(l.q_id, v.q_id) AS q_id,
             |    coalesce(l.doc_id, v.doc_id) AS doc_id,
             |    coalesce(1000000 // (60 + l.lex_rank), 0) AS lex_u,
             |    coalesce(1000000 // (60 + v.vec_rank), 0) AS vec_u
             |  FROM lex10 l FULL JOIN vec10 v
             |    ON l.q_id = v.q_id AND l.doc_id = v.doc_id),
             |rr AS (SELECT q_id, doc_id, lex_u + vec_u AS rrf_u,
             |    lex_u, vec_u, ROW_NUMBER() OVER (PARTITION BY q_id
             |      ORDER BY lex_u + vec_u DESC, doc_id) AS rank
             |  FROM f)
             |SELECT CAST(q_id AS INTEGER) AS q_id,
             |  CAST(rank AS INTEGER) AS rank, doc_id,
             |  CAST(rrf_u AS BIGINT) AS rrf_u, CAST(lex_u AS BIGINT) AS lex_u,
             |  CAST(vec_u AS BIGINT) AS vec_u
             |FROM rr WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin)),

    // ---- p74: greedy coverage source selection --------------------------
    // Facility-location data selection: order sources by MARGINAL new
    // distinct 8-grams (the submodular coverage objective — greedy is
    // the (1−1/e) workhorse of training-data subset selection). Each
    // of the k rounds is one hash-aggregate for the argmax plus one
    // anti-join that retires the winner's grams — so cost is k passes
    // over a monotonically SHRINKING gram table, never a 2^|sources|
    // search, and the driver holds one (source, count) row per round.
    // The DuckDB mirror runs the identical k rounds as chained CTEs
    // (the p70 BPE-mirror pattern); grams are the p64 polynomial hash
    // so both engines compare the same integers.
    RegQuery("p74_greedy_coverage",
      (s, d) => {
        import s.implicits._
        val tk = col("tk")
        var remaining = Tables(s, d, "documents")
          .select(col("source"), TextOps.tokens(col("text")).as("tk"))
          .where(size(tk) >= 8)
          .transform(graft.Part.pin(col("source"))) // token barrier (p40 lesson)
          .select(col("source"), explode(
            transform(sequence(lit(0), size(tk) - 8),
              i => TextOps.polyHash(concat_ws(" ", slice(tk, i + 1, lit(8))))))
            .as("h"))
          .distinct()
          .localCheckpoint() // feeds k marginal passes
        val picks = Seq.newBuilder[(Int, String, Long, Long)]
        var cum = 0L
        var exhausted = false
        for (it <- 1 to 5 if !exhausted) {
          // headOption, not (0): with fewer sources than rounds (or
          // full coverage) `remaining` empties early — then the greedy
          // just stops, exactly where the oracle emits fewer rows
          remaining.groupBy("source").agg(count(lit(1)).as("m"))
            .orderBy(col("m").desc, col("source")).limit(1)
            .collect().headOption match {
            case None => exhausted = true
            case Some(top) =>
              val (src, m) = (top.getString(0), top.getLong(1))
              cum += m
              picks += ((it, src, m, cum))
              remaining = remaining.where(col("source") =!= src)
                .join(remaining.where(col("source") === src).select("h"),
                  Seq("h"), "anti")
                .localCheckpoint()
          }
        }
        picks.result().toDF("iter", "source", "marginal_new", "cum_cover")
      },
      Some(p74Oracle)),

    // ---- p75: cosine top-k through the custom physical operator ---------
    // p09's EXACT semantics executed by the whole-operator Catalyst
    // extension (plans/CosineTopK): CosineTopKPlan → CosineTopKStrategy
    // → CosineTopKExec — one narrow corpus pass with a bounded k-heap
    // per query per partition, then a reduceByKey merge of the
    // ≤ partitions·q·k survivors. The crossJoin×window plan p09 runs
    // materializes |corpus|·|queries| rows into a rank shuffle; this
    // one shuffles kilobytes at any corpus size. Determinization is
    // bit-identical (left-to-right dot product, micro rounding,
    // (cos desc, id) ties), so the UNCHANGED p09 oracle hash-checks
    // the custom operator — and PlansSpec pins exec-node presence and
    // row-for-row equality with p09's composed plan.
    RegQuery("p75_ann_topk_exec",
      (s, d) => {
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
        // the probe side is a CHILD PLAN (a filter over the same scan),
        // never a driver collect — EnsureRequirements plans it as a
        // BroadcastExchange, so a probe batch scales exactly as far as
        // any broadcast build side
        graft.plans.CosineTopK.topK(e, "vec_id", "v",
          e.where(col("vec_id") < 3), "vec_id", "v", k = 5,
          excludeSelf = true)
          .orderBy("q_id", "rank")
      },
      Some(p09Oracle)),

    // ---- p76: batched BPE training (multi-merge rounds) -----------------
    // p70's scale caveat closed: a production 32k-merge vocabulary
    // cannot afford one Spark job per merge. Each round now selects up
    // to 6 SYMBOL-DISJOINT pairs (greedy down the (cnt DESC, lhs, rhs)
    // ranking; a pair is blocked when either symbol appeared in any
    // higher-ranked pair) and applies them in ONE fold pass —
    // disjointness makes the batch order-independent, so the single
    // fold equals 6 sequential merges and the job count drops to
    // ~vocab/6. Selection pulls only the ranked pair prefix to the
    // driver; the DuckDB mirror runs the identical ranking + NOT
    // EXISTS blocking + list-membership fold as chained CTEs, so every
    // selected pair, rank, and tie-break is hash-checked.
    RegQuery("p76_bpe_batch_merges",
      (s, d) => {
        import s.implicits._
        bpeLearnBatched(s, d, rounds = 3, batchN = 6)._1
          .toDF("rnd", "sel_rank", "lhs", "rhs", "pair_freq")
          .orderBy("rnd", "sel_rank")
      },
      Some(bpeBatchOracle(3, 6)))  ,

    // ---- p77: incremental dedup index MAINTENANCE (fold + re-probe) -----
    // p72 closes its operational loop: batch 1 (the twins, ids +1M)
    // probes the PERSISTED corpus band index; its NOVEL docs' band
    // rows are then APPENDED to the index (merge-on-read, GraphStore's
    // append discipline) and the index is compacted (one re-bucketed
    // rewrite); batch 2 (ids +3M — byte-identical to batch 1, the
    // retry/replay shape) probes the COMPACTED index and must find
    // every batch-1-admitted doc as a corpus_dup with canonical = the
    // admitted id (x+3M → x+1M) — proving the fold actually landed.
    // Cost per epoch stays ~|batch|: the batch band-joins the index,
    // the corpus is never re-signed, and the compaction rewrites only
    // the (constant-size-per-doc) band rows. The oracle derives the
    // identical dispositions from the three-generation mirrored pair
    // set with the index membership as a CTE, so admission, fold,
    // and re-probe — including chance band collisions — are all
    // hash-checked. `via` labels the match source (corpus /
    // batch1_admitted / batch / self) to make the fold visible.
    RegQuery("p77_dedup_index_fold",
      (s, d) => {
        val idxPath = Scratch.path(s, "p77_bandidx", d)
        Scratch.clear(s, idxPath)
        val base = Tables(s, d, "documents").select("doc_id", "text")
        val batch1 = base.select((col("doc_id") + 1000000L).as("doc_id"),
          batch1Text(TextOps.tokens(col("text"))).as("text"))
        val docs3 = base.unionAll(batch1)
          .unionAll(batch1
            .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
        // bands feeds EIGHT consumers below (index create, two probe
        // self-joins per epoch, the fold's semi-join) — each would
        // re-run the minhash+band derivation from the hs checkpoint;
        // cut it once (r10)
        val (hs, bands0) = mirrorHsBandsOf(docs3)
        val bands = bands0.localCheckpoint()
        def verified(cand: DataFrame): DataFrame = cand
          .join(hs.select(col("doc_id").as("a_id"), col("hs").as("a_hs")),
            "a_id")
          .join(hs.select(col("doc_id").as("b_id"), col("hs").as("b_hs")),
            "b_id")
          .where(TextOps.jaccardSorted(col("a_hs"), col("b_hs")) >= 0.5)
        // epoch 0: persist the corpus band index as generation 0
        // (lifecycle through graft.llm.DedupIndex — the generation
        // policy module the rehearsal pins; cap forced to 1 here so
        // the fold EXERCISES the policy-triggered compaction)
        import graft.llm.DedupIndex
        s.conf.set(DedupIndex.MaxGenerationsConf, "1")
        DedupIndex.create(s, idxPath, bands.where(col("doc_id") < 1000000L))
        // epoch 1: batch 1 probes the index + itself; novel = no hit
        val b1 = bands.where(col("doc_id") >= 1000000L &&
          col("doc_id") < 2000000L)
        val cand1 = b1.select(col("bi"), col("bv"), col("doc_id").as("b_id"))
          .join(DedupIndex.read(s, idxPath)
            .select(col("bi"), col("bv"), col("doc_id").as("a_id")),
            Seq("bi", "bv"))
          .unionAll(b1.select(col("bi"), col("bv"), col("doc_id").as("b_id"))
            .join(b1.select(col("bi"), col("bv"), col("doc_id").as("a_id")),
              Seq("bi", "bv"))
            .where(col("a_id") < col("b_id")))
          .select("a_id", "b_id").distinct()
        val novel1 = batch1.select("doc_id")
          .join(verified(cand1).select(col("b_id").as("doc_id")).distinct(),
            Seq("doc_id"), "anti")
          .localCheckpoint() // feeds the fold AND is itself one pass
        // the FOLD: append the admitted docs' band rows as generation 1
        // — 2 generations > cap 1, so DedupIndex compacts to one
        // band-clustered generation before the next probe
        val gens = DedupIndex.append(s, idxPath,
          bands.join(novel1, Seq("doc_id"), "semi"))
        require(gens == 1, s"p77: expected policy compaction to 1 " +
          s"generation, found $gens")
        // epoch 2: batch 2 probes the COMPACTED index + itself
        val b2 = bands.where(col("doc_id") >= 3000000L)
        val cand2 = b2.select(col("bi"), col("bv"), col("doc_id").as("b_id"))
          .join(DedupIndex.read(s, idxPath)
            .select(col("bi"), col("bv"), col("doc_id").as("a_id")),
            Seq("bi", "bv"))
          .unionAll(b2.select(col("bi"), col("bv"), col("doc_id").as("b_id"))
            .join(b2.select(col("bi"), col("bv"), col("doc_id").as("a_id")),
              Seq("bi", "bv"))
            .where(col("a_id") < col("b_id")))
          .select("a_id", "b_id").distinct()
        val hits2 = verified(cand2)
          .groupBy("b_id")
          .agg(min(when(col("a_id") < 2000000L, col("a_id"))).as("c_hit"),
            min(when(col("a_id") >= 3000000L, col("a_id"))).as("b_hit"))
        docs3.where(col("doc_id") >= 3000000L).select("doc_id")
          .join(hits2.withColumnRenamed("b_id", "doc_id"),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("c_hit").isNotNull, lit("corpus_dup"))
              .when(col("b_hit").isNotNull, lit("batch_dup"))
              .otherwise(lit("novel")).as("status"),
            coalesce(col("c_hit"), col("b_hit"), col("doc_id"))
              .as("canonical_id"),
            when(col("c_hit") < 1000000L, lit("corpus"))
              .when(col("c_hit").isNotNull, lit("batch1_admitted"))
              .when(col("b_hit").isNotNull, lit("batch"))
              .otherwise(lit("self")).as("via"))
          .orderBy("doc_id")
      },
      Some(twins3Cte + mirrorPairsCte +
        """, b1 AS (SELECT doc_id FROM alldocs
          |    WHERE doc_id >= 1000000 AND doc_id < 2000000),
          |h1 AS (SELECT b_id AS doc_id, count(*) AS nh
          |  FROM pr WHERE b_id >= 1000000 AND b_id < 2000000
          |  GROUP BY b_id),
          |nov AS (SELECT b1.doc_id FROM b1 LEFT JOIN h1 USING (doc_id)
          |  WHERE nh IS NULL),
          |idx AS (SELECT doc_id FROM alldocs WHERE doc_id < 1000000
          |  UNION ALL SELECT doc_id FROM nov),
          |h2 AS (SELECT pr.b_id AS doc_id,
          |    min(CASE WHEN idx.doc_id IS NOT NULL THEN pr.a_id END)
          |      AS c_hit,
          |    min(CASE WHEN pr.a_id >= 3000000 THEN pr.a_id END) AS b_hit
          |  FROM pr LEFT JOIN idx ON pr.a_id = idx.doc_id
          |  WHERE pr.b_id >= 3000000 GROUP BY pr.b_id),
          |b2 AS (SELECT doc_id FROM alldocs WHERE doc_id >= 3000000)
          |SELECT b2.doc_id,
          |  CASE WHEN c_hit IS NOT NULL THEN 'corpus_dup'
          |       WHEN b_hit IS NOT NULL THEN 'batch_dup'
          |       ELSE 'novel' END AS status,
          |  COALESCE(c_hit, b_hit, b2.doc_id) AS canonical_id,
          |  CASE WHEN c_hit < 1000000 THEN 'corpus'
          |       WHEN c_hit IS NOT NULL THEN 'batch1_admitted'
          |       WHEN b_hit IS NOT NULL THEN 'batch'
          |       ELSE 'self' END AS via
          |FROM b2 LEFT JOIN h2 USING (doc_id)
          |ORDER BY b2.doc_id""".stripMargin)),

    // ---- p78: BM25 served from a PERSISTED term-bucketed index ----------
    // p34 computes postings per query run; a deployed search engine
    // builds the inverted index ONCE and every query touches only its
    // terms' postings. Index build = postings (doc_id, dl, term, tf)
    // bucketed 16 ways on term (q61's layout discipline applied to
    // retrieval), plus the per-term document frequencies and the
    // 1-row corpus stats as side tables. Query time reads NOTHING but
    // the index: the term IN-list prunes the bucketed scan to the
    // buckets holding the query terms (ScaleSpec pins
    // SelectedBucketsCount < 16; a probe-serving session sets
    // spark.sql.sources.bucketing.autoBucketedScan.enabled=false,
    // since the auto heuristic weighs only partitioning interest, not
    // pruning), df/stats broadcast, and the same
    // integer micro-unit scoring as p34 runs over the matched postings
    // only — so p34's UNCHANGED oracle hash-checks the index-served
    // path, proving build + probe lose nothing vs scoring the corpus
    // directly.
    RegQuery("p78_bm25_index_probe",
      (s, d) => {
        import s.implicits._
        val tag = d.replaceAll("[^0-9a-zA-Z]", "_")
        val postT = s"graft_p78_post_$tag"
        val dfPath = Scratch.path(s, "p78_df", d)
        val statPath = Scratch.path(s, "p78_stats", d)
        Scratch.dropTable(s, postT)
        Scratch.clear(s, dfPath, statPath)
        // ---- index build (once per corpus) ----
        val docs = Tables(s, d, "documents")
          .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
          .transform(graft.Part.pin(col("doc_id"))) // token barrier (p34 discipline)
          .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
            col("tk"))
          .localCheckpoint() // feeds postings AND the stats row
        docs.select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
          .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
          .write.mode("overwrite").bucketBy(16, "term").sortBy("term")
          .format("parquet").saveAsTable(postT)
        s.table(postT).groupBy("term").agg(count(lit(1)).as("df"))
          .write.mode("overwrite").parquet(dfPath)
        docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
          .write.mode("overwrite").parquet(statPath)
        // ---- query time: the index is the ONLY input ----
        val qterms = Seq((1, "spark"), (1, "join"), (2, "hash"),
          (2, "table"), (2, "scan"), (3, "window"), (3, "agg"), (3, "data"))
          .toDF("q_id", "term")
        val terms = qterms.select("term").distinct()
          .as[String].collect().sorted.toSeq
        val post = s.table(postT).where(col("term").isin(terms: _*))
        val dfreq = s.read.parquet(dfPath)
          .where(col("term").isin(terms: _*))
        val st = s.read.parquet(statPath)
        val avgdl = col("sum_dl").cast("double") / col("n_docs")
        val idf = log(lit(1.0) +
          (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
        val tfn = col("tf") * 2.2 / (col("tf") +
          lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
        post.join(broadcast(qterms), "term")
          .join(broadcast(dfreq), "term")
          .crossJoin(broadcast(st))
          .withColumn("u", floor(idf * tfn * 10000 + 0.5).cast("long"))
          .groupBy("q_id", "doc_id").agg(sum(col("u")).as("score_u"))
          .withColumn("rank", row_number().over(Window.partitionBy("q_id")
            .orderBy(col("score_u").desc, col("doc_id"))))
          .where(col("rank") <= 10)
          .select("q_id", "rank", "doc_id", "score_u")
          .orderBy("q_id", "rank")
      },
      Some(bm25ProbeOracle)),

    // ---- p79: incremental BM25 index maintenance ------------------------
    // p78's index kept FRESH without a rebuild: a new-docs batch (the
    // twins) appends (a) its postings rows into the SAME term-bucketed
    // table — Spark appends respect the table's bucket spec, so probe
    // pruning keeps working — and (b) its ALGEBRAIC df and corpus-
    // stats partials as extra parquet rows, folded by sum at probe
    // time (q62's merge-on-read law applied to retrieval: df and
    // (n_docs, Σdl) are sums, so per-batch partials + read-time fold
    // == full recompute, and a compactor can fold the side tables
    // whenever it likes). The probe after the increment scores against
    // base+batch postings with the folded stats, and the oracle is
    // p34's SQL over the UNION corpus — proving append + fold serves
    // exactly what a from-scratch rebuild would.
    RegQuery("p79_bm25_index_increment",
      (s, d) => {
        import s.implicits._
        val tag = d.replaceAll("[^0-9a-zA-Z]", "_")
        val postT = s"graft_p79_post_$tag"
        val dfPath = Scratch.path(s, "p79_df", d)
        val statPath = Scratch.path(s, "p79_stats", d)
        Scratch.dropTable(s, postT)
        Scratch.clear(s, dfPath, statPath)
        def tokenized(docs: DataFrame) = docs
          .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
          .transform(graft.Part.pin(col("doc_id")))
          .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
            col("tk"))
          .localCheckpoint()
        def postings(docs: DataFrame) = docs
          .select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
          .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
        def sidecars(post: DataFrame, docs: DataFrame,
            mode: String): Unit = {
          post.groupBy("term").agg(count(lit(1)).as("df"))
            .write.mode(mode).parquet(dfPath)
          docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
            .write.mode(mode).parquet(statPath)
        }
        // epoch 0: base index. The postings aggregate feeds BOTH the
        // bucketed-table write and the df sidecar — localCheckpoint it
        // so the explode+groupBy over the full corpus runs once per
        // epoch, not once per consumer (r10; same move as tokenized())
        val base = tokenized(Tables(s, d, "documents")
          .select("doc_id", "text"))
        val basePost = postings(base).localCheckpoint()
        basePost.write.mode("overwrite").bucketBy(16, "term")
          .sortBy("term").format("parquet").saveAsTable(postT)
        sidecars(basePost, base, "overwrite")
        // epoch 1: the increment appends postings + partial sidecars
        val t = TextOps.tokens(col("text"))
        val batch = tokenized(Tables(s, d, "documents")
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat_ws(" ", slice(t, lit(1), greatest(size(t) - 3, lit(1))))
              .as("text")))
        val bPost = postings(batch).localCheckpoint()
        bPost.write.mode("append").bucketBy(16, "term").sortBy("term")
          .format("parquet").saveAsTable(postT)
        sidecars(bPost, batch, "append")
        // probe: folded sidecars + base+batch postings
        val qterms = Seq((1, "spark"), (1, "join"), (2, "hash"),
          (2, "table"), (2, "scan"), (3, "window"), (3, "agg"), (3, "data"))
          .toDF("q_id", "term")
        val terms = qterms.select("term").distinct()
          .as[String].collect().sorted.toSeq
        val post = s.table(postT).where(col("term").isin(terms: _*))
        val dfreq = s.read.parquet(dfPath)
          .where(col("term").isin(terms: _*))
          .groupBy("term").agg(sum("df").as("df"))
        val st = s.read.parquet(statPath)
          .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
        val avgdl = col("sum_dl").cast("double") / col("n_docs")
        val idf = log(lit(1.0) +
          (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
        val tfn = col("tf") * 2.2 / (col("tf") +
          lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
        post.join(broadcast(qterms), "term")
          .join(broadcast(dfreq), "term")
          .crossJoin(broadcast(st))
          .withColumn("u", floor(idf * tfn * 10000 + 0.5).cast("long"))
          .groupBy("q_id", "doc_id").agg(sum(col("u")).as("score_u"))
          .withColumn("rank", row_number().over(Window.partitionBy("q_id")
            .orderBy(col("score_u").desc, col("doc_id"))))
          .where(col("rank") <= 10)
          .select("q_id", "rank", "doc_id", "score_u")
          .orderBy("q_id", "rank")
      },
      Some(twinsCte +
        """, dd AS (SELECT doc_id,
          |    CAST(len(string_split(text,' ')) AS BIGINT) AS dl,
          |    string_split(text,' ') AS t FROM alldocs),
          |post AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
          |  FROM (SELECT doc_id, dl, unnest(t) AS term FROM dd)
          |  GROUP BY doc_id, dl, term),
          |q(q_id, term) AS (VALUES (1,'spark'),(1,'join'),(2,'hash'),
          |  (2,'table'),(2,'scan'),(3,'window'),(3,'agg'),(3,'data')),
          |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post
          |  WHERE term IN (SELECT term FROM q) GROUP BY term),
          |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(dl) AS BIGINT) AS sum_dl FROM dd),
          |sc AS (SELECT q.q_id, p.doc_id,
          |  CAST(floor(ln(1.0 + (st.n_docs - f.df + 0.5)/(f.df + 0.5))
          |    * (p.tf*2.2/(p.tf + 1.2*(0.25 + 0.75*p.dl
          |        /(CAST(st.sum_dl AS DOUBLE)/st.n_docs))))
          |    * 10000 + 0.5) AS BIGINT) AS u
          |  FROM post p JOIN q ON p.term = q.term
          |  JOIN dfreq f ON p.term = f.term CROSS JOIN st),
          |a AS (SELECT q_id, doc_id, CAST(sum(u) AS BIGINT) AS score_u
          |  FROM sc GROUP BY q_id, doc_id),
          |r AS (SELECT q_id, doc_id, score_u, ROW_NUMBER() OVER
          |  (PARTITION BY q_id ORDER BY score_u DESC, doc_id) AS rn FROM a)
          |SELECT CAST(q_id AS INTEGER) AS q_id, CAST(rn AS INTEGER) AS rank,
          |  doc_id, score_u
          |FROM r WHERE rn <= 10 ORDER BY q_id, rank""".stripMargin)),

    // ---- p80: int8 scalar quantization + retrieval-loss audit -----------
    // The 4× vector-storage move at 100 TB: per-dimension max-abs is
    // the SQ8 codebook (one tiny broadcast row), the corpus quantizes
    // to q = floor(x/m*127 + 0.5) and serves search DEQUANTIZED
    // (asymmetric: float query against int8-reconstructed corpus —
    // the FAISS SQ8 deployment shape). The audit every quantization
    // rollout needs: recall@5 of the quantized arm against the exact
    // arm (p09's determinization on both), plus the global
    // reconstruction error in micro units. All arithmetic is the same
    // closed-form double math in both engines, so the whole audit —
    // codebook, quantized ranks, overlap counts, error — is
    // hash-checked.
    RegQuery("p80_sq8_quantize_audit",
      (s, d) => {
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
          .localCheckpoint() // feeds codebook, quantize, and exact arm
        val mx = e.select(posexplode(col("v")).as(Seq("i", "x")))
          .groupBy("i").agg(max(abs(col("x"))).as("m"))
          .agg(sort_array(collect_list(struct(col("i"), col("m"))))
            .as("im"))
          .select(transform(col("im"), t => t.getField("m")).as("mx"))
        val dq = e.crossJoin(broadcast(mx))
          .select(col("vec_id"), col("v"),
            zip_with(col("v"), col("mx"), (x, m) =>
              when(m > 0, floor(x / m * 127 + 0.5) * m / 127)
                .otherwise(lit(0.0))).as("dv"))
          .localCheckpoint() // feeds error agg AND the quantized arm
        // per-element NANO-unit flooring BEFORE the aggregate: the sum
        // is then exact integer math, immune to float-sum order (the
        // micro-unit discipline applied to the error metric)
        val err = dq
          .select(explode(zip_with(col("dv"), col("v"), (a, b) =>
            floor(abs(a - b) * 1000000000L + 0.5).cast("long"))).as("ae"))
          .agg(expr("sum(ae) div count(1)").as("recon_err_u"))
        val q = e.where(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        def top5(corpus: DataFrame, vcol: String) = corpus
          .select(col("vec_id").as("n_id"), col(vcol).as("nv"))
          .crossJoin(broadcast(q))
          .where(col("q_id") =!= col("n_id"))
          .withColumn("c", floor(VectorOps.cosineFast(col("qv"), col("nv"))
            * 1000000 + 0.5) / 1000000)
          .withColumn("rank", row_number().over(Window.partitionBy("q_id")
            .orderBy(col("c").desc, col("n_id"))))
          .where(col("rank") <= 5)
          .select("q_id", "n_id")
        top5(dq, "dv").join(top5(e, "v"), Seq("q_id", "n_id"))
          .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
          .crossJoin(err)
          .orderBy("q_id")
      },
      Some("""WITH e AS (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |mx0 AS (SELECT u.i AS i, max(abs(e.v[CAST(u.i AS INTEGER)]))
             |    AS m FROM e, unnest(range(1, 65)) AS u(i) GROUP BY u.i),
             |mx AS (SELECT list(m ORDER BY i) AS m FROM mx0),
             |dq AS (SELECT vec_id, v, list_transform(range(1, 65), i ->
             |    CASE WHEN mx.m[i] > 0
             |      THEN floor(v[i]/mx.m[i]*127 + 0.5)*mx.m[i]/127
             |      ELSE 0.0 END) AS dv FROM e, mx),
             |err AS (SELECT CAST(sum(ae) // count(*) AS BIGINT)
             |    AS recon_err_u
             |  FROM (SELECT unnest(list_transform(range(1, 65),
             |      i -> CAST(floor(abs(dv[i] - v[i])*1000000000 + 0.5)
             |        AS BIGINT))) AS ae FROM dq)),
             |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 3),
             |pa AS (SELECT q_id, d.vec_id AS n_id,
             |  floor(list_sum(list_transform(range(1, len(qv)+1),
             |      i -> qv[i]*d.dv[i]))
             |    / (sqrt(list_sum(list_transform(qv, x -> x*x)))
             |       * sqrt(list_sum(list_transform(d.dv, x -> x*x))))
             |    * 1000000 + 0.5)/1000000 AS c
             |  FROM q, dq d WHERE d.vec_id != q_id),
             |ra AS (SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
             |    ORDER BY c DESC, n_id) AS rn FROM pa),
             |pe AS (SELECT q_id, e.vec_id AS n_id,
             |  floor(list_sum(list_transform(range(1, len(qv)+1),
             |      i -> qv[i]*e.v[i]))
             |    / (sqrt(list_sum(list_transform(qv, x -> x*x)))
             |       * sqrt(list_sum(list_transform(e.v, x -> x*x))))
             |    * 1000000 + 0.5)/1000000 AS c
             |  FROM q, e WHERE e.vec_id != q_id),
             |re AS (SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
             |    ORDER BY c DESC, n_id) AS rn FROM pe)
             |SELECT ra.q_id, CAST(count(*) AS BIGINT) AS n_hit, err.recon_err_u
             |FROM ra JOIN re ON ra.q_id = re.q_id AND ra.n_id = re.n_id
             |  AND ra.rn <= 5 AND re.rn <= 5
             |CROSS JOIN err
             |GROUP BY ra.q_id, err.recon_err_u ORDER BY ra.q_id""".stripMargin)),

    // ---- p81: quality-weighted canonical selection ----------------------
    // Production dedup keeps the BEST member of each near-dup cluster,
    // not the smallest id (a twin with its tail cut is strictly worse
    // training data than its source). Pairs come from the mirrored LSH
    // family (banding equi-join, never all-pairs), clusters from
    // connected components, and the keeper is the (quality desc,
    // doc_id) argmax per cluster — quality is a deterministic integer
    // (length-dominant: tokens * 10000 + type-token ratio in basis
    // points, so a truncated twin can never outrank its source but
    // equal-length members split on lexical diversity), so selection,
    // including every tie-break, is DuckDB-hash-checked; the oracle
    // replays the closure + the same window. One window over cluster
    // members only (dup mass, not corpus mass) at any scale.
    RegQuery("p81_quality_canonical",
      (s, d) => {
        val pairs = mirrorVerifiedPairs(s, d)
          .select(lpad(col("a_id").cast("string"), 9, "0").as("src_id"),
            lpad(col("b_id").cast("string"), 9, "0").as("dst_id"))
        val cc = graft.graphx.GraphAnalytics.connectedComponents(pairs)
          .select(col("id").cast("long").as("doc_id"),
            col("component").cast("long").as("cluster_id"))
        val qual = docsWithTwins(s, d)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
          .select(col("doc_id"), expr(
            "cast(size(tk) as bigint) * 10000" +
              " + cast(size(array_distinct(tk)) as bigint) * 10000" +
              " div cast(size(tk) as bigint)").as("q_u"))
        val w = Window.partitionBy("cluster_id")
          .orderBy(col("q_u").desc, col("doc_id"))
        cc.join(qual, "doc_id")
          .withColumn("canonical_id", first("doc_id").over(
            w.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
          .select(col("doc_id"), col("cluster_id"), col("q_u"),
            col("canonical_id"),
            (col("doc_id") === col("canonical_id")).as("kept"))
          .orderBy("doc_id")
      },
      Some((twinsCte + mirrorPairsCte +
        """, und AS (SELECT a_id AS u, b_id AS v FROM pr
          |  UNION SELECT b_id, a_id FROM pr),
          |reach AS (
          |  SELECT u, u AS v FROM (SELECT DISTINCT u FROM und)
          |  UNION
          |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
          |comp AS (SELECT u AS doc_id, min(v) AS cluster_id
          |  FROM reach GROUP BY u),
          |qual AS (SELECT doc_id,
          |    CAST(len(string_split(text, ' ')) * 10000
          |      + len(list_distinct(string_split(text, ' '))) * 10000
          |        // len(string_split(text, ' ')) AS BIGINT) AS q_u
          |  FROM alldocs),
          |m AS (SELECT c.doc_id, c.cluster_id, q.q_u FROM comp c
          |  JOIN qual q ON c.doc_id = q.doc_id),
          |canon AS (SELECT cluster_id, doc_id AS canonical_id FROM (
          |  SELECT cluster_id, doc_id, ROW_NUMBER() OVER (
          |    PARTITION BY cluster_id ORDER BY q_u DESC, doc_id) AS rn
          |  FROM m) WHERE rn = 1)
          |SELECT m.doc_id, m.cluster_id, CAST(m.q_u AS BIGINT) AS q_u,
          |  canon.canonical_id, m.doc_id = canon.canonical_id AS kept
          |FROM m JOIN canon ON m.cluster_id = canon.cluster_id
          |ORDER BY m.doc_id""".stripMargin)
        .replaceFirst("WITH ", "WITH RECURSIVE "))),

    // ---- p82: dedup index RETRACTION (takedown + re-resolution) ---------
    // The third arm of the dedup-index lifecycle (p72 create, p77
    // fold, p82 retract — mirroring the q62/q64/s21 materialized-view
    // trio): a takedown batch (every 50th corpus doc — the GDPR/DMCA
    // shape) removes its band rows from the index by one anti-join,
    // and the incoming batch is resolved against BOTH generations so
    // each doc's transition is visible: a dup whose only corpus match
    // was purged downgrades to batch_dup or novel, everything else is
    // pinned unchanged. Cost: the retraction is ~|takedown| (anti-join
    // on the index), re-resolution is the ordinary ~|batch| probe —
    // the corpus is never re-signed. The oracle derives both
    // generations' dispositions from the mirrored pair set with the
    // takedown as a filter, so every transition is hash-checked.
    RegQuery("p82_dedup_index_retract",
      (s, d) => {
        val (hs, bands) = mirrorHsBands(s, d)
        val idx0 = bands.where(col("doc_id") < 1000000L)
          .select(col("bi"), col("bv"), col("doc_id").as("a_id"))
          .localCheckpoint() // generation 0, feeds both resolutions
        // the takedown batch arrives as a FRAME; retraction is one
        // anti-join on the index — ~|takedown| work
        val takedown = Tables(s, d, "documents")
          .select(col("doc_id").as("a_id"))
          .where(col("a_id") % 50 === 0)
        val idx1 = idx0.join(takedown, Seq("a_id"), "anti")
        val nb = bands.where(col("doc_id") >= 1000000L)
        def resolve(idx: DataFrame): DataFrame = {
          val cand = nb.select(col("bi"), col("bv"),
              col("doc_id").as("b_id"))
            .join(idx, Seq("bi", "bv"))
            .unionAll(nb.select(col("bi"), col("bv"),
                col("doc_id").as("b_id"))
              .join(nb.select(col("bi"), col("bv"),
                col("doc_id").as("a_id")), Seq("bi", "bv"))
              .where(col("a_id") < col("b_id")))
            .select("a_id", "b_id").distinct()
          cand
            .join(hs.select(col("doc_id").as("a_id"), col("hs").as("a_hs")),
              "a_id")
            .join(hs.select(col("doc_id").as("b_id"), col("hs").as("b_hs")),
              "b_id")
            .where(TextOps.jaccardSorted(col("a_hs"), col("b_hs")) >= 0.5)
            .groupBy("b_id")
            .agg(min(when(col("a_id") < 1000000L, col("a_id")))
                .as("c_hit"),
              min(when(col("a_id") >= 1000000L, col("a_id")))
                .as("b_hit"))
        }
        def status(c: String, b: String) =
          when(col(c).isNotNull, lit("corpus_dup"))
            .when(col(b).isNotNull, lit("batch_dup"))
            .otherwise(lit("novel"))
        def canon(c: String, b: String) =
          coalesce(col(c), col(b), col("doc_id"))
        docsWithTwins(s, d).where(col("doc_id") >= 1000000L)
          .select("doc_id")
          .join(resolve(idx0).select(col("b_id").as("doc_id"),
            col("c_hit").as("c_hit0"), col("b_hit").as("b_hit0")),
            Seq("doc_id"), "left")
          .join(resolve(idx1).select(col("b_id").as("doc_id"),
            col("c_hit").as("c_hit1"), col("b_hit").as("b_hit1")),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            status("c_hit0", "b_hit0").as("status_before"),
            canon("c_hit0", "b_hit0").as("canonical_before"),
            status("c_hit1", "b_hit1").as("status_after"),
            canon("c_hit1", "b_hit1").as("canonical_after"))
          .withColumn("changed",
            col("status_before") =!= col("status_after") ||
              col("canonical_before") =!= col("canonical_after"))
          .orderBy("doc_id")
      },
      Some(twinsCte + mirrorPairsCte +
        """, nd AS (SELECT doc_id FROM alldocs WHERE doc_id >= 1000000),
          |h0 AS (SELECT b_id AS doc_id,
          |    min(CASE WHEN a_id < 1000000 THEN a_id END) AS c_hit0,
          |    min(CASE WHEN a_id >= 1000000 THEN a_id END) AS b_hit0
          |  FROM pr WHERE b_id >= 1000000 GROUP BY b_id),
          |h1 AS (SELECT b_id AS doc_id,
          |    min(CASE WHEN a_id < 1000000 AND a_id % 50 <> 0
          |      THEN a_id END) AS c_hit1,
          |    min(CASE WHEN a_id >= 1000000 THEN a_id END) AS b_hit1
          |  FROM pr WHERE b_id >= 1000000 GROUP BY b_id)
          |SELECT nd.doc_id,
          |  CASE WHEN c_hit0 IS NOT NULL THEN 'corpus_dup'
          |       WHEN b_hit0 IS NOT NULL THEN 'batch_dup'
          |       ELSE 'novel' END AS status_before,
          |  COALESCE(c_hit0, b_hit0, nd.doc_id) AS canonical_before,
          |  CASE WHEN c_hit1 IS NOT NULL THEN 'corpus_dup'
          |       WHEN b_hit1 IS NOT NULL THEN 'batch_dup'
          |       ELSE 'novel' END AS status_after,
          |  COALESCE(c_hit1, b_hit1, nd.doc_id) AS canonical_after,
          |  (CASE WHEN c_hit0 IS NOT NULL THEN 'corpus_dup'
          |        WHEN b_hit0 IS NOT NULL THEN 'batch_dup'
          |        ELSE 'novel' END)
          |    <> (CASE WHEN c_hit1 IS NOT NULL THEN 'corpus_dup'
          |        WHEN b_hit1 IS NOT NULL THEN 'batch_dup'
          |        ELSE 'novel' END)
          |  OR COALESCE(c_hit0, b_hit0, nd.doc_id)
          |    <> COALESCE(c_hit1, b_hit1, nd.doc_id) AS changed
          |FROM nd LEFT JOIN h0 USING (doc_id) LEFT JOIN h1 USING (doc_id)
          |ORDER BY nd.doc_id""".stripMargin)),

    // ---- p83: kNN GRAPH build at corpus scale ---------------------------
    // The missing LLM-pipeline shape (round-6 verdict #5): every doc's
    // top-k neighbors — the SemDeDup / embedding-cluster input — not a
    // small probe set served by an index. Same trained IVF as p14
    // (8 seeds, 2 Lloyd rounds, 1e-6 rounding — the oracle prelude is
    // literally shared via ivfOracleFor), but the probe side is the
    // WHOLE corpus: each vector probes its nprobe=2 nearest cells and
    // meets candidates through an EQUI-JOIN on cell — the corpus is
    // never broadcast, never crossed with itself (the only cross join
    // is each scan × the broadcast 8-row centroid table, the trained-
    // quantizer assignment pass). At 100 TB: K grows ∝ N/targetCellSize
    // so per-probe candidates stay bounded and total candidate rows
    // grow LINEARLY with the corpus (ScaleRehearsalSpec pins the 10×
    // growth and no-cartesian plan shape via knnCandidatesIvf);
    // assignment is written bucketed by cell, so each probe's scan is
    // bucket-pruned (the ScaleSpec IVF pin).
    RegQuery("p83_knn_graph",
      (s, d) => knnGraphIvf(
          Tables(s, d, "embeddings").select(col("vec_id"),
            VectorOps.toDouble(col("embedding")).as("v")),
          kCells = 8, nprobe = 2, topK = 3)
        .orderBy("q_id", "rank"),
      Some(knnGraphOracle)),

    // ---- p84: cosine top-k from PURE SQL TEXT ---------------------------
    // Completes the SQL surface across ALL THREE custom physical
    // operators (q68 sessionize, q69 as-of, this): a COSINE_TOPK hint
    // marks a bare JOIN (corpus ⋈ probes — the spec in the hint IS the
    // join condition) and plans into CosineTopKExec through the same
    // buildPlan as the Scala API, probe side a BroadcastExchange child.
    // p09's UNCHANGED oracle now checks three arms: composed
    // crossJoin×window (p09), custom exec via Scala (p75), SQL text
    // (this).
    RegQuery("p84_cosine_topk_sql",
      (s, d) => {
        Tables(s, d, "embeddings").createOrReplaceTempView("p84_emb")
        s.sql("""
          SELECT q_id, rank, n_id, cos_r FROM (
            SELECT /*+ COSINE_TOPK('vec_id', 'embedding', 'vec_id', 'embedding', 5, true) */ *
            FROM p84_emb
            JOIN (SELECT vec_id, embedding FROM p84_emb WHERE vec_id < 3))
          ORDER BY q_id, rank""")
      },
      Some(p09Oracle)),

    // ---- p85: SemDeDup — cluster-local semantic dedup -------------------
    // The published SemDeDup shape (Abbas et al. 2023): cluster the
    // corpus with the trained coarse quantizer, then dedup PAIRWISE
    // ONLY WITHIN A CLUSTER — the design point that makes semantic
    // dedup linear (cluster count scales with the corpus, so the
    // within-cell self-join is bounded by cell size, never all-pairs).
    // Deterministic keep rule: drop b iff some same-cell a < b has
    // cos6(a,b) ≥ 0.99; canonical = the smallest such a. Scaled twins
    // (×1.5, cosine-invariant → cos exactly 1 after rounding) are
    // planted for vec_id % 10 == 0 so the rule provably fires; organic
    // sf pairs top out ~0.51 and survive. DuckDB mirrors the identical
    // trained assignment (shared ivfAsgPrelude) + pair rule.
    RegQuery("p85_semdedup",
      (s, d) => {
        val e = semDedupInput(s, d)
        val (assigned, _) = ivfAssign(e, 8)
        // NOT salted (r10): this corpus is small enough that the salted
        // self-join's replication overhead measured slower (A/B warm
        // 1.73 → 1.92 s); see Part.saltedJoin scaladoc for where it wins
        val drops = assigned.select(col("cell"), col("vec_id").as("a_id"),
            col("v").as("av"))
          .join(assigned.select(col("cell"), col("vec_id").as("b_id"),
            col("v").as("bv")), "cell")
          .where(col("a_id") < col("b_id") &&
            ivfSim6(col("av"), col("bv")) >= 0.99)
          .groupBy("b_id").agg(min("a_id").as("canon"))
        e.select("vec_id")
          .join(drops.withColumnRenamed("b_id", "vec_id"),
            Seq("vec_id"), "left")
          .select(col("vec_id"), col("canon").isNull.as("kept"),
            coalesce(col("canon"), col("vec_id")).as("canonical"))
          .orderBy("vec_id")
      },
      Some(semDedupOracle)),

    // ---- p86: content-defined chunking (CDC) ----------------------------
    // The dedup-grade chunker fixed-size p46 cannot be: boundaries cut
    // where a rolling CONTENT hash (the mirrorable poly_hash over the
    // trailing 3-token gram) hits a residue class (h % 16 == 0,
    // expected chunk ≈ 16 tokens) — so an edit near the start of a doc
    // re-aligns within a few grams and every downstream chunk hash
    // SURVIVES, where fixed-size windows shift and invalidate the
    // whole tail (the rsync/LBFS/FastCDC property; CdcSpec pins the
    // shift-invariance). Map-only in-row array work after the token
    // barrier — chunking 100 TB is one codegen pass, no shuffle until
    // chunks aggregate. Chunk hashes reuse p46's polynomial fold, so
    // the chunks drop straight into the p25/p77 dedup machinery.
    RegQuery("p86_cdc_chunks",
      (s, d) => cdcChunks(Tables(s, d, "documents"))
        .orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH $cdcChunksCte
             |SELECT doc_id, chunk_idx, start_tok, n_tok, chunk_hash
             |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ---- p87: CDC-chunk INCREMENTAL dedup through the index policy -----
    // The round-7 pieces composed into the operational loop a
    // dedup-at-ingest platform actually runs: the corpus's CDC chunk
    // hashes live in a persisted DedupIndex (gen=N layout, compaction
    // policy); an arriving batch of EDITED near-copies (one token
    // inserted at position 3 — p86's shift-invariance scenario) chunks
    // itself, probes the index by ONE equi-join (~|batch| work, corpus
    // never re-chunked), and folds only its NOVEL hashes as the next
    // generation. CDC is why this works: the edit perturbs only the
    // chunks around position 3, so n_matched_before/n_chunks stays
    // high (fixed-size chunking would match ~nothing past the edit) —
    // and the post-fold re-probe matching EVERYTHING pins the fold.
    RegQuery("p87_cdc_incremental_dedup",
      (s, d) => {
        import graft.llm.DedupIndex
        val idxPath = Scratch.path(s, "p87_chunkidx", d)
        Scratch.clear(s, idxPath)
        val docs = Tables(s, d, "documents").select("doc_id", "text")
        val tk = TextOps.tokens(col("text"))
        val twins = docs.where(col("doc_id") % 10 === 0 && size(tk) >= 4)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat_ws(" ", concat(slice(tk, 1, 3),
              array(lit("INSERTED")), slice(tk, lit(4), size(tk) - 3)))
              .as("text"))
        // one chunk pass over corpus ∪ batch (the oracle mirrors the
        // same union), split by id range afterwards
        val allChunks = cdcChunks(docs.unionAll(twins)).localCheckpoint()
        DedupIndex.create(s, idxPath,
          allChunks.where(col("doc_id") < 1000000L)
            .select("doc_id", "chunk_hash"))
        val probe = allChunks.where(col("doc_id") >= 1000000L)
          .select("doc_id", "chunk_idx", "chunk_hash")
        val idx0 = DedupIndex.read(s, idxPath)
          .select("chunk_hash").distinct().localCheckpoint()
        val before = probe.join(idx0, Seq("chunk_hash"), "semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_matched_before"))
        // fold: ONLY the batch's novel hashes append (one generation;
        // the chunk ledger clusters on chunk_hash)
        DedupIndex.append(s, idxPath,
          probe.join(idx0, Seq("chunk_hash"), "anti")
            .select("doc_id", "chunk_hash"),
          clusterCols = Seq("chunk_hash"))
        val idx1 = DedupIndex.read(s, idxPath)
          .select("chunk_hash").distinct()
        val after = probe.join(idx1, Seq("chunk_hash"), "semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_matched_after"))
        probe.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
          .join(before, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_matched_before"))
          .join(after, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_matched_after"))
          .select(col("doc_id"), col("n_chunks"),
            col("n_matched_before"),
            expr("n_matched_before * 1000 div n_chunks").as("dup_milli"),
            col("n_matched_after"))
          .orderBy("doc_id")
      },
      Some(s"""WITH alldocs AS (SELECT doc_id, text FROM documents
             |  UNION ALL SELECT doc_id + 1000000,
             |    array_to_string(list_concat(list_concat(
             |      string_split(text,' ')[1:3], ['INSERTED']),
             |      string_split(text,' ')[4:len(string_split(text,' '))]),
             |      ' ')
             |  FROM documents WHERE doc_id % 10 = 0
             |    AND len(string_split(text,' ')) >= 4),
             |${cdcChunksCteFrom("alldocs")},
             |cor AS (SELECT DISTINCT chunk_hash FROM ch
             |  WHERE doc_id < 1000000),
             |tw AS (SELECT doc_id, chunk_idx, chunk_hash FROM ch
             |  WHERE doc_id >= 1000000),
             |m AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             |  CAST(sum(CASE WHEN c.chunk_hash IS NOT NULL
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_matched_before
             |  FROM tw t LEFT JOIN cor c USING (chunk_hash)
             |  GROUP BY t.doc_id)
             |SELECT doc_id, n_chunks, n_matched_before,
             |  CAST(n_matched_before * 1000 // n_chunks AS BIGINT)
             |    AS dup_milli,
             |  n_chunks AS n_matched_after
             |FROM m ORDER BY doc_id""".stripMargin)),

    // ---- p88: temperature-scaled mixture sampling -----------------------
    // The data-mixing move every multi-source training corpus runs
    // (sample source i ∝ n_i^α, α < 1, so small sources are UP-weighted
    // relative to their share): per-source targets floor(√n · 8) —
    // α = 1/2 exactly, because IEEE-754 sqrt is CORRECTLY ROUNDED and
    // therefore bit-identical across engines where exp/ln powers would
    // not be — then the p45 deterministic hash-priority picks each
    // source's docs. One aggregate + one per-source top-k window (the
    // WindowGroupLimit partial top-k, so the shuffle moves O(k), not
    // the corpus); selection checksums make the exact pick set
    // hash-checkable, not just the counts.
    RegQuery("p88_sqrt_mix",
      (s, d) => {
        val prio = expr("(doc_id * 2654435761 + 104729) % 1000000007")
        val ranked = Tables(s, d, "documents")
          .select(col("source"), col("doc_id"), prio.as("prio"))
          .withColumn("rk", row_number().over(Window.partitionBy("source")
            .orderBy(col("prio"), col("doc_id"))))
        val targets = Tables(s, d, "documents")
          .groupBy("source").agg(count(lit(1)).as("n_docs"))
          .withColumn("target_n",
            floor(sqrt(col("n_docs").cast("double")) * 8).cast("long"))
        ranked.join(broadcast(targets), "source")
          .where(col("rk") <= col("target_n"))
          .groupBy("source")
          .agg(first("n_docs").as("n_docs"),
            first("target_n").as("target_n"),
            count(lit(1)).as("n_sel"),
            sum("doc_id").as("sel_sum"))
          .orderBy("source")
      },
      Some("""WITH n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 8) AS BIGINT)
             |    AS target_n
             |  FROM documents GROUP BY source),
             |r AS (SELECT source, doc_id, ROW_NUMBER() OVER (
             |    PARTITION BY source ORDER BY
             |      (doc_id * 2654435761 + 104729) % 1000000007, doc_id)
             |    AS rk FROM documents)
             |SELECT n.source AS source, n.n_docs, n.target_n,
             |  CAST(count(*) AS BIGINT) AS n_sel,
             |  CAST(sum(r.doc_id) AS BIGINT) AS sel_sum
             |FROM r JOIN n ON r.source = n.source AND r.rk <= n.target_n
             |GROUP BY n.source, n.n_docs, n.target_n
             |ORDER BY n.source""".stripMargin)),

    // ---- p89: WordPiece-style tokenizer (train + greedy MaxMatch) -------
    // The second tokenizer family beside BPE (p70/p71/p76): WordPiece /
    // SentencePiece-style GREEDY LONGEST-MATCH inference (Wu et al.
    // 2016 §4.1) over a frequency-trained subword vocabulary. Train:
    // candidate pieces = all substrings of length 2-6 (distinct per
    // word), scored by corpus-weighted frequency; vocab = top-512
    // pieces + every single character (totality). Apply: greedy
    // MaxMatch IS one regex pass — an alternation ordered longest-
    // first under leftmost-FIRST semantics picks the longest vocab
    // piece at each position and resumes after it, and both Java
    // regex (engine) and RE2 (oracle) implement leftmost-first (the
    // p13 BpePattern precedent) — so apply is a single codegen'd
    // regexp_extract_all over the DISTINCT-WORD frame (the
    // SentencePiece trick: tokenize each distinct word once, weight
    // by corpus count), no joins, no per-round loops. At 100 TB:
    // train is one explode + hash-agg + a bounded (512-row) collect,
    // apply is embarrassingly parallel over words.
    RegQuery("p89_wordpiece",
      (s, d) => {
        val pat = wordpiecePattern(s, d)
        Tables(s, d, "documents")
          .select(explode(graft.llm.TextOps.tokens(col("text"))).as("w"))
          .where(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("cnt")) // SentencePiece
          .select(explode(regexp_extract_all(col("w"), lit(pat), lit(0)))
            .as("token"), col("cnt")) // tokenize each DISTINCT word once
          .groupBy("token").agg(sum("cnt").as("n"))
          .orderBy(col("n").desc, col("token").asc).limit(100)
      },
      Some(wordpieceOracle)),

    // ---- p90: margin-based bitext mining --------------------------------
    // Parallel-corpus mining (Artetxe & Schwenk 2019, the
    // LASER/CCMatrix shape): every high-resource-side document is
    // paired with its best low-resource candidate by embedding cosine,
    // ACCEPTED only when the top-1/top-2 MARGIN clears a threshold —
    // the margin criterion is what separates true translations from
    // generically-near neighbours. Scores are 1e-6 micro-unit BIGINTs
    // (the p09 discipline), so the margin is an exact integer
    // difference. Plan shape: the LOW-RESOURCE side broadcasts (it is
    // the small side by definition — that asymmetry is the production
    // layout; at equal sizes the p83 IVF-cell equi-join is the scale
    // path), one window top-2 per source doc, no driver loops.
    RegQuery("p90_bitext_mine",
      (s, d) => {
        val langs = Tables(s, d, "documents").select("doc_id", "lang")
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"),
            graft.llm.VectorOps.toDouble(col("embedding")).as("v"))
          .join(langs, col("vec_id") === col("doc_id"))
        val src = e.where(col("lang") === "en")
          .select(col("vec_id").as("s_id"), col("v").as("sv"))
        val tgt = e.where(col("lang") === "zh")
          .select(col("vec_id").as("t_id"), col("v").as("tv"))
        val scored = src.crossJoin(broadcast(tgt))
          .withColumn("cu", floor(graft.llm.VectorOps
            .cosineFast(col("sv"), col("tv")) * 1000000 + 0.5)
            .cast("long"))
        val w = Window.partitionBy("s_id")
          .orderBy(col("cu").desc, col("t_id"))
        scored.withColumn("rn", row_number().over(w))
          .where(col("rn") <= 2)
          .groupBy("s_id")
          .agg(max(when(col("rn") === 1, col("t_id"))).as("t_id"),
            max(when(col("rn") === 1, col("cu"))).as("top1_u"),
            max(when(col("rn") === 2, col("cu"))).as("top2_u"))
          .where(col("top2_u").isNotNull &&
            col("top1_u") - col("top2_u") >= 50000)
          .select(col("s_id"), col("t_id"), col("top1_u"),
            (col("top1_u") - col("top2_u")).as("margin_u"))
          .orderBy("s_id")
      },
      Some("""WITH docs AS (SELECT doc_id, lang FROM documents),
             |e AS (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             |    lang
             |  FROM embeddings JOIN docs ON vec_id = doc_id),
             |s AS (SELECT vec_id AS s_id, v AS sv FROM e WHERE lang = 'en'),
             |t AS (SELECT vec_id AS t_id, v AS tv FROM e WHERE lang = 'zh'),
             |p AS (SELECT s_id, t_id, CAST(floor(
             |    list_sum(list_transform(range(1, len(sv)+1),
             |      i -> sv[i]*tv[i]))
             |    / (sqrt(list_sum(list_transform(sv, x -> x*x)))
             |       * sqrt(list_sum(list_transform(tv, x -> x*x))))
             |    * 1000000 + 0.5) AS BIGINT) AS cu
             |  FROM s, t),
             |r AS (SELECT s_id, t_id, cu, ROW_NUMBER() OVER (
             |    PARTITION BY s_id ORDER BY cu DESC, t_id) AS rn FROM p),
             |a AS (SELECT s_id,
             |    max(CASE WHEN rn = 1 THEN t_id END) AS t_id,
             |    max(CASE WHEN rn = 1 THEN cu END) AS top1_u,
             |    max(CASE WHEN rn = 2 THEN cu END) AS top2_u
             |  FROM r WHERE rn <= 2 GROUP BY s_id)
             |SELECT s_id, t_id, top1_u, top1_u - top2_u AS margin_u
             |FROM a WHERE top2_u IS NOT NULL AND top1_u - top2_u >= 50000
             |ORDER BY s_id""".stripMargin))
  )

  /** DuckDB mirror of [[cdcChunks]] as a CTE-list fragment ending in
    * `ch(doc_id, chunk_idx, start_tok, n_tok, chunk_hash)` — shared by
    * p86 and s28 (the streamed first-seen dedup over the chunks) and,
    * via [[cdcChunksCteFrom]], p87 (corpus ∪ edited twins). */
  private[queries] def cdcChunksCte: String = cdcChunksCteFrom("documents")

  private[queries] def cdcChunksCteFrom(src: String): String =
    s"""t AS (SELECT doc_id, string_split(text,' ') AS tk
      |  FROM $src WHERE len(string_split(text,' ')) >= 1),
      |g AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n,
      |  CASE WHEN len(tk) >= 4 THEN
      |    list_filter(list_transform(range(3, CAST(len(tk) AS BIGINT)),
      |      i -> CASE WHEN list_reduce(list_prepend(CAST(7 AS BIGINT),
      |          list_transform(string_split(
      |            tk[i-2] || ' ' || tk[i-1] || ' ' || tk[i], ''),
      |            x -> CAST(ord(x) AS BIGINT))),
      |          (acc, x) -> (acc*131 + x) % 1000000007) % 16 = 0
      |        THEN i ELSE -1 END),
      |      x -> x > 0)
      |  ELSE CAST([] AS BIGINT[]) END AS cuts FROM t),
      |b AS (SELECT doc_id, tk,
      |  list_concat(list_concat(CAST([0] AS BIGINT[]), cuts),
      |    [n]) AS b FROM g),
      |c AS (SELECT doc_id, tk, b, unnest(range(1,
      |  CAST(len(b) AS BIGINT))) AS k FROM b),
      |ch AS (SELECT doc_id, CAST(k AS INTEGER) AS chunk_idx,
      |  CAST(b[k] + 1 AS INTEGER) AS start_tok,
      |  CAST(b[k+1] - b[k] AS INTEGER) AS n_tok,
      |  list_reduce(list_prepend(CAST(7 AS BIGINT),
      |    list_transform(string_split(
      |      array_to_string(tk[b[k]+1 : b[k+1]], ' '), ''),
      |      x -> CAST(ord(x) AS BIGINT))),
      |    (acc, x) -> (acc*131 + x) % 1000000007) AS chunk_hash
      |FROM c)""".stripMargin

  /** p86 core over any [doc_id, text] frame (factored so CdcSpec can
    * pin shift-invariance on planted edits): content-defined chunk
    * boundaries cut after token i (3 ≤ i ≤ n−1) when the trailing
    * 3-token gram's poly_hash lands in the h % 16 == 0 residue class;
    * each chunk carries provenance (1-based start token, length) and
    * p46's polynomial content hash. Map-only in-row array work. */
  def cdcChunks(docs: DataFrame): DataFrame = {
    val tk = TextOps.tokens(col("text"))
    def gram(i: Column) = concat_ws(" ",
      element_at(col("tk"), i - 2), element_at(col("tk"), i - 1),
      element_at(col("tk"), i))
    docs
      .where(size(tk) >= 1)
      .select(col("doc_id"), tk.as("tk"))
      .transform(graft.Part.pin(col("doc_id"))) // token barrier (p16 rule)
      .select(col("doc_id"), col("tk"),
        // docs under 4 tokens have no interior gram positions
        // (sequence(3, 2) would DESCEND — guard, don't clamp)
        when(size(col("tk")) >= 4,
          filter(transform(sequence(lit(3), size(col("tk")) - 1),
            i => when(TextOps.polyHash(gram(i)) % 16 === 0, i)
              .otherwise(lit(-1))), x => x > 0))
          .otherwise(array().cast("array<int>")).as("cuts"))
      .select(col("doc_id"), col("tk"),
        concat(array(lit(0)), col("cuts"),
          array(size(col("tk")))).as("b"))
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("b")) - 1), k => struct(
          k.as("chunk_idx"),
          (element_at(col("b"), k) + 1).as("start_tok"),
          (element_at(col("b"), k + 1) - element_at(col("b"), k))
            .as("n_tok"),
          TextOps.polyHash(concat_ws(" ",
            slice(col("tk"), element_at(col("b"), k) + 1,
              element_at(col("b"), k + 1) - element_at(col("b"), k))))
            .as("chunk_hash")))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.start_tok"),
        col("c.n_tok"), col("c.chunk_hash"))
  }

  /** p85/s27 shared input: the corpus plus ×1.5 scaled twins (cosine-
    * invariant → cos6 exactly 1 to the source) for vec_id % 10 == 0,
    * twin ids offset by 1e6. */
  private[queries] def semDedupInput(s: SparkSession,
      d: String): DataFrame = {
    val e0 = Tables(s, d, "embeddings").select(col("vec_id"),
      VectorOps.toDouble(col("embedding")).as("v"))
    e0.unionAll(e0.where(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("v"), x => x * 1.5).as("v")))
  }

  /** p85's oracle — shared VERBATIM by s27, the ingest-time arm (one
    * SQL checks the batch rule and the streamed rule). */
  private[queries] def semDedupOracle: String =
    s"""${ivfAsgPrelude(
        s"""$ivfEmbedCte
           |  UNION ALL
           |  SELECT vec_id + 1000000,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.5)
           |  FROM embeddings WHERE vec_id % 10 = 0""".stripMargin)},
       |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM asg a JOIN asg b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${ivfCosSql("a.v", "b.v")} >= 0.99),
       |dr AS (SELECT b_id AS vec_id, min(a_id) AS canon
       |  FROM p GROUP BY b_id)
       |SELECT e.vec_id, dr.canon IS NULL AS kept,
       |  COALESCE(dr.canon, e.vec_id) AS canonical
       |FROM e LEFT JOIN dr USING (vec_id) ORDER BY vec_id""".stripMargin

  /** p70/p71's shared BPE training loop: word-frequency table →
    * `rounds` (argmax pair, fold-merge) iterations. Returns the merge
    * table rows and the final segmented vocab [w, freq, syms]. Only
    * the per-round winning pair reaches the driver. */
  /** Test seam for the rehearsal pin comparing the two trainers. */
  private[graft] def bpeLearnSeq(s: SparkSession, d: String, rounds: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = bpeLearn(s, d, rounds)

  private def bpeLearn(s: SparkSession, d: String, rounds: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    def applyMerge(syms: Column, a: String, b: String): Column =
      aggregate(syms, array().cast("array<string>"), (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), x))))
          .otherwise(concat(acc, array(x))))
    var cur = Tables(s, d, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("syms"))
      .repartition(col("w"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to rounds) {
      val best = cur.where(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> struct(syms[i-1] AS lhs, syms[i] AS rhs))")).as("p"))
        .groupBy("p.lhs", "p.rhs").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((rank, a, b, c))
        cur = cur.select(col("w"), col("freq"),
            applyMerge(col("syms"), a, b).as("syms"))
          .localCheckpoint()
      }
    }
    (merges.result(), cur)
  }

  /** p76's batched BPE training loop: like [[bpeLearn]], but each
    * round selects up to `batchN` SYMBOL-DISJOINT pairs (greedy down
    * the (cnt DESC, lhs, rhs) ranking, a pair eligible iff neither
    * symbol appeared in ANY higher-ranked pair) and folds them all in
    * ONE pass. Disjointness makes the merges order-independent within
    * the round, so one fold applies them exactly as `batchN`
    * sequential folds would — and a production 32k-merge vocabulary
    * costs ~vocab/batchN sequential Spark jobs instead of vocab (the
    * round-5 verdict's p70 scale caveat, closed). Only the ranked
    * pair prefix reaches the driver (adaptively grown until the
    * selection closes), and the blocking rule scans pairs in rank
    * order so the DuckDB mirror's NOT EXISTS formulation is
    * hash-exact including every tie-break. */
  private[graft] def bpeLearnBatched(s: SparkSession, d: String,
      rounds: Int, batchN: Int)
      : (Seq[(Int, Int, String, String, Long)], DataFrame) = {
    def applyMerges(syms: Column, ps: Seq[(String, String)]): Column =
      aggregate(syms, array().cast("array<string>"), (acc, x) => {
        val last = element_at(acc, -1)
        val hit = ps.map { case (a, b) => last === lit(a) && x === lit(b) }
          .reduce(_ || _)
        when(size(acc) > 0 && hit,
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(last, x))))
          .otherwise(concat(acc, array(x)))
      })
    var cur = Tables(s, d, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("syms"))
      .repartition(col("w"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, Int, String, String, Long)]
    for (rnd <- 1 to rounds) {
      val pairs = cur.where(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> struct(syms[i-1] AS lhs, syms[i] AS rhs))")).as("p"))
        .groupBy("p.lhs", "p.rhs").agg(sum("freq").as("cnt"))
      // greedy disjoint selection over the RANKED pair prefix; grow the
      // prefix until the selection closes or the ranking is exhausted,
      // so the driver never holds more than the blocking frontier
      var limit = 512
      var sel: Seq[(String, String, Long)] = Seq.empty
      var settled = false
      while (!settled) {
        val top = pairs
          .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
          .limit(limit).collect()
        val seen = scala.collection.mutable.Set.empty[String]
        val picked = Seq.newBuilder[(String, String, Long)]
        var n = 0
        val it = top.iterator
        while (n < batchN && it.hasNext) {
          val r = it.next()
          val (a, b) = (r.getString(0), r.getString(1))
          if (!seen(a) && !seen(b)) {
            picked += ((a, b, r.getLong(2))); n += 1
          }
          seen += a; seen += b
        }
        if (n == batchN || top.length < limit) {
          sel = picked.result(); settled = true
        } else limit *= 4
      }
      if (sel.nonEmpty) {
        sel.zipWithIndex.foreach { case ((a, b, c), i) =>
          merges += ((rnd, i + 1, a, b, c))
        }
        cur = cur.select(col("w"), col("freq"),
            applyMerges(col("syms"), sel.map(p => (p._1, p._2))).as("syms"))
          .localCheckpoint()
      }
    }
    (merges.result(), cur)
  }

  /** DuckDB mirror of [[bpeLearnBatched]]: the same `n` rounds as
    * chained CTEs — per round the pair aggregate, a (cnt DESC, lhs,
    * rhs) row_number ranking, the symbol-disjoint selection as a NOT
    * EXISTS against all higher-ranked pairs, and the batch applied in
    * one list_reduce fold whose membership test scans the selected
    * (lhs, rhs) lists. */
  private def bpeBatchChain(n: Int, batchN: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH w0 AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
             |  string_split(w, '') AS syms
             |  FROM (SELECT unnest(string_split(text, ' ')) AS w
             |        FROM documents)
             |  GROUP BY w)""".stripMargin
    for (i <- 1 to n) {
      val (prev, p, r, s, m, ms, next) = (s"w${i - 1}", s"p$i", s"r$i",
        s"s$i", s"m$i", s"ms$i", s"w$i")
      sb ++= s""",
$p AS (SELECT syms[i] AS lhs, syms[i+1] AS rhs,
    CAST(sum(freq) AS BIGINT) AS cnt
  FROM $prev, unnest(range(1, len(syms))) AS u(i)
  WHERE len(syms) >= 2 GROUP BY 1, 2),
$r AS (SELECT lhs, rhs, cnt,
    row_number() OVER (ORDER BY cnt DESC, lhs, rhs) AS rn FROM $p),
$s AS (SELECT a.lhs, a.rhs, a.cnt, a.rn FROM $r a WHERE NOT EXISTS (
  SELECT 1 FROM $r b WHERE b.rn < a.rn
    AND (b.lhs IN (a.lhs, a.rhs) OR b.rhs IN (a.lhs, a.rhs)))),
$m AS (SELECT lhs, rhs, cnt,
    row_number() OVER (ORDER BY rn) AS sr FROM $s ORDER BY rn LIMIT $batchN),
$ms AS (SELECT coalesce(list(lhs ORDER BY sr), []) AS ll,
    coalesce(list(rhs ORDER BY sr), []) AS lr FROM $m),
$next AS (SELECT w, freq, CASE WHEN len(syms) <= 1 THEN syms ELSE
    string_split(list_reduce(syms, (acc, x) -> CASE
      WHEN len(list_filter(range(1, len(ll)+1),
        k -> (acc = ll[k] OR acc LIKE '%/' || ll[k]) AND x = lr[k])) > 0
      THEN acc || x ELSE acc || '/' || x END), '/') END AS syms
  FROM $prev LEFT JOIN $ms ON TRUE)"""
    }
    sb.toString
  }

  private def bpeBatchOracle(n: Int, batchN: Int): String =
    bpeBatchChain(n, batchN) + "\n" + (1 to n).map(i =>
      s"SELECT CAST($i AS INTEGER) AS rnd, CAST(sr AS INTEGER) AS sel_rank," +
        s" lhs, rhs, cnt AS pair_freq FROM m$i").mkString(" UNION ALL ") +
      " ORDER BY rnd, sel_rank"

  /** DuckDB mirror of p52: the textured-audio sample generator (the
    * p50 finalizer mapped to [-100,100]) and the twin nudge re-expressed
    * as arithmetic on (doc_id, t), folded to 32 exact frame energies,
    * then the identical 31-bit comparison hash, chunk join, and
    * Hamming gate. */
  private def p52Oracle: String = {
    s"""WITH ids AS (SELECT doc_id FROM documents
       |  UNION ALL SELECT doc_id + 1000000 FROM documents),
       |s0 AS (SELECT doc_id, list_transform(range(0, 256), t ->
       |    ((CASE WHEN doc_id >= 1000000 THEN doc_id - 1000000
       |      ELSE doc_id END) * 2654435761 + t * 104729)
       |    % 1000000007) AS v FROM ids),
       |s1 AS (SELECT doc_id, list_transform(v,
       |    x -> (xor(x, x >> 13) * 1779033703) % 1000000007) AS v FROM s0),
       |s2 AS (SELECT doc_id, list_transform(v,
       |    x -> xor(x, x >> 11) % 201 - 100) AS v FROM s1),
       |sm AS (SELECT doc_id, list_transform(range(0, 256), t ->
       |    CASE WHEN doc_id >= 1000000 AND t = 31
       |    THEN v[CAST(t + 1 AS INTEGER)] + 7
       |    ELSE v[CAST(t + 1 AS INTEGER)] END) AS s FROM s2),
       |en AS (SELECT doc_id, list_transform(range(0, 32), f ->
       |    list_sum(list_transform(range(0, 8), j ->
       |      s[CAST(f * 8 + j + 1 AS INTEGER)]
       |        * s[CAST(f * 8 + j + 1 AS INTEGER)]))) AS e FROM sm),
       |hs AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 31),
       |    b -> CASE WHEN e[CAST(b + 2 AS INTEGER)] > e[CAST(b + 1 AS INTEGER)]
       |      THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER) ELSE 0 END))
       |    AS BIGINT) AS ahash FROM en),
       |ch AS (SELECT doc_id, ahash, unnest(range(0, 4)) AS chunk_idx,
       |  unnest(list_transform(range(0, 4),
       |    c -> (ahash >> CAST(c * 8 AS INTEGER)) & 255)) AS chunk_val
       |  FROM hs)
       |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming
       |FROM ch a JOIN ch b ON a.chunk_idx = b.chunk_idx
       |  AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.ahash, b.ahash)) <= 2
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** DuckDB mirror of p50: the textured corpus's pixel generator
    * (poly seed + two xor-shift/multiply-mod finalizer rounds, staged
    * as list_transform passes over the 72-pixel grid) and the twin
    * perturbation re-expressed as arithmetic on (doc_id, pixel), then
    * the identical chunk join + Hamming gate. */
  private def p50Oracle: String = {
    s"""WITH ids AS (SELECT doc_id FROM documents
       |  UNION ALL SELECT doc_id + 1000000 FROM documents),
       |v0 AS (SELECT doc_id, list_transform(range(0, 72), p ->
       |    ((CASE WHEN doc_id >= 1000000 THEN doc_id - 1000000
       |      ELSE doc_id END) * 2654435761 + p * 104729)
       |    % 1000000007) AS v FROM ids),
       |v1 AS (SELECT doc_id, list_transform(v,
       |    x -> (xor(x, x >> 13) * 1779033703) % 1000000007) AS v FROM v0),
       |v2 AS (SELECT doc_id, list_transform(v,
       |    x -> xor(x, x >> 11) % 256) AS v FROM v1),
       |lm AS (SELECT doc_id, list_transform(range(0, 72), p ->
       |    CASE WHEN doc_id >= 1000000 AND p = 31
       |    THEN (v[CAST(p + 1 AS INTEGER)] + 7) % 256
       |    ELSE v[CAST(p + 1 AS INTEGER)] END) AS lums FROM v2),
       |hs AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60),
       |    b -> CASE WHEN lums[CAST((b // 8) * 9 + (b % 8) + 2 AS INTEGER)]
       |            > lums[CAST((b // 8) * 9 + (b % 8) + 1 AS INTEGER)]
       |      THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER) ELSE 0 END))
       |    AS BIGINT) AS dhash FROM lm),
       |ch AS (SELECT doc_id, dhash, unnest(range(0, 4)) AS chunk_idx,
       |  unnest(list_transform(range(0, 4),
       |    c -> (dhash >> CAST(c * 15 AS INTEGER)) & 32767)) AS chunk_val
       |  FROM hs)
       |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
       |FROM ch a JOIN ch b ON a.chunk_idx = b.chunk_idx
       |  AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.dhash, b.dhash)) <= 2
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** DuckDB mirror of p48: identical plane congruence, fold order, and
    * rounding at every stage. */
  /** DuckDB mirror of p70's BPE training loop: the same `n` rounds as
    * chained CTEs — per round an adjacent-pair unnest + aggregate, a
    * (cnt DESC, lhs, rhs) argmax, and the merge applied as a
    * list_reduce string fold (whole-symbol tail compare, '/' as the
    * out-of-alphabet separator) — so every learned merge, including
    * tie-breaks, is hash-exact against the Spark fold. */
  private def bpeChain(n: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH w0 AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
             |  string_split(w, '') AS syms
             |  FROM (SELECT unnest(string_split(text, ' ')) AS w
             |        FROM documents)
             |  GROUP BY w)""".stripMargin
    for (i <- 1 to n) {
      val (prev, p, m, next) = (s"w${i - 1}", s"p$i", s"m$i", s"w$i")
      sb ++= s""",
$p AS (SELECT syms[i] AS lhs, syms[i+1] AS rhs,
    CAST(sum(freq) AS BIGINT) AS cnt
  FROM $prev, unnest(range(1, len(syms))) AS u(i)
  WHERE len(syms) >= 2 GROUP BY 1, 2),
$m AS (SELECT lhs, rhs, cnt FROM $p ORDER BY cnt DESC, lhs, rhs LIMIT 1),
$next AS (SELECT w, freq, CASE WHEN len(syms) <= 1 THEN syms ELSE
    string_split(list_reduce(syms, (acc, x) -> CASE
      WHEN (acc = m.lhs OR acc LIKE '%/' || m.lhs) AND x = m.rhs
      THEN acc || x ELSE acc || '/' || x END), '/') END AS syms
  FROM $prev LEFT JOIN $m AS m ON TRUE)"""
    }
    sb.toString
  }

  private def bpeOracle(n: Int): String =
    bpeChain(n) + "\n" + (1 to n).map(i =>
      s"SELECT CAST($i AS INTEGER) AS mrank, lhs, rhs," +
        s" cnt AS pair_freq FROM m$i").mkString(" UNION ALL ") +
      " ORDER BY mrank"

  /** The deterministic hyperplane-LSH signature family shared by the
    * mirrored ANN/near-dup queries (p11, p48): 4 tables × 8 planes,
    * plane weights integers in [-500, 500] from an affine congruence of
    * (table, plane, dim), dot products a left fold of double·integer
    * products — the identical arithmetic runs in DuckDB
    * ([[lshMirrorOracle]]'s `dotp`/`sig`), so even the sign of a
    * near-zero projection agrees bit-for-bit. Returns the 4-signature
    * array for posexplode into (t, sig) bucket rows. */
  private def mirrorSigs(v: Column): Column = {
    def dot(t: Int, p: Int): Column = {
      val seed = (t * 31 + p).toLong
      val w = transform(sequence(lit(0), lit(63)), j =>
        ((lit(seed) * lit(2654435761L) +
          j.cast("long") * lit(104729L)) % lit(1000000007L))
          % lit(1001L) - lit(500L))
      aggregate(zip_with(v, w, (x, wj) => x * wj.cast("double")),
        lit(0.0d), _ + _)
    }
    def sig(t: Int): Column = (0 until 8)
      .map(p => when(dot(t, p) > 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
    array((0 until 4).map(sig): _*)
  }

  /** DuckDB twin of [[mirrorSigs]]'s per-table dot products / sign
    * signature — shared by the p48 and p11 oracles. */
  private def oracleDotp(t: Int, p: Int): String = {
    val seed = t * 31 + p
    s"""list_sum(list_transform(range(1, 65),
       |      j -> v[j] * CAST((($seed * 2654435761 + (j-1) * 104729)
       |        % 1000000007) % 1001 - 500 AS DOUBLE)))""".stripMargin
  }

  private def oracleSig(t: Int): String = (0 until 8)
    .map(p => s"(CASE WHEN ${oracleDotp(t, p)} > 0 THEN ${1L << p} ELSE 0 END)")
    .mkString("(", " + ", ")")

  /** DuckDB mirror of the bucketed p11: same planted twins, same
    * hyperplane banding, same exact-cosine verify — so the oracle gates
    * the banding itself, not just the verify stage. */
  private def p11BucketedOracle: String =
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings WHERE vec_id < ${CorpusCaps.Vectors}),
       |alle AS (SELECT vec_id, v FROM e
       |  UNION ALL SELECT vec_id + 1000000,
       |    list_transform(range(1, len(v)+1),
       |      i -> v[i] + CASE WHEN i = 1 THEN 0.05 ELSE 0.0 END) FROM e),
       |sigs AS (SELECT vec_id,
       |  ${(0 until 4).map(t => s"${oracleSig(t)} AS s$t").mkString(",\n  ")}
       |  FROM alle),
       |bk AS (SELECT vec_id, unnest([0, 1, 2, 3]) AS t,
       |  unnest([s0, s1, s2, s3]) AS sig FROM sigs),
       |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM bk a JOIN bk b ON a.t = b.t AND a.sig = b.sig
       |    AND a.vec_id < b.vec_id),
       |p AS (SELECT c.a_id, c.b_id,
       |  list_sum(list_transform(range(1, 65), i -> ea.v[i]*eb.v[i]))
       |    / (sqrt(list_sum(list_transform(ea.v, x -> x*x)))
       |       * sqrt(list_sum(list_transform(eb.v, x -> x*x)))) AS cs
       |  FROM cand c JOIN alle ea ON c.a_id = ea.vec_id
       |  JOIN alle eb ON c.b_id = eb.vec_id)
       |SELECT a_id, b_id FROM p WHERE cs > 0.9 ORDER BY a_id, b_id""".stripMargin

  private def lshMirrorOracle: String = {
    def sig(t: Int): String = oracleSig(t)
    val cos =
      """floor(list_sum(list_transform(range(1, 65),
        |      i -> qv[i]*nv[i]))
        |    / (sqrt(list_sum(list_transform(qv, x -> x*x)))
        |       * sqrt(list_sum(list_transform(nv, x -> x*x))))
        |    * 1000000 + 0.5)/1000000""".stripMargin
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |sigs AS (SELECT vec_id,
       |  ${(0 until 4).map(t => s"${sig(t)} AS s$t").mkString(",\n  ")}
       |  FROM e),
       |bk AS (SELECT vec_id, unnest([0, 1, 2, 3]) AS t,
       |  unnest([s0, s1, s2, s3]) AS sig FROM sigs),
       |cand AS (SELECT DISTINCT q.vec_id AS q_id, b.vec_id AS n_id
       |  FROM bk q JOIN bk b ON q.t = b.t AND q.sig = b.sig
       |    AND b.vec_id != q.vec_id
       |  WHERE q.vec_id < 3),
       |sc AS (SELECT c.q_id, c.n_id, $cos AS cos_r
       |  FROM cand c JOIN (SELECT vec_id, v AS qv FROM e) qe
       |    ON c.q_id = qe.vec_id
       |  JOIN (SELECT vec_id, v AS nv FROM e) ne ON c.n_id = ne.vec_id),
       |r AS (SELECT q_id, n_id, cos_r, ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY cos_r DESC, n_id) AS rank FROM sc)
       |SELECT q_id, CAST(rank AS INTEGER) AS rank, n_id, cos_r FROM r
       |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
  }

  /** DuckDB mirror of p14's trained IVF. The 64-dim centroid means are
    * generated per dimension; every float lands through the same
    * floor(x*1e6+0.5)/1e6 rounding as the Spark side. */
  /** p31: product quantization — the MEMORY-side ANN scale story (IVF
    * prunes compute; PQ shrinks residency). 64-dim doubles → 8 blocks
    * of 8 dims, one 16-centroid sub-quantizer per block (seeded from
    * the first 16 vectors' blocks, one Lloyd step — deterministic like
    * p14), each vector stored as 8 small codes: 512 B → 8 B, 64×. Query =
    * ADC: per (query, block) a 16-entry distance table to the
    * sub-centroids, approx distance = Σ_blocks table[code] — the
    * codes⋈tables equi-join below, never touching raw vectors at
    * search time. All stages round at 1e-6 so the DuckDB mirror is
    * value-identical. */
  private def pqQuery(s: SparkSession, d: String): DataFrame = {
    val e = Tables(s, d, "embeddings")
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    def r6(c: Column) = floor(c * 1000000 + 0.5) / 1000000
    def bdist(a: Column, b: Column) = r6(aggregate(
      zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), _ + _))
    val blocks = e.select(col("vec_id"), posexplode(
        array((0 until 8).map(m => slice(col("v"), m * 8 + 1, 8)): _*))
        .as(Seq("block", "bv")))
      .localCheckpoint() // feeds training, encoding, and the query side
    def nearestB(bl: DataFrame, cents: DataFrame) =
      bl.join(broadcast(cents), "block")
        // pinned exchange: the window's own (vec_id, block) exchange
        // is AQE-coalescible and the fanned-out block×centroid rows
        // are tiny in BYTES but carry the bdist arithmetic — see Part
        .transform(graft.Part.pin(col("vec_id"), col("block")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id", "block")
            .orderBy(bdist(col("bv"), col("cv")), col("c_id"))))
        .where(col("rn") === 1)
    val centroid = udaf(graft.functions.VectorCentroid)
    var cents = blocks.where(col("vec_id") < 16)
      .select(col("block"), col("vec_id").as("c_id"), col("bv").as("cv"))
    for (_ <- 1 to 2) // Lloyd: assign → per-(block, cell) mean, rounded
      cents = nearestB(blocks, cents)
        .groupBy("block", "c_id")
        .agg(transform(centroid(col("bv")), x => r6(x)).as("cv"))
    val trained = cents
      .localCheckpoint() // train once; reused by encode + both scans
    val codes = nearestB(blocks, trained)
      .select(col("vec_id"), col("block"), col("c_id").as("code"))
    val tables = blocks.where(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("block"), col("bv").as("qbv"))
      .join(broadcast(trained), "block")
      .select(col("q_id"), col("block"), col("c_id").as("code"),
        bdist(col("qbv"), col("cv")).as("qd"))
    // ADC shortlist (top-50 by approximate distance) → exact re-rank:
    // the production IVFADC shape — the scan ranks COMPRESSED codes
    // only, raw vectors are touched for just 50 candidates per query
    val shortlist = codes.join(broadcast(tables), Seq("block", "code"))
      .where(col("q_id") =!= col("vec_id"))
      .groupBy("q_id", "vec_id")
      .agg(r6(sum(col("qd"))).as("adist"))
      .withColumn("arn", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("adist"), col("vec_id"))))
      .where(col("arn") <= 50)
    shortlist
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv")), "q_id")
      .join(e, "vec_id")
      .withColumn("dist", r6(aggregate(
        zip_with(col("qv"), col("v"), (x, y) => (x - y) * (x - y)),
        lit(0.0d), _ + _)))
      .withColumn("rank", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("dist"), col("vec_id"))))
      .where(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
        col("dist"))
      .orderBy("q_id", "rank")
  }

  /** DuckDB mirror of p31: same seeds, same single Lloyd step, same
    * 1e-6 rounding at every stage boundary. */
  private def pqOracle: String = {
    def bdist(a: String, b: String) =
      s"""floor(list_sum(list_transform(range(1, 9),
         |    i -> ($a[i]-$b[i])*($a[i]-$b[i])))*1000000+0.5)/1000000""".stripMargin
    val avg8 = (1 to 8)
      .map(i => s"floor(avg(bv[$i])*1000000+0.5)/1000000")
      .mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |bl AS (SELECT vec_id, m AS block, list_slice(v, m*8+1, m*8+8) AS bv
       |  FROM e, (SELECT unnest(range(0, 8)) AS m)),
       |seeds AS (SELECT block, vec_id AS c_id, bv AS cv FROM bl
       |  WHERE vec_id < 16),
       |a1 AS (SELECT vec_id, block, bv, c_id FROM (
       |  SELECT b.vec_id, b.block, b.bv, s.c_id, ROW_NUMBER() OVER (
       |    PARTITION BY b.vec_id, b.block
       |    ORDER BY ${bdist("b.bv", "s.cv")}, s.c_id) AS rn
       |  FROM bl b JOIN seeds s ON b.block = s.block) WHERE rn = 1),
       |c1 AS (SELECT block, c_id, $avg8 AS cv FROM a1 GROUP BY block, c_id),
       |a2 AS (SELECT vec_id, block, bv, c_id FROM (
       |  SELECT b.vec_id, b.block, b.bv, s.c_id, ROW_NUMBER() OVER (
       |    PARTITION BY b.vec_id, b.block
       |    ORDER BY ${bdist("b.bv", "s.cv")}, s.c_id) AS rn
       |  FROM bl b JOIN c1 s ON b.block = s.block) WHERE rn = 1),
       |tr AS (SELECT block, c_id, $avg8 AS cv FROM a2 GROUP BY block, c_id),
       |codes AS (SELECT vec_id, block, c_id AS code FROM (
       |  SELECT b.vec_id, b.block, t.c_id, ROW_NUMBER() OVER (
       |    PARTITION BY b.vec_id, b.block
       |    ORDER BY ${bdist("b.bv", "t.cv")}, t.c_id) AS rn
       |  FROM bl b JOIN tr t ON b.block = t.block) WHERE rn = 1),
       |tab AS (SELECT b.vec_id AS q_id, b.block, t.c_id AS code,
       |    ${bdist("b.bv", "t.cv")} AS qd
       |  FROM bl b JOIN tr t ON b.block = t.block WHERE b.vec_id < 3),
       |ad AS (SELECT t.q_id, c.vec_id,
       |    floor(sum(t.qd)*1000000+0.5)/1000000 AS adist
       |  FROM codes c JOIN tab t ON c.block = t.block AND c.code = t.code
       |  WHERE t.q_id != c.vec_id GROUP BY t.q_id, c.vec_id),
       |sl AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id, ROW_NUMBER()
       |  OVER (PARTITION BY q_id ORDER BY adist, vec_id) AS arn FROM ad)
       |  WHERE arn <= 50),
       |rr AS (SELECT s.q_id, s.vec_id,
       |    floor(list_sum(list_transform(range(1, 65),
       |      i -> (qe.v[i]-ne.v[i])*(qe.v[i]-ne.v[i])))*1000000+0.5)/1000000
       |      AS dist
       |  FROM sl s JOIN e qe ON s.q_id = qe.vec_id
       |  JOIN e ne ON s.vec_id = ne.vec_id),
       |r AS (SELECT q_id, vec_id, dist, ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY dist, vec_id) AS rn FROM rr)
       |SELECT q_id, CAST(rn AS INTEGER) AS rank, vec_id AS n_id, dist
       |FROM r WHERE rn <= 5 ORDER BY q_id, rank""".stripMargin
  }

  /** DuckDB mirror of p09 (exact brute-force cosine top-k) — a def so
    * p68's recall harness can embed it as a subquery. */
  /** p74's DuckDB mirror: the identical 5 greedy rounds as chained
    * CTEs (p70's generated-mirror pattern) — round i picks the
    * max-marginal source from g(i-1) with the same (m DESC, source)
    * tie-break, then g(i) retires the winner's rows and grams. */
  private def p74Oracle: String = {
    val rounds = 5
    val sb = new StringBuilder(
      """WITH t AS (SELECT source, string_split(text,' ') AS tk
        |  FROM documents WHERE len(string_split(text,' ')) >= 8),
        |g0 AS (SELECT DISTINCT source,
        |    unnest(list_transform(range(0, len(tk)-7),
        |      i -> list_reduce(list_prepend(CAST(7 AS BIGINT),
        |        list_transform(string_split(
        |          array_to_string(tk[i+1:i+8], ' '), ''),
        |          x -> CAST(ord(x) AS BIGINT))),
        |        (acc, x) -> (acc * 131 + x) % 1000000007))) AS h
        |  FROM t)""".stripMargin)
    for (i <- 1 to rounds) {
      sb ++= s""",
        |p$i AS (SELECT source, count(*) AS m FROM g${i - 1}
        |  GROUP BY 1 ORDER BY m DESC, source LIMIT 1)""".stripMargin
      if (i < rounds) sb ++= s""",
        |g$i AS (SELECT g.source, g.h FROM g${i - 1} g
        |  WHERE g.source != (SELECT source FROM p$i)
        |    AND g.h NOT IN (SELECT h FROM g${i - 1}
        |                    WHERE source = (SELECT source FROM p$i)))"""
        .stripMargin
    }
    sb ++= s""",
      |sel AS (${(1 to rounds).map(i =>
        s"SELECT $i AS iter, source, m FROM p$i")
        .mkString("\n|  UNION ALL ")})
      |SELECT iter, source, CAST(m AS BIGINT) AS marginal_new,
      |  CAST(sum(m) OVER (ORDER BY iter) AS BIGINT) AS cum_cover
      |FROM sel ORDER BY iter""".stripMargin
    sb.toString
  }

  /** BM25 top-k per query over `documents` in integer 1e-4 score
    * units — the p34 ranking, shared with p73's hybrid fusion.
    * Postings build once behind the token barrier; every query-side
    * frame (terms, doc freqs, corpus stats) is broadcast, so the
    * corpus is touched by exactly one shuffle at any scale. Returns
    * [q_id, rank, doc_id, score_u], rank ≤ k. */
  private def bm25TopK(s: SparkSession, d: String, k: Int): DataFrame = {
    import s.implicits._
    val docs = Tables(s, d, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .repartition(col("doc_id")) // token barrier: dl + explode both read tk
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        col("tk"))
      .localCheckpoint() // feeds postings AND the corpus stats row
    val post = docs
      .select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val qterms = Seq((1, "spark"), (1, "join"), (2, "hash"),
      (2, "table"), (2, "scan"), (3, "window"), (3, "agg"), (3, "data"))
      .toDF("q_id", "term")
    val dfreq = post.join(broadcast(qterms.select("term").distinct()), "term")
      .groupBy("term").agg(count(lit(1)).as("df"))
    val st = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfn = col("tf") * 2.2 / (col("tf") +
      lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
    post.join(broadcast(qterms), "term")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(st))
      .withColumn("u", floor(idf * tfn * 10000 + 0.5).cast("long"))
      .groupBy("q_id", "doc_id").agg(sum(col("u")).as("score_u"))
      .withColumn("rank", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("score_u").desc, col("doc_id"))))
      .where(col("rank") <= k)
  }

  private def p09Oracle: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 3),
      |p AS (SELECT q_id, e.vec_id AS n_id,
      |  list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*e.v[i]))
      |    / (sqrt(list_sum(list_transform(qv, x -> x*x)))
      |       * sqrt(list_sum(list_transform(e.v, x -> x*x)))) AS c
      |  FROM q, e WHERE e.vec_id != q_id),
      |r AS (SELECT q_id, n_id, floor(c*1000000 + 0.5)/1000000 AS cos_r,
      |  ROW_NUMBER() OVER (PARTITION BY q_id
      |    ORDER BY floor(c*1000000 + 0.5)/1000000 DESC, n_id) AS rn
      |  FROM p)
      |SELECT q_id, CAST(rn AS INTEGER) AS rank, n_id, cos_r FROM r
      |WHERE rn <= 5 ORDER BY q_id, rank""".stripMargin

  private def ivfOracle: String = ivfOracleFor("e.vec_id < 3", 2, 5)

  /** The 1e-6-rounded cosine, DuckDB list-algebra form — the single
    * definition every IVF-family oracle interpolates. */
  private def ivfCosSql(a: String, b: String): String =
    s"""floor(list_sum(list_transform(range(1, len($a)+1),
       |      i -> $a[i]*$b[i]))
       |    / (sqrt(list_sum(list_transform($a, x -> x*x)))
       |       * sqrt(list_sum(list_transform($b, x -> x*x))))
       |    * 1000000 + 0.5)/1000000""".stripMargin

  // def, not val: the registry val above initializes first and would
  // read a null field (object-init order)
  private def ivfEmbedCte: String =
    """SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings""".stripMargin

  /** WITH-prelude mirroring ivfAssign: trained centroids (c2) and the
    * full assignment (asg) over the `e` CTE body supplied — shared by
    * p14/p83 (probe tails) and p85 (pairwise SemDeDup tail). */
  private def ivfAsgPrelude(eCte: String): String = {
    val avgList = (1 to 64)
      .map(i => s"floor(avg(v[$i])*1000000+0.5)/1000000")
      .mkString("[", ", ", "]")
    def asg(cSrc: String, out: String) =
      s"""$out AS (SELECT vec_id, v, c_id AS cell FROM (
         |  SELECT e.vec_id, e.v, c.c_id, ROW_NUMBER() OVER (
         |    PARTITION BY e.vec_id
         |    ORDER BY ${ivfCosSql("e.v", "c.cv")} DESC, c.c_id) AS rn
         |  FROM e, $cSrc c) WHERE rn = 1)""".stripMargin
    s"""WITH e AS ($eCte),
       |c0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
       |${asg("c0", "a1")},
       |c1 AS (SELECT cell AS c_id, $avgList AS cv FROM a1 GROUP BY cell),
       |${asg("c1", "a2")},
       |c2 AS (SELECT cell AS c_id, $avgList AS cv FROM a2 GROUP BY cell),
       |${asg("c2", "asg")}""".stripMargin
  }

  /** p83's oracle — shared VERBATIM by s26, the streamed serving arm
    * (one SQL checks the batch kNN build and the stream). */
  private[queries] def knnGraphOracle: String = ivfOracleFor("TRUE", 2, 3)

  /** Parameterized form shared by p14 (3 probe vectors, top-5) and p83
    * (probeWhere=TRUE — EVERY vector probes, the kNN-graph build);
    * training (8 seeds, 2 Lloyd rounds, 1e-6 rounding) is identical. */
  private def ivfOracleFor(probeWhere: String, nprobe: Int,
      topK: Int): String = {
    def cos(a: String, b: String) = ivfCosSql(a, b)
    s"""${ivfAsgPrelude(ivfEmbedCte)},
       |prb AS (SELECT vec_id AS q_id, v AS qv, c_id AS cell FROM (
       |  SELECT e.vec_id, e.v, c.c_id, ROW_NUMBER() OVER (
       |    PARTITION BY e.vec_id
       |    ORDER BY ${cos("e.v", "c.cv")} DESC, c.c_id) AS rn
       |  FROM e, c2 c WHERE $probeWhere) WHERE rn <= $nprobe),
       |cand AS (SELECT p.q_id, a.vec_id AS n_id,
       |  ${cos("p.qv", "a.v")} AS cos_r
       |  FROM prb p JOIN asg a ON p.cell = a.cell
       |  WHERE a.vec_id != p.q_id),
       |r AS (SELECT q_id, n_id, cos_r, ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY cos_r DESC, n_id) AS rn FROM cand)
       |SELECT q_id, CAST(rn AS INTEGER) AS rank, n_id, cos_r FROM r
       |WHERE rn <= $topK ORDER BY q_id, rank""".stripMargin
  }

  /** p83 core, candidate stage — factored so the scale rehearsal can
    * count candidate rows directly. Trains the p14 IVF (seeds =
    * vec_id < kCells, 2 Lloyd rounds, 1e-6-rounded centroids) over
    * [vec_id, v], assigns every vector to its nearest cell, then joins
    * every vector's `nprobe` nearest cells to the assignment by an
    * EQUI-JOIN on cell (self excluded). `kCells` is the scale knob:
    * production sets it ∝ corpus/targetCellSize, which holds per-probe
    * candidates bounded and total candidates LINEAR in the corpus —
    * never an all-pairs form. Returns [q_id, qv, cell, vec_id, v,
    * cos_r] candidates, unranked. */
  private[queries] def ivfSim6(a: Column, b: Column) =
    floor(VectorOps.cosineFast(a, b) * 1000000 + 0.5) / 1000000

  private[queries] def ivfNearest(vecs: DataFrame, cents: DataFrame,
      keep: Int) =
    vecs.crossJoin(broadcast(cents)) // kCells-row broadcast side only
      .withColumn("rn", row_number().over(Window.partitionBy("vec_id")
        .orderBy(ivfSim6(col("v"), col("cv")).desc, col("c_id"))))
      .where(col("rn") <= keep)

  /** Train the p14 IVF over [vec_id, v] (seeds = vec_id &lt; kCells,
    * 2 Lloyd rounds, 1e-6-rounded centroids) and assign every vector
    * to its nearest cell. Returns (assigned [vec_id, v, cell], trained
    * centroids [c_id, cv] — localCheckpointed). Shared by the kNN
    * graph (p83) and SemDeDup (p85). */
  def ivfAssign(e: DataFrame, kCells: Int): (DataFrame, DataFrame) = {
    var cents = e.where(col("vec_id") < kCells)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    val centroid = udaf(graft.functions.VectorCentroid)
    for (_ <- 1 to 2) // Lloyd: assign → per-cell mean, rounded 1e-6
      cents = ivfNearest(e, cents, 1)
        .groupBy("c_id")
        .agg(transform(centroid(col("v")),
          x => floor(x * 1000000 + 0.5) / 1000000).as("cv"))
    cents = cents.localCheckpoint() // train once; feeds every consumer
    (ivfNearest(e, cents, 1)
      .select(col("vec_id"), col("v"), col("c_id").as("cell")), cents)
  }

  def knnCandidatesIvf(e: DataFrame, kCells: Int,
      nprobe: Int): DataFrame = {
    val (assigned, cents) = ivfAssign(e, kCells)
    val probes = ivfNearest(e, cents, nprobe)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("c_id").as("cell"))
    // salted (r10): 8 cells hash to ≤8 partitions and AQE coalesces
    // the tiny exchange to ONE task, serializing ~1 M cosine evals
    // (p83 measured 15 single-task stages end to end)
    graft.Part.saltedJoin(probes, assigned, "cell", col("q_id"))
      .where(col("q_id") =!= col("vec_id"))
      .withColumn("cos_r", ivfSim6(col("qv"), col("v")))
  }

  /** p83: the full kNN graph — every vector's `topK` nearest by the
    * IVF candidate stage above, ranked (cos desc, id) per query. */
  def knnGraphIvf(e: DataFrame, kCells: Int, nprobe: Int,
      topK: Int): DataFrame =
    knnCandidatesIvf(e, kCells, nprobe)
      .withColumn("rank", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("cos_r").desc, col("vec_id"))))
      .where(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
        col("cos_r"))

  /** p41 core over any [doc_id, text] frame (factored so the spec can
    * plant a corpus with a known rare term): per-doc top-`topK` terms by
    * tf × idf_micro where idf_micro = floor(1e6·ln(N/df)) — integer
    * scores, exact aggregation, deterministic (score desc, tok) order.
    * Returns [doc_id, rk, tok, tf, score_micro], unordered. */
  def tfidfKeywords(docs: DataFrame, topK: Int): DataFrame = {
    // checkpoint: the tf frame feeds the df aggregate AND the score
    // join back — inlined it would re-run tokenize+explode+agg twice
    val tf = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .transform(graft.Part.pin(col("doc_id"))) // token barrier (p16 rule)
      .select(col("doc_id"), explode(col("tk")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val st = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfq, "tok")
      .crossJoin(broadcast(st))
      .withColumn("score_micro", col("tf") *
        floor(lit(1000000.0) *
          log(col("n_docs").cast("double") / col("df"))).cast("long"))
      .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score_micro").desc, col("tok"))))
      .where(col("rk") <= topK)
      .select(col("doc_id"), col("rk"), col("tok"), col("tf"),
        col("score_micro"))
  }

  /** p46 core over any [doc_id, text] frame (factored so the spec can
    * plant exact-length docs): fixed-size token windows of `chunkTok`
    * tokens every `stride` tokens, the last window short rather than
    * re-read; docs with ≤ chunkTok tokens emit one whole-doc chunk
    * (chunk count = 1 + ceil(max(n−chunkTok,0)/stride), exact BIGINT).
    * Each chunk carries provenance (1-based start token, length) and a
    * polynomial content hash (seed 7, ×131 mod 1e9+7 — the p37/p40
    * DuckDB-mirrorable family) for chunk-level dedup. Map-only: all
    * per-row array arithmetic in one codegen span after the token
    * barrier. Returns [doc_id, chunk_idx, start_tok, n_tok,
    * chunk_hash], unordered. */
  def ragChunks(docs: DataFrame, chunkTok: Int, stride: Int): DataFrame = {
    val P = 1000000007L
    def polyH(g: Column): Column = TextOps.polyHash(g) // native codegen fold
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .transform(graft.Part.pin(col("doc_id"))) // token barrier (p16 rule)
      .withColumn("nch",
        expr(s"1 + (greatest(size(tk) - $chunkTok, 0)" +
          s" + ${stride - 1}) div $stride"))
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), col("nch").cast("int") - 1), i => {
          val chunk = slice(col("tk"), i * stride + 1, lit(chunkTok))
          struct((i * stride + 1).as("start_tok"),
            size(chunk).as("n_tok"),
            polyH(concat_ws(" ", chunk)).as("chunk_hash"))
        })).as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx"), col("c.start_tok"),
        col("c.n_tok"), col("c.chunk_hash"))
  }

  /** p43 core over any [doc_id, text] frame (factored so the spec can
    * plant exact subset/overlap corpora): asymmetric 3-shingle
    * containment via an inverted index. Shingles hash to longs
    * (xxhash64) so the equi-join moves 8-byte keys — set sizes and
    * intersection counts are hash-invariant (modulo 2^-64 collisions,
    * the p04 acceptance). Shingles appearing in more than `dfCap` docs
    * are dropped from the index AND both denominators (symmetric, so
    * true subset pairs keep cont_bp = 10000). Returns [a_id, b_id,
    * shared, min_sz, cont_bp] for pairs with cont_bp ≥ `minBp`,
    * unordered; cont_bp = shared·10000 div min(|A|,|B|) exact BIGINT. */
  def containmentPairs(docs: DataFrame, dfCap: Long,
      minBp: Long): DataFrame = {
    // checkpoints: the raw index feeds the df agg and the stop-shingle
    // anti-join (tokenize+shingle+hash once); the capped index feeds
    // the size agg and the bucket agg
    val idx = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      // token barrier (p16 rule) BETWEEN tokenize and shingle: the
      // shingle lambda reads tk 3×/position — inlined, split() re-runs
      // per element_at (measured 8.2 s → 1.5 s on this stage at sf0.1)
      .transform(graft.Part.pin(col("doc_id")))
      .select(col("doc_id"),
        explode(transform(TextOps.shingles(col("tk"), 3),
          x => xxhash64(x))).as("h"))
      .localCheckpoint()
    // stop-shingles (df > cap) are FEW by construction — a broadcast
    // anti-join drops them without shuffling the index. The two-pass df
    // count (not a collect_list cap) is the scale guard: a corpus-wide
    // boilerplate shingle never builds an unbounded aggregation buffer.
    val stop = idx.groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") > dfCap).select("h")
    val kept = idx.join(broadcast(stop), Seq("h"), "left_anti")
      .localCheckpoint()
    val sz = kept.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // pair stage is the candidatePairs shape (one bounded collect per
    // shingle, pairs explode from the sorted member array), not a 3M×3M
    // self-join: only shingles in 2..cap docs can emit, and each emits
    // at most C(cap,2) pairs. shared(a,b) = how many buckets emit the
    // pair = |A∩B| exactly.
    // NOT pinned (r10): AQE runs this ~27 MB exchange at 5 tasks, but
    // pinning it to the session width measured SLOWER end to end (A/B
    // warm 4.00 → 4.54 s; the pair fanout's per-task fixed cost
    // outweighs the extra width) — the 5-task stage is not the wall
    val shared = kept.groupBy("h")
      .agg(collect_list(col("doc_id")).as("ds"))
      .where(size(col("ds")) >= 2)
      .select(array_sort(col("ds")).as("ds"))
      .select(explode(flatten(transform(col("ds"), (a, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))), b =>
          struct(a.as("a_id"), b.as("b_id")))))).as("p"))
      .groupBy(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sz.select(col("doc_id").as("a_id"), col("sz").as("a_sz")), "a_id")
      .join(sz.select(col("doc_id").as("b_id"), col("sz").as("b_sz")), "b_id")
      .withColumn("min_sz", least(col("a_sz"), col("b_sz")))
      .withColumn("cont_bp", expr("shared * 10000 div min_sz"))
      .where(col("cont_bp") >= minBp)
      .select("a_id", "b_id", "shared", "min_sz", "cont_bp")
  }
}
