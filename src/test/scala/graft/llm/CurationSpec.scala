package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the corpus-curation ops (queries/Curation.scala) that
  * the DuckDB oracle can't see: detection guarantees on planted inputs
  * and statistical properties of the hash-gated sampler.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("p18 repetition signals: planted repeats dominate clean text") {
    val docs = Seq(
      (1L, "a b a b a b a b"),          // one bigram everywhere
      (2L, "w x y z q r s t u v")       // all bigrams distinct
    ).toDF("doc_id", "text").createOrReplaceTempView("curation_p18")
    val toks = TextOps.tokens(col("text"))
    val tk = col("tk")
    val grams = transform(
      sequence(lit(1), greatest(size(tk) - 1, lit(0))),
      i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1)))
    val out = spark.table("curation_p18")
      .select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"), grams.as("g"))
      .select(col("doc_id"),
        (lit(1.0) - size(array_distinct(col("g"))).cast("double")
          / size(col("g"))).as("dup_frac"),
        (array_max(transform(array_distinct(col("g")),
          x => size(filter(col("g"), y => y === x)))).cast("double")
          / size(col("g"))).as("top_frac"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L)._1 > 0.5 && out(1L)._2 > 0.5, s"repetitive doc: ${out(1L)}")
    assert(out(2L)._1 == 0.0, s"clean doc dup_frac: ${out(2L)}")
  }

  test("p19 decontamination flags every doc sharing a benchmark 3-gram") {
    // every flagged doc must genuinely share a 3-gram with the benchmark
    // slice, and benchmark docs never flag themselves
    val flagged = graft.SparkEntry.queries("p19_decontam")(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged.forall(_ % 97 != 0), "benchmark doc flagged as contaminated")
    val docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    val benchGrams = docs.where(col("doc_id") % 97 === 0)
      .select(explode(col("sh")).as("g")).distinct()
      .as[String].collect().toSet
    val expect = docs.where(col("doc_id") % 97 =!= 0)
      .collect()
      .filter(_.getSeq[String](1).exists(benchGrams.contains))
      .map(_.getLong(0)).toSet
    assert(flagged == expect, s"flagged ${flagged.size} vs expected ${expect.size}")
  }

  test("p37 bloom decontamination: no false negatives, bounded FP rate") {
    // THE Bloom guarantee: every exact hit must also be a bloom hit
    // (a false negative means the bitmap lost a set bit — broken), and
    // the FP surplus stays small (m=65536 bits vs a few thousand grams
    // → per-gram FP odds well under 1%, so doc-level surplus is a few
    // percent of the corpus at most)
    val out = graft.SparkEntry.queries("p37_bloom_decontam")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val falseNeg = out.filter { case (_, bloom, exact) => exact == 1 && bloom == 0 }
    assert(falseNeg.isEmpty, s"bloom false negatives: ${falseNeg.take(5).toSeq}")
    val fps = out.count { case (_, bloom, exact) => bloom == 1 && exact == 0 }
    assert(fps <= out.length / 10,
      s"bloom FP surplus $fps of ${out.length} docs — bitmap too saturated")
  }

  test("p38 count-min: one-sided estimates, exact top-k order preserved") {
    // the count-min guarantee is one-sided: collisions only ADD, so
    // est >= cnt for every item, always — a single violation means the
    // sketch lost an increment. The overestimate should also stay
    // within a loose multiple of the ε=e·N/w bound (w=1024, 3 rows).
    val rows = graft.SparkEntry.queries("p38_countmin")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (g, cnt, est) =>
      assert(est >= cnt, s"count-min underestimated '$g': $est < $cnt")
    }
    val n = graft.Tables(spark, sfDir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("w")).count()
    val bound = math.ceil(math.E * n / 1024).toLong * 3
    rows.foreach { case (g, cnt, est) =>
      assert(est - cnt <= bound,
        s"'$g' overestimate ${est - cnt} blows past 3x the eps-N bound $bound")
    }
  }

  test("p20 redaction scrubs every planted PII token") {
    val out = graft.SparkEntry.queries("p20_pii_redact")(spark, sfDir)
    assert(out.where(col("n_email") =!= 1 || col("n_url") =!= 1).count() == 0,
      "every doc plants exactly one email and one URL")
    // the corpus itself is PII-free, so the fully-scrubbed text is
    // exactly text + the marker suffix — rebuild it and compare hashes
    val expect = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        md5(concat(col("text"), lit(" contact <EMAIL> via <URL> or <PHONE>")))
          .as("expect"))
    val diff = out.join(expect, "doc_id")
      .where(col("scrubbed") =!= col("expect")).count()
    assert(diff == 0, s"$diff docs scrubbed differently than expected")
  }

  test("p21 hash-gated sampling is deterministic and roughly uniform") {
    val a = graft.SparkEntry.queries("p21_stratified_sample")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val b = graft.SparkEntry.queries("p21_stratified_sample")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(a == b, "same data, same decisions")
    // each source's achieved rate should be within ±0.2 of its hash
    // threshold (first two hex chars of md5(source) / 256)
    val rates = graft.SparkEntry.queries("p21_stratified_sample")(spark, sfDir)
      .collect().map { r =>
        val src = r.getString(0)
        val want = Integer.parseInt(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(src).substring(0, 2), 16) / 256.0
        (src, r.getDouble(3), want)
      }
    rates.foreach { case (src, got, want) =>
      assert(math.abs(got - want) <= 0.2, s"$src rate $got vs threshold $want")
    }
  }

  test("p22 SemDeDup catches >=85% of planted twins, never an original-only id") {
    val removed = graft.SparkEntry.queries("p22_semantic_dedup")(spark, sfDir)
      .select("removed_id").as[Long].collect().toSet
    val originals = graft.Tables(spark, sfDir, "embeddings")
      .where(col("vec_id") < 500).select("vec_id").as[Long].collect()
    // twins (id+1M) have cosine ≈ 1 with their original and the higher
    // id, so when the pair shares a cell the twin is the removed side;
    // a twin escapes only by straddling a cell boundary — bounded, not zero
    val caught = originals.map(_ + 1000000L).count(removed.contains)
    val recall = caught.toDouble / originals.length
    assert(recall >= 0.85, s"twin recall $recall")
  }

  test("p41 tf-idf: a planted rare term tops its document") {
    val docs = Seq(
      (1L, "alpha beta gamma zzqq zzqq zzqq"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma eta theta iota"),
      (4L, "alpha beta gamma kappa lambda mu")
    ).toDF("doc_id", "text")
    val out = graft.queries.Pipeline.tfidfKeywords(docs, topK = 3).collect()
    val top1 = out.filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(top1(1L) == "zzqq", top1.toString)
    // ubiquitous terms (df == N → idf 0) never top a doc with rare terms
    assert(!top1.values.exists(Set("alpha", "beta", "gamma")), top1.toString)
    // every doc yields exactly topK ranked rows, scores non-negative
    assert(out.length == 12 && out.forall(_.getLong(4) >= 0))
  }

  test("p42 DSIR: target-vocabulary docs outrank off-vocabulary docs") {
    val docs = Seq(
      (1L, "tgt", "apple banana cherry apple banana"),
      (2L, "tgt", "banana cherry apple cherry"),
      (3L, "raw", "apple banana cherry banana apple"), // target-like
      (4L, "raw", "xylo ygg zubr xylo ygg"),           // off-vocabulary
      (5L, "raw", "zubr ygg xylo zubr")
    ).toDF("doc_id", "source", "text")
    val out = graft.queries.Curation.dsirWeights(docs, "tgt", nSelect = 3)
      .collect()
    val sc = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sc(3L) > sc(4L) && sc(3L) > sc(5L),
      s"target-like raw doc must outrank off-vocab docs: $sc")
    assert(out.map(_.getInt(3)).sum == 3, "selection flags != nSelect")
    // determinism: identical rerun, identical scores
    val sc2 = graft.queries.Curation.dsirWeights(docs, "tgt", nSelect = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sc == sc2)
  }

  test("p44 epoch build: gated, deduped, packed consistently") {
    val out = graft.SparkEntry.queries("p44_epoch_pipeline")(spark, sfDir)
      .collect()
    assert(out.length == 200, s"epoch size ${out.length}")
    val ids = out.map(_.getLong(0)).toSet
    // stage 1 held: every packed doc clears p26's quality gate
    val q = graft.SparkEntry.queries("p26_quality_logreg")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(ids.forall(q(_) == 1), "a packed doc failed the quality gate")
    // stage 2 held: no two packed docs share content
    val nDistinct = graft.Tables(spark, sfDir, "documents")
      .where(col("doc_id").isin(ids.toSeq: _*))
      .select(countDistinct(md5(col("text")))).head().getLong(0)
    assert(nDistinct == 200L, s"content dups in the epoch: $nDistinct")
    // stage 4 held: seq_id/off are the exact per-shard running sum
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      var cum = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(4) == cum / 2048 && r.getLong(5) == cum % 2048,
          s"$src: $r at cum=$cum")
        cum += r.getLong(3)
      }
    }
  }

  test("p43 containment: subset pair at 10000 bp, Jaccard-invisible") {
    val base = "q w e r t y u i o p a s d f g h j k l z"
    val docs = Seq(
      (1L, base),                                   // 20 tokens, 18 shingles
      (2L, base.split(" ").take(10).mkString(" ")), // prefix half: subset
      (3L, "m n b v c x q1 w1 e1 r1")               // disjoint
    ).toDF("doc_id", "text")
    val out = graft.queries.Pipeline.containmentPairs(docs,
      dfCap = 50, minBp = 9000).collect()
    assert(out.length == 1, out.mkString(";"))
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    // exact subset: shared == |B|, containment exactly 10000 bp — while
    // symmetric Jaccard is 8/18 ≈ 0.44, under p04's 0.5 gate
    assert(r.getLong(2) == r.getLong(3) && r.getLong(4) == 10000L,
      r.toString)
  }

  test("p43 containment: df cap drops stop-shingles from both sides") {
    // the stop-shingle "x x x" appears in all 4 docs; with dfCap = 3 it
    // leaves the index, so the disjoint pair (3,4) loses its only link
    // while the subset pair (1,2) stays at exactly 10000 bp
    val docs = Seq(
      (1L, "x x x a b c d e f g h"),
      (2L, "x x x a b c d e"),
      (3L, "x x x p q r s t"),
      (4L, "x x x m n o u v")
    ).toDF("doc_id", "text")
    val out = graft.queries.Pipeline.containmentPairs(docs,
      dfCap = 3, minBp = 9000).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists(p => p._1 >= 3L || p._2 >= 3L),
      s"stop-shingle-only pairs leaked: $pairs")
    val sub = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(sub.exists(_.getLong(4) == 10000L), out.mkString(";"))
  }

  test("p46 chunking: window arithmetic, overlap, short-doc edges") {
    val docs = Seq(
      (1L, (1 to 130).map(i => s"t$i").mkString(" ")), // 3 chunks
      (2L, (1 to 10).map(i => s"t$i").mkString(" ")),  // short → whole doc
      (3L, (1 to 64).map(i => s"t$i").mkString(" ")),  // exactly C → 1
      (4L, (1 to 65).map(i => s"t$i").mkString(" "))   // C+1 → short tail
    ).toDF("doc_id", "text")
    val out = graft.queries.Pipeline
      .ragChunks(docs, chunkTok = 64, stride = 48).collect()
    val byDoc = out
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted.toSeq }
    // stride-48 windows of 64: starts 1, 49, 97; tail is short, never
    // re-read; consecutive full chunks overlap exactly 64-48 tokens
    assert(byDoc(1L) == Seq((0, 1, 64), (1, 49, 64), (2, 97, 34)), byDoc(1L))
    assert(byDoc(2L) == Seq((0, 1, 10)))
    assert(byDoc(3L) == Seq((0, 1, 64)))
    assert(byDoc(4L) == Seq((0, 1, 64), (1, 49, 17)))
    // identical chunk TEXT hashes identically across docs — the
    // chunk-level dedup key p25 consumes (doc 3 == doc 1's first window)
    val h = out.map(r => ((r.getLong(0), r.getInt(1)), r.getLong(4))).toMap
    assert(h((1L, 0)) == h((3L, 0)), "equal chunk text must hash equal")
    assert(h((1L, 0)) != h((1L, 1)), "different windows must differ")
  }

  test("p86 CDC chunks: an edit near the start leaves the tail's chunk hashes intact") {
    import spark.implicits._
    // 400 deterministic tokens; the edited twin inserts ONE token at
    // position 3 — content-defined boundaries realign right after the
    // perturbed grams, so every later chunk hash SURVIVES (the
    // rsync/FastCDC property); fixed-size windows would shift the
    // whole tail
    val toks = (1 to 400).map(i => s"w${(i * 2654435761L) % 997}")
    val edited = (toks.take(3) :+ "INSERTED") ++ toks.drop(3)
    val docs = Seq((1L, toks.mkString(" ")), (2L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.queries.Pipeline.cdcChunks(docs).collect()
    val orig = out.filter(_.getLong(0) == 1L).map(_.getLong(4)).toSet
    val edit = out.filter(_.getLong(0) == 2L).map(_.getLong(4)).toSet
    val shared = orig.intersect(edit).size
    // all but the few chunks around the insertion point are shared
    assert(orig.size > 10, s"expected many chunks, got ${orig.size}")
    assert(shared >= orig.size - 3,
      s"CDC lost shift-invariance: only $shared of ${orig.size} " +
        "chunk hashes survived a 1-token insertion")
    // and the chunks are genuinely content-defined: interior
    // boundaries, not one whole-doc chunk
    assert(out.count(_.getLong(0) == 1L) > 10)
  }
}
