package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Recall / detection guarantees of the approximate near-dup and ANN
  * paths, checked against exact baselines (the reference tests
  * nondeterministic paths with invariants the same way,
  * src/core.tests/Tests.fs:882-900).
  */
class LshSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    val base = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").limit(200).cache()
    val t = TextOps.tokens(col("text"))
    val twins = base.select((col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(t, lit(1), greatest(size(t) - 3, lit(1)))).as("text"))
    base.unionAll(twins)
  }

  /** Full planted-twins corpus (no limit) — the p32/p33 queries' input. */
  private lazy val twinsCorpus = {
    val base = graft.Tables(spark, sfDir, "documents").select("doc_id", "text")
    val t = TextOps.tokens(col("text"))
    base.unionAll(base.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(t, lit(1), greatest(size(t) - 3, lit(1)))).as("text")))
  }

  /** Exact-Jaccard ≥0.5 ground-truth pairs over [[twinsCorpus]] by an
    * independent path (string shingles, all-pairs cross join) — shared
    * by the p32 partition pin and the p33 rollup pin. */
  private lazy val exactPairs: Array[(Long, Long)] = {
    val sh = twinsCorpus.select(col("doc_id"),
      TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh")).cache()
    sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
      .crossJoin(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")))
      .where(col("a_id") < col("b_id"))
      .where(TextOps.jaccard(col("a_sh"), col("b_sh")) >= 0.5)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
  }

  test("p05 per-row native banding == the explode/aggregate pipeline") {
    // p05's pair source swapped explode → k-min-aggregate for the
    // native per-row XxMinhashSigs; the hashes are the same fold, so
    // the VERIFIED PAIR SET must be bit-identical. Rebuild the old
    // pipeline literally (k=32, b=8, r=4 — p05's parameters) and
    // compare against the shipped query.
    val shipped = graft.SparkEntry
      .queries("p05_minhash_lsh")(spark, sfDir)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hs = twinsCorpus
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        array_sort(transform(TextOps.shingles(col("tk"), 3),
          sh => xxhash64(sh))).as("sh")).cache()
    val sig = TextOps.minhash(hs, "doc_id", col("sh"), k = 32)
    val cand = TextOps.candidatePairs(
      TextOps.bands(sig, "doc_id", b = 8, r = 4), "doc_id")
    val legacy = cand
      .join(hs.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(hs.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .where(TextOps.jaccardSorted(col("a_sh"), col("b_sh")) >= 0.5)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shipped == legacy,
      s"only-shipped=${(shipped -- legacy).take(5)} " +
        s"only-legacy=${(legacy -- shipped).take(5)}")
  }

  test("minhash-LSH recovers >=90% of planted near-dup twins") {
    val withSh = docs.select(col("doc_id"),
      TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    val sig = TextOps.minhash(withSh, "doc_id", col("sh"), k = 32)
    val cand = TextOps.candidatePairs(TextOps.bands(sig, "doc_id", b = 8, r = 4), "doc_id")
    val found = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = docs.where(col("doc_id") < 1000000)
      .select("doc_id").as[Long].collect()
      .map(i => (i, i + 1000000L)).toSet
    val recall = planted.count(found.contains).toDouble / planted.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("p05/p06 survivors: precision 1.0 vs independent exact recompute") {
    // the verify stage is the precision guarantee — if its join keys or
    // threshold silently weakened, false pairs would survive. Recompute
    // ground truth over a path the queries DON'T use (string shingles
    // instead of xxhash64'd longs; signatures re-derived from text) and
    // require zero survivors below the documented thresholds.
    val base = graft.Tables(spark, sfDir, "documents").select("doc_id", "text")
    val t = TextOps.tokens(col("text"))
    val corpus = base.unionAll(base.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(t, lit(1), greatest(size(t) - 3, lit(1)))).as("text")))
      .cache()

    val sh = corpus.select(col("doc_id"),
      TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    val p05 = graft.SparkEntry.queries("p05_minhash_lsh")(spark, sfDir)
    val p05Pairs = p05.count()
    assert(p05Pairs > 0)
    val belowJac = p05
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .where(TextOps.jaccard(col("a_sh"), col("b_sh")) < 0.5)
      .count()
    assert(belowJac == 0,
      s"$belowJac of $p05Pairs p05 pairs below Jaccard 0.5 — verify stage weakened")

    val sig = TextOps.simhash(corpus, "doc_id", TextOps.tokens(col("text")))
    val p06 = graft.SparkEntry.queries("p06_simhash_neardup")(spark, sfDir)
    val p06Pairs = p06.count()
    assert(p06Pairs > 0)
    val beyondHam = p06
      .join(sig.select(col("doc_id").as("a_id"), col("simhash").as("a_s")), "a_id")
      .join(sig.select(col("doc_id").as("b_id"), col("simhash").as("b_s")), "b_id")
      .where(bit_count(col("a_s").bitwiseXOR(col("b_s"))) > 6)
      .count()
    assert(beyondHam == 0,
      s"$beyondHam of $p06Pairs p06 pairs beyond Hamming 6 — verify stage weakened")
  }

  test("p32: LSH dedup clusters == exact-Jaccard clusters (composition)") {
    // ground truth by an independent path (string shingles, exact
    // all-pairs Jaccard, test-side union-find); the executed pipeline
    // (LSH bands → connectedComponents → canonical resolution) must
    // produce the IDENTICAL partition of the planted-twins corpus —
    // this is the "at scale the same plan consumes LSH pairs" claim as
    // tested code rather than a comment.
    assert(exactPairs.nonEmpty)

    // min-root union-find: canonical = min member id, the p32 contract
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    exactPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val allIds = twinsCorpus.select("doc_id").as[Long].collect()
    val expected = allIds.map(i => i -> find(i)).toMap
    val expectedSizes = expected.values.groupBy(identity).map {
      case (c, xs) => c -> xs.size.toLong
    }

    val got = graft.SparkEntry.queries("p32_lsh_dedup_pipeline")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val gotMap = got.map(g => g._1 -> g._2).toMap
    assert(gotMap == expected, {
      val diff = gotMap.collect {
        case (k, v) if expected.get(k) != Some(v) => (k, v, expected.get(k))
      }
      s"partition diverged on ${diff.size} docs: ${diff.take(5)}"
    })
    // per-row consistency: cluster_size matches the partition, keep
    // marks exactly the canonical member
    got.foreach { case (id, canon, size, keep) =>
      assert(size == expectedSizes(canon), s"doc $id size")
      assert(keep == (id == canon), s"doc $id keep flag")
    }
  }

  test("p33: LSH contamination rollup == exact-pair rollup") {
    // the rollup is only as good as its pair source: require the
    // (src_lo, src_hi) counts over the 32×2 LSH pairs to equal the
    // counts over the independently computed exact-Jaccard pair set —
    // on the planted corpus the high-recall banding recovers the exact
    // pair SET (stronger than p32's partition equality, which larger
    // clusters could satisfy with missing internal pairs)
    val srcOf = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def src(id: Long) = srcOf(id % 1000000L)
    val expected = exactPairs.toSeq
      .map { case (a, b) =>
        val (x, y) = (src(a), src(b))
        (if (x <= y) (x, y) else (y, x)) -> 1L
      }
      .groupBy(_._1).map { case (k, xs) => k -> xs.size.toLong }
    val got = graft.SparkEntry.queries("p33_contamination_lsh")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == expected,
      s"rollup diverged: only-got=${(got.toSet -- expected.toSet).take(3)} " +
        s"only-expected=${(expected.toSet -- got.toSet).take(3)}")
  }

  test("sketch aggregates stay within documented error of exact") {
    val q33 = graft.SparkEntry.queries("q33_approx_sketch")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = graft.Tables(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (d, m)) =>
      val (ad, p50) = q33(k)
      assert(math.abs(ad - d).toDouble / d < 0.05,
        s"$k approx distinct $ad vs exact $d")  // HLL++ rsd default 5%
      assert(math.abs(p50 - m) / m < 0.05, s"$k approx p50 $p50 vs exact $m")
    }
  }

  test("IVF ANN recovers most of the exact top-5 (recall vs p09)") {
    def pairs(name: String) =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("p09_ann_topk")
    val ivf = pairs("p14_ann_ivf")
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall") // nprobe=2 of 8 cells
  }

  test("simhash places twins within small hamming distance") {
    val sig = TextOps.simhash(docs, "doc_id", TextOps.tokens(col("text")))
    val a = sig.select(col("doc_id").as("a_id"), col("simhash").as("a_sim"))
    val b = sig.select((col("doc_id") - 1000000L).as("a_id"), col("simhash").as("b_sim"))
    val d = a.join(b, "a_id")
      .select(bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).as("h"))
      .agg(avg("h"), max("h")).head()
    assert(d.getDouble(0) <= 4.0, s"avg hamming ${d.getDouble(0)}")
  }

  test("p49 mirror: pigeonhole recall (every pair <=5 emitted) vs test-side recompute") {
    // independent JVM reimplementation of p49's fingerprint (poly fold +
    // avalanche + tf bit votes) — the engine result must contain EVERY
    // pair at Hamming <= 5 (6 chunks of 10 bits: <= 5 flips leave one
    // chunk clean), and most planted twins at the <= 6 gate
    val P = 1000000007L
    def fp(text: String): Long = {
      val votes = new Array[Long](60)
      text.split("\\s+").filter(_.nonEmpty).foreach { tok =>
        var h = 7L
        tok.foreach(c => h = (h * 131 + c.toLong) % P)
        val h1 = h * 2654435761L % P
        val h2 = (h * 1779033703L + 104729L) % P
        (0 until 30).foreach { j =>
          votes(j) += (if (((h1 >> j) & 1L) == 1L) 1 else -1)
          votes(30 + j) += (if (((h2 >> j) & 1L) == 1L) 1 else -1)
        }
      }
      (0 until 60).map(j => if (votes(j) > 0) 1L << j else 0L).sum
    }
    val base = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val twins = base.map { case (id, t) =>
      val tk = t.split("\\s+").filter(_.nonEmpty)
      (id + 1000000L, tk.take(math.max(tk.length - 3, 1)).mkString(" "))
    }
    val sigs = (base ++ twins).map { case (id, t) => (id, fp(t)) }
    val close5 = for {
      (a, fa) <- sigs; (b, fb) <- sigs
      if a < b && java.lang.Long.bitCount(fa ^ fb) <= 5
    } yield (a, b)
    val out = graft.SparkEntry.queries("p49_simhash_mirror")(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = close5.filterNot(out.contains)
    assert(missed.isEmpty, s"pigeonhole violated: ${missed.take(5).toSeq}")
    val twinHits = base.map { case (id, _) => (id, id + 1000000L) }
      .count(out.contains)
    assert(twinHits >= base.length * 0.7,
      s"twin recall $twinHits/${base.length}")
  }

  test("p11 bucketed near-dup: subset of + high recall vs exact witness, no cartesian") {
    // the registry p11 is the BUCKETED arm (hyperplane-LSH candidates);
    // this is its exact all-pairs witness (the p04 pattern): banding
    // may only PRUNE pairs (precision 1.0 structurally — the verify
    // stage applies the same cosine > 0.9 gate), and on the planted-
    // twins corpus it must recall nearly all of them.
    val q = graft.SparkEntry.queries("p11_embed_neardup")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "headline p11 plan must not be all-pairs:\n" + plan.take(2000))
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = graft.Tables(spark, sfDir, "embeddings")
      .where(col("vec_id") < 500)
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    val all = e.unionAll(e.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("v"), (x, i) =>
        x + when(i === 0, lit(0.05)).otherwise(lit(0.0))).as("v")))
    val exact = all.select(col("vec_id").as("a_id"), col("v").as("av"))
      .crossJoin(all.select(col("vec_id").as("b_id"), col("v").as("bv")))
      .where(col("a_id") < col("b_id"))
      .where(VectorOps.cosineFast(col("av"), col("bv")) > 0.9)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact),
      s"banding emitted ${(got -- exact).take(5)} not in exact set")
    assert(exact.nonEmpty)
    val recall = got.size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall (${got.size}/${exact.size})")
  }

  test("LSH ANN top-3 has nonzero overlap with brute-force top-3 and finds the planted twin") {
    val e = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    val twins = e.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("v"), (x, i) => x + when(i === 0, lit(0.05)).otherwise(lit(0.0))).as("v"))
    val all = e.unionAll(twins).cache()

    val planes = VectorOps.hyperplanes(tables = 4, planes = 8, dim = 64)
    val buckets = VectorOps.lshBuckets(all, "vec_id", col("v"), planes)
    val q = buckets.where(col("vec_id") < 20)
      .select(col("table_idx"), col("sig"), col("vec_id").as("q_id"))
    val cand = q.join(buckets, Seq("table_idx", "sig"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id")).distinct()
      .join(all.select(col("vec_id").as("q_id"), col("v").as("qv")), "q_id")
      .join(all.select(col("vec_id").as("n_id"), col("v").as("nv")), "n_id")
      .withColumn("cos", VectorOps.cosine(col("qv"), col("nv")))

    // the twin (cosine ~0.999) must always land in the same buckets:
    // a tiny perturbation rarely flips any of 8 sign bits in 4 tables
    val twinFound = cand.where(col("n_id") === col("q_id") + 1000000L)
      .select("q_id").distinct().count()
    assert(twinFound >= 18, s"twin found for only $twinFound/20 queries")

    // and its cosine tops the candidate ranking
    val top1 = cand.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("cos").desc)))
      .where(col("rn") === 1 && col("n_id") === col("q_id") + 1000000L)
      .count()
    assert(top1 >= 18, s"twin ranked top-1 for only $top1/20 queries")
  }

  test("PQ ANN recovers most of the exact L2 top-5 (quantization recall)") {
    val e = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    // exact L2 top-5 for the same 3 query vectors p31 uses
    val q = e.where(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val exact = q.crossJoin(e).where(col("q_id") =!= col("vec_id"))
      .withColumn("d", aggregate(
        zip_with(col("qv"), col("v"), (x, y) => (x - y) * (x - y)),
        lit(0.0d), _ + _))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("d"), col("vec_id"))))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = graft.SparkEntry.queries("p31_ann_pq")(spark, sfDir)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(pq.contains).toDouble / exact.size
    assert(recall >= 0.4,
      s"PQ recall $recall — 8x16 codebooks shouldn't quantize this badly")
  }

  test("q44 sketch merge: lossless union, estimates within HLL error") {
    val out = graft.SparkEntry.queries("q44_sketch_merge")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // merged-from-partials must equal the direct whole-table sketch
    // (HLL union at fixed lgK is lossless)
    val direct = graft.Tables(spark, sfDir, "lineitem")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 12))"))
      .first().getLong(0)
    assert(out("ALL") == direct,
      s"merged ${out("ALL")} != direct $direct — union lost precision")
    // and each estimate sits within the documented rel. error (~1.6% at
    // lgK=12; allow 5%)
    val exact = graft.Tables(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, d) =>
      assert(math.abs(out(k) - d).toDouble / d < 0.05, s"$k: ${out(k)} vs $d")
    }
  }
}
