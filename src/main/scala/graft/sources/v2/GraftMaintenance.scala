package graft.sources.v2

import java.io.File

/** Store maintenance: generation EXPIRY (the VACUUM that bounds how
  * much history time travel retains). Commits never delete files —
  * that is what keeps every snapshot readable — so an unbounded store
  * accumulates every generation's rewrite forever; expiry is the
  * documented policy lever (the same role the reference's FASTER
  * checkpoint cadence plays, NodeAttrIndex.cs:74,115-121, and
  * `spark.graft.dedupIndex.maxGenerations` plays for the dedup
  * index).
  */
object GraftMaintenance {

  /** Drop every generation older than the newest `keepGens`, then
    * delete any data file referenced ONLY by dropped generations —
    * plus orphans no manifest references at all (the residue of
    * crashed/aborted writes). Returns (droppedGens, deletedFiles).
    *
    * Readers of RETAINED generations are untouched: their manifests
    * and every file they reference survive. Time travel simply
    * shortens — `VERSION AS OF` below the horizon now fails with a
    * missing-manifest error instead of silently reading bad data. */
  def expire(root0: String, keepGens: Int,
             orphanGraceMs: Long = 10L * 60 * 1000): (Seq[Long], Seq[String]) =
    synchronized {
      require(keepGens >= 1, "must keep at least the live generation")
      val root = GraftTable.norm(root0)
      val gens = StoreManifest.generations(root)
      val (drop, keep) = gens.splitAt(math.max(0, gens.size - keepGens))
      val live = keep.flatMap(g => StoreManifest.read(root, g).files).toSet
      // files referenced ONLY by dropped manifests are always safe to
      // sweep (they were committed, and append commits merge against
      // the latest manifest under the lock, so no in-flight write can
      // re-reference them). UNREFERENCED files are ambiguous: aborted-
      // write residue looks identical to an IN-FLIGHT write whose
      // manifest commit is imminent — deleting those would silently
      // lose a racing append's data. Those only go once older than the
      // grace window (no legitimate write runs for orphanGraceMs).
      val droppedRefs =
        drop.flatMap(g => StoreManifest.read(root, g).files).toSet
      val cutoff = System.currentTimeMillis() - orphanGraceMs
      val dataDir = new File(s"$root/data")
      val deleted = Option(dataDir.listFiles()).toSeq.flatten
        .filter { f =>
          val rel = s"data/${f.getName}"
          f.isFile && !live.contains(rel) &&
            (droppedRefs.contains(rel) || f.lastModified() < cutoff)
        }
        .map { f => f.delete(); s"data/${f.getName}" }
      drop.foreach(g =>
        new File(StoreManifest.genPath(root, g)).delete(): Unit)
      // the grace window is an ASSERTED invariant ("no legitimate write
      // runs for orphanGraceMs"), not an enforced one: an append that
      // outlives it could have had its files swept above and then
      // commit a manifest referencing them. Validate instead of trusting
      // — re-list generations (a commit may have landed during the
      // sweep) and check every retained manifest's files still exist;
      // a miss fails LOUDLY here, at the maintenance call, instead of
      // surfacing later as a silent unreadable table.
      val retained = StoreManifest.generations(root)
      val missing = retained.flatMap { g =>
        StoreManifest.read(root, g).files.filterNot(f =>
          new File(s"$root/$f").exists()).map(f => s"gen $g: $f")
      }
      if (missing.nonEmpty)
        throw new IllegalStateException(
          "graft expire: retained manifest references deleted data " +
            "files (a write outlived the orphan grace window of " +
            s"${orphanGraceMs} ms and raced the sweep) — restore from " +
            "backup or re-append the lost batch: " +
            missing.take(10).mkString("; "))
      (drop, deleted)
    }
}
