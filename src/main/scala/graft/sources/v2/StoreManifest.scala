package graft.sources.v2

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.types.{DataType, StructType}

/** One committed generation of a graft V2 store: the LIVE file set at
  * that point in time. Files are immutable once written and NEVER
  * deleted by a commit — an append's new generation references
  * parent ∪ new, an overwrite/compaction's references only its own
  * rewrite — so any earlier generation stays readable (snapshot
  * time travel over the storage history, the analog of the
  * reference's versioned data model: types.proto:55-59 keeps every
  * fragment; Printers.cs:139-152 renders the history view).
  */
case class StoreGen(gen: Long, commitMs: Long, schemaDdl: String,
                    bucketCol: String, numBuckets: Int,
                    files: Seq[String],
                    kind: String = StoreManifest.KindAppend) {
  def schema: StructType =
    DataType.fromDDL(schemaDdl).asInstanceOf[StructType]
}

/** Manifest IO for a store root directory:
  *
  *   <root>/gen-00000.json, gen-00001.json, ...   (commit log)
  *   <root>/data/part-<uuid>_<bucket%05d>.parquet (immutable data)
  *
  * Commits are atomic at the filesystem level: the manifest writes to
  * a temp name and moves into place (ATOMIC_MOVE), so a reader never
  * observes a half-written generation; the latest complete gen-*.json
  * IS the table. A crashed write leaves orphan data files that no
  * manifest references — harmless, collected by a compaction rewrite.
  */
object StoreManifest {

  /** Commit kinds: an APPEND adds rows (its file delta vs the parent
    * is new data — what a streaming reader emits); an OVERWRITE is a
    * rewrite of existing data (compaction / replace — INVISIBLE to a
    * streaming reader, which already emitted those rows). */
  val KindAppend = "append"
  val KindOverwrite = "overwrite"

  def genPath(root: String, gen: Long): String =
    f"${GraftTable.norm(root)}/gen-$gen%05d.json"

  def dataDir(root: String): String = s"$root/data"

  /** All committed generation numbers, ascending. */
  def generations(root: String): Seq[Long] = {
    val d = new File(GraftTable.norm(root))
    Option(d.listFiles()).toSeq.flatten
      .map(_.getName)
      .collect { case n if n.startsWith("gen-") && n.endsWith(".json") =>
        n.stripPrefix("gen-").stripSuffix(".json").toLong }
      .sorted
  }

  def latest(root: String): Option[Long] = generations(root).lastOption

  def read(root: String, gen: Long): StoreGen = {
    val txt = new String(
      Files.readAllBytes(Paths.get(genPath(root, gen))),
      StandardCharsets.UTF_8)
    val j = JsonMethods.parse(txt)
    implicit val fmt: Formats = DefaultFormats
    StoreGen(
      (j \ "gen").extract[Long], (j \ "commitMs").extract[Long],
      (j \ "schemaDdl").extract[String],
      (j \ "bucketCol").extract[String],
      (j \ "numBuckets").extract[Int],
      (j \ "files").extract[Seq[String]],
      (j \ "kind").extractOrElse[String](KindAppend))
  }

  def readLatest(root: String): Option[StoreGen] =
    latest(root).map(read(root, _))

  /** Commit a new generation; returns it. Synchronization is per-JVM
    * (local[] stand-in); a cluster deployment would route commits
    * through a metastore/lock service exactly like other table
    * formats do. */
  def commit(root: String, schema: StructType, bucketCol: String,
             numBuckets: Int, files: Seq[String],
             kind: String = KindAppend): StoreGen = synchronized {
    val gen = latest(root).fold(0L)(_ + 1L)
    commitAsGen(root, gen, schema, bucketCol, numBuckets, files, kind)
  }

  /** Append commit that merges its delta against the latest manifest
    * INSIDE the lock: two concurrent appends in one JVM (a streaming
    * foreachBatch racing a batch write) each land parent∪own with
    * neither dropping the other's files — the read-modify-write the
    * caller-side `gen.files ++ added` pattern raced on. */
  def commitAppend(root: String, schema: StructType, bucketCol: String,
                   numBuckets: Int, added: Seq[String]): StoreGen =
    synchronized {
      val parent = readLatest(root).map(_.files).getOrElse(Seq.empty)
      val gen = latest(root).fold(0L)(_ + 1L)
      commitAsGen(root, gen, schema, bucketCol, numBuckets,
        parent ++ added, KindAppend)
    }

  private def commitAsGen(root: String, gen: Long, schema: StructType,
      bucketCol: String, numBuckets: Int, files: Seq[String],
      kind: String): StoreGen = synchronized {
    val sg = StoreGen(gen, System.currentTimeMillis(), schema.toDDL,
      bucketCol, numBuckets, files, kind)
    val json = JsonMethods.pretty(JsonMethods.render(
      JObject(
        "gen" -> JLong(sg.gen),
        "commitMs" -> JLong(sg.commitMs),
        "schemaDdl" -> JString(sg.schemaDdl),
        "bucketCol" -> JString(sg.bucketCol),
        "numBuckets" -> JInt(sg.numBuckets),
        "kind" -> JString(sg.kind),
        "files" -> JArray(sg.files.toList.map(JString(_))))))
    new File(root).mkdirs()
    val tmp = Paths.get(s"${genPath(root, gen)}.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(genPath(root, gen)),
      StandardCopyOption.ATOMIC_MOVE)
    sg
  }

  /** Resolve the generation a reader asked for: an explicit gen, a
    * commit-timestamp upper bound, or latest. */
  def resolve(root: String, gen: Option[Long],
              asOfMs: Option[Long]): StoreGen = {
    val g = gen.orElse(asOfMs.map { ms =>
      val ok = generations(root).map(read(root, _))
        .filter(_.commitMs <= ms)
      require(ok.nonEmpty, s"no generation committed at or before $ms")
      ok.last.gen
    }).orElse(latest(root)).getOrElse(
      throw new IllegalArgumentException(s"no graft store at $root"))
    read(root, g)
  }
}
