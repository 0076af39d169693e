package graft.sources

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets

/** Versioned SERVING MANIFEST for the stored IVFADC index — the
  * table-format contract the bare `partitionBy(cell)` store lacks.
  * The store now has four mutation paths (build / partition-append /
  * compaction / forget) and, without a manifest, "which directory is
  * live" is convention: a reader that lists the data dir while a
  * compaction finishes sees half of two snapshots. This object makes
  * the snapshot an ARTIFACT, using the public version-log pattern
  * (Delta/Iceberg-style): data files are immutable and write-once, a
  * snapshot is an explicit FILE LIST plus a model-generation pointer,
  * and a commit is one atomic rename into a monotonically numbered
  * log. Readers never lock: `open` lists the log, takes the highest
  * committed version, and reads exactly that snapshot's files — a
  * concurrent writer can commit, compact, even vacuum (outside the
  * retention window) without perturbing an open reader.
  *
  * Layout under the store root:
  * {{{
  *   data/v%09d-<uuid>/cell_pt=<c>/part-*.parquet   // attempt-unique
  *   models/g%09d-<uuid>/{cents,codebook}.parquet   // model generations
  *   log/v%09d.commit                               // one manifest each
  * }}}
  *
  *  - Data files carry (nn_id, cell, codes) IN the data (`cell_pt` is a
  *    duplicate partition column for directory hygiene): a manifest
  *    reader opens leaf FILES, so pruning is file-level — the manifest
  *    records each file's cell, and [[codesForCells]] reads only the
  *    probed cells' files (data skipping without directory discovery).
  *  - A commit writes its episode dir and model generation FIRST, then
  *    publishes by renaming a fully-written temp manifest to
  *    `log/v%09d.commit`. Rename-no-overwrite is atomic on HDFS and
  *    refuses an existing destination, so two racing writers of the
  *    same version produce one winner and one clean retryable loser
  *    (the loser's episode dir is unreferenced garbage for [[vacuum]]).
  *    On S3-class stores the same commit maps to a conditional PUT.
  *  - Version logs are never rewritten: a reader's `open` is a
  *    consistent point-in-time view, and [[openVersion]] pins any
  *    retained historical snapshot (time travel).
  *
  * Mutation cost model at 100 TB: APPEND writes only the increment's
  * files (the parent's file list is inherited by reference — no data
  * rewrite, no small-files rewrite); COMPACT writes one file per
  * occupied cell and swaps the whole list; FORGET rewrites only the
  * files of cells that actually held doomed rows (bounded by the
  * deleted set's cell footprint); REBUILD starts a new model
  * generation. All four leave every older snapshot intact until
  * [[vacuum]] reclaims files outside the retention window.
  */
object IndexStore {

  /** The (nn_id, cell, codes) schema every snapshot's data files hold. */
  val CodesSchema: StructType = StructType(Seq(
    StructField("nn_id", LongType),
    StructField("cell", IntegerType),
    StructField("codes", ArrayType(IntegerType))))

  /** One committed snapshot: `files` are store-root-relative paths,
    * `fileCells` the per-file cell id parsed from the path (the data-
    * skipping key), `modelGen` the logical generation counter and
    * `modelDir` the store-relative dir of the frozen models serving
    * it (attempt-unique — two writers racing a rebuild never share a
    * model directory, same as data episodes). */
  case class Snapshot(version: Long, op: String, modelGen: Long,
                      modelDir: String, nRows: Long, cells: Int,
                      files: Seq[String], fileCells: Seq[Int],
                      cents: Array[Array[Double]],
                      cb: Array[Array[Array[Double]]])

  private def fs(s: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def vName(v: Long) = f"v$v%09d"

  // ---- model-generation persistence (driver-bounded metadata) ----

  /** Write one model generation into an attempt-unique dir; returns
    * its store-relative path (the manifest records it). */
  private def writeModels(s: SparkSession, root: String, gen: Long,
                          cents: Array[Array[Double]],
                          cb: Array[Array[Array[Double]]]): String = {
    import s.implicits._
    val rel = f"models/g$gen%09d-${java.util.UUID.randomUUID().toString.take(8)}"
    val dir = s"$root/$rel"
    cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cell", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/cents.parquet")
    cb.zipWithIndex.flatMap { case (sub, si) =>
      sub.zipWithIndex.map { case (v, ci) => (si, ci, v.toSeq) }
    }.toSeq.toDF("sub", "code", "vec")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/codebook.parquet")
    rel
  }

  private def readModels(s: SparkSession, root: String, rel: String)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val dir = s"$root/$rel"
    val cents = s.read.parquet(s"$dir/cents.parquet")
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)
    val cb = s.read.parquet(s"$dir/codebook.parquet")
      .orderBy("sub", "code").collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray))
      .toArray
    (cents, cb)
  }

  // ---- data-episode write + listing ----

  /** Write `rows` (nn_id, cell, codes) as a fresh episode dir for the
    * commit targeting version `v` and return the (relative path, cell)
    * pairs it produced. The episode name is ATTEMPT-unique (version +
    * uuid): two writers racing on the same version must never share a
    * directory — a version-named dir would let the eventual LOSER's
    * overwrite clobber the winner's already-committed files. The
    * `cell` column stays IN the data; `cell_pt` duplicates it as the
    * partition directory. `repartition(cell)` puts each cell's rows in
    * one task → one file per occupied cell per episode (at 100 TB the
    * key becomes a cell→task bin-packing; the shape is the same). */
  private def writeEpisode(s: SparkSession, root: String, v: Long,
                           rows: DataFrame): Seq[(String, Int)] = {
    val rel = s"data/${vName(v)}-${java.util.UUID.randomUUID().toString
      .take(8)}"
    rows.select(col("nn_id"), col("cell"), col("codes"),
        col("cell").as("cell_pt"))
      .repartition(col("cell_pt"))
      .write.mode("overwrite").partitionBy("cell_pt")
      .parquet(s"$root/$rel")
    listEpisode(s, root, rel)
  }

  /** Recursively list one episode dir's part files as store-relative
    * (path, cell) pairs; cell parses from the `cell_pt=` segment. */
  private def listEpisode(s: SparkSession, root: String,
                          rel: String): Seq[(String, Int)] = {
    val f = fs(s, root)
    val p = new Path(s"$root/$rel")
    if (!f.exists(p)) return Seq.empty
    val it = f.listFiles(p, true)
    val out = Seq.newBuilder[(String, Int)]
    while (it.hasNext) {
      val fp = it.next().getPath
      if (fp.getName.startsWith("part-")) {
        val cell = fp.getParent.getName match {
          case n if n.startsWith("cell_pt=") =>
            n.substring("cell_pt=".length).toInt
          case _ => -1
        }
        out += ((s"$rel/${fp.getParent.getName}/${fp.getName}", cell))
      }
    }
    out.result().sortBy(_._1)
  }

  // ---- the version log ----

  /** Serialize + atomically publish version `v`. The manifest is a
    * line-oriented text file (k=v headers + one `file=<cell>\t<path>`
    * line per data file) written FULLY to a temp name, then renamed —
    * rename-no-overwrite is the commit point. Returns false when a
    * concurrent writer won the version (caller re-opens and retries). */
  private def commit(s: SparkSession, root: String, v: Long, op: String,
                     modelGen: Long, modelDir: String, nRows: Long,
                     cells: Int, files: Seq[(String, Int)],
                     txn: Option[(String, Long)] = None): Boolean = {
    val f = fs(s, root)
    f.mkdirs(new Path(s"$root/log"))
    val body = new StringBuilder()
    body ++= s"version=$v\nop=$op\nmodel_gen=$modelGen\n"
    body ++= s"model_dir=$modelDir\n"
    body ++= s"n_rows=$nRows\ncells=$cells\n"
    txn.foreach { case (app, tv) =>
      body ++= s"txn_app=$app\ntxn_version=$tv\n" }
    files.foreach { case (p, c) => body ++= s"file=$c\t$p\n" }
    val tmp = new Path(
      s"$root/log/.tmp-${vName(v)}-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(body.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dest = new Path(s"$root/log/${vName(v)}.commit")
    if (f.exists(dest)) { f.delete(tmp, false); return false }
    val won = f.rename(tmp, dest)
    if (!won) f.delete(tmp, false)
    won
  }

  /** Lightweight manifest record — everything in the log file, models
    * NOT loaded (txn scans and vacuum read many manifests and need no
    * models). */
  private case class Meta(version: Long, op: String, modelGen: Long,
                          modelDir: String, nRows: Long, cells: Int,
                          files: Seq[(String, Int)],
                          txn: Option[(String, Long)])

  private def parseMeta(s: SparkSession, root: String, p: Path): Meta = {
    val f = fs(s, root)
    val in = f.open(p)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      val b = new Array[Byte](8192)
      var n = in.read(b)
      while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val kv = scala.collection.mutable.Map[String, String]()
    val files = Seq.newBuilder[(String, Int)]
    text.linesIterator.foreach { line =>
      val i = line.indexOf('=')
      if (i > 0) {
        val (k, v) = (line.substring(0, i), line.substring(i + 1))
        if (k == "file") {
          val t = v.indexOf('\t')
          files += ((v.substring(t + 1), v.substring(0, t).toInt))
        } else kv(k) = v
      }
    }
    val fl = files.result()
    Meta(kv("version").toLong, kv("op"), kv("model_gen").toLong,
      kv("model_dir"), kv("n_rows").toLong, kv("cells").toInt, fl,
      for { a <- kv.get("txn_app"); tv <- kv.get("txn_version") }
        yield (a, tv.toLong))
  }

  private def metaOf(s: SparkSession, root: String, v: Long): Meta =
    parseMeta(s, root, new Path(s"$root/log/${vName(v)}.commit"))

  private def snapOf(s: SparkSession, root: String, m: Meta): Snapshot = {
    val (cents, cb) = readModels(s, root, m.modelDir)
    Snapshot(m.version, m.op, m.modelGen, m.modelDir, m.nRows, m.cells,
      m.files.map(_._1), m.files.map(_._2), cents, cb)
  }

  /** Highest committed writer-transaction version for `appId`, or None
    * — the idempotent-sink lookup (Delta's txnAppId/txnVersion
    * pattern): a streaming writer stamps each commit with its
    * micro-batch id and skips batches at or below this watermark on
    * replay. A text scan of the log only; no models load. */
  def lastTxnVersion(s: SparkSession, root: String,
                     appId: String): Option[Long] = {
    val txs = versions(s, root)
      .map(v => metaOf(s, root, v))
      .flatMap(_.txn)
      .collect { case (a, tv) if a == appId => tv }
    if (txs.isEmpty) None else Some(txs.max)
  }

  /** All committed versions, ascending (never rewritten → a reader's
    * listing is always a consistent prefix of history). */
  def versions(s: SparkSession, root: String): Seq[Long] = {
    val f = fs(s, root)
    val p = new Path(s"$root/log")
    if (!f.exists(p)) return Seq.empty
    f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".commit"))
      .map(n => n.stripPrefix("v").stripSuffix(".commit").toLong)
      .sorted
  }

  /** The LIVE snapshot: highest committed version. */
  def open(s: SparkSession, root: String): Snapshot =
    openVersion(s, root, versions(s, root).lastOption.getOrElse(
      throw new IllegalStateException(s"empty index store at $root")))

  /** A pinned historical snapshot (time travel) — consistent as long
    * as [[vacuum]]'s retention covers it. */
  def openVersion(s: SparkSession, root: String, v: Long): Snapshot =
    snapOf(s, root, metaOf(s, root, v))

  /** The snapshot's code rows — exactly its manifest's files, read as
    * leaf files (each file's parent is its own base path, so no
    * directory discovery races with concurrent writers). */
  def codes(s: SparkSession, root: String, snap: Snapshot): DataFrame =
    if (snap.files.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        CodesSchema)
    else s.read.schema(CodesSchema)
      .parquet(snap.files.map(p => s"$root/$p"): _*)

  /** File-level pruning: only the files whose cell is in `wanted` —
    * the manifest-reader form of partition pruning (a probe passes its
    * nprobe cells and opens that many files, not the corpus). */
  def codesForCells(s: SparkSession, root: String, snap: Snapshot,
                    wanted: Set[Int]): DataFrame = {
    val picked = snap.files.zip(snap.fileCells)
      .collect { case (p, c) if wanted(c) => s"$root/$p" }
    if (picked.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        CodesSchema)
    else s.read.schema(CodesSchema).parquet(picked: _*)
  }

  // ---- the four mutations + rebuild ----

  /** Initialize the store: train models at the corpus-count cell
    * policy, encode, publish v1. */
  def build(s: SparkSession, root: String, emb: DataFrame): Snapshot = {
    val n = emb.count()
    val cells = Similarity.scaledCells(n)
    val (cents, cb, index) = Similarity.ivfPqIndex(emb, cells)
    val mDir = writeModels(s, root, 1L, cents, cb)
    val files = writeEpisode(s, root, 1L, index)
    require(commit(s, root, 1L, "build", 1L, mDir, n, cells, files),
      s"store at $root already initialized")
    openVersion(s, root, 1L)
  }

  /** Partition-append an increment under the live snapshot's FROZEN
    * models: writes ONLY the increment's files; the parent's file list
    * is inherited by reference — zero data rewrite. */
  def append(s: SparkSession, root: String, newEmb: DataFrame,
             txn: Option[(String, Long)] = None): Snapshot = {
    // idempotent-sink guard: a replayed micro-batch (same appId, batch
    // version <= the committed watermark) must NOT re-append — append
    // duplicates rows where forget's replay was naturally idempotent
    txn.foreach { case (app, tv) =>
      if (lastTxnVersion(s, root, app).exists(tv <= _))
        return open(s, root)
    }
    val snap = open(s, root)
    val v = snap.version + 1
    val rows = Similarity.ivfPqAppend(snap.cents, snap.cb, newEmb)
    val nNew = newEmb.count()
    val newFiles = writeEpisode(s, root, v, rows)
    require(commit(s, root, v, "append", snap.modelGen, snap.modelDir,
      snap.nRows + nNew, snap.cells,
      snap.files.zip(snap.fileCells) ++ newFiles, txn),
      s"concurrent commit of ${vName(v)} at $root")
    openVersion(s, root, v)
  }

  /** Compact the live snapshot: shuffle by cell, rewrite one file per
    * occupied cell, swap the WHOLE file list — content-identical,
    * codes never recomputed. Readers of older versions keep their
    * files (immutable) until vacuum. */
  def compact(s: SparkSession, root: String): Snapshot = {
    val snap = open(s, root)
    val v = snap.version + 1
    val newFiles = writeEpisode(s, root, v, codes(s, root, snap))
    require(commit(s, root, v, "compact", snap.modelGen, snap.modelDir,
      snap.nRows, snap.cells, newFiles),
      s"concurrent commit of ${vName(v)} at $root")
    openVersion(s, root, v)
  }

  /** Right-to-be-forgotten against the STORE: rewrite ONLY the files
    * of cells that actually hold doomed rows (the deleted set's cell
    * footprint — bounded by the erasure request, never a full
    * rewrite); every other file is inherited by reference. Idempotent:
    * forgetting already-absent ids touches no cell and commits a
    * content-identical snapshot — the property the streamed erasure
    * path's replay correctness rests on. */
  def forget(s: SparkSession, root: String,
             deletedIds: DataFrame): Snapshot = {
    val snap = open(s, root)
    val v = snap.version + 1
    val all = codes(s, root, snap)
    val del = deletedIds.select(col("vec_id").as("nn_id")).distinct()
    // doomed count + doomed CELL set in ONE pass over the store (the
    // cell set is ≤ cells ints — driver-bounded): a second action
    // here would re-open every snapshot file
    val hit = all.join(del, Seq("nn_id"), "left_semi")
      .agg(count(lit(1)), collect_set(col("cell"))).head()
    val nDel = hit.getLong(0)
    val doomedCells = hit.getSeq[Int](1).toSet
    val keptFiles = snap.files.zip(snap.fileCells)
      .filterNot { case (_, c) => doomedCells(c) }
    val rewritten =
      if (doomedCells.isEmpty) Seq.empty[(String, Int)]
      else writeEpisode(s, root, v,
        codesForCells(s, root, snap, doomedCells)
          .join(del, Seq("nn_id"), "left_anti"))
    require(commit(s, root, v, "forget", snap.modelGen, snap.modelDir,
      snap.nRows - nDel, snap.cells, keptFiles ++ rewritten),
      s"concurrent commit of ${vName(v)} at $root")
    openVersion(s, root, v)
  }

  /** Full re-provision under a NEW model generation (the reindex
    * trigger's action): retrain at the current corpus count, re-encode,
    * publish — older snapshots keep serving their own generation. */
  def rebuild(s: SparkSession, root: String, emb: DataFrame): Snapshot = {
    val snap = open(s, root)
    val v = snap.version + 1
    val gen = snap.modelGen + 1
    val n = emb.count()
    val cells = Similarity.scaledCells(n)
    val (cents, cb, index) = Similarity.ivfPqIndex(emb, cells)
    val mDir = writeModels(s, root, gen, cents, cb)
    val files = writeEpisode(s, root, v, index)
    require(commit(s, root, v, "rebuild", gen, mDir, n, cells, files),
      s"concurrent commit of ${vName(v)} at $root")
    openVersion(s, root, v)
  }

  /** Physical cleanup: delete data files referenced by NO retained
    * version (the last `retainLast` commits) and model generations no
    * retained version serves. Log files are never deleted (they are
    * the history; bytes are trivial). Pinned readers older than the
    * retention window break — the documented contract, same as any
    * table format. Returns (data entries removed — one per whole
    * episode dir or stray file, model gens removed). */
  def vacuum(s: SparkSession, root: String,
             retainLast: Int = 2): (Long, Long) = {
    val f = fs(s, root)
    val vs = versions(s, root)
    val retained = vs.takeRight(math.max(retainLast, 1))
      .map(v => metaOf(s, root, v))
    val liveFiles = retained.flatMap(_.files.map(_._1)).toSet
    val liveModelDirs = retained.map(_.modelDir).toSet
    var removedF = 0L
    val dataRoot = new Path(s"$root/data")
    if (f.exists(dataRoot)) {
      val rootQ = f.makeQualified(new Path(root)).toString
      // fully-unreferenced episode dirs are decided from the MANIFESTS
      // alone and removed with one recursive delete each — never
      // listed (a flat list-then-delete sweep measured ~10 s at the
      // 10× stress purely on small-file stat/unlink round trips);
      // only episodes some retained snapshot still references get a
      // per-file pass
      val liveEpisodes = liveFiles.map(_.split('/').take(2).mkString("/"))
      f.listStatus(dataRoot).foreach { ep =>
        val epRel = s"data/${ep.getPath.getName}"
        if (!liveEpisodes(epRel)) {
          if (f.delete(ep.getPath, true)) removedF += 1
        } else {
          val it = f.listFiles(ep.getPath, true)
          val doomed = Seq.newBuilder[Path]
          while (it.hasNext) {
            val p = it.next().getPath
            val rel = p.toString.stripPrefix(rootQ).stripPrefix("/")
            if (p.getName.startsWith("part-") && !liveFiles(rel))
              doomed += p
          }
          doomed.result().foreach { p =>
            if (f.delete(p, false)) removedF += 1
          }
        }
      }
    }
    var removedG = 0L
    val modelsRoot = new Path(s"$root/models")
    if (f.exists(modelsRoot)) {
      f.listStatus(modelsRoot).foreach { st =>
        if (!liveModelDirs(s"models/${st.getPath.getName}")) {
          if (f.delete(st.getPath, true)) removedG += 1
        }
      }
    }
    (removedF, removedG)
  }
}
