package graft.operators

/** Keyed on-disk artifact installation — the shared machinery behind
  * the stored media fixture ([[Multimodal.MediaLake]]) and the stored
  * vector index ([[Similarity]]'s ensureIndex). One copy of the
  * concurrency-sensitive invariants, bug-fixed in one place:
  *
  *  - a target dir is COMPLETE iff a top-level `_SUCCESS` exists, and
  *    the marker is the LAST thing written before the rename;
  *  - a target without the marker is a crashed writer's leftovers —
  *    but the marker is re-checked IMMEDIATELY before deleting, so a
  *    completed artifact another process renamed into place since the
  *    outer check is never removed out from under a reader;
  *  - staging dirs are per-writer-unique (UUID suffix), so racing
  *    processes cannot overwrite-delete each other mid-write and
  *    install a mixed artifact under a marker;
  *  - losing the rename race is SUCCESS when (and only when) the
  *    builder is deterministic and the target path keys everything the
  *    bytes depend on — both callers guarantee this (fixture/index
  *    version + knob + data-fingerprint keys).
  */
private[operators] object ArtifactLake {

  /** Install `target` if not already complete. `build` populates the
    * passed staging dir; a `_SUCCESS` the build itself created (e.g. a
    * parquet commit into the staging root) is honored, otherwise one
    * is created after `build` returns. Returns true iff THIS call
    * performed the build (false = already installed, or lost the
    * install race to an identical artifact).
    */
  def ensure(target: java.io.File)(build: java.io.File => Unit): Boolean = {
    if (new java.io.File(target, "_SUCCESS").isFile) return false
    target.getParentFile.mkdirs()
    if (target.exists()) {
      if (new java.io.File(target, "_SUCCESS").isFile) return false
      deleteTree(target)
    }
    val staging = new java.io.File(target.getParentFile,
      s".${target.getName}.staging-${java.util.UUID.randomUUID().toString.take(8)}")
    build(staging)
    val marker = new java.io.File(staging, "_SUCCESS")
    if (!marker.isFile && !marker.createNewFile())
      throw new java.io.IOException(s"artifact marker create failed: $staging")
    if (!staging.renameTo(target)) {
      deleteTree(staging)
      if (!new java.io.File(target, "_SUCCESS").isFile)
        throw new java.io.IOException(s"artifact rename failed: $target")
    }
    true
  }

  def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteTree))
    f.delete()
  }

  /** Fingerprint of a source table's FILE LISTING (names, sizes,
    * mtimes) — a stat-only walk, no data read. Part of an artifact's
    * key: the stored content depends on the source CONTENT, not just
    * the dir path, so a regenerated table at the same path re-keys and
    * can never be served a stale artifact (the failure would otherwise
    * surface as oracle hash-mismatches misdiagnosed as engine bugs —
    * or, for the oracle-less serving paths, as silently wrong
    * results). Non-local paths fall back to path-only keying ("nofp").
    */
  def fingerprint(table: java.io.File): String = try {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val sig = walk(table)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    if (sig.isEmpty) "nofp"
    else java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
  } catch { case _: Exception => "nofp" }

  /** Installed (marker-complete) delta segments under `indexPath` with
    * the given name prefix, name-ordered. Names are content keys, so
    * the order is deterministic but semantically irrelevant — segments
    * are id-disjoint by the writers' guards.
    */
  def segmentDirs(indexPath: String, prefix: String): Seq[java.io.File] = {
    val root = new java.io.File(s"$indexPath/deltas")
    Option(root.listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith(prefix) &&
        new java.io.File(f, "_SUCCESS").isFile)
      .sortBy(_.getName)
  }

  // ------------------------------------------------------------------
  // Compaction generations. A generation is one immutable artifact dir
  // `<indexPath>/gens/gen-<%05d seq>-<key>/` holding the FOLD of every
  // delta segment installed so far (adds merged, tombstones applied)
  // plus `consumed.txt`, the cumulative name list of the segments it
  // subsumes. Serving reads: base tables ∪ current gen's tables ∪ only
  // the UNCONSUMED segments — so after a compact the per-serve union
  // list resets to one dir without deleting anything a racing reader
  // might hold open (segments are only ever ADDED or, explicitly and
  // under the single-writer maintenance contract, vacuumed). Install
  // is the same staged-rename [[ensure]] as every other artifact;
  // losing a race to an identical gen is success.
  // ------------------------------------------------------------------

  /** The newest complete generation under `indexPath`, if any.
    * `gen-%05d-…` names sort lexicographically by sequence.
    */
  def currentGen(indexPath: String): Option[java.io.File] = {
    val root = new java.io.File(s"$indexPath/gens")
    Option(root.listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith("gen-") &&
        new java.io.File(f, "_SUCCESS").isFile)
      .sortBy(_.getName).lastOption
  }

  /** The cumulative set of delta-segment names a generation (or a
    * rebase base — same file contract) subsumes — empty when none is
    * installed.
    */
  def consumedNames(gen: Option[java.io.File]): Set[String] =
    linesOf(gen, "consumed.txt")

  // ------------------------------------------------------------------
  // Rebase bases. A base is one immutable artifact dir
  // `<indexPath>/bases/base-<%05d seq>-<key>/` holding the FULL
  // compaction of the store — root tables ∪ generation ∪ every
  // unconsumed segment, tombstones physically applied — plus
  // `consumed.txt` (every segment name folded in) and `gens.txt`
  // (every generation name subsumed). Serving resolves the newest
  // base as its bottom layer INSTEAD of the root tables, and skips
  // any generation listed in the base's gens.txt — so after heavy
  // churn the per-serve composition collapses back to one table scan
  // without a long-lived store carrying its history forever. Install
  // is the same staged-rename [[ensure]]; nothing is deleted
  // (vacuum remains the maintenance-window step).
  // ------------------------------------------------------------------

  /** The newest complete rebase base under `indexPath`, if any.
    * `base-%05d-…` names sort lexicographically by sequence.
    */
  def currentBase(indexPath: String): Option[java.io.File] = {
    val root = new java.io.File(s"$indexPath/bases")
    Option(root.listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith("base-") &&
        new java.io.File(f, "_SUCCESS").isFile)
      .sortBy(f => f.getName).lastOption
  }

  /** The generation names a rebase base subsumes (its `gens.txt`) — a
    * subsumed generation's tables are already folded into the base and
    * must never re-enter a composition that sees the base.
    */
  def subsumedGens(base: Option[java.io.File]): Set[String] =
    linesOf(base, "gens.txt")

  private def linesOf(dir: Option[java.io.File], name: String): Set[String] =
    dir match {
      case None => Set.empty
      case Some(g) =>
        val f = new java.io.File(g, name)
        if (!f.isFile) Set.empty
        else {
          val src = scala.io.Source.fromFile(f, "UTF-8")
          try src.getLines().map(_.trim).filter(_.nonEmpty).toSet
          finally src.close()
        }
    }

  /** A table dir written by a generation, present only when it holds
    * data (an empty fold writes no files — Spark skips empty
    * partitions — so presence IS the non-empty flag).
    */
  def tableIfPresent(gen: Option[java.io.File], table: String): Option[java.io.File] =
    gen.map(g => new java.io.File(g, table)).filter(t =>
      t.isDirectory && Option(t.listFiles()).exists(_.exists(f =>
        f.getName.endsWith(".parquet"))))

  /** [[tableIfPresent]] for PARTITIONED layer tables: true iff any
    * parquet file exists anywhere under `dir` (a `partitionBy` write of
    * zero rows leaves only a `_SUCCESS`, and reading it would fail
    * schema inference — callers substitute an empty frame instead).
    */
  def hasParquet(dir: java.io.File): Boolean =
    (dir.isFile && dir.getName.endsWith(".parquet")) ||
      (dir.isDirectory && Option(dir.listFiles()).toSeq.flatten
        .filterNot(_.getName.startsWith("_")).exists(hasParquet))

  /** One composition snapshot of a gen+adds delta store (the shard
    * lake's view shape, shared by the search-artifact stores): the
    * newest complete generation, the cumulative segment names it
    * subsumes, and the installed add segments NOT yet folded.
    */
  final case class DeltaView(gen: Option[java.io.File],
      consumed: Set[String], adds: Seq[java.io.File]) {
    /** True when serving composes exactly the immutable base — the
      * bit-stability fast path for oracle-pinned readers. */
    def baseOnly: Boolean = gen.isEmpty && adds.isEmpty
    /** Layer roots newest-last: generation (if any) then unconsumed
      * adds — the dirs a serve unions on top of the base tables. */
    def overlays: Seq[java.io.File] = gen.toSeq ++ adds
  }

  def deltaView(indexPath: String): DeltaView = {
    val gen = currentGen(indexPath)
    val consumed = consumedNames(gen)
    DeltaView(gen, consumed,
      segmentDirs(indexPath, "add-").filterNot(f => consumed.contains(f.getName)))
  }

  /** Maintenance-window reclamation for a gen+adds store: delete the
    * delta segments the newest generation has consumed AND every
    * superseded (older) generation — safe because each fold's
    * `consumed.txt` is cumulative and its data subsumes the previous
    * generation's (a vacuumed batch's replay still no-ops off the
    * surviving `consumed.txt`). Returns dirs removed.
    */
  def vacuumStore(indexPath: String): Int = {
    val v = deltaView(indexPath)
    val deadSegs = segmentDirs(indexPath, "add-")
      .filter(f => v.consumed.contains(f.getName))
    val deadGens = v.gen match {
      case None => Seq.empty[java.io.File]
      case Some(g) =>
        Option(new java.io.File(s"$indexPath/gens").listFiles()).toSeq.flatten
          .filter(f => f.getName.startsWith("gen-") && f.getName < g.getName)
    }
    val dead = deadSegs ++ deadGens
    dead.foreach(deleteTree)
    dead.length
  }

  def writeLines(f: java.io.File, lines: Seq[String]): Unit = {
    val w = new java.io.PrintWriter(f, "UTF-8")
    try lines.foreach(w.println) finally w.close()
  }

  // ------------------------------------------------------------------
  // The shared DML recipe pieces (hoisted from the search stores so
  // every gen+adds lake — BM25, runs, and the corpus LM — composes the
  // SAME segment arithmetic instead of re-deriving it per store).
  // ------------------------------------------------------------------

  /** Content key + envelope of a normalized `(doc_id, <payload>)`
    * batch — the [[Bpe!.addShardDocs]] recipe: ONE aggregate pass
    * derives an order-independent 128-bit key (a NULL payload hashed
    * through an explicit is-null flag), the id envelope for the
    * prunable conflict scan, and the batch size. None for an empty
    * batch; duplicate in-batch ids fail loudly. `payload`/`empty`
    * parameterize the column name and its typed empty literal (the
    * text stores pass the defaults; the media lake hashes `blob` with
    * a binary empty).
    */
  private[operators] def batchKey(
      norm: org.apache.spark.sql.DataFrame, op: String,
      payload: String = "text", empty: String = "''")
      : Option[(String, Long, Long, Long)] = {
    val st = norm.selectExpr(
      "count(1) as cnt", "count(distinct doc_id) as dcnt",
      "min(doc_id) as lo", "max(doc_id) as hi",
      s"bit_xor(xxhash64(doc_id, isnull($payload), coalesce($payload, $empty))) as h1",
      s"bit_xor(xxhash64(coalesce($payload, $empty), isnull($payload), doc_id)) as h2").head()
    val cnt = st.getAs[Long]("cnt")
    if (cnt == 0L) None
    else {
      require(st.getAs[Long]("dcnt") == cnt,
        s"$op: duplicate doc_id within the batch")
      Some((f"${st.getAs[Long]("h1")}%016x${st.getAs[Long]("h2")}%016x",
        st.getAs[Long]("lo"), st.getAs[Long]("hi"), cnt))
    }
  }

  /** Union of one table across layer roots, skipping layers where the
    * table is absent-or-empty (a `partitionBy` write of zero rows
    * leaves no readable files). None iff no layer holds it.
    */
  private[operators] def layerUnion(s: org.apache.spark.sql.SparkSession,
      roots: Seq[String], table: String)
      : Option[org.apache.spark.sql.DataFrame] = {
    val dirs = roots.map(r => new java.io.File(r, table))
      .filter(hasParquet)
    if (dirs.isEmpty) None
    else Some(dirs.map(f => s.read.parquet(f.getAbsolutePath))
      .reduce(_ unionByName _))
  }

  /** The fold skeleton shared by every gen+adds store's compaction:
    * name the new generation from the cumulative consumed set, install
    * it via the staged-rename [[ensure]], let `fold` write the folded
    * tables from the overlay roots, and record `consumed.txt`. Returns
    * true iff THIS call installed a generation.
    */
  private[operators] def compactStore(p: String)(
      fold: (Seq[String], String) => Unit): Boolean = {
    val v = deltaView(p)
    if (v.adds.isEmpty) return false
    val consumed = (v.consumed ++ v.adds.map(_.getName)).toSeq.sorted
    val seq = v.gen.map(_.getName.drop(4).takeWhile(_ != '-').toInt)
      .getOrElse(0) + 1
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(consumed.mkString("|").getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    val target = new java.io.File(f"$p/gens/gen-$seq%05d-$key")
    if (new java.io.File(target, "_SUCCESS").isFile) return false
    ensure(target) { staging =>
      fold(v.overlays.map(_.getAbsolutePath), staging.getAbsolutePath)
      staging.mkdirs()
      writeLines(new java.io.File(staging, "consumed.txt"), consumed)
    }
  }

  /** The complete add-segment orchestration shared by the gen+adds
    * stores' DML faces: normalize + persist the batch, derive its
    * content key, no-op on consumed/installed replays, run the id
    * guard, install the layer via the staged rename (the layer writer
    * receives the normalized batch, the staging root, and a
    * batch-proportional file count), bump the store's observability
    * counter, and auto-fold past `maxSegments`. ONE definition for all
    * three stores (BM25, runs, corpus LM), so a lifecycle fix cannot
    * land in one store and drift in the others.
    */
  private[operators] def dmlAdd(s: org.apache.spark.sql.SparkSession,
      p: String, docs: org.apache.spark.sql.DataFrame, op: String,
      maxSegments: Int,
      counter: java.util.concurrent.atomic.AtomicInteger,
      payloadCol: String = "text", payloadType: String = "string")(
      writeLayer: (org.apache.spark.sql.DataFrame, String, Int) => Unit)(
      compact: () => Unit): Boolean = {
    val empty = if (payloadType == "binary") "cast('' as binary)" else "''"
    val norm = docs.selectExpr(
        "cast(doc_id as bigint) as doc_id",
        s"cast($payloadCol as $payloadType) as $payloadCol")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      batchKey(norm, op, payloadCol, empty) match {
        case None => false
        case Some((key, lo, hi, cnt)) =>
          // the retry no-op precedes the id guard: a re-sent batch
          // carries already-indexed ids by definition. Consumed names
          // first — a vacuumed segment's bytes live on in its
          // generation, so its replay must still no-op
          if (deltaView(p).consumed.contains(s"add-$key")) return false
          val target = new java.io.File(s"$p/deltas/add-$key")
          if (new java.io.File(target, "_SUCCESS").isFile) return false
          guardIds(s, p, norm, lo, hi, cnt, op)
          val nFiles =
            math.min(64L, math.max(1L, (cnt + 65535L) / 65536L)).toInt
          val installed = ensure(target) { staging =>
            writeLayer(norm, staging.getAbsolutePath, nFiles)
          }
          if (installed) {
            counter.incrementAndGet()
            if (deltaView(p).adds.length > maxSegments) compact()
          }
          installed
      }
    } finally { norm.unpersist(); () }
  }

  /** The id-conflict guard shared by the stores' DML: ids the lake
    * already holds (base ∪ generation ∪ unconsumed segments, each
    * layer's `docs` table) intersected with the batch, pruned to the
    * batch's [lo, hi] envelope so the scan is parquet-stats-prunable.
    * Fails loudly on conflict; driver memory held is ≤ 8 ids.
    */
  private[operators] def guardIds(s: org.apache.spark.sql.SparkSession,
      p: String, norm: org.apache.spark.sql.DataFrame,
      lo: Long, hi: Long, cnt: Long, op: String): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val v = deltaView(p)
    val taken = layerUnion(s, p +: v.overlays.map(_.getAbsolutePath), "docs")
      .get // the base always writes docs (cnt ≥ 0 rows is still a table)
      .select(col("doc_id")).filter(col("doc_id").between(lo, hi))
    val idsDf = norm.select(col("doc_id"))
    val probe = if (cnt <= 1000000L) broadcast(idsDf) else idsDf
    import s.implicits._
    val dup = taken.join(probe, "doc_id").select(col("doc_id")).distinct()
      .orderBy(col("doc_id")).limit(8).as[Long].collect()
    require(dup.isEmpty,
      s"$op: doc ids already indexed: ${dup.mkString(", ")}")
  }
}
