package graft.tables

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.collection.parallel.CollectionConverters._
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.annotation.JsonDeserialize
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** One committed snapshot of a table. IN MEMORY, `files` is the FULL
  * live file list (relative to the table's data dir), not a delta — so
  * any snapshot is readable on its own (time travel, S10) and expiring
  * old snapshots never breaks later ones. ON DISK, the file list (with
  * per-file rows/specs/column bounds) lives in immutable MANIFEST CHUNK
  * files ([[ManifestStore]]) that the commit json references by name —
  * the persisted json is O(this commit's delta), so commit metadata
  * cost stays flat as the live file count grows (Iceberg's
  * manifest-list design; the reference's tables are all Iceberg
  * format-version 2). [[GraftTable.commits]] resolves chunk references
  * back into the full in-memory view once per handle. Pre-manifest
  * commit jsons (inline `files`/`fileRows`/`fileSpecs`, no `manifests`)
  * still read; the next commit migrates their entries into chunks.
  */
final case class CommitMeta(
    version: Int,
    tsMs: Long,
    op: String,
    rowCount: Long,
    files: Seq[String],
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    sinkBatches: Map[String, Long] = Map.empty,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    fileRows: Map[String, Long] = Map.empty,
    changeFiles: Seq[String] = Nil,
    deleteFiles: Seq[String] = Nil,
    schemaDdl: String = null,
    @JsonDeserialize(contentAs = classOf[java.lang.Integer])
    morDeleteFiles: Map[String, Int] = Map.empty,
    partSpecDdl: String = null,
    fileSpecs: Map[String, String] = Map.empty,
    renames: Seq[String] = Nil,
    @JsonDeserialize(contentAs = classOf[java.lang.Integer])
    posDeleteFiles: Map[String, Int] = Map.empty,
    manifests: Seq[String] = Nil) {
  /** Jackson leaves a missing field null on old commit jsons. */
  def sinkBatchesOrEmpty: Map[String, Long] =
    Option(sinkBatches).getOrElse(Map.empty)

  /** The table's LOGICAL schema as of this commit (Iceberg pins a
    * schema-id per snapshot the same way). Carried forward on every
    * commit once an evolve-schema commit sets it, so expiring the
    * evolve commit itself never loses the schema; absent (None) on
    * never-evolved tables, whose schema is the declared TableDef one.
    */
  def schemaDdlOrNone: Option[String] = Option(schemaDdl)

  /** For a copy-on-write upsert commit: the subset of this commit's
    * files holding EXACTLY the upserted batch (the survivors were
    * rewritten into separate files), i.e. the commit's logical change
    * set — Iceberg's changelog scan derives the same rows from the
    * equality-delete files a v2 MERGE writes. Empty on every other op
    * and on pre-upgrade upsert jsons (whose change set is unknowable —
    * readChanges refuses those, see fileDeltasSince).
    */
  def changeFilesOrEmpty: Seq[String] =
    Option(changeFiles).getOrElse(Nil)

  /** For a change-tracked replace commit (`replace-cdc`): files holding
    * EXACTLY the rows the commit removed — the engine's analog of
    * Iceberg v2's delete files, written only when the caller opted into
    * change tracking (the extra O(deleted) write is a real cost the
    * default repair path must not pay). NOT part of the live file set;
    * referenced by the commit so orphan cleanup spares them until the
    * commit itself expires.
    */
  def deleteFilesOrEmpty: Seq[String] =
    Option(deleteFiles).getOrElse(Nil)

  /** Per-file row counts (Iceberg's manifest `record_count` analog) —
    * carried commit to commit so a replace/compact commit re-reads
    * footers only for files it ADDED, never the carried-over live set:
    * commit metadata cost stays O(new files), not O(table). Missing on
    * pre-upgrade commit jsons → the next commit rebuilds it once.
    */
  def fileRowsOrEmpty: Map[String, Long] =
    Option(fileRows).getOrElse(Map.empty)

  /** PENDING equality-delete files of a merge-on-read table (Iceberg
    * v2's delete files): key-tuple tombstones → the version that wrote
    * each, killing matching rows from OLDER sequences until a later
    * upsert resurrects the key. Carried forward commit to commit (like
    * sinkBatches) so the latest commit always knows the active
    * tombstone set; compaction materializes them away and clears the
    * map. Distinct from `deleteFiles`, which is a change-tracked
    * repair's one-shot changelog payload, never carried.
    */
  def morDeleteFilesOrEmpty: Map[String, Int] =
    Option(morDeleteFiles).getOrElse(Map.empty)

  /** The PARTITION spec in effect as of this commit (serialized
    * transform list, see [[PartitionTransform.specDdl]]) — carried like
    * schemaDdl; absent on never-evolved tables (declared spec applies).
    */
  def partSpecDdlOrNone: Option[String] = Option(partSpecDdl)

  /** file → the spec it was WRITTEN under. Recorded (for every live
    * file) only once the table has ever evolved its partitioning; an
    * empty map means every file is on the declared spec. Explicit
    * per-file provenance — a derived first-seen lookup would silently
    * mis-group files after snapshot expiry, and a mis-grouped file
    * reads the wrong directory layout.
    */
  def fileSpecsOrEmpty: Map[String, String] =
    Option(fileSpecs).getOrElse(Map.empty)

  /** Column-RENAME log as of this commit, carried forward like
    * schemaDdl: each entry `"<version>|<old>|<new>"` records that the
    * evolve commit at `version` renamed `old` to `new`. Files written
    * BEFORE that version store the old name; the read path derives
    * each file's stored names from its first-seen version against this
    * log — the engine's stand-in for Iceberg's field ids, which is
    * what makes RENAME a metadata-only commit on a name-resolved
    * parquet format (zero footers rewritten).
    */
  def renamesOrEmpty: Seq[String] = Option(renames).getOrElse(Nil)

  /** PENDING position-delete files (Iceberg v2's `(file, pos)` delete
    * kind — the shape `DELETE FROM ... WHERE <non-key predicate>`
    * writes): parquet files of (data-file relative path, row index)
    * tombstones → the version that wrote each, anti-joined away by
    * every logical read until [[GraftTable.compact]] materializes them.
    * Carried forward like morDeleteFiles; never part of the live file
    * set. Only non-merge-on-read tables carry these (a MOR predicate
    * delete delegates to equality deletes — see deleteWhere).
    */
  def posDeleteFilesOrEmpty: Map[String, Int] =
    Option(posDeleteFiles).getOrElse(Map.empty)

  /** Names of the manifest chunks whose entries form this snapshot's
    * live file set. Empty on pre-manifest commit jsons (which carry
    * the file list inline) — see the class doc.
    */
  def manifestsOrEmpty: Seq[String] = Option(manifests).getOrElse(Nil)
}

/** A concurrent commit landed that this operation cannot be replayed
  * over — the loud half of the optimistic-concurrency protocol (the
  * quiet half is the bounded retry for commutative shapes). The
  * operation made NO commit; the table is exactly the other writer's
  * state, nothing is lost. Recovery is operation-level: re-run the
  * operation against the current snapshot (its inputs must be re-read —
  * that is precisely what the conflict is telling you).
  */
final class CommitConflictException(msg: String) extends RuntimeException(msg)

/** What a commit MEANS as a delta against the snapshot its operation
  * read (its BASE) — the information the optimistic-commit retry loop
  * needs to decide, per Iceberg's conflict-validation scheme, whether
  * the commit can be replayed over a head another writer advanced:
  *
  *  - [[AddFiles]] (append, MOR upsert): pure addition — commutes with
  *    everything that leaves the write-time column-name epoch and
  *    partition spec alone; retried as `head.files ++ added`.
  *  - [[RewriteFiles]] (compact, z-order): content-preserving rewrite
  *    of `removed` into `added` — retriable iff every input is still
  *    live in the head and no tombstones landed in between (the
  *    rewrite materializes base-time tombstones, so a new one would be
  *    silently cleared); merge-on-read tables additionally require NO
  *    interleaved data commit (a rewrite re-sequences its output above
  *    an interleaved upsert, manufacturing a bogus latest-wins order).
  *  - [[ReplaceContent]] (COW upsert, overwrite, replaceWhere/Keys):
  *    the commit's rows were DERIVED from the base's logical content —
  *    replayable only over interleaved commits that preserved that
  *    content (layout-only: compact/zorder) with every carried
  *    `untouched` file still live; anything else aborts loudly
  *    (snapshot-isolation conflict, Iceberg's ValidationException).
  *  - [[TombstoneEq]] (MOR equality delete): key-granular tombstone,
  *    re-versioned per attempt — latest-delete-wins over interleaved
  *    upserts of the same keys, exactly Iceberg v2 sequence semantics.
  *  - [[TombstonePos]] (position delete): pins (file, row) identities,
  *    so any interleaved REMOVAL of a base file aborts; additions are
  *    fine.
  *  - [[MetadataOnly]] (schema/spec evolution, rollback): computed
  *    against one exact head; any interleaved commit aborts (the
  *    operation is cheap to re-run).
  */
private[tables] sealed trait CommitIntent
private[tables] final case class AddFiles(added: Seq[String]) extends CommitIntent
private[tables] final case class RewriteFiles(removed: Set[String],
    added: Seq[String]) extends CommitIntent
private[tables] final case class ReplaceContent(untouched: Seq[String],
    added: Seq[String]) extends CommitIntent
private[tables] case object TombstoneEq extends CommitIntent
private[tables] case object TombstonePos extends CommitIntent
private[tables] final case class MetadataOnly(filesOverride: Option[Seq[String]])
    extends CommitIntent

/** Conservative file-pruning hint for replace commits: every row the
  * delete-condition can match is guaranteed to lie within
  * `[loMicros, hiMicros]` of `column` (µs since epoch, as parquet stores
  * TIMESTAMP(MICROS)). Live files whose footer min/max don't intersect
  * the range are carried into the new commit by name — zero read, zero
  * rewrite — which is what turns a repair commit from O(table) into
  * O(affected window), the same skipping Iceberg does from manifest
  * column bounds.
  */
final case class RangePrune(column: String, loMicros: Long, hiMicros: Long)

/** A parquet-backed table with an explicit snapshot log — the engine's
  * stand-in for the reference's Iceberg v2 tables (no Iceberg/Delta jars
  * in this environment). Supported operations mirror the reference:
  *
  *  - `append`     — S4 partitioned append sink;
  *  - `upsert`     — S5 keyed upsert (copy-on-write here; the 100 TB
  *                   path is merge-on-read equality deletes / MERGE INTO,
  *                   see hourly_impressions_by_geo.yml:17-21);
  *  - `overwrite`  — M1 CTAS materialization;
  *  - `compact`    — M7 small-file compaction (maintenance.sh:66-67);
  *  - `expireSnapshots` / `removeOrphans` — M8 (maintenance.sh:72-79);
  *  - `snapshots`  — S10 metadata table (query-examples.sh:91-95).
  *
  * MULTI-WRITER under optimistic concurrency (the reference's
  * deployment is concurrent as a matter of routine: three Flink jobs
  * commit every 60 s — insert_jobs.sql:6-9 — while maintenance.sh:66-79
  * compacts/expires the SAME tables on a cron; Iceberg absorbs that
  * with optimistic commits, and so does this log). Every commit is
  * published with an atomic version CAS ([[GraftTable.publish]]:
  * link(2) onto the versioned path, which fails rather than replaces);
  * a writer that loses the race re-validates its intent against the
  * winner ([[CommitIntent]]) and either replays (commutative shapes:
  * appends, content-preserving rewrites over still-live inputs) or
  * aborts loudly ([[CommitConflictException]] — snapshot-isolation
  * conflicts: two writers deriving from the same content). Readers
  * always resolve the latest complete commit.
  */
final class GraftTable(val spark: SparkSession, val defn: TableDef, root: String,
    branch: Option[String] = None)
    extends SinkTable {

  private val tableDir = s"$root/${defn.name}"
  private val dataDir = s"$tableDir/data"
  // a BRANCH view keeps its own commit log beside main's, over the SAME
  // data dir — so every write op (append/upsert/replace/compact) works
  // on a branch unchanged, writing files no main snapshot references
  // until a fast-forward publishes them (Iceberg branches share the
  // data layout the same way)
  private val commitsDir = branch match {
    case Some(b) => s"$tableDir/_commits/branch-$b"
    case None => s"$tableDir/_commits"
  }
  private val refsDir = s"$tableDir/_refs"
  Files.createDirectories(Paths.get(dataDir))
  Files.createDirectories(Paths.get(commitsDir))

  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  // manifest chunks are shared by main and every branch (branch commits
  // reference the same chunk files; fast-forward moves only jsons)
  private val manifestStore = new ManifestStore(s"$tableDir/_manifests", mapper)

  private def timed[A](label: String)(body: => A): A =
    graft.Timing.timed(defn.name, label)(body)

  /** Directory the data files live under — the mount point for a file
    * STREAM tailing this table (Spark's file source lists new files per
    * micro-batch, so a downstream job consumes appends continuously; the
    * reference's jobs chain through Iceberg tables the same way). A
    * tailing reader sees files slightly before the commit json lands —
    * acceptable for append-only flows, which is the only shape the
    * streaming sinks write.
    */
  def dataPath: String = dataDir

  /** Partition spec as of a snapshot (latest when None): the commit's
    * carried partSpecDdl, else the declared TableDef spec. New writes
    * always use the CURRENT spec; existing files keep the layout they
    * were written under ([[CommitMeta.fileSpecsOrEmpty]]).
    */
  def partitionsAt(version: Option[Int]): Seq[PartitionTransform] = {
    val cs = commits
    val snap = version match {
      case Some(v) => cs.find(_.version == v)
      case None => cs.lastOption
    }
    snap.flatMap(_.partSpecDdlOrNone).map(PartitionTransform.parseSpec)
      .getOrElse(defn.partitions)
  }

  /** The current partition spec (declared + applied evolutions). */
  def currentPartitions: Seq[PartitionTransform] = partitionsAt(None)

  /** Physical schema = logical schema + derived partition columns
    * (current spec).
    */
  private def partCols: Seq[String] = currentPartitions.map(_.name)

  /** The spec each of a snapshot's files was written under. */
  private def specsByFile(snap: CommitMeta): Map[String, Seq[PartitionTransform]] = {
    val m = snap.fileSpecsOrEmpty
    if (m.isEmpty) Map.empty.withDefaultValue(defn.partitions)
    else m.view.mapValues(PartitionTransform.parseSpec).toMap
      .withDefaultValue(defn.partitions)
  }

  /** Parsed column-provenance log of a snapshot, ascending by version.
    * Entry kinds (the `|`-separated triple):
    *  - rename `v|old|new` (both non-empty) — resolution walks it back;
    *  - add    `v||name`   (old empty) — recorded ONLY for a
    *    resurrection-prone add (the name once existed as a column or a
    *    rename side): files written before `v` must read the column as
    *    ABSENT even when their footers carry an identically-named dead
    *    column (Iceberg's field-ids prevent the same resurrection);
    *  - drop   `v|name|`   (new empty) — never matched by resolution;
    *    the permanent record that `name` once existed, surviving
    *    snapshot expiry so a later re-add is detected as prone.
    */
  private def renameLogOf(snap: Option[CommitMeta]): Seq[(Int, String, String)] =
    snap.map(_.renamesOrEmpty).getOrElse(Nil).map { s =>
      val parts = s.split("\\|", -1)
      require(parts.length == 3, s"${defn.name}: bad rename log entry '$s'")
      (parts(0).toInt, parts(1), parts(2))
    }

  /** The name a file written at `fileVersion` STORES for the column
    * currently (per `log`) called `cur` — or None when the column is
    * ABSENT for that file (it predates a resurrection-prone add).
    * Renames that landed after the file was written are walked back
    * newest-first, so chained renames (a→b at v5, b→c at v9) and
    * freed-then-reused names resolve correctly. Identity when the log
    * is empty — the common case pays nothing.
    */
  private def storedNameOf(cur: String, fileVersion: Int,
      log: Seq[(Int, String, String)]): Option[String] = {
    var name = cur
    log.reverseIterator.foreach { case (rv, o, n) =>
      if (rv > fileVersion && n.nonEmpty && name == n) name = o
    }
    if (name.isEmpty) None else Some(name)
  }

  /** current-name → stored-name map for a whole logical schema (None =
    * absent for that epoch); files that predate every entry (or a
    * log-free table) get the identity map.
    */
  private def storedNamesAt(logical: StructType, fileVersion: Int,
      log: Seq[(Int, String, String)]): Map[String, Option[String]] =
    logical.fieldNames.map(c => c -> storedNameOf(c, fileVersion, log)).toMap

  /** True iff adding `name` now could RESURRECT dead data: the name was
    * ever a column (any committed schema, the declared one, or either
    * side of a log entry), so a live file may physically store an
    * identically-named dead column. Such adds get a log entry; ordinary
    * adds (the overwhelmingly common case) record nothing and behave
    * exactly as before.
    */
  private def resurrectionProne(name: String, cs: Seq[CommitMeta]): Boolean = {
    val log = renameLogOf(cs.lastOption)
    log.exists(e => e._2.equalsIgnoreCase(name) || e._3.equalsIgnoreCase(name)) ||
      defn.schema.fieldNames.exists(_.equalsIgnoreCase(name)) ||
      cs.flatMap(_.schemaDdlOrNone).exists(ddl =>
        StructType.fromDDL(ddl).fieldNames.exists(_.equalsIgnoreCase(name)))
  }

  // ---- commit log ----

  private def commitPath(v: Int) = Paths.get(s"$commitsDir/commit-$v.json")

  /** Parsed-commit cache: commit jsons are IMMUTABLE once renamed into
    * place, so each (name, size, mtime) parses once per table handle —
    * without this, every schema/spec/read/write resolution re-parses
    * the whole log and a many-commit protocol (materializer repairs,
    * streamed sinks) goes O(ops × commits) on driver-side Jackson work
    * (measured: ~10% on the shared bench after the evolution threading,
    * m4 1.43×). Keyed on a CONTENT hash, not (size, mtime): mtime has
    * millisecond (on some filesystems, second) resolution, so a commit
    * json deleted and rewritten with an identical byte length inside
    * one tick — the purge-and-rebuild path (m9), where fixed-width UUID
    * file names make equal lengths likely — would serve a stale
    * CommitMeta under an mtime key. The bytes are read anyway to parse;
    * hashing them is noise next to the Jackson work being saved.
    */
  private val commitCache =
    scala.collection.concurrent.TrieMap[(String, Long, Long), CommitMeta]()

  /** Manifest chunk sizing: entries per chunk (a full chunk json is a
    * few hundred KB — one metadata IO, Iceberg-manifest-sized) and the
    * reference-count ceiling that triggers the fold-undersized merge.
    */
  private val ChunkTargetEntries = 1024
  private val MaxChunkRefs = 24

  /** Split the predecessor's chunk refs into (carried by reference,
    * folded into this commit's own write). Folding triggers when the
    * ref count would exceed [[MaxChunkRefs]] and merges ONLY
    * UNDERSIZED chunks (≤ half the target): merging those actually
    * reduces the count (amortized-logarithmic rewrites, Iceberg's
    * `rewrite_manifests` folded into the commit), while a SATURATED
    * chunk can never fold into fewer — rewriting it would be pure
    * write amplification per commit, which is exactly what the
    * pre-r16 fold-smallest rule degenerated into past ~24k files
    * (12 full chunks re-serialized per append, measured at 100× in
    * SCALING.md). Past saturation the ref count grows at its true
    * floor, ceil(live / ChunkTargetEntries) — the commit json is then
    * O(live/1024), the same O(#manifests) a real Iceberg manifest
    * list carries.
    */
  private def foldChunks(prevChunks: Seq[String]): (Seq[String], Seq[String]) = {
    if (prevChunks.size < MaxChunkRefs) return (prevChunks, Nil)
    val undersized = prevChunks.filter(n =>
      manifestStore.read(n).size <= ChunkTargetEntries / 2)
    if (undersized.size < 2) (prevChunks, Nil)
    else (prevChunks.filterNot(undersized.toSet), undersized)
  }

  /** Footer stats of freshly written (immutable) files, one open each:
    * row count + per-INT64-column min/max — keyed by relative path,
    * shared between append's zero-row check and writeCommit's manifest
    * entry build so each new file's footer opens exactly once.
    */
  private val footerStatsCache =
    scala.collection.concurrent.TrieMap[String, (Long, Seq[ColumnBound])]()

  private def contentKey(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  def commits: Seq[CommitMeta] = {
    val fs = Option(new File(commitsDir).listFiles()).getOrElse(Array.empty)
    fs.filter(_.getName.matches("commit-\\d+\\.json"))
      .map { f =>
        val bytes = Files.readAllBytes(f.toPath)
        commitCache.getOrElseUpdate(
          (f.getName, bytes.length.toLong, contentKey(bytes)),
          resolveManifests(mapper.readValue(bytes, classOf[CommitMeta])))
      }
      .sortBy(_.version).toSeq
  }

  /** Rebuild the in-memory full-file-list view from a persisted
    * manifest-format commit (files/fileRows/fileSpecs were stripped at
    * write time — see [[writeCommit]]). Cached with the parse, so the
    * chunk walk happens once per commit json per handle; the chunk
    * parses themselves cache in the [[ManifestStore]].
    */
  private def resolveManifests(c: CommitMeta): CommitMeta = {
    val ms = c.manifestsOrEmpty
    if (ms.isEmpty) c
    else {
      val entries = ms.flatMap(manifestStore.read)
      c.copy(files = entries.map(_.p),
        fileRows = entries.map(e => e.p -> e.r).toMap,
        fileSpecs = entries.flatMap(e => e.specOrNone.map(e.p -> _)).toMap)
    }
  }

  /** file → write-time column bounds, from a snapshot's manifest
    * entries — the metadata-log replacement for per-file footer probes
    * on the range-pruning and watermark paths. Files from pre-manifest
    * commits (or migrated entries with unknown bounds) are absent;
    * callers fall back to a footer read for exactly those.
    */
  // single-entry memo, NOT a map: every caller queries the latest
  // snapshot, and a per-snapshot map would retain one O(live files)
  // bounds map per commit for the handle's lifetime (a poll/cron loop
  // commits constantly). Keyed by the chunk-name list itself — UUID
  // names are never reused, purge-rebuild included.
  @volatile private var boundsMemo:
      (Seq[String], Map[String, Map[String, (Long, Long)]]) = (null, null)

  private def manifestBoundsOf(snap: CommitMeta): Map[String, Map[String, (Long, Long)]] = {
    val key = snap.manifestsOrEmpty
    val memo = boundsMemo
    if (memo._1 == key) memo._2
    else {
      // rebuilding an O(live files) map per pruned read would turn
      // every range query into O(table) driver CPU
      val v = key.flatMap(manifestStore.read)
        .flatMap(e => e.boundsOrNone.map(bs =>
          e.p -> bs.map(cb => cb.c -> (cb.lo, cb.hi)).toMap)).toMap
      boundsMemo = (key, v)
      v
    }
  }

  def currentVersion: Int = commits.lastOption.map(_.version).getOrElse(0)

  /** Atomically claim version `persisted.version`: hard-link a fully
    * written tmp json onto the versioned commit path — link(2) fails
    * when the target exists, which IS the compare-and-swap on the
    * table head (atomic across threads AND processes on any POSIX
    * filesystem; an object-store deployment swaps this one primitive
    * for a conditional PUT or a catalog pointer CAS — exactly the
    * pluggable commit seam Iceberg's TableOperations defines). False =
    * another writer claimed the version first; the caller re-reads the
    * head, re-validates, and retries.
    */
  private def publish(meta: CommitMeta, persisted: CommitMeta): Boolean = {
    val bytes = mapper.writeValueAsString(persisted)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val tmp = Paths.get(s"$commitsDir/.tmp-${java.util.UUID.randomUUID()}.json")
    Files.write(tmp, bytes)
    try {
      Files.createLink(commitPath(persisted.version), tmp)
      // prime the parsed-commit cache with the ASSEMBLED in-memory view:
      // this handle's next commits() serves its own commit without
      // re-resolving manifest chunks — the predecessor-carry that keeps
      // a long-lived writer's assembly O(delta) end to end
      commitCache.put((s"commit-${persisted.version}.json",
        bytes.length.toLong, contentKey(bytes)), meta)
      true
    }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.delete(tmp)
  }

  /** Decide whether `intent`, computed against snapshot `baseVersion`,
    * may be replayed over the current `head` (no-op when nothing
    * interleaved — the uncontended fast path). Throws
    * [[CommitConflictException]] when replay would be unsound; see
    * [[CommitIntent]] for the per-shape rules. This is the conflict-
    * validation half of optimistic concurrency (Iceberg's
    * validateNoNewDeletesForDataFiles / validateAddedFilesMatchFilter
    * family, reduced to this format's five commit shapes).
    */
  private def validateIntent(op: String, intent: CommitIntent, baseVersion: Int,
      head: Option[CommitMeta]): Unit = {
    val headV = head.map(_.version).getOrElse(0)
    if (headV == baseVersion) return
    def conflict(why: String): Nothing = throw new CommitConflictException(
      s"${defn.name}: $op derived from snapshot v$baseVersion but the head " +
        s"is v$headV — $why; re-run the operation against the current snapshot")
    if (headV < baseVersion) conflict("the head moved backwards (rolled-back log?)")
    val cs = commits
    val base = cs.find(_.version == baseVersion)
    if (baseVersion > 0 && base.isEmpty)
      conflict("the base snapshot expired mid-operation")
    val intervening = cs.filter(_.version > baseVersion)
    val headFiles = head.map(_.files.toSet).getOrElse(Set.empty)
    // files this operation wrote are stamped under the BASE's
    // column-name epoch and partition spec; an interleaved rename /
    // resurrection-prone re-add / spec evolution would mis-resolve
    // them on read — abort rather than mis-read (the op re-runs
    // cheaply against the new metadata)
    def writeEpochGuards(): Unit = {
      if (head.map(_.renamesOrEmpty).getOrElse(Nil) !=
          base.map(_.renamesOrEmpty).getOrElse(Nil))
        conflict("a column rename/re-add landed concurrently")
      if (head.flatMap(_.partSpecDdlOrNone) != base.flatMap(_.partSpecDdlOrNone))
        conflict("a partition-spec evolution landed concurrently")
    }
    intent match {
      case AddFiles(_) => writeEpochGuards() // pure addition commutes
      case RewriteFiles(removed, _) =>
        writeEpochGuards()
        if (!removed.subsetOf(headFiles))
          conflict("a concurrent commit removed files this rewrite read")
        if (head.map(_.morDeleteFilesOrEmpty).getOrElse(Map.empty) !=
            base.map(_.morDeleteFilesOrEmpty).getOrElse(Map.empty) ||
            head.map(_.posDeleteFilesOrEmpty).getOrElse(Map.empty) !=
            base.map(_.posDeleteFilesOrEmpty).getOrElse(Map.empty))
          conflict("tombstones landed concurrently — this rewrite read the " +
            "base state and would silently clear them")
        if (defn.mergeOnRead &&
            headFiles != base.map(_.files.toSet).getOrElse(Set.empty))
          conflict("a data commit interleaved with a merge-on-read rewrite — " +
            "the rewrite's output would re-sequence above it")
      case ReplaceContent(untouched, _) =>
        writeEpochGuards()
        intervening.find(c => c.op != "compact" && c.op != "zorder").foreach(c =>
          conflict(s"concurrent '${c.op}' commit v${c.version} changed the " +
            "logical content this operation's rows were derived from"))
        if (!untouched.forall(headFiles))
          conflict("a concurrent rewrite removed files this operation " +
            "carried over by name")
      case TombstoneEq => () // key-granular, re-versioned per attempt:
        // latest-delete-wins over interleaved upserts of the same keys,
        // Iceberg v2 sequence semantics
      case TombstonePos =>
        if (!base.map(_.files.toSet).getOrElse(Set.empty).subsetOf(headFiles))
          conflict("a concurrent commit removed files these position " +
            "deletes reference by (file, pos)")
      case MetadataOnly(_) =>
        conflict("metadata operations replay against one exact snapshot")
    }
  }

  /** The live file set `intent` produces over `head` — evaluated per
    * retry attempt, which is what makes commutative shapes replayable.
    */
  private def filesUnder(intent: CommitIntent, head: Option[CommitMeta]): Seq[String] = {
    val headFiles = head.map(_.files).getOrElse(Nil)
    intent match {
      case AddFiles(a) => headFiles ++ a
      case RewriteFiles(rm, a) => headFiles.filterNot(rm) ++ a
      case ReplaceContent(u, a) => u ++ a
      case TombstoneEq | TombstonePos => headFiles
      case MetadataOnly(o) => o.getOrElse(headFiles)
    }
  }

  /** Commit `intent`'s file delta as the new live set, under OPTIMISTIC
    * CONCURRENCY: the new snapshot is assembled against the current
    * head, published with an atomic version CAS ([[publish]]), and on
    * a lost race re-validated ([[validateIntent]]) and re-assembled
    * against the winner — bounded retries, then a loud error. A
    * non-replayable interleaving throws [[CommitConflictException]]
    * with nothing committed. This is what lets the reference's
    * deployment shape — streaming writers committing every 60 s WHILE
    * a maintenance cron compacts/expires the same tables — run without
    * a lost commit, the way Iceberg's optimistic commits absorb it.
    *
    * Row counts AND column bounds come from the previous commit's
    * manifest entries where a file is carried over; only files NOT in
    * the previous commit (the ones this operation wrote) have their
    * footers read (once — the same open harvests rows + bounds) —
    * commit cost is O(new files) regardless of how many live files are
    * carried. The persisted json stores manifest chunk NAMES, never
    * the file list: an append-shaped commit writes one new chunk and
    * carries prior chunks by reference; a commit that removes files
    * (or restamps specs) rewrites only the touched chunks. Chunk-
    * reference growth is bounded by merging the smallest chunks into
    * the commit's own write once the ref count exceeds
    * [[GraftTable.MaxChunkRefs]] — logarithmic amortized rewrite,
    * Iceberg's `rewrite_manifests` folded into the commit.
    */
  private def writeCommit(op: String, intent: CommitIntent, baseVersion: Int,
      knownRows: Map[String, Long] = Map.empty,
      changeFiles: Seq[String] = Nil,
      deleteFiles: Seq[String] = Nil,
      newSchemaDdl: Option[String] = None,
      morDeletes: (Map[String, Int], Int) => Map[String, Int] = (m, _) => m,
      newPartSpecDdl: Option[String] = None,
      fileSpecsOverride: Option[Map[String, String]] = None,
      newRenames: Option[Seq[String]] = None,
      posDeletes: (Map[String, Int], Int) => Map[String, Int] = (m, _) => m): CommitMeta = {
    var attempt = 0
    while (attempt < GraftTable.MaxCommitRetries) {
      val prevMeta = commits.lastOption
      validateIntent(op, intent, baseVersion, prevMeta)
      val meta = assembleCommit(op, intent, prevMeta, knownRows, changeFiles,
        deleteFiles, newSchemaDdl, morDeletes, newPartSpecDdl,
        fileSpecsOverride, newRenames, posDeletes)
      if (publish(meta._1, meta._2)) {
        // bound the footer-stats cache (it exists for files being
        // committed, not for history): entries for files this commit
        // removed from the live set can never be asked for again
        val gone = prevMeta.map(_.files.toSet).getOrElse(Set.empty) -- meta._1.files.toSet
        if (gone.nonEmpty) footerStatsCache --= gone
        // same discipline for the chunk-parse cache: a long-lived
        // poll/cron writer otherwise accumulates one parsed chunk per
        // chunk ever rewritten (see ManifestStore.prune)
        manifestStore.prune(meta._1.manifestsOrEmpty.toSet)
        return meta._1
      }
      attempt += 1
      GraftTable.commitRetryCount.incrementAndGet()
      // lost the version CAS — back off briefly (jittered so N writers
      // don't re-collide in lockstep), re-read the winner, try again
      Thread.sleep(1L +
        java.util.concurrent.ThreadLocalRandom.current().nextLong(2L << math.min(attempt, 6)))
    }
    throw new CommitConflictException(
      s"${defn.name}: $op lost the commit race ${GraftTable.MaxCommitRetries} " +
        "times — writer contention too high; re-run the operation")
  }

  /** One assembly pass of [[writeCommit]] against a specific head:
    * (in-memory meta, stripped persisted form).
    *
    * COST SHAPE: the steady-state commit kinds — pure additions
    * (append, MOR upsert) and tombstone commits (equality/position
    * deletes), i.e. everything the reference's 60-second streaming
    * cadence issues — take the O(DELTA) fast path: the file list, row
    * map, spec map, and row-count total derive INCREMENTALLY from the
    * predecessor's in-memory view (immutable-map structural sharing),
    * every prior manifest chunk carries by reference without being
    * scanned, and the only per-file work is the added files' footer
    * harvest. Driver CPU per commit is then independent of the live
    * file count — at millions of files an append costs what it costs
    * at a thousand (Iceberg's fast-append). Rewrites (compact, zorder,
    * replace, rollback) keep the full O(live) assembly: their intent
    * already touches the live set wholesale, and they run on the
    * maintenance cadence, not the ingest cadence. The one-time
    * migration of a pre-manifest predecessor also takes the full pass
    * (its row map must be rebuilt from footers once).
    */
  private def assembleCommit(op: String, intent: CommitIntent,
      prevMeta: Option[CommitMeta],
      knownRows: Map[String, Long],
      changeFiles: Seq[String],
      deleteFiles: Seq[String],
      newSchemaDdl: Option[String],
      morDeletes: (Map[String, Int], Int) => Map[String, Int],
      newPartSpecDdl: Option[String],
      fileSpecsOverride: Option[Map[String, String]],
      newRenames: Option[Seq[String]],
      posDeletes: (Map[String, Int], Int) => Map[String, Int]): (CommitMeta, CommitMeta) = {
    val newVersion = prevMeta.map(_.version).getOrElse(0) + 1
    val prevSpecDdl = prevMeta.flatMap(_.partSpecDdlOrNone)
    val prevFileSpecs = prevMeta.map(_.fileSpecsOrEmpty).getOrElse(Map.empty)
    val writeSpecDdl = prevSpecDdl.getOrElse(PartitionTransform.specDdl(defn.partitions))
    // ---- O(delta) fast path (see the method doc) ----
    val fastAdds: Option[Seq[String]] = intent match {
      case AddFiles(a)
          if fileSpecsOverride.isEmpty && newPartSpecDdl.isEmpty => Some(a)
      case TombstoneEq | TombstonePos => Some(Nil)
      case _ => None
    }
    // a pre-manifest predecessor (inline file list, possibly no row
    // map) must migrate through the full pass once
    val fast = fastAdds.isDefined &&
      prevMeta.forall(p => p.manifestsOrEmpty.nonEmpty || p.files.isEmpty)
    if (fast) {
      val added = fastAdds.get
      // one footer open per added file: rows + bounds (cached — the
      // caller's zero-row check already primed it)
      val addedStats: Map[String, (Long, Seq[ColumnBound])] =
        added.par.map(f => f -> footerStats(f)).seq.toMap
      val addedRows: Map[String, Long] =
        added.map(f => f -> knownRows.getOrElse(f, addedStats(f)._1)).toMap
      val files = prevMeta.map(_.files).getOrElse(Nil) ++ added
      val fileRows = prevMeta.map(_.fileRowsOrEmpty).getOrElse(Map.empty) ++ addedRows
      val rowCount = prevMeta.map(_.rowCount).getOrElse(0L) + addedRows.values.sum
      val carriedSpecDdl = prevSpecDdl.orNull
      val fileSpecs =
        if (carriedSpecDdl == null) Map.empty[String, String]
        else prevFileSpecs ++ added.map(_ -> writeSpecDdl)
      // every carried file keeps identical rows/spec, so EVERY prior
      // chunk carries by reference — no chunk is read, let alone
      // scanned. Only the fold-undersized merge (amortized logarithmic)
      // ever opens carried chunks here.
      val prevChunks = prevMeta.map(_.manifestsOrEmpty).getOrElse(Nil)
      val (carried, merged) = foldChunks(prevChunks)
      val pool = merged.flatMap(manifestStore.read)
      val fresh = added.map(f => ManifestEntry(
        f, addedRows(f), fileSpecs.get(f).orNull, addedStats(f)._2))
      val newChunks = (pool ++ fresh).grouped(ChunkTargetEntries)
        .map(manifestStore.write).toSeq
      return finishCommit(op, newVersion, rowCount, files, fileRows, fileSpecs,
        carriedSpecDdl, carried ++ newChunks, prevMeta, changeFiles, deleteFiles,
        newSchemaDdl, morDeletes, newRenames, posDeletes)
    }
    // ---- full assembly: rewrites, replaces, metadata ops, migration ----
    val files = filesUnder(intent, prevMeta)
    val prevFiles = prevMeta.map(_.files.toSet).getOrElse(Set.empty)
    val prevRows = prevMeta.map(_.fileRowsOrEmpty).getOrElse(Map.empty) ++ knownRows
    // one footer open per ADDED file harvests rows + INT64 bounds for
    // the manifest entry (parallel, cached per handle — append's own
    // zero-row check already primed it)
    val addedStats: Map[String, (Long, Seq[ColumnBound])] =
      files.filterNot(prevFiles).par.map(f => f -> footerStats(f)).seq.toMap
    val fileRows = files.par.map(f => f -> prevRows.getOrElse(f,
      addedStats.get(f).map(_._1).getOrElse(footerStats(f)._1))).seq.toMap
    // partition-spec bookkeeping: the carried spec, plus (once the table
    // has ever evolved) per-file write-spec provenance. New files were
    // written under the spec in effect BEFORE this commit (an evolve
    // commit adds no files, so the distinction only matters there).
    val carriedSpecDdl = newPartSpecDdl.orElse(prevSpecDdl).orNull
    val fileSpecs: Map[String, String] =
      if (carriedSpecDdl == null) Map.empty // never evolved: declared spec everywhere
      else fileSpecsOverride match {
        // rollback restores the TARGET snapshot's provenance — a file the
        // head had dropped isn't in the head's map, and stamping it with
        // the head's spec would mis-read its layout. A file absent from
        // the target's own map can only mean the target predates every
        // evolution (provenance is recorded for ALL live files once any
        // evolution lands), so the fallback is the TARGET's write spec
        // (newPartSpecDdl — rollback always passes it), never the head's
        // writeSpecDdl: after evolve → compact, the head's provenance no
        // longer names the restored files and the head-derived spec would
        // stamp day-layout files as hour-layout (null p_* reads,
        // mis-grouped compaction).
        case Some(m) =>
          val targetSpec = newPartSpecDdl.getOrElse(writeSpecDdl)
          files.map(f => f -> m.getOrElse(f, targetSpec)).toMap
        case None => files.map(f => f -> prevFileSpecs.getOrElse(f, writeSpecDdl)).toMap
      }
    // ---- manifest chunking: persisted metadata is O(this delta) ----
    val fileSet = files.toSet
    // a prior chunk carries BY REFERENCE iff every entry survives with
    // identical rows/spec — otherwise its survivors spill into this
    // commit's own chunk write with their (immutable) bounds kept.
    // Spec restamps (first partition evolution, rollback overrides)
    // and removals are what break the carry.
    val (carriedOk, toSpill) = prevMeta.map(_.manifestsOrEmpty).getOrElse(Nil)
      .partition(n => manifestStore.read(n).forall(e =>
        fileSet.contains(e.p) && e.r == fileRows(e.p) &&
          e.specOrNone == fileSpecs.get(e.p)))
    // bound ref growth: once the json would reference too many chunks,
    // fold the undersized ones into this commit's write (amortized: a
    // chunk is re-merged O(log files) times over the table's life;
    // saturated chunks never rewrite — see foldChunks)
    val (carried, merged) = foldChunks(carriedOk)
    val pool = (toSpill ++ merged).flatMap(manifestStore.read)
      .filter(e => fileSet.contains(e.p))
      .map(e => e.copy(r = fileRows(e.p), s = fileSpecs.get(e.p).orNull))
    val covered = carried.flatMap(n => manifestStore.read(n).map(_.p)).toSet ++
      pool.map(_.p)
    // files never chunked yet: this commit's additions (bounds from the
    // footer harvest) and any carried-over entries of a PRE-manifest
    // predecessor json (one-time migration; bounds unknown → null)
    val fresh = files.filterNot(covered).map(f => ManifestEntry(
      f, fileRows(f), fileSpecs.get(f).orNull,
      addedStats.get(f).map(_._2).orNull))
    val newChunks = (pool ++ fresh).grouped(ChunkTargetEntries).map(
      manifestStore.write).toSeq
    finishCommit(op, newVersion, fileRows.values.sum, files, fileRows, fileSpecs,
      carriedSpecDdl, carried ++ newChunks, prevMeta, changeFiles, deleteFiles,
      newSchemaDdl, morDeletes, newRenames, posDeletes)
  }

  /** Shared tail of both assembly paths: carry the per-commit metadata
    * (sink marks, schema, tombstone maps, rename log) and build the
    * (in-memory, stripped-persisted) pair.
    */
  private def finishCommit(op: String, newVersion: Int, rowCount: Long,
      files: Seq[String], fileRows: Map[String, Long],
      fileSpecs: Map[String, String], carriedSpecDdl: String,
      chunkNames: Seq[String], prevMeta: Option[CommitMeta],
      changeFiles: Seq[String], deleteFiles: Seq[String],
      newSchemaDdl: Option[String],
      morDeletes: (Map[String, Int], Int) => Map[String, Int],
      newRenames: Option[Seq[String]],
      posDeletes: (Map[String, Int], Int) => Map[String, Int]): (CommitMeta, CommitMeta) = {
    // every commit carries the full per-sink batch watermark forward, so
    // the LATEST commit is always authoritative and expiring old
    // snapshots never loses a sink's mark
    val prev = prevMeta.map(_.sinkBatchesOrEmpty).getOrElse(Map.empty)
    // the current schema rides every commit the same way (see CommitMeta)
    val carriedSchema =
      newSchemaDdl.orElse(prevMeta.flatMap(_.schemaDdlOrNone)).orNull
    // pending equality-delete tombstones carry too; `morDeletes`
    // transforms the carried map (add a tombstone / clear on compact) —
    // handed the ATTEMPT's version, so a retried tombstone re-sequences
    // above the interleaved commits it lost the race to
    val carriedMorDeletes =
      morDeletes(prevMeta.map(_.morDeleteFilesOrEmpty).getOrElse(Map.empty), newVersion)
    // the rename log carries forward like the schema; a rename commit
    // appends its entry, rollback restores the target's log
    val carriedRenames =
      newRenames.getOrElse(prevMeta.map(_.renamesOrEmpty).getOrElse(Nil))
    // pending position-delete tombstones carry like equality tombstones
    val carriedPosDeletes =
      posDeletes(prevMeta.map(_.posDeleteFilesOrEmpty).getOrElse(Map.empty), newVersion)
    val meta = CommitMeta(newVersion, System.currentTimeMillis(), op,
      rowCount, files, prev ++ pendingSinkMark.get(), fileRows, changeFiles,
      deleteFiles, carriedSchema, carriedMorDeletes, carriedSpecDdl, fileSpecs,
      carriedRenames, carriedPosDeletes, chunkNames)
    // persist the STRIPPED form — the chunk references are the durable
    // file list; the full in-memory view rebuilds via resolveManifests
    (meta, meta.copy(files = Nil, fileRows = Map.empty, fileSpecs = Map.empty))
  }

  // ---- file bookkeeping ----

  private def listDataFiles(): Set[String] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new File(dataDir))
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => Paths.get(dataDir).relativize(f.toPath).toString).toSet
  }

  private def withPartitionCols(df: DataFrame): DataFrame =
    currentPartitions.foldLeft(df)((d, p) => d.withColumn(p.name, p.expr))

  /** Write `df`'s rows as NEW files under the data dir; return the
    * relative paths added. Spark append mode never rewrites existing
    * files, so concurrent snapshots stay valid.
    *
    * Timestamps go out as INT64 TIMESTAMP(MICROS): the table layer
    * depends on ordered footer min/max for range pruning and metadata
    * watermark reads, and legacy INT96 stats are unusable. Scoped to
    * the set of in-flight graft writes on this session
    * ([[GraftTable.withMicrosTimestamps]] — reference-counted so one
    * concurrent writer's exit can't hand another the INT96 default
    * mid-plan), restoring the prior conf when the last write exits so
    * result dumps elsewhere in the session keep the default format.
    */
  /** Driver-local fast path: a commit whose rows are a tiny
    * LocalRelation (a watermark row, a bookkeeping upsert, a VALUES
    * insert) pays the full distributed-write floor — analyze/optimize,
    * a scheduled task, the Hadoop commit protocol — to move a few
    * hundred bytes that never left the driver. Write them directly
    * through Spark's own ParquetWriteSupport instead (identical on-disk
    * conventions, footer stats included — see GraftParquetBridge).
    * Gated to: no explicit partition-count request, unpartitioned
    * unsorted layout (partition/sort distribution is the distributed
    * writer's job), and an ANALYZED plan that is just projections over
    * one LocalRelation whose optimized form stays local and small. The
    * analyzed-plan probe is pattern matching only; the optimizer runs
    * solely on plans already known to be projection-over-local, so the
    * distributed path never pays an extra optimization pass.
    */
  private def localRelationRows(df: DataFrame)
      : Option[(StructType, Seq[org.apache.spark.sql.catalyst.InternalRow])] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    @scala.annotation.tailrec
    def leafLocal(p: LogicalPlan): Boolean = p match {
      case _: LocalRelation => true
      case pr: Project => leafLocal(pr.child)
      case a: SubqueryAlias => leafLocal(a.child)
      case _ => false
    }
    if (!leafLocal(df.queryExecution.analyzed)) return None
    df.queryExecution.optimizedPlan match {
      case l: LocalRelation
          if l.data.lengthCompare(GraftTable.LocalWriteMaxRows) <= 0 =>
        Some((df.schema, l.data))
      case _ => None
    }
  }

  private def writeFiles(df: DataFrame, numPartitions: Option[Int] = None): Seq[String] = {
    if (numPartitions.isEmpty && partCols.isEmpty && defn.sortOrder.isEmpty) {
      localRelationRows(df) match {
        case Some((schema, rows)) =>
          return writeStaged { dir =>
            org.apache.spark.sql.execution.datasources.parquet.GraftParquetBridge
              .writeLocalFile(
                s"$dir/part-00000-${java.util.UUID.randomUUID()}.parquet",
                schema, rows.iterator, spark.sessionState.newHadoopConf(),
                spark.conf.get("spark.sql.parquet.compression.codec", "snappy"))
          }
        case None => ()
      }
    }
    val clustered = withPartitionCols(df)
    // hash-distribute on the partition values before a partitioned write
    // (Iceberg write.distribution-mode=hash): without it every task
    // writes a sliver into every partition dir it touches — T×P small
    // files per commit. One task per partition value is the accepted
    // tradeoff; a 100 TB deployment adds a within-partition split at the
    // advisory partition size on top. `numPartitions` (compaction's
    // binpack target) must be applied HERE — a caller-side repartition
    // would be undone by this one.
    val pcols = partCols.map(org.apache.spark.sql.functions.col)
    val scols = defn.sortOrder.map(org.apache.spark.sql.functions.col)
    // declared sort order (Iceberg write.sort-order): an UNPARTITIONED
    // table range-distributes on the sort columns so each file covers a
    // disjoint slice — that is what makes footer min/max pruning
    // (readRangeLogical / RangePrune) open O(window) files on the sort
    // column for plain appends, not just after a z-order rewrite. A
    // PARTITIONED table keeps its partition-value distribution (dir
    // pruning already works) and sorts within each partition file, so
    // parquet row-group stats cluster too.
    val physical = (numPartitions, partCols.nonEmpty) match {
      case (Some(n), true) => clustered.repartition(n, pcols: _*)
      case (Some(n), false) if scols.nonEmpty =>
        clustered.repartitionByRange(n, scols: _*)
      case (Some(n), false) => clustered.repartition(n)
      case (None, true) => clustered.repartition(pcols: _*)
      case (None, false) if scols.nonEmpty =>
        clustered.repartitionByRange(scols: _*)
      case (None, false) => clustered
    }
    val ordered =
      if (scols.isEmpty) physical
      else physical.sortWithinPartitions((pcols ++ scols): _*)
    writePhysical(ordered)
  }

  /** Run one Spark write into a fresh STAGING dir, then move the
    * written files into the data dir preserving their (partition)
    * relative paths. The post-write walk touches only THIS write's
    * files — never the table — so write-side file discovery is O(new
    * files), where the previous append-to-dataDir before/after diff
    * paid TWO full-table directory listings per commit (the last
    * O(live-files) IO on the write path; at object-store scale that
    * LIST volume dominates the commit — Iceberg writers avoid it the
    * same way, collecting task-written paths through the commit
    * protocol instead of listing). Crash story: files move one atomic
    * rename at a time (same filesystem — staging lives beside the data
    * dir); a crash mid-move leaves unreferenced data files and a
    * staging remnant, both reclaimed by [[removeOrphans]] — no
    * snapshot ever references a file that is not fully in place.
    */
  private def writeStaged(write: String => Unit): Seq[String] = {
    val staging = Paths.get(
      s"$tableDir/_staging/${java.util.UUID.randomUUID()}")
    val writeT0 =
      if (GraftTable.writeTiming) System.nanoTime() else 0L
    GraftTable.withMicrosTimestamps(spark)(write(staging.toString))
    if (GraftTable.writeTiming)
      System.err.println(f"[write-timing] ${defn.name} spark-write " +
        f"${(System.nanoTime() - writeT0) / 1e9}%.3f s")
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    val rels = walk(staging.toFile)
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map { f =>
        val rel = staging.relativize(f.toPath)
        val dest = Paths.get(dataDir).resolve(rel)
        Files.createDirectories(dest.getParent)
        Files.move(f.toPath, dest, StandardCopyOption.ATOMIC_MOVE)
        rel.toString
      }
    graft.FsUtil.deleteRecursively(staging) // _SUCCESS + empty dirs
    rels.sorted
  }

  /** The raw write step shared by [[writeFiles]] and the partitioned
    * z-order rewrite (which arranges its own distribution and must not
    * have it re-shuffled): timestamp discipline + partitionBy, staged.
    */
  private def writePhysical(ordered: DataFrame): Seq[String] =
    writeStaged { dir =>
      val writer = ordered.write.mode("append")
      (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer).parquet(dir)
    }

  /** Write rows OUTSIDE the partition layout (equality-delete tombstone
    * files — key tuples only, so partition sources may be absent).
    * Same timestamp discipline as [[writeFiles]]; never listed in a
    * commit's `files`, so no data read ever sees them by accident.
    */
  private def writeRawFiles(df: DataFrame): Seq[String] =
    writeStaged(dir => df.write.mode("append").parquet(dir))

  // ---- reads ----

  /** Logical schema as of a snapshot (latest when None): the commit's
    * carried schemaDdl, else the declared TableDef schema. Time-travel
    * reads use the SNAPSHOT's schema, as Iceberg does — reading v1 of a
    * later-evolved table returns v1's columns.
    */
  def schemaAt(version: Option[Int]): StructType = {
    val cs = commits
    val snap = version match {
      case Some(v) => cs.find(_.version == v)
      case None => cs.lastOption
    }
    snap.flatMap(_.schemaDdlOrNone).map(StructType.fromDDL).getOrElse(defn.schema)
  }

  /** The table's current logical schema (declared + applied evolutions). */
  def currentSchema: StructType = schemaAt(None)

  /** (logical ddl, spec ddl) → derived physical schema. Deriving one
    * costs an empty-frame Catalyst analysis per partition column; the
    * spec-aware read path asks per file GROUP, so memoize.
    */
  private val physSchemaCache =
    scala.collection.concurrent.TrieMap[(String, String), StructType]()

  private def physicalSchemaOf(logical: StructType,
      spec: Seq[PartitionTransform]): StructType =
    physSchemaCache.getOrElseUpdate(
      (logical.toDDL, PartitionTransform.specDdl(spec)), {
        val withParts = spec.foldLeft(
          spark.createDataFrame(new java.util.ArrayList[Row](), logical))(
          (d, p) => d.withColumn(p.name, p.expr))
        withParts.schema
      })

  private def physicalSchemaOf(logical: StructType): StructType =
    physicalSchemaOf(logical, currentPartitions)

  private def physicalSchema: StructType = physicalSchemaOf(currentSchema)

  /** Read a snapshot (default: latest). Returns the physical schema —
    * logical columns plus derived `p_*` partition columns, so callers
    * can filter on partition values and get directory-level pruning.
    */
  def read(version: Option[Int] = None): DataFrame = {
    val cs = commits
    val snap = version match {
      case Some(v) => cs.find(_.version == v)
        .getOrElse(throw new IllegalArgumentException(s"${defn.name}: no snapshot v$v"))
      case None => cs.lastOption.getOrElse(CommitMeta(0, 0L, "empty", 0L, Nil))
    }
    // a raw physical read would resurface position-deleted rows
    require(snap.posDeleteFilesOrEmpty.isEmpty,
      s"${defn.name}: physical read with pending position deletes — " +
        "use readLogical(), or compact() to materialize them")
    // a PHYSICAL read exposes one set of p_* columns, so it can only
    // span one partition-spec generation; after an evolution, logical
    // reads work immediately and compact() migrates the layout
    val byFile = specsByFile(snap)
    val specs = snap.files.map(f => PartitionTransform.specDdl(byFile(f))).distinct
    require(specs.size <= 1,
      s"${defn.name}: physical read across ${specs.size} partition-spec " +
        "generations — use readLogical(), or compact() to migrate the layout")
    val spec = specs.headOption.map(PartitionTransform.parseSpec)
      .getOrElse(partitionsAt(version))
    // the SNAPSHOT's schema: older files missing later-added columns
    // null-fill; columns dropped later still read in a pre-drop snapshot
    val logical = snap.schemaDdlOrNone.map(StructType.fromDDL).getOrElse(defn.schema)
    // a physical read resolves columns by the snapshot's names directly;
    // files that predate a rename store the OLD name and would silently
    // null-fill the renamed column — refuse, like the mixed-spec case
    // (logical reads alias per epoch; compact() migrates the names)
    val log = renameLogOf(Some(snap))
    if (log.nonEmpty) {
      val firstSeen = firstSeenByFile(cs)
      val stale = snap.files.exists(f => storedNamesAt(logical,
        firstSeen.getOrElse(f, Int.MaxValue), log).exists { case (c, s) => s != Some(c) })
      require(!stale,
        s"${defn.name}: physical read over files written before a column " +
          "rename (or a re-added column) — use readLogical(), or compact()")
    }
    val phys = physicalSchemaOf(logical, spec)
    if (snap.files.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), phys)
    else
      spark.read
        .option("basePath", dataDir)
        .schema(phys)
        .parquet(snap.files.map(f => s"$dataDir/$f"): _*)
  }

  /** Logical read: latest snapshot without the derived partition cols.
    * For merge-on-read tables whose live files span several upsert
    * commits, resolves latest-wins per key by commit sequence: each
    * file carries the version that first added it, and only rows from
    * a key's newest sequence survive (ALL of them — a batch with
    * duplicate keys keeps its duplicates, matching copy-on-write). One
    * hash-shuffle on the keys; files from a single sequence (fresh
    * table, or just compacted) skip the merge entirely.
    */
  def readLogical(version: Option[Int] = None): DataFrame = {
    val logical = schemaAt(version)
    val logicalCols = logical.fieldNames.map(org.apache.spark.sql.functions.col)
    val cs = commits
    val snap = version match {
      case Some(v) => cs.find(_.version == v)
        .getOrElse(throw new IllegalArgumentException(s"${defn.name}: no snapshot v$v"))
      case None => cs.lastOption.getOrElse(CommitMeta(0, 0L, "empty", 0L, Nil))
    }
    if (!defn.mergeOnRead) {
      // pending position deletes (this SNAPSHOT's — time travel to a
      // pre-delete version sees the rows) anti-join away per (file, pos)
      snap.posDeleteFilesOrEmpty.keys.toSeq.sorted match {
        case Nil => readFilesLogicalSpecAware(snap.files, logical, Some(snap))
        case ps => applyPosDeletes(
          readFilesLogicalSpecAware(snap.files, logical, Some(snap), withPos = true), ps)
          .select(logicalCols: _*)
      }
    } else {
      val firstSeen = firstSeenByFile(cs)
      val groups = snap.files.groupBy(firstSeen).toSeq.sortBy(_._1)
      val tombs = snap.morDeleteFilesOrEmpty
      if (groups.size <= 1 && tombs.isEmpty)
        readFilesLogicalSpecAware(snap.files, logical, Some(snap))
      else {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions.{col, lit, max}
        val dataLegs = groups.map { case (seq, files) =>
          readFilesLogicalSpecAware(files, logical, Some(snap))
            .withColumn("__seq", lit(seq)).withColumn("__tomb", lit(0))
        }
        // equality-delete tombstones participate in the same latest-wins
        // ordering as data (Iceberg v2 sequence-number semantics): a
        // tombstone newer than a key's newest data kills the key; a
        // later upsert resurrects it. Tombstone files carry ONLY the
        // key tuple; non-key columns ride as nulls and never surface
        // (tombstone rows are filtered out after the window).
        val tombLegs = tombs.toSeq.groupBy(_._2).toSeq.map { case (v, fs) =>
          readKeyFiles(fs.map(_._1), logical).withColumn("__seq", lit(v))
            .withColumn("__tomb", lit(1))
        }
        val union = (dataLegs ++ tombLegs).reduce(_.unionByName(_))
        val newest = max(col("__seq")).over(
          Window.partitionBy(defn.keys.map(col): _*))
        union.withColumn("__newest", newest)
          .filter(col("__seq") === col("__newest") && col("__tomb") === 0)
          .select(logicalCols: _*)
      }
    }
  }

  /** Read equality-delete tombstone files (key columns only) widened to
    * the logical schema with null non-key columns.
    */
  private def readKeyFiles(files: Seq[String], logical: StructType): DataFrame = {
    val keySchema = StructType(logical.fields.filter(f => defn.keys.contains(f.name)))
    val keys = spark.read.schema(keySchema)
      .parquet(files.map(f => s"$dataDir/$f"): _*)
    logical.fields.foldLeft(keys)((d, f) =>
      if (keySchema.fieldNames.contains(f.name)) d
      else d.withColumn(f.name, org.apache.spark.sql.functions.lit(null).cast(f.dataType)))
      .select(logical.fieldNames.map(org.apache.spark.sql.functions.col): _*)
  }

  /** The schema the live files ACTUALLY carry (parquet footers, no
    * declared-schema coercion), minus derived partition columns — what
    * the drift check (S7) compares against the declaration.
    */
  def liveSchema: Option[StructType] =
    commits.lastOption.filter(_.files.nonEmpty).map { snap =>
      // per spec generation AND rename epoch: mixed directory layouts
      // can't be listed in one partition-discovery pass, each group's
      // derived p_* cols are ITS spec's, and a pre-rename file's footer
      // stores the OLD column name — rendered back as the current name
      // so a rename alone never reads as drift
      val byFile = specsByFile(snap)
      val log = renameLogOf(Some(snap))
      val firstSeen: Map[String, Int] =
        if (log.isEmpty) Map.empty else firstSeenByFile(commits)
      val logical = currentSchema
      def epoch(f: String): Map[String, String] =
        if (log.isEmpty) Map.empty
        else storedNamesAt(logical, firstSeen.getOrElse(f, Int.MaxValue), log)
          .collect { case (c, Some(s)) if c != s => s -> c } // stored → current
      val fields = snap.files
        .groupBy(f => (PartitionTransform.specDdl(byFile(f)),
          epoch(f).toSeq.sorted.mkString(",")))
        .toSeq.sortBy(_._1).flatMap { case (_, fs) =>
          val specNames = byFile(fs.head).map(_.name).toSet
          val toCurrent = epoch(fs.head)
          spark.read.option("basePath", dataDir)
            .parquet(fs.map(f => s"$dataDir/$f"): _*)
            .schema.fields.filterNot(f => specNames.contains(f.name))
            .map(f => f.copy(name = toCurrent.getOrElse(f.name, f.name)))
        }
      val seen = scala.collection.mutable.LinkedHashMap[String, StructField]()
      fields.foreach(f => if (!seen.contains(f.name)) seen(f.name) = f)
      StructType(seen.values.toSeq)
    }

  // ---- writes ----

  /** S4 — partitioned append. Row count = previous count + count of the
    * NEW files only — an append commit must never re-scan the table.
    * Appending zero rows to a non-empty table writes no files and no
    * commit (callers then skip the did-I-have-rows pre-check, which
    * would evaluate the input twice).
    */
  def append(df: DataFrame): CommitMeta = {
    val baseV = currentVersion
    val added = writeFiles(df.select(currentSchema.fieldNames.map(df.col): _*))
    val prev = commits.lastOption
    val addedRowsByFile = added.par.map(f => f -> footerRowCount(Seq(f))).seq.toMap
    val addedRows = addedRowsByFile.values.sum
    prev match {
      case Some(p) if addedRows == 0 =>
        // a zero-row write leaves at most one schema-only file behind
        // (Spark writes it when the plan collapses to an empty relation).
        // LEFT IN PLACE, unreferenced: a tailing file stream may already
        // have listed it (it reads as 0 rows — harmless), where deleting
        // it here would crash that reader; removeOrphans reclaims it on
        // the maintenance cadence like any other unreferenced file
        p
      case _ =>
        writeCommit("append", AddFiles(added), baseV, addedRowsByFile)
    }
  }

  // ---- schema evolution ----

  /** Iceberg-style ADD COLUMN: a METADATA-ONLY commit (same live files,
    * zero data rewritten — the point of lakehouse schema evolution at
    * 100 TB) records the widened schema; files written before it simply
    * miss the column and every read null-fills it, so the added fields
    * must be nullable. Name-based resolution (parquet column names, not
    * Iceberg field ids) is what this format can do without rewriting
    * footers — so ADD and DROP are supported and RENAME is not (a
    * rename would silently null out history; Iceberg needs field ids
    * for exactly this reason — documented deviation).
    */
  def addColumns(fields: StructField*): CommitMeta = {
    require(fields.nonEmpty, s"${defn.name}: addColumns with no columns")
    val cur = currentSchema
    val taken = (cur.fieldNames ++ partCols).map(_.toLowerCase).toSet
    fields.foreach { f =>
      require(!taken.contains(f.name.toLowerCase),
        s"${defn.name}: column '${f.name}' already exists")
      require(f.nullable,
        s"${defn.name}: added column '${f.name}' must be nullable — " +
          "files written before the evolution have no values for it")
    }
    val dup = fields.groupBy(_.name.toLowerCase).collect { case (n, fs) if fs.size > 1 => n }
    require(dup.isEmpty, s"${defn.name}: duplicate added column(s) ${dup.mkString(", ")}")
    val next = StructType(cur.fields ++ fields)
    val cs = commits
    // a re-add of a name that ever existed gets an `add` log entry so
    // files predating it read the column as ABSENT (not as whatever
    // dead values their footers still carry under that name)
    val v = currentVersion + 1
    val proneEntries = fields.filter(f => resurrectionProne(f.name, cs))
      .map(f => s"$v||${f.name}")
    writeCommit("evolve-schema", MetadataOnly(None),
      cs.lastOption.map(_.version).getOrElse(0),
      newSchemaDdl = Some(next.toDDL),
      newRenames =
        if (proneEntries.isEmpty) None
        else Some(cs.lastOption.map(_.renamesOrEmpty).getOrElse(Nil) ++ proneEntries))
  }

  /** Iceberg-style DROP COLUMN: metadata-only — the column's values stay
    * in existing files (readable through time travel to a pre-drop
    * snapshot) but every current-schema read projects them away. Refuses
    * to drop identifier keys (upsert resolution needs them) and columns
    * a partition transform derives from (the physical layout reads them
    * on every write).
    */
  def dropColumns(names: String*): CommitMeta = {
    require(names.nonEmpty, s"${defn.name}: dropColumns with no columns")
    val cur = currentSchema
    val have = cur.fieldNames.map(n => n.toLowerCase -> n).toMap
    names.foreach { n =>
      require(have.contains(n.toLowerCase), s"${defn.name}: no column '$n'")
      require(!defn.keys.exists(_.equalsIgnoreCase(n)),
        s"${defn.name}: cannot drop identifier key '$n'")
    }
    val dropped = names.map(_.toLowerCase).toSet
    val next = StructType(cur.fields.filterNot(f => dropped.contains(f.name.toLowerCase)))
    require(next.nonEmpty, s"${defn.name}: cannot drop every column")
    // a partition transform that reads a dropped column would break every
    // subsequent write — probe by deriving the partition columns over the
    // narrowed schema, exactly as writeFiles will
    try physicalSchemaOf(next)
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"${defn.name}: a partition transform depends on a dropped column " +
            s"(${e.getMessage.linesIterator.next()})")
    }
    val cs = commits
    val v = currentVersion + 1
    // drop entries are the PERMANENT record that these names existed
    // (they survive snapshot expiry), so a later re-add is detected as
    // resurrection-prone; resolution itself never matches them
    val dropEntries = names.map(n => s"$v|${have(n.toLowerCase)}|")
    writeCommit("evolve-schema", MetadataOnly(None),
      cs.lastOption.map(_.version).getOrElse(0),
      newSchemaDdl = Some(next.toDDL),
      newRenames = Some(cs.lastOption.map(_.renamesOrEmpty).getOrElse(Nil) ++ dropEntries))
  }

  /** Iceberg-style RENAME COLUMN: a METADATA-ONLY commit (zero data
    * rewritten) records the new name in the schema AND an entry in the
    * carried rename log; every read resolves each file's STORED name
    * from its first-seen version against the log — Iceberg reaches the
    * same safety through field ids, this format through versioned name
    * provenance (commit jsons are the only metadata it owns). Old
    * files keep serving their values under the new logical name
    * immediately; [[compact]] migrates stale-named files to the
    * current names on the normal maintenance cadence. Refuses
    * identifier keys (upsert resolution joins on the TableDef names),
    * partition-transform sources and declared sort columns (the write
    * layout derives from them by name), exactly the columns Iceberg
    * users also treat as pinned in practice.
    */
  def renameColumn(oldName: String, newName: String): CommitMeta = {
    val cur = currentSchema
    val exact = cur.fieldNames.find(_.equalsIgnoreCase(oldName)).getOrElse(
      throw new IllegalArgumentException(s"${defn.name}: no column '$oldName'"))
    require(newName.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"${defn.name}: bad column name '$newName'")
    val taken = (cur.fieldNames ++ partCols).map(_.toLowerCase).toSet
    require(!taken.contains(newName.toLowerCase),
      s"${defn.name}: column '$newName' already exists")
    require(!defn.keys.exists(_.equalsIgnoreCase(oldName)),
      s"${defn.name}: cannot rename identifier key '$oldName'")
    require(!currentPartitions.exists(_.source.equalsIgnoreCase(oldName)),
      s"${defn.name}: cannot rename partition-transform source '$oldName'")
    require(!defn.sortOrder.exists(_.equalsIgnoreCase(oldName)),
      s"${defn.name}: cannot rename declared sort column '$oldName'")
    val next = StructType(cur.fields.map(f =>
      if (f.name == exact) f.copy(name = newName) else f))
    val prev = commits.lastOption
    writeCommit("evolve-schema", MetadataOnly(None),
      prev.map(_.version).getOrElse(0),
      newSchemaDdl = Some(next.toDDL),
      newRenames = Some(prev.map(_.renamesOrEmpty).getOrElse(Nil) :+
        s"${prev.map(_.version).getOrElse(0) + 1}|$exact|$newName"))
  }

  /** Iceberg-style partition-spec evolution: a METADATA-ONLY commit
    * switches the spec for FUTURE writes; every existing file keeps the
    * layout it was written under (recorded per file in the commit log),
    * logical reads union the generations transparently, and compact()
    * migrates old-generation files to the current layout on the normal
    * maintenance cadence. Physical reads (which expose one set of p_*
    * columns) refuse while generations are mixed. This is exactly
    * Iceberg's evolution model — no eager rewrite of 100 TB because the
    * partitioning got finer.
    */
  def evolvePartitioning(spec: Seq[PartitionTransform]): CommitMeta = {
    val cur = currentSchema
    spec.foreach { p =>
      require(cur.fieldNames.exists(_.equalsIgnoreCase(p.source)),
        s"${defn.name}: partition source '${p.source}' is not a column")
      require(!cur.fieldNames.exists(_.equalsIgnoreCase(p.name)),
        s"${defn.name}: derived partition column '${p.name}' collides with a data column")
    }
    val names = spec.map(_.name.toLowerCase)
    require(names.distinct.size == names.size,
      s"${defn.name}: duplicate derived partition column names")
    val ddl = PartitionTransform.specDdl(spec)
    require(ddl != PartitionTransform.specDdl(currentPartitions),
      s"${defn.name}: partition spec is already '$ddl'")
    require(PartitionTransform.specDdl(PartitionTransform.parseSpec(ddl)) == ddl,
      s"${defn.name}: partition spec does not round-trip: '$ddl'")
    physicalSchemaOf(cur, spec) // probe derivability against the schema
    writeCommit("evolve-partition", MetadataOnly(None), currentVersion,
      newPartSpecDdl = Some(ddl))
  }

  /** Iceberg's `rollback_to_snapshot`: a NEW commit whose live set (and
    * schema, spec, tombstones) is snapshot `version`'s — the bad
    * commits stay in the log (auditable, still time-travelable) but the
    * head no longer derives from them; expiry reclaims them on the
    * normal cadence. Metadata-only: no data moves. Sink marks are NOT
    * rolled back — a streaming producer must not replay batches the
    * sink already de-duplicated (Iceberg keeps summary properties of
    * rolled-back snapshots out of reach the same way; the mark rides
    * the max over the whole log here).
    */
  def rollback(version: Int): CommitMeta = {
    val cs = commits
    val target = cs.find(_.version == version).getOrElse(
      throw new IllegalArgumentException(s"${defn.name}: no snapshot v$version to roll back to"))
    require(version < currentVersion,
      s"${defn.name}: rollback target v$version is not an ancestor of v$currentVersion")
    writeCommit("rollback", MetadataOnly(Some(target.files)),
      cs.lastOption.map(_.version).getOrElse(0),
      newSchemaDdl = Some(target.schemaDdlOrNone.getOrElse(defn.schema.toDDL)),
      morDeletes = (_, _) => target.morDeleteFilesOrEmpty,
      newPartSpecDdl = Some(target.partSpecDdlOrNone
        .getOrElse(PartitionTransform.specDdl(defn.partitions))),
      fileSpecsOverride = Some(target.fileSpecsOrEmpty),
      newRenames = Some(target.renamesOrEmpty),
      posDeletes = (_, _) => target.posDeleteFilesOrEmpty)
  }

  /** Iceberg's `TIMESTAMP AS OF`: the snapshot that was current at
    * `tsMs` (the last commit at or before it).
    */
  def versionAsOf(tsMs: Long): Int = {
    val cs = commits.filter(_.tsMs <= tsMs)
    require(cs.nonEmpty, s"${defn.name}: no snapshot existed at $tsMs")
    cs.last.version
  }

  def readAsOfLogical(tsMs: Long): DataFrame =
    readLogical(Some(versionAsOf(tsMs)))

  /** M1 — full overwrite (CTAS materialization). */
  def overwrite(df: DataFrame): CommitMeta = {
    val baseV = currentVersion
    val added = writeFiles(df.select(currentSchema.fieldNames.map(df.col): _*))
    // a full rewrite supersedes any pending position deletes
    writeCommit("overwrite", ReplaceContent(Nil, added), baseV,
      posDeletes = (_, _) => Map.empty)
  }

  /** S5 — keyed upsert: rows in `batch` replace live rows with the same
    * identifier-key tuple (latest wins), everything else is carried
    * over. Two strategies, per `TableDef.mergeOnRead`:
    *
    *  - **copy-on-write** (default): surviving+new rows are written as
    *    fresh files and the commit swaps the live set atomically. Write
    *    cost O(table), reads free — right for tables revised rarely.
    *  - **merge-on-read**: ONLY the batch is written; superseded rows
    *    stay in older files and [[readLogical]] resolves latest-wins by
    *    commit sequence. Write cost O(batch) — the only strategy that
    *    survives a continuously-revising streaming upsert at 100 TB
    *    (Iceberg v2's upsert mode is the same trade; its equality
    *    deletes are this sequence rule in file form). Reads pay a
    *    key-shuffle until [[compact]] materializes the merge, so
    *    compaction cadence bounds read cost. Commit rowCount records
    *    PHYSICAL rows (logical count would force the merge at commit).
    */
  def upsert(batch: DataFrame): CommitMeta = upsert(batch, trackChanges = true)

  def upsert(batch: DataFrame, trackChanges: Boolean): CommitMeta = {
    require(defn.isUpsert, s"${defn.name} has no identifier keys")
    val baseV = currentVersion
    val cols = currentSchema.fieldNames.map(batch.col)
    val b = batch.select(cols: _*)
    if (defn.mergeOnRead) {
      // O(batch) addition — latest-wins resolution happens at read, so
      // the commit commutes with interleaved writers like an append
      val added = writeFiles(b)
      writeCommit("upsert-mor", AddFiles(added), baseV)
    } else if (!trackChanges) {
      // opt-out: one merged write, NO changeFiles — the commit's change
      // set is unknowable and readChanges refuses it (same contract as
      // pre-upgrade upsert jsons). Measured worth: the split write
      // reads ~1.34× on the s5 bench row — a table nobody tails is
      // entitled to skip that premium.
      val cur = readLogical().alias("cur")
      val bb = b.alias("b")
      val sameKey = defn.keys
        .map(k => org.apache.spark.sql.functions.col(s"cur.$k") <=>
          org.apache.spark.sql.functions.col(s"b.$k"))
        .reduce(_ && _)
      val survivors = cur.join(bb, sameKey, "left_anti")
        .select(currentSchema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      // the COW rewrite reads the visible state (pos deletes applied)
      // and replaces every file — pending tombstones are materialized
      writeCommit("upsert",
        ReplaceContent(Nil, writeFiles(survivors.unionByName(b))), baseV,
        posDeletes = (_, _) => Map.empty)
    } else {
      // null-safe key match (<=>): a name-list join compares with =, so a
      // NULL key tuple never matches and the old null-key row would
      // survive alongside the new one — while the MOR path's latest-wins
      // window groups nulls together and keeps only the newest. Both
      // strategies must stay observably identical.
      val cur = readLogical().alias("cur")
      val bb = b.alias("b")
      val sameKey = defn.keys
        .map(k => org.apache.spark.sql.functions.col(s"cur.$k") <=>
          org.apache.spark.sql.functions.col(s"b.$k"))
        .reduce(_ && _)
      val survivors = cur.join(bb, sameKey, "left_anti")
        .select(currentSchema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      // batch and survivors land in SEPARATE files so the commit can
      // name the batch's files as its change set (changeFiles) — that
      // is what lets readChanges serve CDC rows for a COW upsert
      // instead of refusing (Iceberg's changelog scan reads the same
      // facts from a MERGE's equality-delete files). Same total write
      // volume as the former single merged write; one extra file per
      // touched partition until the next compact.
      val batchFiles = writeFiles(b)
      val survivorFiles = writeFiles(survivors)
      writeCommit("upsert", ReplaceContent(Nil, survivorFiles ++ batchFiles),
        baseV, changeFiles = batchFiles,
        posDeletes = (_, _) => Map.empty)
    }
  }

  /** S5b — merge-on-read equality DELETE (Iceberg v2 delete files): the
    * commit writes ONLY the key tuples as a tombstone file — O(keys),
    * zero data rewritten, the only delete shape that survives a
    * continuously-deleting stream at 100 TB (GDPR erasure, retraction
    * feeds) — and [[readLogical]] folds tombstones into the latest-wins
    * sequence resolution: a tombstone kills matching rows from OLDER
    * sequences; a later upsert resurrects the key. [[compact]]
    * materializes pending tombstones away, which is what bounds the
    * read-side cost — the same compaction-cadence trade as MOR upserts.
    * Copy-on-write tables use [[replaceWhere]]/[[replaceKeys]] instead.
    * One tombstone file per commit (distinct keys, single writer task);
    * an Iceberg-scale deployment shards delete files per partition —
    * the sequence semantics are unchanged by that split.
    */
  def deleteKeys(staleKeys: DataFrame): CommitMeta = {
    require(defn.mergeOnRead,
      s"${defn.name}: equality deletes are merge-on-read only — " +
        "copy-on-write tables use replaceWhere/replaceKeys")
    val k = staleKeys.select(defn.keys.map(staleKeys.col): _*)
      .distinct().repartition(1)
    val added = writeRawFiles(k)
    val prev = commits.lastOption
    if (added.isEmpty) // zero keys → a schema-only stub at most; no commit
      return prev.getOrElse(CommitMeta(0, 0L, "empty", 0L, Nil))
    writeCommit("delete-mor", TombstoneEq, prev.map(_.version).getOrElse(0),
      morDeletes = (m, v) => m ++ added.map(_ -> v))
  }

  /** Schema of a position-delete tombstone file. */
  private val posPairSchema = StructType(Seq(
    StructField("__file", StringType), StructField("__pos", LongType)))

  /** The (data file, row index) pairs a set of pos-delete files holds. */
  private def posPairs(posFiles: Seq[String]): DataFrame =
    spark.read.schema(posPairSchema)
      .parquet(posFiles.map(f => s"$dataDir/$f"): _*)

  /** Anti-join pending position deletes out of a provenance-carrying
    * read (one produced with `withPos = true`). The tombstone side is
    * broadcast while it fits an executor budget — the overwhelmingly
    * common case (a predicate delete's tombstones are O(matches), tiny
    * next to the table) — so the read pays no extra shuffle; past the
    * bound it degrades to a shuffled anti-join, never to wrong rows.
    */
  private def applyPosDeletes(data: DataFrame, posFiles: Seq[String]): DataFrame = {
    val totalBytes = posFiles.map(f => new File(s"$dataDir/$f").length()).sum
    val dels = posPairs(posFiles)
    val hinted =
      if (totalBytes <= GraftTable.PosDeleteBroadcastBytes)
        org.apache.spark.sql.functions.broadcast(dels)
      else dels
    data.join(hinted, Seq("__file", "__pos"), "left_anti")
  }

  /** True while un-compacted position-delete tombstones are live — raw
    * file reads (range reads, replace rewrites, physical reads) would
    * resurface deleted rows, so those paths refuse until [[compact]]
    * materializes the deletes (mirroring the MOR-sequence refusals).
    */
  private def posPending: Boolean =
    commits.lastOption.exists(_.posDeleteFilesOrEmpty.nonEmpty)

  /** S5c — predicate DELETE, Iceberg v2's position-delete shape (`DELETE
    * FROM ... WHERE <any predicate>`): scans the VISIBLE state with file
    * /row-index provenance, writes ONLY the matching rows' (file, pos)
    * tuples as a tombstone file — O(matches) written, zero data
    * rewritten — and every logical read anti-joins them away until
    * [[compact]] rewrites exactly the files the tombstones reference.
    * This is the delete shape for non-key predicates on append/COW
    * tables, where [[replaceWhere]] would rewrite every overlapping
    * file; at 100 TB a small predicate delete must not cost a window
    * rewrite. The scan applies PENDING tombstones first, so a second
    * delete never re-tombstones an already-deleted row.
    *
    * Merge-on-read tables DELEGATE to [[deleteKeys]] on the matching
    * visible rows' keys: MOR shadowing is implicit (latest-wins by
    * sequence), so a position delete of a key's newest physical row
    * would resurface its superseded versions — the equality-delete form
    * is the one with sound semantics there, and it is key-granular (a
    * matching row deletes its whole key tuple). One tombstone file per
    * commit (single writer task); an Iceberg-scale deployment shards
    * delete files per partition — the read semantics are unchanged.
    */
  def deleteWhere(condition: org.apache.spark.sql.Column): CommitMeta =
    deleteWhere(condition, None)

  /** With a [[RangePrune]] hint, the match scan opens ONLY the files
    * whose footer bounds intersect the range (same caller contract as
    * [[replaceWhere]]: every row the condition can match lies inside
    * it) — a bounded predicate delete then reads O(window), writes
    * O(matches), and rewrites nothing.
    */
  def deleteWhere(condition: org.apache.spark.sql.Column,
      prune: Option[RangePrune]): CommitMeta = {
    if (defn.mergeOnRead)
      return deleteKeys(readLogical().filter(condition))
    val prev = commits.lastOption
    if (prev.forall(_.files.isEmpty))
      return prev.getOrElse(CommitMeta(0, 0L, "empty", 0L, Nil))
    val snap = prev.get
    val logical = currentSchema
    val (_, overlapping) = classifyLiveFiles(prune)
    val base = readFilesLogicalSpecAware(overlapping, logical, Some(snap),
      withPos = true)
    val visible = snap.posDeleteFilesOrEmpty.keys.toSeq.sorted match {
      case Nil => base
      case ps => applyPosDeletes(base, ps)
    }
    val matches = visible.filter(condition)
      .select(org.apache.spark.sql.functions.col("__file"),
        org.apache.spark.sql.functions.col("__pos"))
      .repartition(1)
    val added = writeRawFiles(matches)
    // zero matches → no commit (a schema-only stub stays unreferenced
    // for removeOrphans, the append() convention)
    if (added.isEmpty || footerRowCount(added) == 0) return snap
    writeCommit("delete-pos", TombstonePos, snap.version,
      posDeletes = (m, v) => m ++ added.map(_ -> v))
  }

  /** Targeted delete+re-insert for the materializer repair passes
    * (M4–M6): drop live rows matching `condition`, append `replacement`.
    * With a [[RangePrune]] hint, files provably outside the repair range
    * survive into the new commit untouched; only overlapping files are
    * read, row-filtered, and rewritten.
    */
  def replaceWhere(
      condition: org.apache.spark.sql.Column,
      replacement: DataFrame,
      prune: Option[RangePrune] = None,
      trackChanges: Boolean = false): CommitMeta = {
    require(!defn.mergeOnRead || (morSequences <= 1 && !morPending),
      s"${defn.name}: replace over un-compacted merge-on-read sequences is unsound")
    require(!posPending,
      s"${defn.name}: replace with pending position deletes is unsound — compact() first")
    val baseV = currentVersion
    val (untouched, toRewrite) = classifyLiveFiles(prune)
    val keep = readFilesLogicalSpecAware(toRewrite, currentSchema, commits.lastOption)
      .filter(!condition || condition.isNull)
    val repl = replacement.select(currentSchema.fieldNames.map(replacement.col): _*)
    val prev = commits.lastOption
    if (trackChanges) {
      // change-tracked form (opt-in — the CDC writes below are a real
      // extra cost the default repair path must not pay): the
      // replacement lands in its OWN files (the commit's change set)
      // and the rows the condition removes are materialized as DELETE
      // files (one extra scan of the rewritten window, O(affected
      // window) like the rewrite itself) — Iceberg v2's delete-file
      // scheme, which is what lets readChanges serve insert+delete
      // rows for a repair instead of forcing a consumer full-resync.
      val deleted = readFilesLogicalSpecAware(toRewrite, currentSchema, commits.lastOption)
        .filter(condition)
      val keepFiles = writeFiles(keep)
      val replFiles = writeFiles(repl)
      val delFiles = writeFiles(deleted)
      writeCommit("replace-cdc", ReplaceContent(untouched, keepFiles ++ replFiles),
        baseV, changeFiles = replFiles, deleteFiles = delFiles)
    } else {
      val added = writeFiles(keep.unionByName(repl))
      // nothing deleted (no file overlapped the condition) and nothing
      // inserted ⇒ a no-op: skip the commit, mirroring append()'s
      // zero-row skip (any schema-only stub file stays unreferenced for
      // removeOrphans, same as there)
      prev match {
        case Some(p) if toRewrite.isEmpty && footerRowCount(added) == 0 => p
        case _ => writeCommit("replace", ReplaceContent(untouched, added), baseV)
      }
    }
  }

  /** Keyed delete+re-insert: drop live rows whose `keyCols` tuple appears
    * in `staleKeys`, append `replacement`. The deletion is an anti-join
    * (distributed — no driver-side key collection), so it scales to
    * arbitrarily many stale keys; this is the engine's MERGE primitive
    * for the materializer repair passes (M5/M6). The key set is counted
    * once (persisted, so the count is not a recompute) and BROADCAST
    * when bounded — the steady-state repair case, where keys come from a
    * fixed detection window — turning the delete into a broadcast
    * anti-join with zero shuffle of the rewritten rows; past the bound
    * it stays a shuffled join. `prune` is only safe when every row a
    * stale key can match lies inside the range (e.g. the key tuple
    * includes the timestamp column) — the caller asserts that by
    * passing it.
    */
  def replaceKeys(
      staleKeys: DataFrame,
      keyCols: Seq[String],
      replacement: DataFrame,
      prune: Option[RangePrune] = None,
      knownKeyCount: Option[Long] = None,
      trackChanges: Boolean = false): CommitMeta = {
    require(!defn.mergeOnRead || (morSequences <= 1 && !morPending),
      s"${defn.name}: replace over un-compacted merge-on-read sequences is unsound")
    require(!posPending,
      s"${defn.name}: replace with pending position deletes is unsound — compact() first")
    val baseV = currentVersion
    val keyProj = staleKeys.select(keyCols.map(staleKeys.col): _*)
    // `knownKeyCount` = the caller already distincted/persisted/counted
    // the key set (the Materializer repair passes do) — reuse it rather
    // than re-shuffling and re-caching the same keys; duplicates are
    // harmless to a left-anti join, so no defensive distinct either way
    val (keys, ownedCache, nKeys) = knownKeyCount match {
      case Some(n) => (keyProj, false, n)
      case None =>
        val k = keyProj.distinct().persist()
        (k, true, k.count())
    }
    try {
      if (nKeys == 0) {
        // nothing to delete ⇒ nothing may be inserted either (a repair
        // pass derives `replacement` FROM the keys; silently dropping a
        // non-empty replacement here would lose data for any caller
        // using this as insert-or-replace — that caller wants append).
        // The isEmpty probe is one limit-1 job on the rare no-op path.
        require(replacement.isEmpty,
          s"${defn.name}: replaceKeys with zero keys but a non-empty replacement — use append")
        return commits.lastOption.getOrElse(CommitMeta(0, 0L, "empty", 0L, Nil))
      }
      val (untouched, toRewrite) = timed("replaceKeys/classify")(classifyLiveFiles(prune))
      val hinted =
        if (nKeys <= GraftTable.BroadcastKeyLimit)
          org.apache.spark.sql.functions.broadcast(keys)
        else keys
      val keep = readFilesLogicalSpecAware(toRewrite, currentSchema, commits.lastOption)
        .join(hinted, keyCols, "left_anti")
      val repl = replacement.select(currentSchema.fieldNames.map(replacement.col): _*)
      if (trackChanges) {
        // opt-in CDC form — see replaceWhere: replacement in its own
        // files, deleted rows (the keys' SEMI-join complement of keep)
        // materialized as delete files
        val deleted = readFilesLogicalSpecAware(toRewrite, currentSchema, commits.lastOption)
          .join(hinted, keyCols, "left_semi")
        val keepFiles = timed("replaceKeys/write")(writeFiles(keep))
        val replFiles = writeFiles(repl)
        val delFiles = writeFiles(deleted)
        timed("replaceKeys/commit")(writeCommit("replace-cdc",
          ReplaceContent(untouched, keepFiles ++ replFiles), baseV,
          changeFiles = replFiles, deleteFiles = delFiles))
      } else {
        val added = timed("replaceKeys/write")(writeFiles(keep.unionByName(repl)))
        timed("replaceKeys/commit")(
          writeCommit("replace", ReplaceContent(untouched, added), baseV))
      }
    } finally if (ownedCache) keys.unpersist()
  }

  /** Split the live file set into (provably-outside-range → carry over,
    * possibly-overlapping → rewrite). No hint, or any file with unusable
    * stats, degrades to rewriting everything — never to wrong results.
    */
  private def classifyLiveFiles(prune: Option[RangePrune]): (Seq[String], Seq[String]) = {
    val live = commits.lastOption.map(_.files).getOrElse(Nil)
    prune match {
      case None => (Nil, live)
      case Some(p) =>
        // bounds come from the snapshot's MANIFEST entries (persisted at
        // write time) — a metadata-log lookup, zero data-file footer IO.
        // Manifests store bounds under the WRITE-TIME column name, so a
        // renamed pruning column is probed under each file's stored name
        // (a miss there degrades to rewrite, never to a wrong carry).
        // Only files migrated from pre-manifest commits (no recorded
        // bounds at all) fall back to a parallel footer probe.
        val stored = storedColumnByFile(p.column)
        val bounds = boundsByFile(commits.lastOption, live, stored)
        if (bounds.exists(_._2.isEmpty)) (Nil, live)
        else {
          val (out, in) = bounds.partition {
            case (_, Some((lo, hi))) => hi < p.loMicros || lo > p.hiMicros
            case _ => false
          }
          (out.map(_._1), in.map(_._1))
        }
    }
  }

  /** Per-file bounds of a (possibly renamed) column over `files`:
    * manifest entries first — a key present is the written bounds, a
    * key absent from a RECORDED bounds map means the stats were
    * unusable at write time (same verdict a footer probe would reach,
    * without the IO) — and a parquet footer probe only for files whose
    * entry predates bounds recording entirely.
    */
  private def boundsByFile(snap: Option[CommitMeta], files: Seq[String],
      stored: String => String): Seq[(String, Option[(Long, Long)])] = {
    val persisted = snap.map(manifestBoundsOf).getOrElse(Map.empty)
    val rows = snap.map(_.fileRowsOrEmpty).getOrElse(Map.empty)
    files.par.map { f =>
      f -> (persisted.get(f) match {
        // a zero-row file (Spark's schema-only artifact) has no blocks
        // and so no recorded columns — its bounds are the empty range
        // for EVERY column, same as a footer probe would conclude
        case Some(_) if rows.getOrElse(f, -1L) == 0L =>
          Some((Long.MaxValue, Long.MinValue))
        case Some(bm) => bm.get(stored(f))
        case None => fileBoundsMicros(f, stored(f))
      })
    }.seq
  }

  /** file → the name the file's FOOTER stores for the current logical
    * column `cur` (identity when the table was never renamed — the
    * common case allocates nothing per file).
    */
  private def storedColumnByFile(cur: String): String => String = {
    val log = renameLogOf(commits.lastOption)
    if (log.isEmpty) _ => cur
    else {
      val firstSeen = firstSeenByFile(commits)
      // absent-for-epoch → probe a name no footer has: stats come back
      // unusable and the caller degrades to reading the file (safe)
      f => storedNameOf(cur, firstSeen.getOrElse(f, Int.MaxValue), log)
        .getOrElse("\u0000absent")
    }
  }

  /** Footer min/max of an INT64 column (µs for TIMESTAMP) across a
    * file's row groups. None ⇒ stats unusable (column missing — e.g. a
    * partition column not stored in the data file — or not INT64, or
    * not recorded); callers must treat None as "may contain anything".
    * A file whose every value is null gets the empty range
    * (MaxValue, MinValue), which intersects nothing.
    */
  private def fileBoundsMicros(file: String, colName: String): Option[(Long, Long)] = {
    GraftTable.footerProbeCount.incrementAndGet() // test pin: the pruned
    // path on manifest-format tables must never reach this fallback
    val conf = spark.sessionState.newHadoopConf()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(s"$dataDir/$file"), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      var lo = Long.MaxValue
      var hi = Long.MinValue
      var usable = true
      r.getFooter.getBlocks.asScala.foreach { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == colName) match {
          case Some(c) =>
            val s = c.getStatistics
            if (s == null) usable = false
            else if (s.hasNonNullValue) (s.genericGetMin, s.genericGetMax) match {
              case (mn: java.lang.Long, mx: java.lang.Long) =>
                lo = math.min(lo, mn)
                hi = math.max(hi, mx)
              case _ => usable = false
            }
            else if (!(s.isNumNullsSet && s.getNumNulls == b.getRowCount)) usable = false
          case None => usable = false
        }
      }
      if (usable) Some((lo, hi)) else None
    } finally r.close()
  }

  /** Footer max of an INT64/timestamp column over the live snapshot — a
    * metadata-only watermark read. None ⇒ stats unusable on some file or
    * no non-null value anywhere; callers fall back to a data scan.
    */
  def columnMaxMicros(colName: String): Option[Long] = {
    val live = commits.lastOption.map(_.files).getOrElse(Nil)
    val stored = storedColumnByFile(colName)
    val bounds = boundsByFile(commits.lastOption, live, stored).map(_._2)
    if (bounds.exists(_.isEmpty)) None
    else bounds.flatten.map(_._2).filter(_ != Long.MinValue) match {
      case Nil => None
      case maxes => Some(maxes.max)
    }
  }

  /** Range-pruned logical read: only live files whose footer bounds
    * intersect `[loMicros, hiMicros]` of `colName` are opened (plus any
    * with unusable stats). Callers still apply their exact row filter —
    * this prunes FILES the way the replace path does, so a bounded
    * repair window reads O(window), not O(table). Raw-file read: a
    * merge-on-read table with un-compacted upsert sequences would need
    * ALL of a key's files to resolve latest-wins, which file pruning
    * cannot guarantee — refuse loudly rather than return superseded
    * rows (compact() collapses a MOR table to one sequence, after which
    * the read is sound again).
    */
  def readRangeLogical(colName: String, loMicros: Long, hiMicros: Long): DataFrame = {
    require(!defn.mergeOnRead || (morSequences <= 1 && !morPending),
      s"${defn.name}: range read over ${morSequences} merge-on-read upsert sequences " +
        "would skip latest-wins resolution — compact() first")
    require(!posPending,
      s"${defn.name}: range read with pending position deletes would " +
        "resurface deleted rows — compact() first")
    val (_, overlapping) = classifyLiveFiles(Some(RangePrune(colName, loMicros, hiMicros)))
    readFilesLogicalSpecAware(overlapping, currentSchema, commits.lastOption)
  }

  /** file → the commit version that FIRST added it — the merge-on-read
    * sequence number readLogical's latest-wins resolution orders by.
    * One definition for every MOR-aware code path.
    */
  private def firstSeenByFile(cs: Seq[CommitMeta]): Map[String, Int] =
    cs.flatMap(c => c.files.map(_ -> c.version)).groupBy(_._1)
      .view.mapValues(_.map(_._2).min).toMap

  /** Distinct upsert sequences among the live files of a merge-on-read
    * table (1 after compaction; raw-file reads are sound only then).
    */
  private def morSequences: Int = {
    val cs = commits
    cs.lastOption.map(snap =>
      snap.files.map(firstSeenByFile(cs)).distinct.size).getOrElse(0)
  }

  /** True while un-compacted equality-delete tombstones are live — raw
    * file reads (range reads, replace rewrites) would resurface deleted
    * rows, so the same paths that refuse multi-sequence MOR state
    * refuse this too (compact() clears both).
    */
  private def morPending: Boolean =
    commits.lastOption.exists(_.morDeleteFilesOrEmpty.nonEmpty)

  /** Raw read of specific data files, projected to the logical columns —
    * the incremental-scan primitive: the materializer reads ONLY the
    * files a snapshot delta added, O(new data) regardless of table size.
    * Append-only file sets only (a merge-on-read file does not carry its
    * shadowed rows); the caller asserts that by knowing the delta's ops.
    */
  private[graft] def readFilesLogical(files: Seq[String]): DataFrame =
    readFilesLogicalSpecAware(files, currentSchema, commits.lastOption)

  private def readFilesAs(files: Seq[String],
      logical: StructType = currentSchema,
      spec: Seq[PartitionTransform] = null): DataFrame = {
    val phys = physicalSchemaOf(logical,
      Option(spec).getOrElse(currentPartitions))
    if (files.isEmpty) spark.createDataFrame(new java.util.ArrayList[Row](), phys)
    else spark.read.option("basePath", dataDir).schema(phys)
      .parquet(files.map(f => s"$dataDir/$f"): _*)
  }

  /** Logical projection over arbitrary live files, PARTITION-SPEC- and
    * RENAME-aware: files are grouped by the spec they were written
    * under AND by their stored-name epoch (which renames they predate),
    * each group is read with its own directory layout and its own
    * stored column names, aliased to the current logical names, then
    * unioned — how every logical-level consumer survives a partition
    * evolution or a column rename (a never-evolved table is one group
    * and takes the plain path).
    */
  /** Relative-to-dataDir path of the row's source file, from the
    * parquet `_metadata` hidden column — the provenance half of a
    * position delete's (file, pos) identity.
    */
  private def relFileCol: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    element_at(split(col("_metadata.file_path"),
      java.util.regex.Pattern.quote(s"$dataDir/")), 2)
  }

  private def readFilesLogicalSpecAware(files: Seq[String], logical: StructType,
      snap: Option[CommitMeta], withPos: Boolean = false,
      renameLog: Option[Seq[(Int, String, String)]] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val posCols =
      if (withPos) Seq(relFileCol.as("__file"),
        col("_metadata.row_index").as("__pos"))
      else Nil
    val logicalCols = logical.fieldNames.map(c => col(c): org.apache.spark.sql.Column)
    if (files.isEmpty) {
      val schema =
        if (!withPos) logical
        else StructType(logical.fields ++ Seq(
          StructField("__file", StringType), StructField("__pos", LongType)))
      return spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    }
    val effSnap = snap.orElse(commits.lastOption)
    val byFile = effSnap.map(specsByFile)
      .getOrElse(Map.empty[String, Seq[PartitionTransform]]
        .withDefaultValue(defn.partitions))
    // rename resolution defaults to the snapshot's own log; a caller
    // projecting a LATER schema (readChanges' range-end contract)
    // overrides with the later log so post-snapshot renames still map
    // the file's stored names onto the projected ones
    val log = renameLog.getOrElse(renameLogOf(effSnap))
    // the first-seen index is only needed once a rename exists; a file
    // outside any commit's live set (defensive default) reads as
    // current-named
    val firstSeen: Map[String, Int] =
      if (log.isEmpty) Map.empty else firstSeenByFile(commits)
    // non-identity resolutions only: Some(other) = stored under a
    // pre-rename name; None = ABSENT for this epoch (predates a
    // resurrection-prone re-add — must NOT read the dead same-named
    // column the file may still carry)
    def storedOf(f: String): Map[String, Option[String]] =
      if (log.isEmpty) Map.empty
      else storedNamesAt(logical, firstSeen.getOrElse(f, Int.MaxValue), log)
        .filter { case (c, s) => s != Some(c) }
    files.groupBy(f => (PartitionTransform.specDdl(byFile(f)),
        storedOf(f).toSeq.sortBy(_._1).mkString(",")))
      .toSeq.sortBy(_._1)
      .map { case (_, fs) =>
        val stored = storedOf(fs.head)
        if (stored.isEmpty)
          readFilesAs(fs, logical, byFile(fs.head)).select(logicalCols ++ posCols: _*)
        else {
          val storedSchema = StructType(logical.fields.flatMap(f =>
            stored.get(f.name) match {
              case Some(None) => None // absent: never read the dead column
              case Some(Some(s)) => Some(f.copy(name = s))
              case None => Some(f)
            }))
          readFilesAs(fs, storedSchema, byFile(fs.head))
            .select(logical.fields.map(f => stored.get(f.name) match {
              case Some(None) =>
                org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
              case Some(Some(s)) => col(s).as(f.name)
              case None => col(f.name)
            }) ++ posCols: _*)
        }
      }
      .reduce(_.unionByName(_))
  }

  /** Row count of freshly written files from the parquet footers — a
    * metadata read, never a data scan. This is what keeps a commit O(1)
    * in table size: Iceberg records the same per-file counts in its
    * manifests from write metrics rather than re-reading the data.
    */
  private def footerRowCount(files: Seq[String]): Long =
    files.map(footerStats(_)._1).sum

  /** One footer open per (immutable) file: row count + `[min, max]` of
    * every column whose statistics decode as INT64 — the write-time
    * harvest that feeds the manifest entries, so range pruning
    * ([[classifyLiveFiles]]) and watermark reads ([[columnMaxMicros]])
    * later resolve from the metadata log with ZERO data-file footer
    * IO (Iceberg records the same bounds in its manifests from write
    * metrics). Per-column semantics mirror [[fileBoundsMicros]]: an
    * all-null column records the empty range (MaxValue, MinValue);
    * unusable stats (missing, non-INT64, null-count unknown) omit the
    * column. Cached per handle so append's zero-row check and
    * writeCommit share a single open.
    */
  private def footerStats(file: String): (Long, Seq[ColumnBound]) =
    footerStatsCache.getOrElseUpdate(file, {
      val conf = spark.sessionState.newHadoopConf()
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(s"$dataDir/$file"), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        var rows = 0L
        val lo = scala.collection.mutable.Map[String, Long]()
        val hi = scala.collection.mutable.Map[String, Long]()
        val seen = scala.collection.mutable.Set[String]()
        val bad = scala.collection.mutable.Set[String]()
        r.getFooter.getBlocks.asScala.foreach { b =>
          rows += b.getRowCount
          b.getColumns.asScala.foreach { c =>
            val name = c.getPath.toDotString
            seen += name
            val s = c.getStatistics
            if (s == null) bad += name
            else if (s.hasNonNullValue) (s.genericGetMin, s.genericGetMax) match {
              case (mn: java.lang.Long, mx: java.lang.Long) =>
                lo(name) = math.min(lo.getOrElse(name, Long.MaxValue), mn)
                hi(name) = math.max(hi.getOrElse(name, Long.MinValue), mx)
              case _ => bad += name // non-INT64: no orderable bounds kept
            }
            else if (!(s.isNumNullsSet && s.getNumNulls == b.getRowCount)) bad += name
          }
        }
        val bounds = seen.diff(bad).toSeq.sorted.map(n => ColumnBound(n,
          lo.getOrElse(n, Long.MaxValue), hi.getOrElse(n, Long.MinValue)))
        (rows, bounds)
      } finally r.close()
    })

  // ---- streaming sink bookkeeping ----

  /** Sink mark the NEXT commit must persist, set by [[withSinkMark]].
    * Thread-local: a sink is single-writer per sinkId by the Structured
    * Streaming contract, but OTHER writers (maintenance, another sink)
    * may commit this table concurrently and must not pick up — or
    * clobber — a mark that is not theirs.
    */
  private val pendingSinkMark: ThreadLocal[Map[String, Long]] =
    ThreadLocal.withInitial(() => Map.empty[String, Long])

  /** Run `body` (zero or more table commits for micro-batch `batchId` of
    * `sinkId`) such that the batch watermark lands ATOMICALLY with the
    * data: every commit `body` makes embeds (sinkId → batchId) in its
    * own CAS-published CommitMeta, exactly as Iceberg's sink stores the
    * batch id in snapshot summary properties. There is no window where
    * the data is committed but the mark is not — a crash anywhere leaves
    * either (no data, no mark) or (data, mark), and the Spark retry of
    * the same batchId is skipped or replayed correspondingly. If `body`
    * commits nothing (empty batch), the mark goes to the side file
    * instead — nothing was appended, so a replay is harmless either way.
    * The did-body-commit probe asks for THIS sink's mark (not a version
    * diff): under concurrent writers the version moving proves nothing
    * about whose commit moved it.
    */
  def withSinkMark(sinkId: String, batchId: Long)(body: => Unit): Unit = {
    pendingSinkMark.set(Map(sinkId -> batchId))
    try body
    finally pendingSinkMark.set(Map.empty)
    if (lastCommittedBatch(sinkId) < batchId) markCommittedBatch(sinkId, batchId)
  }

  /** Last micro-batch id committed into this table by `sinkId`, or -1.
    * Spark retries a failed micro-batch under the SAME batchId, so a
    * foreachBatch sink must deduplicate on it (the Structured Streaming
    * contract). Authoritative source is the latest commit's embedded
    * `sinkBatches`; the side file only covers batches that committed no
    * data (and pre-upgrade tables).
    */
  private def streamState: Map[String, Long] = {
    val p = Paths.get(s"$commitsDir/stream-state.json")
    if (!Files.exists(p)) Map.empty
    else mapper.readValue(p.toFile, classOf[Map[String, Any]])
      .map { case (k, v) => k -> v.asInstanceOf[Number].longValue }
  }

  def lastCommittedBatch(sinkId: String): Long = {
    val inCommit = commits.lastOption
      .flatMap(_.sinkBatchesOrEmpty.get(sinkId)).getOrElse(-1L)
    math.max(inCommit, streamState.getOrElse(sinkId, -1L))
  }

  /** Side-file mark for batches that committed no data. NOT atomic with
    * any commit — only [[withSinkMark]] may rely on it, and only for the
    * empty-batch case.
    */
  private def markCommittedBatch(sinkId: String, batchId: Long): Unit = synchronized {
    // in-process read-modify-write guard; cross-process the mark is
    // per-sinkId single-writer (the streaming contract), so two
    // processes never race the SAME key, and a torn union of different
    // keys only re-delivers an EMPTY batch — harmless by construction
    val p = Paths.get(s"$commitsDir/stream-state.json")
    val tmp = Paths.get(s"$commitsDir/.tmp-stream-state-${java.util.UUID.randomUUID()}.json")
    Files.writeString(tmp, mapper.writeValueAsString(streamState + (sinkId -> batchId)))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- maintenance ----

  /** M7 — binpack compaction: files already near `targetBytes` carry
    * into the new commit BY NAME; only under-sized files are read,
    * merged, and rewritten (reference threshold 128 MB,
    * maintenance.sh:66-67; Iceberg's rewrite_data_files binpack makes
    * the same split). At 100 TB this is what keeps a maintenance pass
    * O(small files), not O(table). Partition layout is preserved —
    * the rewrite repartitions by partition value before writing.
    *
    * Exception: merge-on-read tables compact EVERYTHING — compaction
    * doubles as the merge materializer there, and carrying a file by
    * name would leave it on an older sequence than the rewrite,
    * manufacturing a bogus latest-wins ordering.
    */
  /** True iff a compaction at `targetBytes` would actually IMPROVE the
    * table — the gate must converge, so it asks "would compacting
    * reduce anything", not "are files small":
    *  - merge-on-read: >1 SEQUENCE GROUP among live files (compaction
    *    materializes the latest-wins merge; a multi-file single-group
    *    table is already merged and stays untouched);
    *  - copy-on-write: merging the under-sized files would yield FEWER
    *    files than they currently occupy (3×100 MB at a 128 MB target
    *    can't improve and must not re-flag forever).
    * A maintenance sweep uses this to skip clean tables.
    */
  /** Live files storing pre-rename column names (under the CURRENT
    * schema and log) — compaction migrates them like stale-spec files.
    */
  private def staleNamedFiles(snap: CommitMeta): Set[String] = {
    val log = renameLogOf(Some(snap))
    if (log.isEmpty) Set.empty
    else {
      val logical = currentSchema
      val firstSeen = firstSeenByFile(commits)
      // any non-identity resolution flags migration: renamed-stored
      // files AND absent-for-epoch files (pre-resurrection) — rewriting
      // the latter materializes the nulls and drops the dead bytes,
      // which is also what lets their first-seen commits (which the
      // resolution depends on — see expireSnapshots) expire afterwards.
      // A plain non-prone ADD records no entry, so it still never
      // forces a rewrite (the metadata-only contract).
      snap.files.filter(f => storedNamesAt(logical,
        firstSeen.getOrElse(f, Int.MaxValue), log)
        .exists { case (c, s) => s != Some(c) }).toSet
    }
  }

  def needsCompaction(targetBytes: Long = 128L * 1024 * 1024): Boolean = {
    val cs = commits
    val live = cs.lastOption.map(_.files).getOrElse(Nil)
    // files left on an old partition-spec generation (or storing
    // pre-rename column names) migrate via compaction (Iceberg:
    // rewrite_data_files after a spec evolution)
    val staleSpec = cs.lastOption.exists { snap =>
      val byFile = specsByFile(snap)
      val cur = PartitionTransform.specDdl(currentPartitions)
      snap.files.exists(f => PartitionTransform.specDdl(byFile(f)) != cur) ||
        staleNamedFiles(snap).nonEmpty
    }
    if (staleSpec) true
    else if (defn.mergeOnRead) {
      // pending tombstones also compact away (readLogical folds them in)
      live.map(firstSeenByFile(cs)).distinct.size > 1 || morPending
    } else if (posPending) true // pending position deletes materialize away
    else {
      val small = live.filter(f => new File(s"$dataDir/$f").length() < targetBytes * 9 / 10)
      val smallBytes = small.map(f => new File(s"$dataDir/$f").length()).sum
      small.size > 1 &&
        math.max(1, math.ceil(smallBytes.toDouble / targetBytes).toInt) < small.size
    }
  }

  def compact(targetBytes: Long = 128L * 1024 * 1024): CommitMeta = {
    val snap = commits.lastOption
    val live = snap.map(_.files).getOrElse(Nil)
    val curSpec = PartitionTransform.specDdl(currentPartitions)
    val byFile = snap.map(specsByFile)
      .getOrElse(Map.empty[String, Seq[PartitionTransform]]
        .withDefaultValue(defn.partitions))
    val staleNames = snap.map(staleNamedFiles).getOrElse(Set.empty)
    // files referenced by pending position deletes must rewrite (with
    // the tombstones applied) — an unreferenced file still carries by
    // name, so a small predicate delete compacts O(touched files)
    val pendingPos = snap.map(_.posDeleteFilesOrEmpty.keys.toSeq.sorted).getOrElse(Nil)
    val posRefs: Set[String] =
      if (pendingPos.isEmpty) Set.empty
      else posPairs(pendingPos).select("__file").distinct()
        .collect().map(_.getString(0)).toSet
    val (keep, small) =
      if (defn.mergeOnRead) (Nil, live)
      // a file carries by name only if it is big enough AND on the
      // current partition spec AND stores the current column names AND
      // holds no position-deleted rows — compaction doubles as the
      // layout/name/delete migrator after an evolution, rename, or
      // predicate delete
      else live.partition(f => new File(s"$dataDir/$f").length() >= targetBytes * 9 / 10 &&
        PartitionTransform.specDdl(byFile(f)) == curSpec &&
        !staleNames.contains(f) && !posRefs.contains(f))
    val smallBytes = small.map(f => new File(s"$dataDir/$f").length()).sum
    val nFiles = math.max(1, math.ceil(smallBytes.toDouble / targetBytes).toInt)
    val df =
      if (defn.mergeOnRead) readLogical() // resolves latest-wins
      else if (pendingPos.isEmpty)
        readFilesLogicalSpecAware(small, currentSchema, commits.lastOption)
      else applyPosDeletes(
        readFilesLogicalSpecAware(small, currentSchema, commits.lastOption,
          withPos = true), pendingPos)
        .select(currentSchema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
    // the binpack count goes through writeFiles, which owns the final
    // repartition — a pre-repartition here would be re-shuffled (and its
    // sizing discarded) by writeFiles' own partition-value distribution
    val added = writeFiles(df, Some(nFiles))
    // a compact materialized every pending tombstone (equality AND
    // position) into the rewrite; a content-preserving rewrite, so it
    // replays over interleaved appends (validateIntent re-checks its
    // inputs are still live)
    writeCommit("compact", RewriteFiles(small.toSet, added),
      snap.map(_.version).getOrElse(0),
      morDeletes = (_, _) => Map.empty, posDeletes = (_, _) => Map.empty)
  }

  /** M7b — z-order clustering rewrite (the Delta `OPTIMIZE ZORDER BY` /
    * Iceberg sort-strategy `rewrite_data_files` analog): rewrite the
    * live snapshot ordered by the bit-interleaved z-value of `zcols`,
    * range-distributed so every output file covers a contiguous z-range
    * — a narrow box in EVERY clustered dimension, not just a sort
    * leader. Footer min/max pruning ([[readRangeLogical]] /
    * [[RangePrune]]) then skips files for predicates on ANY of the
    * clustered columns; a linearly-written table only ever prunes on
    * its write-order column. Each column is normalized to a
    * min(21, 63/n)-bit bucket of its global [min, max] (one scalar
    * aggregate) so range skew cannot starve bit positions and every
    * interleaved bit stays below the sign bit at any column count.
    * Integral/timestamp columns only
    * (those are the ones parquet footers carry orderable INT64 stats
    * for). A PARTITIONED table applies the identical rewrite WITHIN
    * each partition: rows range-distribute on (partition values, z) —
    * so a slice never mixes z-ranges across partition values except at
    * slice boundaries — and sort within, giving every file inside a
    * partition directory a narrow box in each clustered dimension on
    * top of the directory pruning the partitioning already provides
    * (Iceberg's sort-strategy rewrite_data_files composes the same
    * way). Partition-transform SOURCE columns are not meaningful
    * z-columns there (the directory already splits them) and refuse.
    */
  def compactZOrder(zcols: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024): CommitMeta = {
    import org.apache.spark.sql.functions._
    require(zcols.size >= 2, "z-order clustering needs at least 2 columns")
    zcols.foreach(c => require(!currentPartitions.exists(_.source.equalsIgnoreCase(c)),
      s"${defn.name}: '$c' is a partition-transform source — the directory " +
        "layout already clusters it; z-order the residual columns"))
    val zbase = commits.lastOption
    val live = zbase.map(_.files).getOrElse(Nil)
    require(live.nonEmpty, s"${defn.name}: nothing to z-order")
    val df = readLogical()
    val totalBytes = live.map(f => new File(s"$dataDir/$f").length()).sum
    val nFiles = math.max(2, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val statCols = zcols.flatMap(c =>
      Seq(min(col(c).cast("long")), max(col(c).cast("long"))))
    val stats = df.agg(statCols.head, statCols.tail: _*).first()
    zcols.zipWithIndex.foreach { case (c, i) =>
      require(!stats.isNullAt(2 * i),
        s"${defn.name}: z-order column '$c' has no orderable integral values " +
          "(all-null, or not castable to long) — integral/timestamp columns only")
    }
    val n = zcols.size
    // bits per column shrink with column count so every interleaved bit
    // position stays below the long's sign bit (21 bits at n≤3, 15 at
    // n=4, 12 at n=5, …) — positions ≥ 63 would be masked by shiftleft
    // and silently collide bit planes across columns
    val bits = math.min(21, 63 / n)
    val nBuckets = 1L << bits
    // truncating double division is fine here (a boundary off-by-one
    // only nudges clustering, never correctness — footer bounds stay
    // exact)
    val buckets = zcols.zipWithIndex.map { case (c, i) =>
      val lo = stats.getLong(2 * i)
      val hi = stats.getLong(2 * i + 1)
      val scale = math.max(1L, (hi - lo) / nBuckets + 1L)
      least(lit(nBuckets - 1), coalesce(
        ((col(c).cast("long") - lit(lo)) / lit(scale)).cast("long"), lit(0L)))
    }
    val z = (0 until bits).flatMap { b =>
      buckets.zipWithIndex.map { case (bc, i) =>
        shiftleft(shiftright(bc, b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce(_ + _)
    val added =
      if (currentPartitions.isEmpty) {
        val ordered = df.withColumn("__z", z)
          .repartitionByRange(nFiles, col("__z"))
          .sortWithinPartitions("__z")
          .select(currentSchema.fieldNames.map(col): _*)
        writeFiles(ordered)
      } else {
        // within-partition form: range-distribute on (partition values,
        // z) so each output slice is a contiguous z-range inside one
        // partition (boundary slices split by directory at write), then
        // sort within — and write DIRECTLY (writeFiles would re-shuffle
        // to one task per partition value, collapsing the z split)
        val pcols = partCols.map(col)
        val shaped = withPartitionCols(df.withColumn("__z", z))
          .repartitionByRange(math.max(nFiles, 2), (pcols :+ col("__z")): _*)
          .sortWithinPartitions((pcols :+ col("__z")): _*)
          .select(currentSchema.fieldNames.map(col) ++ pcols: _*)
        writePhysical(shaped)
      }
    // the clustering rewrite reads the visible state and replaces every
    // file — pending tombstones (either kind) are materialized
    writeCommit("zorder", RewriteFiles(live.toSet, added),
      zbase.map(_.version).getOrElse(0),
      morDeletes = (_, _) => Map.empty, posDeletes = (_, _) => Map.empty)
  }

  // ---- refs: tags + branches (write-audit-publish) ----

  private def requireMain(op: String): Unit =
    require(branch.isEmpty, s"${defn.name}: $op is a main-table operation, " +
      s"not valid on branch '${branch.get}'")

  private def checkRefName(name: String): Unit =
    require(name.matches("[A-Za-z0-9_-]+"), s"${defn.name}: bad ref name '$name'")

  private def tagPath(name: String) = Paths.get(s"$refsDir/tag-$name.json")
  private def branchMarkPath(name: String) = Paths.get(s"$refsDir/branch-$name.json")
  private def branchDir(name: String) = Paths.get(s"$tableDir/_commits/branch-$name")

  /** Named immutable snapshot pointers (Iceberg tags): tag → version.
    * A tagged snapshot is retention-exempt — [[expireSnapshots]] keeps
    * it until the tag is dropped — so audits and reproducible reads
    * (e.g. "the exact training-set snapshot") survive the maintenance
    * cadence.
    */
  def tags: Map[String, Int] = {
    val fs = Option(new File(refsDir).listFiles()).getOrElse(Array.empty)
    fs.filter(_.getName.matches("tag-.*\\.json")).map { f =>
      val m = mapper.readValue(f, classOf[Map[String, Any]])
      m("name").toString -> m("version").asInstanceOf[Number].intValue
    }.toMap
  }

  def createTag(name: String, version: Option[Int] = None): Unit = {
    requireMain("createTag")
    checkRefName(name)
    require(!Files.exists(tagPath(name)), s"${defn.name}: tag '$name' exists")
    val v = version.getOrElse(currentVersion)
    require(commits.exists(_.version == v), s"${defn.name}: no snapshot v$v to tag")
    Files.createDirectories(Paths.get(refsDir))
    val tmp = Paths.get(s"$refsDir/.tmp-tag-$name.json")
    Files.writeString(tmp, mapper.writeValueAsString(Map("name" -> name, "version" -> v)))
    Files.move(tmp, tagPath(name), StandardCopyOption.ATOMIC_MOVE)
  }

  def dropTag(name: String): Unit = {
    requireMain("dropTag")
    require(Files.deleteIfExists(tagPath(name)), s"${defn.name}: no tag '$name'")
  }

  /** Read the snapshot a tag pins (logical columns, tag-time schema). */
  def readTagLogical(name: String): DataFrame = {
    val v = tags.getOrElse(name,
      throw new IllegalArgumentException(s"${defn.name}: no tag '$name'"))
    readLogical(Some(v))
  }

  /** Live branch names (refs with an un-published commit log). */
  def branches: Seq[String] = {
    val fs = Option(new File(refsDir).listFiles()).getOrElse(Array.empty)
    fs.filter(_.getName.matches("branch-.*\\.json")).map { f =>
      mapper.readValue(f, classOf[Map[String, Any]])("name").toString
    }.toSeq.sorted
  }

  /** Fork a branch at the current snapshot — the WRITE leg of Iceberg's
    * write-audit-publish: a producer stages commits on the branch (any
    * table op — the returned view is a full [[GraftTable]] over the
    * SAME data dir with its own commit log), auditors query the branch,
    * and [[fastForward]] publishes atomically or [[dropBranch]]
    * abandons it with main never having seen a byte. The fork copies
    * main's commit JSONS only (metadata — no data movement), keeping
    * the full log so merge-on-read sequence ordering survives on the
    * branch.
    */
  def createBranch(name: String): GraftTable = {
    requireMain("createBranch")
    checkRefName(name)
    require(!Files.exists(branchMarkPath(name)), s"${defn.name}: branch '$name' exists")
    require(!Files.exists(tagPath(name)), s"${defn.name}: '$name' is a tag")
    val fork = currentVersion
    Files.createDirectories(branchDir(name))
    commits.foreach { c =>
      Files.copy(commitPath(c.version),
        branchDir(name).resolve(s"commit-${c.version}.json"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    Files.createDirectories(Paths.get(refsDir))
    val tmp = Paths.get(s"$refsDir/.tmp-branch-$name.json")
    Files.writeString(tmp,
      mapper.writeValueAsString(Map("name" -> name, "forkVersion" -> fork)))
    Files.move(tmp, branchMarkPath(name), StandardCopyOption.ATOMIC_MOVE)
    branchView(name)
  }

  /** Open an existing branch as a writable table view. */
  def branchView(name: String): GraftTable = {
    requireMain("branchView")
    require(Files.exists(branchMarkPath(name)), s"${defn.name}: no branch '$name'")
    new GraftTable(spark, defn, root, Some(name))
  }

  private def branchForkVersion(name: String): Int =
    mapper.readValue(branchMarkPath(name).toFile, classOf[Map[String, Any]])(
      "forkVersion").asInstanceOf[Number].intValue

  /** PUBLISH: fast-forward main to the branch head (Iceberg's
    * `fast_forward` procedure / WAP publish). Valid while main still
    * sits at the fork version — a diverged main refuses (the branch
    * must be re-staged), never merges. Publication moves the branch's
    * post-fork commit jsons onto main OLDEST FIRST, so a crash
    * mid-publish leaves main on a valid contiguous prefix of the branch
    * — every intermediate state is a readable table — and a RETRY
    * RESUMES the move rather than refusing: a main head past the fork
    * is recognized as a partial publish exactly when the branch's
    * remaining staged jsons pick up contiguously at main's head + 1
    * (a genuinely diverged main still holds the branch's FIRST staged
    * version in both logs, so its remaining set starts at fork+1 ≤
    * head and refuses). Without the resume, the documented recovery
    * (dropBranch) would delete the not-yet-moved staged suffix and
    * orphan its data files. Returns the number of commits published
    * by THIS call.
    */
  def fastForward(name: String): Int = {
    requireMain("fastForward")
    val fork = branchForkVersion(name)
    val b = branchView(name)
    val pending = b.commits.filter(_.version > fork).sortBy(_.version)
    val head = currentVersion
    if (head != fork) {
      // drained: every staged json already lives on main and none
      // remain on the branch — either a prior publish crashed between
      // its last staged-commit move and the dropBranch, or the branch
      // never staged anything while main advanced. In both shapes the
      // only remaining work IS the dropBranch: finish it rather than
      // refuse (a refusal here forced a manual dropBranch per the old
      // error text).
      if (head > fork && pending.isEmpty) { dropBranch(name); return 0 }
      val resumable = head > fork &&
        pending.head.version == head + 1 &&
        ((fork + 1) to head).forall(v => Files.exists(commitPath(v)))
      require(resumable,
        s"${defn.name}: main advanced past the '$name' fork " +
          s"(fork v$fork, main v$head) and the branch's staged commits " +
          s"are not a contiguous continuation — cannot fast-forward; " +
          "drop the branch and re-stage")
    }
    pending.foreach { c =>
      // publish each staged json with the SAME version CAS ordinary
      // commits use (link fails if the slot is taken) — a concurrent
      // main writer claiming the version mid-publish aborts loudly with
      // main left on a valid contiguous prefix of the branch, instead
      // of being silently clobbered by a replacing move
      val src = branchDir(name).resolve(s"commit-${c.version}.json")
      try { Files.createLink(commitPath(c.version), src); Files.delete(src) }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new CommitConflictException(
            s"${defn.name}: a concurrent writer committed v${c.version} to main " +
              s"mid-publish of branch '$name' — published up to v${c.version - 1}; " +
              "the branch retains the rest (drop and re-stage it)")
      }
    }
    dropBranch(name)
    pending.size
  }

  /** Abandon a branch: its staged commits vanish, main never changes;
    * the branch's data files become unreferenced and [[removeOrphans]]
    * reclaims them on the normal maintenance cadence.
    */
  def dropBranch(name: String): Unit = {
    requireMain("dropBranch")
    require(Files.deleteIfExists(branchMarkPath(name)), s"${defn.name}: no branch '$name'")
    val d = branchDir(name).toFile
    Option(d.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    d.delete()
  }

  /** M8a — expire snapshots older than `olderThanMs`, always keeping the
    * latest (reference: expire_snapshots(retention_threshold => '7d')).
    * A commit that is the first-seen version of a still-live file is
    * ALSO kept when that version is load-bearing:
    *  - merge-on-read tables — the latest-wins merge orders files by it
    *    (losing it would collapse sequence groups and resurface
    *    superseded rows), and
    *  - tables with a column-provenance log (renames / resurrection-
    *    prone re-adds) — stored-name resolution derives each file's
    *    epoch from it (losing it would resurrect dead columns or
    *    mis-alias renamed ones).
    * Iceberg's analog both times: snapshots still referenced by scan
    * metadata can't expire — compact first (which migrates the files
    * to the current epoch/sequence), then expire.
    */
  def expireSnapshots(olderThanMs: Long): Int = {
    requireMain("expireSnapshots")
    val cs = commits
    val cutoff = System.currentTimeMillis() - olderThanMs
    // drop-only logs never affect resolution (a drop entry's empty NEW
    // side matches no trace), so a table that only ever dropped columns
    // keeps the unpinned retention behavior
    val resolutionEntries = renameLogOf(cs.lastOption).exists(_._3.nonEmpty)
    val needed: Set[Int] =
      if (!defn.mergeOnRead && !resolutionEntries) Set.empty
      else {
        val live = cs.lastOption.map(_.files).getOrElse(Nil)
        live.map(firstSeenByFile(cs)).toSet
      }
    // tagged snapshots are retention-exempt until the tag is dropped
    val tagged = tags.values.toSet
    val expired = cs.dropRight(1)
      .filter(c => c.tsMs < cutoff && !needed.contains(c.version) &&
        !tagged.contains(c.version))
    expired.foreach(c => Files.deleteIfExists(commitPath(c.version)))
    expired.size
  }

  /** M8b — delete data files referenced by no remaining snapshot.
    * Delete-record files of surviving change-tracked commits are
    * referenced too: they are not live data, but they ARE the commit's
    * changelog payload and must survive exactly as long as its json.
    *
    * `minAgeMs` is the CONCURRENCY guard (Iceberg's `older_than`
    * retention, which exists for exactly this): a racing writer's
    * data/manifest files sit unreferenced between its staging move and
    * its publish CAS, so a maintenance pass sharing the table must
    * only reclaim orphans older than any plausible write duration —
    * the reference's scripts pass 7d. The default 0 sweeps
    * immediately, which is only safe when the caller KNOWS no write is
    * in flight (the engine's single-threaded tests and oracle rows).
    */
  def removeOrphans(minAgeMs: Long = 0L): Int = {
    requireMain("removeOrphans")
    val ageCutoff = System.currentTimeMillis() - minAgeMs
    def oldEnough(p: java.nio.file.Path): Boolean =
      try Files.getLastModifiedTime(p).toMillis < ageCutoff
      catch { case _: Exception => false } // vanished mid-scan: not ours to sweep
    // live BRANCH snapshots reference files main doesn't know yet —
    // those are the branch's staged payload, not orphans
    def refsOf(c: CommitMeta): Seq[String] =
      c.files ++ c.deleteFilesOrEmpty ++ c.morDeleteFilesOrEmpty.keys ++
        c.posDeleteFilesOrEmpty.keys
    val branchViews = branches.map(branchView)
    val branchRefs = branchViews.flatMap(_.commits.flatMap(refsOf)).toSet
    val referenced = commits.flatMap(refsOf).toSet ++ branchRefs
    val orphans = (listDataFiles() -- referenced)
      .filter(f => oldEnough(Paths.get(s"$dataDir/$f")))
    orphans.foreach(f => Files.deleteIfExists(Paths.get(s"$dataDir/$f")))
    // the manifest leg: chunks referenced by no surviving commit json
    // (expired snapshots, dropped branches) go with the data orphans —
    // not counted in the return value, which stays "data files removed".
    // Same age gate: a racing writer's fresh chunks are unreferenced
    // until its publish lands
    manifestStore.sweep(
      (commits ++ branchViews.flatMap(_.commits)).flatMap(_.manifestsOrEmpty).toSet,
      minAgeMs)
    // staging remnants: under concurrent writers a fresh staging dir
    // may be an IN-FLIGHT write racing this maintenance pass — only
    // age-gated remnants (a crash, by definition: a live write drains
    // its staging within its own runtime) are reclaimed
    val stagingCutoff = System.currentTimeMillis() -
      math.max(minAgeMs, GraftTable.StagingSweepAgeMs)
    Option(new File(s"$tableDir/_staging").listFiles()).getOrElse(Array.empty)
      .filter(_.lastModified() < stagingCutoff)
      .foreach(d => graft.FsUtil.deleteRecursively(d.toPath))
    // prune now-empty partition dirs
    def sweep(dir: File): Unit = {
      Option(dir.listFiles()).getOrElse(Array.empty).filter(_.isDirectory).foreach(sweep)
      if (dir.getPath != dataDir && Option(dir.listFiles()).exists(_.isEmpty)) dir.delete()
    }
    sweep(new File(dataDir))
    orphans.size
  }

  /** S10 — the `$snapshots` metadata table. */
  /** Incremental changelog scan — the Iceberg incremental-append /
    * changelog-scan analog (the reference's iceberg/tables YAMLs are
    * consumed downstream exactly this way by its materialization
    * layer): every LOGICAL change committed in `(fromVersion,
    * toVersion]`, as the logical rows plus `_change_version` (the
    * commit that introduced the row) and `_change_type`: `insert` for
    * appends and for a change-tracked repair's replacement rows,
    * `upsert` for upserts (merge-on-read, or change-tracked
    * copy-on-write — the consumer applies versions in order,
    * latest-wins per key, the same contract [[readLogical]] resolves),
    * and `delete` for a change-tracked repair's removed rows (row-level
    * multiset semantics: each delete row cancels one earlier instance,
    * Iceberg's changelog-scan DELETE rows).
    *
    * Cost shape: each commit's delta is read from exactly the files
    * that commit ADDED (commit metadata names them; nothing is diffed
    * or re-read), so a consumer tailing the table pays O(new data) per
    * poll — never O(table). Pure layout rewrites (`compact`, `zorder`)
    * change nothing logical and are skipped. Blind rewrites
    * (`overwrite`, COW `upsert`, `replace`) THROW: their file delta is
    * the merged result, not the change set, and emitting it would be
    * silently wrong — the same reason Iceberg's incremental append
    * scan refuses non-append snapshots. Changelog consumers pair with
    * merge-on-read tables, where every commit's delta IS its batch.
    */
  def readChanges(fromVersion: Int, toVersion: Int): DataFrame = {
    // one schema for the whole range — the range END's schema, the same
    // contract as Iceberg's changelog scan (pre-evolution change rows
    // null-fill later-added columns)
    val logical = schemaAt(Some(toVersion).filter(_ > 0))
    val logicalCols = logical.fieldNames.map(org.apache.spark.sql.functions.col)
    val deltas = fileDeltasSince(fromVersion, toVersion).fold(throw _, identity)
    // rename resolution against the range END's log (matching the
    // range-end schema contract above): a leg's files were written by
    // commit c and store version-c names
    val endLog = renameLogOf(commits.find(_.version == toVersion)
      .orElse(commits.lastOption))
    def leg(c: CommitMeta, files: Seq[String], changeType: String) =
      if (files.isEmpty) None
      else {
        // every leg's files were WRITTEN by commit c, under c's spec
        // (covers replace-cdc delete files, which live outside `files`
        // and so outside the per-file provenance map)
        val spec = c.partSpecDdlOrNone.map(PartitionTransform.parseSpec)
          .getOrElse(defn.partitions)
        val stored = storedNamesAt(logical, c.version, endLog)
          .filter { case (cur, s) => s != Some(cur) }
        val base =
          if (stored.isEmpty) readFilesAs(files, logical, spec).select(logicalCols: _*)
          else readFilesAs(files, StructType(logical.fields.flatMap(f =>
              stored.get(f.name) match {
                case Some(None) => None
                case Some(Some(s)) => Some(f.copy(name = s))
                case None => Some(f)
              })), spec)
            .select(logical.fields.map(f => stored.get(f.name) match {
              case Some(None) => org.apache.spark.sql.functions.lit(null)
                .cast(f.dataType).as(f.name)
              case Some(Some(s)) => org.apache.spark.sql.functions.col(s).as(f.name)
              case None => org.apache.spark.sql.functions.col(f.name)
            }): _*)
        Some(base
          .withColumn("_change_version", org.apache.spark.sql.functions.lit(c.version))
          .withColumn("_change_type", org.apache.spark.sql.functions.lit(changeType)))
      }
    val legs = deltas.flatMap { case (c, added, deleted) =>
      if (c.op == "delete-mor") {
        // an equality delete names KEYS, not rows — the deleted ROWS are
        // the predecessor snapshot's matches, materialized here by one
        // semi-join (Iceberg's changelog scan pays the same read to turn
        // equality-delete files into DELETE rows). This is the one
        // changelog leg that is O(predecessor snapshot), not O(delta) —
        // the price of O(keys) deletes on the write side.
        if (deleted.isEmpty) Nil
        else {
          val keySchema = StructType(logical.fields.filter(f => defn.keys.contains(f.name)))
          val keys = spark.read.schema(keySchema)
            .parquet(deleted.map(f => s"$dataDir/$f"): _*)
          val prior = logical.fields.foldLeft(readLogical(Some(c.version - 1)))(
            (d, f) => if (d.columns.contains(f.name)) d
            else d.withColumn(f.name, org.apache.spark.sql.functions.lit(null).cast(f.dataType)))
          Some(prior.join(keys, defn.keys, "left_semi").select(logicalCols: _*)
            .withColumn("_change_version", org.apache.spark.sql.functions.lit(c.version))
            .withColumn("_change_type", org.apache.spark.sql.functions.lit("delete")))
        }
      } else if (c.op == "delete-pos") {
        // a position delete names (file, pos) tuples — the deleted ROWS
        // are read back from exactly the referenced data files via one
        // semi-join on the provenance columns: O(referenced files), the
        // row-level analog of the delete-mor leg's predecessor read.
        if (deleted.isEmpty) Nil
        else {
          val pairs = posPairs(deleted)
          val refFiles = pairs.select("__file").distinct()
            .collect().map(_.getString(0)).toSeq.sorted
          val predecessor = commits.find(_.version == c.version - 1)
          // specs resolve via the predecessor (the referenced files'
          // writing epoch) but renames via endLog — this leg projects
          // the range-END schema like every other leg, so a rename
          // landing between the delete-pos commit and the range end
          // must still map the files' stored names onto it
          val rows = readFilesLogicalSpecAware(refFiles, logical, predecessor,
            withPos = true, renameLog = Some(endLog))
          Some(rows.join(pairs, Seq("__file", "__pos"), "left_semi")
            .select(logicalCols: _*)
            .withColumn("_change_version", org.apache.spark.sql.functions.lit(c.version))
            .withColumn("_change_type", org.apache.spark.sql.functions.lit("delete")))
        }
      } else {
        val addType = c.op match {
          case "append" | "replace-cdc" => "insert"
          case _ => "upsert"
        }
        leg(c, added, addType) ++ leg(c, deleted, "delete")
      }
    }
    if (legs.isEmpty) {
      val schema = StructType(logical.fields ++ Seq(
        StructField("_change_version", IntegerType, nullable = false),
        StructField("_change_type", StringType, nullable = false)))
      spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    } else legs.reduce(_.unionByName(_))
  }

  /** The single owner of changelog FILE-DELTA semantics — which files
    * carry each commit's logical change in `(fromVersion, toVersion]`,
    * or a refusal. Both consumers sit on this one path (VERDICT r12
    * #7): [[readChanges]] throws the refusal; the materializer's
    * append detection (Materializer.sourceAppendsSince) falls back to
    * signature detection, so the two can never drift on gap handling.
    *
    * Per-op delta `(commit, addedFiles, deletedFiles)`:
    * `append`/`upsert-mor` commits added exactly `files − predecessor's
    * files` (no deletes); a copy-on-write `upsert` that recorded its
    * batch's files names them (`changeFiles` — the survivors' rewritten
    * files are NOT changes); a change-tracked repair (`replace-cdc`)
    * names its replacement files AND its delete files; layout-only
    * rewrites (`compact`, `zorder`) change nothing logical and
    * contribute an empty delta. Everything else refuses: a blind
    * rewrite's file delta is the merged result, not the change set,
    * and a pre-changeFiles upsert json no longer knows its batch.
    *
    * Gap rule: every version in the range AND each one's predecessor
    * must still be in the log (the delta is files-minus-predecessor).
    * An expired commit would otherwise fail in one of two SILENT
    * shapes — a vanished version contributing nothing, or an empty
    * predecessor set replaying the whole carried file list as one
    * commit's "delta" — both corrupt for a consumer. Refuse instead;
    * the consumer re-syncs from a full snapshot read.
    */
  private[graft] def fileDeltasSince(fromVersion: Int, toVersion: Int)
      : Either[RuntimeException, Seq[(CommitMeta, Seq[String], Seq[String])]] = {
    val cs = commits
    if (fromVersion < 0 || fromVersion > toVersion)
      return Left(new IllegalArgumentException(
        s"${defn.name}: bad changelog range ($fromVersion, $toVersion]"))
    if (toVersion > cs.lastOption.map(_.version).getOrElse(0))
      return Left(new IllegalArgumentException(
        s"${defn.name}: no snapshot v$toVersion"))
    val byVersion = cs.map(c => c.version -> c).toMap
    val missing = ((fromVersion + 1) to toVersion).filterNot(byVersion.contains) ++
      ((fromVersion + 1) to toVersion)
        .filter(v => v > 1 && !byVersion.contains(v - 1)).map(_ - 1)
    if (missing.nonEmpty)
      return Left(new IllegalStateException(
        s"${defn.name}: commit(s) v${missing.distinct.sorted.mkString(", v")} " +
          s"expired — changelog gap in ($fromVersion, $toVersion]; " +
          "re-sync from readLogical"))
    val deltas = cs.filter(c => c.version > fromVersion && c.version <= toVersion)
      .map { c =>
        val prevFiles =
          byVersion.get(c.version - 1).map(_.files.toSet).getOrElse(Set.empty[String])
        c.op match {
          case "append" | "upsert-mor" =>
            (c, c.files.filterNot(prevFiles), Nil: Seq[String])
          case "upsert" if c.changeFilesOrEmpty.nonEmpty =>
            (c, c.changeFilesOrEmpty, Nil: Seq[String])
          case "replace-cdc" =>
            (c, c.changeFilesOrEmpty, c.deleteFilesOrEmpty)
          case "delete-mor" =>
            // the tombstone file(s) THIS commit added (map delta vs the
            // predecessor's carried set); readChanges turns them into
            // full delete rows via the predecessor snapshot
            val prevTombs = byVersion.get(c.version - 1)
              .map(_.morDeleteFilesOrEmpty.keySet).getOrElse(Set.empty[String])
            (c, Nil: Seq[String],
              (c.morDeleteFilesOrEmpty.keySet -- prevTombs).toSeq.sorted)
          case "delete-pos" =>
            // same shape for position deletes: the pos-tombstone file(s)
            // this commit added; readChanges reads the referenced rows
            val prevPos = byVersion.get(c.version - 1)
              .map(_.posDeleteFilesOrEmpty.keySet).getOrElse(Set.empty[String])
            (c, Nil: Seq[String],
              (c.posDeleteFilesOrEmpty.keySet -- prevPos).toSeq.sorted)
          case "compact" | "zorder" | "evolve-schema" | "evolve-partition" =>
            // layout-/metadata-only: no logical rows changed
            (c, Nil: Seq[String], Nil: Seq[String])
          case other => return Left(new IllegalArgumentException(
            s"${defn.name}: commit v${c.version} is '$other' — a rewrite has no " +
              "derivable change set; changelog consumers need append/merge-on-read/" +
              "change-tracked upsert or replace commits (see readChanges scaladoc)"))
        }
      }
    Right(deltas)
  }

  def snapshots: DataFrame = {
    val schema = StructType(Seq(
      StructField("version", IntegerType, nullable = false),
      StructField("committed_at", TimestampType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("row_count", LongType, nullable = false),
      StructField("n_files", IntegerType, nullable = false)))
    val rows = commits.map(c => Row(
      c.version, new java.sql.Timestamp(c.tsMs), c.op, c.rowCount, c.files.size))
    spark.createDataFrame(rows.asJava, schema)
  }

  /** The CURRENT snapshot's manifest entries, with the chunk each lives
    * in — the raw feed for the `$manifests` metadata table and the
    * s27 oracle (whose row counts and column bounds must reconstruct
    * the source aggregate without touching a data file).
    */
  def manifestEntries: Seq[(String, ManifestEntry)] =
    commits.lastOption.map(_.manifestsOrEmpty).getOrElse(Nil)
      .flatMap(n => manifestStore.read(n).map(n -> _))

  /** Per-chunk stats of the current snapshot, Iceberg-`$manifests`
    * shaped: (path, length bytes, added-at version, data file count,
    * record count). Added-at = the FIRST commit referencing the chunk
    * (chunks are immutable, so that is the commit that wrote it) —
    * derived from the SURVIVING log, so after the writing commit
    * expires, added-at reports the oldest survivor that references the
    * chunk instead (documented drift; persisting the writer version in
    * the chunk would pin it exactly, but the column is informational —
    * nothing resolves data from it — and the drift direction is always
    * "later version", never a dangling one).
    */
  def manifestInfo: Seq[(String, Long, Int, Int, Long)] = {
    val cs = commits
    cs.lastOption.map(_.manifestsOrEmpty).getOrElse(Nil).map { n =>
      val entries = manifestStore.read(n)
      val addedAt = cs.find(_.manifestsOrEmpty.contains(n)).map(_.version).getOrElse(0)
      (n, manifestStore.sizeBytes(n), addedAt, entries.size, entries.map(_.r).sum)
    }
  }
}

object GraftTable {
  /** Dev-only write-path timing (GRAFT_WRITE_TIMING=1): one stderr line
    * per staged Spark write so a profiling run can count the commits a
    * protocol makes and what each write job costs. Read once — env never
    * changes within a JVM and the flag sits on the hot write path.
    */
  private[tables] val writeTiming: Boolean =
    sys.env.contains("GRAFT_WRITE_TIMING")

  /** Row bound for the driver-local write fast path (writeFiles):
    * enough for any bookkeeping/marker commit, far below anything a
    * distributed write exists for. One file either way — a 10k-row
    * LocalRelation is well under a single row group.
    */
  private[tables] val LocalWriteMaxRows = 10000

  /** Max distinct key tuples a repair pass will broadcast for its
    * delete/re-insert joins. 1M tuples of (timestamp, long-ish key)
    * ≈ tens of MB — comfortably under executor broadcast budgets on a
    * real cluster; beyond it the joins fall back to shuffled form.
    */
  val BroadcastKeyLimit: Long = 1000000L

  /** Max total on-disk bytes of pending position-delete files a logical
    * read will broadcast for its anti-join. (file, pos) pairs are ~tens
    * of bytes each, so 32 MB covers ~hundreds of millions of deleted
    * rows at snappy compression — past that the read degrades to a
    * shuffled anti-join (and compaction should have run long before).
    */
  val PosDeleteBroadcastBytes: Long = 32L * 1024 * 1024

  /** Count of per-file parquet-footer bound probes ([[fileBoundsMicros]]
    * calls) — the metadata-IO the manifest bounds exist to eliminate.
    * Tests pin that pruned reads and watermark lookups on
    * manifest-format tables leave this untouched; only files migrated
    * from pre-manifest commit jsons may pay the fallback.
    */
  val footerProbeCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Per-session depth of in-flight graft writes, guarding the
    * `spark.sql.parquet.outputTimestampType = TIMESTAMP_MICROS` scope
    * (the table layer depends on ordered INT64 footer min/max for its
    * manifest bounds; the INT96 session default has no usable stats).
    * The conf is SESSION state, so with concurrent writers a naive
    * per-write set/restore races: writer A's restore can land between
    * writer B's set and B's write-job conf capture, handing B INT96
    * and silently stripping B's files of their write-time bounds.
    * Reference-counted instead: set on the first concurrent write in
    * a session, restore only when the last one exits. Keyed per
    * session (cloned sessions — the DML runner's — have their own
    * SQLConf).
    */
  private val microsDepth =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Integer]()
  private val microsPrior =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Option[String]]()
  private val MicrosKey = "spark.sql.parquet.outputTimestampType"
  private[tables] def withMicrosTimestamps[T](spark: SparkSession)(f: => T): T = {
    microsDepth.synchronized {
      val d: Int = Option(microsDepth.get(spark)).fold(0)(_.intValue)
      if (d == 0) {
        microsPrior.put(spark, spark.conf.getOption(MicrosKey))
        spark.conf.set(MicrosKey, "TIMESTAMP_MICROS")
      }
      microsDepth.put(spark, d + 1)
    }
    try f
    finally microsDepth.synchronized {
      val d: Int = microsDepth.get(spark).intValue - 1
      if (d == 0) {
        microsDepth.remove(spark)
        microsPrior.remove(spark) match {
          case Some(v) => spark.conf.set(MicrosKey, v)
          case None => spark.conf.unset(MicrosKey)
          case null => ()
        }
      } else microsDepth.put(spark, d)
    }
  }

  /** Lost-CAS retry count across all tables (diagnostic — the
    * contention probe samples it around racing-writer runs to report
    * measured retry cost, SCALING.md's concurrency section).
    */
  val commitRetryCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Bounded optimistic-commit retries before giving up loudly. Each
    * retry re-reads the head and re-validates — 20 lost CAS races in a
    * row means pathological contention the caller should see.
    */
  val MaxCommitRetries: Int = 20

  /** Age a crashed write's staging remnant must reach before the
    * maintenance sweep reclaims it. Under concurrent writers a staging
    * dir may belong to an IN-FLIGHT commit; one untouched for an hour
    * can only be a crash (a live write moves its files out within the
    * write's own runtime).
    */
  val StagingSweepAgeMs: Long = 60L * 60 * 1000
}
