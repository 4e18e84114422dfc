package graft

import graft.tables.{GraftTable, TableCatalog}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit}

/** X4 — SQL DML over the snapshot-log tables: the reference's
  * materializer issues its repairs as SQL TEXT against Iceberg
  * (`scripts/materialize.sh:197-216`: `DELETE FROM iceberg.db.<t> WHERE
  * <pred incl. IN (SELECT ...)>` then `INSERT INTO iceberg.db.<t>
  * SELECT ...`), and until now that text only replayed through the
  * Scala table API. This runner translates the four DML verbs onto the
  * table ops with the right 100 TB cost shape per table kind:
  *
  *  - `DELETE FROM t WHERE p`  → [[GraftTable.deleteWhere]] — position
  *    deletes (O(matches) tombstones, zero rewrite) on append/COW
  *    tables, key-granular equality deletes on merge-on-read;
  *  - `UPDATE t SET c = e, ... [WHERE p]` → keyed tables upsert the
  *    updated rows (O(batch), merge-on-read stays O(batch) write);
  *    unkeyed tables [[GraftTable.replaceWhere]] (delete+re-insert,
  *    auto-compacting first if position deletes pend — the documented
  *    raw-rewrite ordering);
  *  - `INSERT INTO t [(cols)] SELECT ...|VALUES ...` →
  *    [[GraftTable.append]] (positional when no column list, like SQL);
  *  - `MERGE INTO t USING src ON <key equalities> WHEN MATCHED THEN
  *    UPDATE SET * WHEN NOT MATCHED THEN INSERT *` →
  *    [[GraftTable.upsert]] — exactly the upsert-shaped MERGE; any
  *    other ON/action shape refuses loudly rather than approximating.
  *
  * Non-DML statements (SET / SELECT / CREATE TEMP VIEW ...) run through
  * `spark.sql` as in [[SqlRunner]]. Every catalog table is (re-)published
  * as a temp view under its name BEFORE EACH statement — a logical read
  * pins the snapshot current at registration, so each statement (and
  * each DML's subqueries) sees its predecessors' writes, Trino's
  * read-committed statement semantics. Catalog-qualified names
  * (`iceberg.db.foo`) resolve by last segment, so the reference text
  * needs no rewriting. Returns the LAST statement's result; DML
  * statements yield a one-row (verb, table) marker frame so a
  * DML-final script still returns something inspectable.
  */
object DmlRunner {

  private val DeleteRe =
    """(?is)^DELETE\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.+))?$""".r
  private val UpdateRe =
    """(?is)^UPDATE\s+([\w.]+)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+))?$""".r
  private val InsertRe =
    """(?is)^INSERT\s+INTO\s+([\w.]+)\s*(?:\(([^)]*)\)\s*)?((?:SELECT|VALUES|WITH|TABLE)\b.+)$""".r
  private val InsertOverwriteRe =
    """(?is)^INSERT\s+OVERWRITE\s+(?:TABLE\s+)?([\w.]+)\s*(?:\(([^)]*)\)\s*)?((?:SELECT|VALUES|WITH|TABLE)\b.+)$""".r
  private val MergeHead =
    """(?is)^MERGE\s+INTO\s+([\w.]+)(?:\s+(?:AS\s+)?\w+)?\s+USING\s+""".r
  private val MergeTail =
    ("""(?is)^\s*(?:(?:AS\s+)?(\w+)\s+)?ON\s+(.+?)""" +
      """\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*""" +
      """\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*$""").r

  /** Parse the upsert-shaped MERGE: (target, usingSource, onClause).
    * The USING source is consumed PAREN-AWARE (a subquery may itself
    * contain `JOIN ... ON` — a regex splitting on the first ` ON `
    * would truncate it), then the tail must be exactly the
    * `ON ... UPDATE SET * / INSERT *` shape.
    */
  private def parseMerge(stmt: String): Option[(String, String, String)] =
    MergeHead.findFirstMatchIn(stmt).map { m =>
      val rest = stmt.substring(m.end).trim
      val (usingText, afterUsing) =
        if (rest.startsWith("(")) {
          var depth = 0; var i = 0; var inQ = false; var end = -1
          while (i < rest.length && end < 0) {
            rest(i) match {
              case '\'' => inQ = !inQ
              case '(' if !inQ => depth += 1
              case ')' if !inQ => depth -= 1; if (depth == 0) end = i
              case _ =>
            }
            i += 1
          }
          require(end > 0, "unbalanced parentheses in MERGE USING source")
          (rest.substring(0, end + 1), rest.substring(end + 1))
        } else {
          val w = rest.takeWhile(c => c.isLetterOrDigit || c == '_' || c == '.')
          require(w.nonEmpty, "MERGE USING needs a view name or a (subquery)")
          (w, rest.substring(w.length))
        }
      MergeTail.findFirstMatchIn(afterUsing) match {
        case Some(t) => (m.group(1), usingText, t.group(2))
        case None => throw new IllegalArgumentException(
          "unsupported MERGE shape — only `MERGE INTO t USING src ON <key " +
            "equalities> WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED " +
            "THEN INSERT *` maps to upsert semantics")
      }
    }

  // Trino-style maintenance procedures (scripts/maintenance.sh:66-79
  // issues exactly these) and the ALTER COLUMN DDL trio
  private val AlterExecRe =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+EXECUTE\s+(\w+)\s*\(([^)]*)\)\s*$""".r
  private val AlterAddRe =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMNS?\s*\((.+)\)\s*$""".r
  private val AlterDropRe =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+COLUMNS?\s+([\w\s,]+)$""".r
  private val AlterRenameRe =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*$""".r

  // Trino/Iceberg procedure-call style: CALL iceberg.system.<proc>(...)
  private val CallRe =
    """(?is)^CALL\s+[\w.]*system\.(\w+)\s*\((.*)\)\s*$""".r

  /** `'128MB'` / `'64kB'` / `'1GB'` → bytes. */
  private[graft] def parseBytes(s: String): Long = {
    val m = """(?i)'?\s*(\d+)\s*(B|KB|MB|GB)?\s*'?""".r
      .findFirstMatchIn(s.trim).getOrElse(
        throw new IllegalArgumentException(s"bad size literal: '$s'"))
    val n = m.group(1).toLong
    Option(m.group(2)).map(_.toUpperCase) match {
      case Some("KB") => n * 1024L
      case Some("MB") => n * 1024L * 1024
      case Some("GB") => n * 1024L * 1024 * 1024
      case _ => n
    }
  }

  /** `'7d'` / `'12h'` / `'30m'` / `'45s'` → milliseconds. */
  private[graft] def parseDurationMs(s: String): Long = {
    val m = """(?i)'?\s*(\d+)\s*(d|h|m|s)\s*'?""".r
      .findFirstMatchIn(s.trim).getOrElse(
        throw new IllegalArgumentException(s"bad duration literal: '$s'"))
    val n = m.group(1).toLong
    m.group(2).toLowerCase match {
      case "d" => n * 86400000L
      case "h" => n * 3600000L
      case "m" => n * 60000L
      case "s" => n * 1000L
    }
  }

  /** The value of a `name => 'value'` argument list entry, if present. */
  private def namedArg(args: String, name: String): Option[String] =
    s"""(?i)$name\\s*=>\\s*('[^']*'|\\S+)""".r
      .findFirstMatchIn(args).map(_.group(1))

  /** Last identifier segment: `iceberg.db.foo` → `foo`. */
  private def baseName(qualified: String): String =
    qualified.split('.').last

  /** Rewrite catalog-qualified table names to their bare temp-view
    * names OUTSIDE single-quoted string literals (a literal like
    * `'iceberg.db.foo'` must survive verbatim). Three-part names
    * (`<catalog>.<schema>.t`) always rewrite; two-part names rewrite
    * only under the reference's `db` schema segment (its scripts
    * qualify every table as `iceberg.db.<t>`) — a generic two-part
    * match would clobber `alias.column` references. Names are
    * regex-quoted, so no metacharacter in a table name can widen the
    * match.
    */
  private[graft] def rewriteQualified(stmt: String, names: Iterable[String]): String = {
    import java.util.regex.{Matcher, Pattern}
    val res = names.toSeq.map(n => Pattern.compile(
      s"""(?i)\\b(?:\\w+\\.\\w+|db)\\.${Pattern.quote(n)}\\b""") -> n)
    // alternating unquoted/quoted runs; a doubled '' stays inside quotes
    val segs = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    val cur = new StringBuilder
    var inQ = false
    stmt.foreach {
      case '\'' if !inQ =>
        if (cur.nonEmpty) { segs += ((cur.toString, false)); cur.clear() }
        inQ = true; cur += '\''
      case '\'' =>
        cur += '\''; segs += ((cur.toString, true)); cur.clear(); inQ = false
      case ch => cur += ch
    }
    if (cur.nonEmpty) segs += ((cur.toString, inQ))
    segs.map {
      case (text, true) => text
      case (text, false) =>
        res.foldLeft(text) { case (s, (p, n)) =>
          p.matcher(s).replaceAll(Matcher.quoteReplacement(n)) }
    }.mkString
  }

  /** Split a SET list on top-level commas (quote- and paren-aware, so
    * `SET v = round(a, 2), w = 'x,y'` splits correctly).
    */
  private[graft] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    s.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case '(' if !inQuote => depth += 1; cur += '('
      case ')' if !inQuote => depth -= 1; cur += ')'
      case ',' if !inQuote && depth == 0 =>
        out += cur.toString.trim; cur.clear()
      case ch => cur += ch
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }

  private def marker(spark: SparkSession, verb: String, table: String): DataFrame = {
    import spark.implicits._
    Seq((verb, table)).toDF("dml", "table")
  }

  /** Run a script of SQL statements (DML + reads) against the catalog's
    * tables inside a scoped `newSession` (conf/view isolation, the
    * [[SqlRunner.run]] discipline — temp views are session-bound, so
    * the table handles are re-opened ON the scoped session too).
    * `registerExtras` publishes additional read-only views (e.g. the
    * testdata tables) into the scoped session before any statement.
    */
  def run(spark: SparkSession, cat: TableCatalog, script: String,
      registerExtras: SparkSession => Unit = _ => ()): DataFrame = {
    val scoped = spark.newSession()
    registerExtras(scoped)
    val tables: Map[String, GraftTable] =
      cat.names.map(n => n -> new GraftTable(scoped, cat.defn(n), cat.root)).toMap
    val stmts = SqlRunner.splitStatements(script)
    require(stmts.nonEmpty, "empty SQL script")
    var last: DataFrame = null
    stmts.foreach { stmt =>
      // publish every catalog table at ITS CURRENT snapshot — a logical
      // read pins the snapshot at plan time, so re-registering per
      // statement is what gives statement-level read-committed
      tables.foreach { case (n, t) =>
        if (t.currentVersion > 0) t.readLogical().createOrReplaceTempView(n)
        else scoped.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          t.currentSchema).createOrReplaceTempView(n)
      }
      // catalog-qualified names (`iceberg.db.foo`, `db.foo`) resolve to
      // the temp views by LAST segment — applied to the whole statement
      // so qualified names inside subqueries and plain SELECTs replay
      // verbatim too (the reference's scripts qualify every reference)
      val rewritten = rewriteQualified(stmt, tables.keys)
      val r = runStatement(scoped, tables, rewritten)
      if (r != null) last = r
    }
    require(last != null, "script contained only SET statements")
    last
  }

  private def resolve(tables: Map[String, GraftTable], qualified: String): GraftTable =
    tables.getOrElse(baseName(qualified),
      throw new IllegalArgumentException(s"unknown DML target table: $qualified"))

  private def runStatement(spark: SparkSession, tables: Map[String, GraftTable],
      stmt: String): DataFrame = stmt match {
    case DeleteRe(name, whereOrNull) =>
      val t = resolve(tables, name)
      val cond = Option(whereOrNull).map(expr).getOrElse(lit(true))
      t.deleteWhere(cond)
      marker(spark, "DELETE", t.defn.name)
    case UpdateRe(name, setList, whereOrNull) =>
      val t = resolve(tables, name)
      runUpdate(spark, t, setList, Option(whereOrNull))
      marker(spark, "UPDATE", t.defn.name)
    case InsertRe(name, colsOrNull, query) =>
      val t = resolve(tables, name)
      t.append(alignInsert(spark, t, Option(colsOrNull), query))
      marker(spark, "INSERT", t.defn.name)
    case InsertOverwriteRe(name, colsOrNull, query) =>
      val t = resolve(tables, name)
      t.overwrite(alignInsert(spark, t, Option(colsOrNull), query))
      marker(spark, "INSERT OVERWRITE", t.defn.name)
    case AlterExecRe(name, proc, args) =>
      val t = resolve(tables, name)
      proc.toLowerCase match {
        case "optimize" =>
          // Trino: ALTER TABLE t EXECUTE optimize(file_size_threshold => '128MB')
          val target = namedArg(args, "file_size_threshold")
            .map(parseBytes).getOrElse(128L * 1024 * 1024)
          t.compact(targetBytes = target)
        case "expire_snapshots" =>
          val retention = namedArg(args, "retention_threshold")
            .map(parseDurationMs).getOrElse(7L * 86400000)
          t.expireSnapshots(retention)
        case "remove_orphan_files" =>
          // the engine's orphan sweep reclaims files referenced by NO
          // surviving snapshot; Iceberg's retention_threshold guards
          // in-flight multi-writer uploads, which a single-writer log
          // has none of — the argument is accepted and moot
          t.removeOrphans()
        case other => throw new IllegalArgumentException(
          s"${t.defn.name}: unknown table procedure '$other' — " +
            "optimize / expire_snapshots / remove_orphan_files")
      }
      marker(spark, s"EXECUTE $proc", baseName(name))
    case CallRe(proc, args) =>
      // positional-or-named args; the table is the first 'db.t' literal
      val argList = splitTopLevel(args).map(_.trim)
      def tableArg: GraftTable = {
        val named = namedArg(args, "table").orElse(namedArg(args, "schema_table"))
        val raw = named.orElse(argList.headOption).getOrElse(
          throw new IllegalArgumentException(s"CALL $proc: missing table argument"))
        resolve(tables, raw.stripPrefix("'").stripSuffix("'"))
      }
      proc.toLowerCase match {
        case "rollback_to_snapshot" =>
          // CALL iceberg.system.rollback_to_snapshot('db.t', <version>)
          val t = tableArg
          val v = namedArg(args, "snapshot_id").orElse(argList.lift(1)).getOrElse(
            throw new IllegalArgumentException(
              s"CALL rollback_to_snapshot: missing snapshot id")).trim.toInt
          t.rollback(v)
          marker(spark, "ROLLBACK", t.defn.name)
        case "fast_forward" =>
          // CALL iceberg.system.fast_forward('db.t', 'main', 'audit'):
          // publish the staged branch onto main (the WAP publish leg)
          val t = tableArg
          val to = namedArg(args, "to").orElse(argList.lift(2)).getOrElse(
            throw new IllegalArgumentException(
              s"CALL fast_forward: missing source branch")).trim
              .stripPrefix("'").stripSuffix("'")
          t.fastForward(to)
          marker(spark, "FAST_FORWARD", t.defn.name)
        case "expire_snapshots" =>
          val t = tableArg
          val retention = namedArg(args, "retention_threshold")
            .map(parseDurationMs).getOrElse(7L * 86400000)
          t.expireSnapshots(retention)
          marker(spark, "EXPIRE_SNAPSHOTS", t.defn.name)
        case "remove_orphan_files" =>
          val t = tableArg
          t.removeOrphans()
          marker(spark, "REMOVE_ORPHAN_FILES", t.defn.name)
        case other => throw new IllegalArgumentException(
          s"unknown procedure 'system.$other' — rollback_to_snapshot / " +
            "fast_forward / expire_snapshots / remove_orphan_files")
      }
    case AlterRenameRe(name, from, to) =>
      val t = resolve(tables, name)
      t.renameColumn(from, to)
      marker(spark, "RENAME COLUMN", t.defn.name)
    case AlterAddRe(name, colList) =>
      val t = resolve(tables, name)
      t.addColumns(org.apache.spark.sql.types.StructType.fromDDL(colList).fields: _*)
      marker(spark, "ADD COLUMNS", t.defn.name)
    case AlterDropRe(name, colList) =>
      val t = resolve(tables, name)
      t.dropColumns(colList.split(',').map(_.trim).toIndexedSeq: _*)
      marker(spark, "DROP COLUMNS", t.defn.name)
    case merge if merge.trim.toUpperCase.startsWith("MERGE") =>
      parseMerge(merge.trim) match {
        case Some((name, using, on)) =>
          val t = resolve(tables, name)
          runMerge(spark, t, using.trim, on)
          marker(spark, "MERGE", t.defn.name)
        case None =>
          throw new IllegalArgumentException(s"unparseable MERGE statement: $merge")
      }
    case other =>
      SqlRunner.applySetOrSql(spark, other)
  }

  /** Align an INSERT source to the table schema: column-list mapping
    * when given (must cover the schema), positional otherwise — SQL's
    * rules — then the implicit write-side cast.
    */
  private def alignInsert(spark: SparkSession, t: GraftTable,
      colsOrNull: Option[String], query: String): DataFrame = {
    val src = spark.sql(query)
    val want = t.currentSchema.fieldNames
    val aligned = colsOrNull match {
      case Some(colList) =>
        val names = colList.split(',').map(_.trim)
        require(names.sorted.sameElements(want.sorted.toArray[String]),
          s"${t.defn.name}: INSERT column list must cover the schema " +
            s"(${want.mkString(", ")}) — partial inserts are not supported")
        src.toDF(names.toIndexedSeq: _*)
      case None =>
        require(src.columns.length == want.length,
          s"${t.defn.name}: INSERT arity ${src.columns.length} != ${want.length}")
        src.toDF(want.toIndexedSeq: _*) // positional, like SQL
    }
    castTo(aligned, t)
  }

  /** SQL's implicit write-side cast: align a frame's column TYPES to
    * the table schema (a `VALUES (1, 'a', 1.0)` literal types as
    * INT/DECIMAL — appended raw, the parquet physical types would
    * diverge from the declared schema and reads would miscarry).
    */
  private def castTo(df: DataFrame, t: GraftTable): DataFrame = {
    val schema = t.currentSchema
    df.select(schema.fields.map(f => df.col(f.name).cast(f.dataType).as(f.name))
      .toIndexedSeq: _*)
  }

  private def runUpdate(spark: SparkSession, t: GraftTable,
      setList: String, where: Option[String]): Unit = {
    val cond: Column = where.map(expr).getOrElse(lit(true))
    val assignments = splitTopLevel(setList).map { a =>
      val i = a.indexOf('=')
      require(i > 0, s"${t.defn.name}: bad SET assignment '$a'")
      val name = a.substring(0, i).trim
      require(t.currentSchema.fieldNames.exists(_.equalsIgnoreCase(name)),
        s"${t.defn.name}: SET names unknown column '$name'")
      require(!t.defn.keys.exists(_.equalsIgnoreCase(name)),
        s"${t.defn.name}: cannot UPDATE identifier key '$name'")
      name -> expr(a.substring(i + 1).trim)
    }
    require(assignments.map(_._1.toLowerCase).distinct.size == assignments.size,
      s"${t.defn.name}: duplicate column in SET list")
    // SQL evaluates every SET RHS against the OLD row — a single select
    // substituting the assigned columns, never a sequential withColumn
    // fold (there, `SET a = 1, b = a + 1` would see the NEW a)
    val byName = assignments.map { case (n, e) => n.toLowerCase -> e }.toMap
    val updated = castTo(t.readLogical().filter(cond).select(
      t.currentSchema.fieldNames.map(f =>
        byName.get(f.toLowerCase).map(_.as(f)).getOrElse(col(f))).toIndexedSeq: _*),
      t)
    if (t.defn.isUpsert) {
      // keyed table: the updated rows upsert by key — O(batch), and the
      // merge-on-read form never rewrites survivors
      t.upsert(updated)
    } else {
      // unkeyed: delete+re-insert of the affected rows. A raw rewrite
      // refuses over pending position deletes, so materialize them
      // first (the maintenance ordering a lakehouse operator runs
      // anyway; at 100 TB the compact is O(deleted-touched files))
      if (t.commits.lastOption.exists(_.posDeleteFilesOrEmpty.nonEmpty)) t.compact()
      t.replaceWhere(cond, updated)
    }
  }

  private def runMerge(spark: SparkSession, t: GraftTable,
      using: String, on: String): Unit = {
    require(t.defn.isUpsert,
      s"${t.defn.name}: MERGE INTO needs a keyed (upsert) table")
    // the source: a parenthesized subquery or a view name
    val src =
      if (using.startsWith("(")) spark.sql(using.stripPrefix("(").stripSuffix(")"))
      else spark.table(using)
    // the ON clause must be exactly the identifier-key equalities — the
    // one MERGE shape with upsert semantics; anything else (partial
    // keys, extra predicates) would NOT be latest-wins-per-key and
    // refuses rather than approximating
    val eqRe = """(?i)\s*(?:\w+\.)?(\w+)\s*=\s*(?:\w+\.)?(\w+)\s*""".r
    val onCols = on.split("(?i)\\bAND\\b").toSeq.map {
      case eqRe(a, b) =>
        require(a.equalsIgnoreCase(b),
          s"${t.defn.name}: MERGE ON must equate same-named key columns, got '$a = $b'")
        a.toLowerCase
      case other =>
        throw new IllegalArgumentException(
          s"${t.defn.name}: unsupported MERGE ON term '$other' — key equalities only")
    }
    require(onCols.sorted == t.defn.keys.map(_.toLowerCase).sorted,
      s"${t.defn.name}: MERGE ON columns (${onCols.mkString(", ")}) must be " +
        s"exactly the identifier keys (${t.defn.keys.mkString(", ")})")
    val want = t.currentSchema.fieldNames
    require(src.columns.map(_.toLowerCase).sorted.sameElements(
        want.map(_.toLowerCase).sorted.toArray[String]),
      s"${t.defn.name}: MERGE source columns must match the schema for SET */INSERT *")
    t.upsert(castTo(src.select(want.map(src.col).toIndexedSeq: _*), t))
  }
}
