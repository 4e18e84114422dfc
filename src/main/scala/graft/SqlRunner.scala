package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** X2 — thin SQL-script runner, the engine's analog of the reference's
  * Flink statement runner (flink/SqlRunner.java:28-151): splits a script
  * into statements (line comments stripped, quote-aware `;` splitting),
  * applies `SET key=value` statements to the session conf instead of
  * executing them, registers the testdata tables as temp views, runs
  * everything else through `spark.sql`, and returns the LAST statement's
  * result. Multi-statement scripts give the statement-set shape: earlier
  * statements build temp views (shared-scan fan-in), the final SELECT
  * consumes them.
  */
object SqlRunner {

  /** Quote-aware statement splitter; strips `--` line comments. */
  def splitStatements(script: String): Seq[String] = {
    val noComments = script.linesIterator
      .map { line =>
        // find -- outside single quotes
        var inQuote = false
        var cut = line.length
        var i = 0
        while (i < line.length - 1 && cut == line.length) {
          if (line(i) == '\'') inQuote = !inQuote
          else if (!inQuote && line(i) == '-' && line(i + 1) == '-') cut = i
          i += 1
        }
        line.substring(0, cut)
      }
      .mkString("\n")
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    noComments.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case ';' if !inQuote =>
        if (cur.toString.trim.nonEmpty) out += cur.toString.trim
        cur.clear()
      case ch => cur += ch
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }

  private val SetStmt = """(?is)SET\s+(\S+)\s*=\s*'?([^';]*?)'?\s*""".r

  /** One non-DML statement: `SET k=v` lands on the session conf (and
    * returns null), anything else runs through `spark.sql`. Shared with
    * [[DmlRunner]] so the two runners can't drift on SET handling.
    */
  private[graft] def applySetOrSql(spark: SparkSession, stmt: String): DataFrame =
    stmt match {
      case SetStmt(k, v) => spark.conf.set(k.trim, v.trim); null
      case other => spark.sql(other)
    }

  /** Run a script over the testdata tables at `dir`. The script runs in
    * its own `newSession()` (shared SparkContext + builder confs, private
    * SQLConf and temp-view registry), so its SET statements and views
    * cannot leak into the caller's session — Bench/Verify run every query
    * on one shared session, and a script's conf change would otherwise
    * silently apply to every query after it.
    */
  def run(spark: SparkSession, dir: String, script: String): DataFrame = {
    val scoped = spark.newSession()
    val t = Tables(scoped, dir)
    Tables.names.foreach(n => t.byName(n).createOrReplaceTempView(n))
    val stmts = splitStatements(script)
    require(stmts.nonEmpty, "empty SQL script")
    var last: DataFrame = null
    stmts.foreach { stmt =>
      val r = applySetOrSql(scoped, stmt)
      if (r != null) last = r
    }
    require(last != null, "script contained only SET statements")
    last
  }
}
