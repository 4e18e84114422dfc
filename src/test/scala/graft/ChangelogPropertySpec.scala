package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style randomized check of the changelog layer: for RANDOM
  * commit histories mixing every derivable op (append, merge-on-read
  * upsert, change-tracked copy-on-write upsert, change-tracked
  * replaceWhere repairs, merge-on-read equality-delete tombstones,
  * partition-spec evolutions, compaction), reconstructing the table
  * from `readChanges(0, current)` alone must equal `readLogical` — the
  * contract a downstream incremental consumer relies on. Seeds are
  * fixed, so failures reproduce exactly.
  *
  * Consumer replay semantics (the readChanges scaladoc contract):
  * apply versions in order — `upsert` rows replace by key
  * (latest-wins), `delete` rows cancel one earlier instance each
  * (multiset), `insert` rows add.
  */
class ChangelogPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_clprop", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))

  private def df(rows: Seq[(Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  /** Driver-side replay of the changelog rows, version order. */
  private def replay(changes: Seq[(Long, Double, Int, String)]): Set[(Long, Double)] = {
    val state = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    changes.sortBy(_._3).foreach {
      case (id, v, _, "insert") => state += ((id, v))
      case (id, v, _, "upsert") =>
        // key-based: replaces every live row with this id
        val kept = state.filterNot(_._1 == id)
        state.clear(); state ++= kept += ((id, v))
      case (id, v, _, "delete") =>
        // multiset: cancel ONE earlier instance
        val i = state.indexOf((id, v))
        assert(i >= 0, s"delete of a row never inserted: ($id, $v)")
        state.remove(i)
      case other => fail(s"unknown change type: $other")
    }
    state.toSet // histories below never leave duplicate live rows
  }

  private def collectChanges(t: GraftTable): Seq[(Long, Double, Int, String)] =
    t.readChanges(0, t.currentVersion)
      .select(col("id"), col("v"), col("_change_version"), col("_change_type"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getString(3)))
      .toSeq

  private def logical(t: GraftTable): Set[(Long, Double)] =
    t.readLogical().collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

  for (seed <- Seq(11L, 42L, 1337L)) {
    test(s"random op histories replay to readLogical (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      for (mor <- Seq(false, true)) {
        val t = new GraftTable(spark,
          TableDef(s"clp_${seed}_$mor", schema, keys = Seq("id"), mergeOnRead = mor),
          freshRoot(s"clp_${seed}_$mor"))
        // version counter of the shadow model: ids are partitioned per
        // op so the replay stays well-defined (no duplicate live rows)
        var nextId = 0L
        def freshIds(n: Int): Seq[Long] = {
          val ids = (nextId until nextId + n); nextId += n; ids
        }
        t.append(df(freshIds(8).map(i => i -> 1.0))) // seed rows
        for (step <- 1 to 8) {
          rnd.nextInt(6) match {
            case 0 => t.append(df(freshIds(3).map(i => i -> (step * 1.0))))
            case 1 =>
              // upsert: revise 2 random EXISTING ids (+1 new)
              val existing = t.readLogical().select("id")
                .collect().map(_.getLong(0)).sorted
              val pick = rnd.shuffle(existing.toSeq).take(2) ++ freshIds(1)
              t.upsert(df(pick.map(i => i -> (step * 10.0))))
            case 2 if !mor =>
              // tracked repair: rewrite a random id band to a marker
              val lo = rnd.nextInt(nextId.toInt max 1).toLong
              val hi = lo + rnd.nextInt(4)
              val affected = t.readLogical()
                .filter(col("id") >= lo && col("id") <= hi)
                .select("id").collect().map(_.getLong(0))
              t.replaceWhere(col("id") >= lo && col("id") <= hi,
                df(affected.toSeq.map(i => i -> (step * 100.0))),
                trackChanges = true)
            case 2 if mor =>
              // equality-delete tombstone of up to 2 random existing keys
              val existing = t.readLogical().select("id")
                .collect().map(_.getLong(0)).sorted
              val victims = rnd.shuffle(existing.toSeq).take(1 + rnd.nextInt(2))
              if (victims.nonEmpty)
                t.deleteKeys(df(victims.map(i => i -> 0.0)))
            case 3 =>
              // partition-spec evolution: toggle bucket(4, id) ↔ flat —
              // every subsequent op then spans layout generations
              if (t.currentPartitions.isEmpty)
                t.evolvePartitioning(Seq(BucketTransform("id", 4)))
              else t.evolvePartitioning(Nil)
            case _ => t.compact(targetBytes = 64L * 1024)
          }
        }
        val replayed = replay(collectChanges(t))
        assert(replayed == logical(t),
          s"seed=$seed mor=$mor: changelog replay diverged from the table " +
            s"(replay-only=${(replayed -- logical(t)).take(3)}, " +
            s"table-only=${(logical(t) -- replayed).take(3)})")
      }
    }
  }
}
