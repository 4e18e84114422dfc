package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized schema-evolution histories vs a driver-side shadow model:
  * random interleavings of appends/upserts, column ADDs, DROPs, and
  * RENAMEs (round 14), and compactions must leave `readLogical` equal
  * to the shadow (rows as Map(column → value), null-filled for pre-ADD
  * rows, projected after a DROP, values following the name across a
  * RENAME) — and every historical snapshot must still read with ITS
  * schema. Because drops and renames FREE names the add op can pick
  * again, random histories exercise the resurrection guard (a re-added
  * name must read as null on files that still physically store the
  * dead column). Catches cross-op interactions single-path tests can't.
  */
class SchemaEvolutionPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_seprop", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  // candidate evolvable columns (beyond the permanent id/v); rename
  // targets come from the same small space so freed names get REUSED
  // by later adds — the resurrection-guard regime
  private val pool = Vector("c1", "c2", "c3", "r1", "r2")

  for (seed <- Seq(5L, 77L, 1234L)) {
    test(s"random add/drop/write/compact histories match the shadow model (seed $seed)") {
      val rnd = new Random(seed)
      for (mor <- Seq(false, true)) {
        val base = StructType(Seq(
          StructField("id", LongType),
          StructField("v", DoubleType)))
        val t = new GraftTable(spark,
          TableDef(s"sep_${seed}_$mor", base, keys = Seq("id"), mergeOnRead = mor),
          freshRoot(s"sep_${seed}_$mor"))
        // shadow: id → row(Map col → value); plus the live column list
        var cols = Vector("id", "v")
        val shadow = scala.collection.mutable.LinkedHashMap[Long, Map[String, Any]]()
        var nextId = 0L
        def write(n: Int, upsert: Boolean, mark: Double): Unit = {
          val ids =
            if (upsert && shadow.nonEmpty)
              rnd.shuffle(shadow.keys.toSeq).take(n) ++ { nextId += 1; Seq(nextId) }
            else (1 to n).map(_ => { nextId += 1; nextId })
          val rows = ids.map { i =>
            i -> (cols.map {
              case "id" => "id" -> (i: Any)
              case c => c -> (mark: Any)
            }.toMap)
          }
          // build a DataFrame with exactly the current schema
          val df = spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](
              scala.jdk.CollectionConverters.SeqHasAsJava(rows.map { case (i, m) =>
                org.apache.spark.sql.Row.fromSeq(cols.map(c =>
                  if (c == "id") i else m(c)))
              }.toList).asJava),
            StructType(cols.map(c =>
              if (c == "id") StructField("id", LongType)
              else StructField(c, DoubleType))))
          if (upsert) t.upsert(df) else t.append(df)
          rows.foreach { case (i, m) =>
            if (upsert) shadow(i) = m
            else shadow(i) = m // fresh ids on append — no collision
          }
        }
        write(4, upsert = false, 0.0)
        for (step <- 1 to 14) {
          rnd.nextInt(6) match {
            case 0 => write(2, upsert = false, step * 1.0)
            case 1 => write(2, upsert = true, step * 10.0)
            case 2 =>
              val addable = pool.filterNot(cols.contains)
              if (addable.nonEmpty) {
                val c = addable(rnd.nextInt(addable.size))
                t.addColumns(StructField(c, DoubleType))
                cols = cols :+ c
                // existing shadow rows null-fill the new column
                shadow.keys.toSeq.foreach(i => shadow(i) = shadow(i) + (c -> null))
              }
            case 3 =>
              val droppable = cols.filter(pool.contains)
              if (droppable.nonEmpty) {
                val c = droppable(rnd.nextInt(droppable.size))
                t.dropColumns(c)
                cols = cols.filterNot(_ == c)
                shadow.keys.toSeq.foreach(i => shadow(i) = shadow(i) - c)
              }
            case 4 =>
              // RENAME a pool column to a free pool name: values follow
              // the name in the shadow; the old name becomes addable
              // again (and a later add must then read pre-rename files
              // as null, not as the renamed column's dead bytes)
              val renameable = cols.filter(pool.contains)
              val free = pool.filterNot(cols.contains)
              if (renameable.nonEmpty && free.nonEmpty) {
                val from = renameable(rnd.nextInt(renameable.size))
                val to = free(rnd.nextInt(free.size))
                t.renameColumn(from, to)
                cols = cols.map(c => if (c == from) to else c)
                shadow.keys.toSeq.foreach { i =>
                  val m = shadow(i)
                  shadow(i) = m - from + (to -> m(from))
                }
              }
            case _ => t.compact(targetBytes = 64L * 1024)
          }
        }
        val got = t.readLogical().collect().map { r =>
          r.getLong(r.fieldIndex("id")) ->
            cols.map(c => c -> r.get(r.fieldIndex(c))).toMap
        }.toMap
        val want = shadow.toMap.map { case (i, m) =>
          i -> (m + ("id" -> i))
        }
        assert(got.keySet == want.keySet,
          s"seed=$seed mor=$mor id sets diverged: " +
            s"extra=${(got.keySet -- want.keySet).take(3)} missing=${(want.keySet -- got.keySet).take(3)}")
        got.foreach { case (i, m) =>
          assert(m == want(i), s"seed=$seed mor=$mor row $i: got $m want ${want(i)}")
        }
        // every surviving snapshot still reads with its own schema
        t.commits.foreach { c =>
          val snap = t.readLogical(Some(c.version))
          assert(snap.schema.fieldNames.toSet ==
            t.schemaAt(Some(c.version)).fieldNames.toSet)
          snap.count() // and actually evaluates
        }
      }
    }
  }
}
