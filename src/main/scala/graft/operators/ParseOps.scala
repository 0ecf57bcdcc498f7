package graft.operators

import graft.{Q, Cols, Tables}
import Cols._
import Tables.t
import graft.functions.RegexExtractNamed.regexp_extract_named
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-checkable twins of the reference's streaming operators, driven
  * through the oracle gate on the testdata tables:
  *
  *  - q70 exercises [[graft.functions.RegexExtractNamed]] — the P1
  *    extract-to-schema operator (reference readport.py:328-369) with
  *    `///`→NULL sentinel handling (P3) and the float cast layer (P2) —
  *    on wire-format messages synthesized from `lineitem`.
  *  - q71 is the G2 count-based window (reference readport.py:233-297,
  *    `pack_length` packing) as a deterministic batch computation:
  *    row_number per key → window id = (rn-1) div N → per-window stats.
  *    The streaming form lives in graft.streaming.CountWindow.
  */
object ParseOps {

  private val q70 = Q(
    "q70_regex_extract_device",
    (s, d) => {
      import s.implicits._
      val msgs = t(s, d, "lineitem").select(
        $"l_returnflag",
        concat(
          lit("x= "),
          when($"l_discount" > 0.08, lit("///"))
            .otherwise(expr("CAST(CAST(floor(l_quantity) AS BIGINT) AS STRING)")),
          lit(" y= "), $"l_linenumber".cast("string"),
          lit(" T= "), ($"l_partkey" % 100).cast("string")).as("msg"))
      msgs
        .withColumn("ex", regexp_extract_named($"msg",
          """^x= (?<u>\S+) y= (?<v>\S+) T= (?<temp>\S+)$"""))
        .select($"l_returnflag",
          $"ex.u".cast("double").as("u"),
          $"ex.v".cast("double").as("v"),
          $"ex.temp".cast("double").as("temp"))
        .groupBy($"l_returnflag")
        .agg(
          count($"u").as("n_u"),          // sentinel rows are NULL → proves P3
          count(lit(1)).as("n_all"),
          r2(sum($"u")).as("sum_u"),
          r2(sum($"v")).as("sum_v"),
          r4(avg($"temp")).as("avg_temp"))
        .orderBy($"l_returnflag")
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag,
               'x= ' || CASE WHEN l_discount > 0.08 THEN '///'
                             ELSE CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR) END
               || ' y= ' || CAST(l_linenumber AS VARCHAR)
               || ' T= ' || CAST(l_partkey % 100 AS VARCHAR) AS msg
        FROM lineitem),
      e AS (
        SELECT l_returnflag,
               CAST(nullif(regexp_extract(msg, '^x= (\S+) y= (\S+) T= (\S+)$', 1), '///') AS DOUBLE) AS u,
               CAST(nullif(regexp_extract(msg, '^x= (\S+) y= (\S+) T= (\S+)$', 2), '///') AS DOUBLE) AS v,
               CAST(nullif(regexp_extract(msg, '^x= (\S+) y= (\S+) T= (\S+)$', 3), '///') AS DOUBLE) AS temp
        FROM m)
      SELECT l_returnflag,
             count(u)             AS n_u,
             count(*)             AS n_all,
             round(sum(u), 2)     AS sum_u,
             round(sum(v), 2)     AS sum_v,
             round(avg(temp), 4)  AS avg_temp
      FROM e
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  private val q71 = Q(
    "q71_count_window_pack",
    (s, d) => {
      import s.implicits._
      // Per-type sequential rank via the range-partitioned two-pass
      // pattern (TwoPass, as q22/q58): event_type has a HANDFUL of hot
      // values, so the previous `Window.partitionBy(event_type)
      // .orderBy(ts, event_id)` sorted each type's full history in ONE
      // task — the same class of plan the round-2 verdict flagged on
      // q22/q29. Ordering on event-time micros (not the truncated
      // second cast), event_id tiebreak — identical total order to the
      // window form and the oracle.
      // Option-encoded nullable fields: the parquet schema marks ts /
      // value optional, and a typed (Long, Double) view would crash on a
      // NULL where the window form it replaced tolerated them (nulls
      // rank first, sum skips them — preserved here)
      val ranged = TwoPass.rangedPinned(
        t(s, d, "events")
          .select($"event_type", unix_micros($"ts").as("tsm"),
            $"event_id", $"value")
          .as[(String, Option[Long], Option[Long], Option[Double])],
        $"event_type", $"tsm", $"event_id")
      val (offsets, _) = TwoPass.groupOffsets(ranged)(_._1)
      val bOff = s.sparkContext.broadcast(offsets)
      val binned = TwoPass.withPid(ranged) { (pid, it) =>
        val local = scala.collection.mutable.HashMap[String, Long]()
        it.map { case (g, _, id, v) =>
          val rn = local.getOrElse(g, 0L) + 1L
          local.update(g, rn)
          (g, id, v, (bOff.value.getOrElse((pid, g), 0L) + rn - 1L) / 10L)
        }
      }.toDF("event_type", "event_id", "value", "win_id")
      binned.groupBy($"event_type", $"win_id")
        .agg(
          count(lit(1)).as("n"),
          min($"event_id").as("first_id"),
          max($"event_id").as("last_id"),
          r2(sum($"value")).as("sum_value"))
        .orderBy($"event_type", $"win_id")
    },
    Some("""
      WITH r AS (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
        FROM events)
      SELECT event_type, CAST((rn - 1) // 10 AS BIGINT) AS win_id,
             count(*) AS n, min(event_id) AS first_id, max(event_id) AS last_id,
             round(sum(value), 2) AS sum_value
      FROM r
      GROUP BY 1, 2
      ORDER BY event_type, win_id"""))

  val all: Seq[Q] = Seq(q70, q71)
}
