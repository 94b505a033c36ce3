package graft.queries

import scala.util.Random

/** Seeded random generator for CEP differential cases — fuzzes the NFA
  * ([[graft.cep.NFA]] / [[graft.cep.CEP.batch]], the reference's
  * CepOperator analogue) with random strict-contiguity patterns the
  * hand-written `q_cep_*` rows can't enumerate: 2–3 steps, each a
  * random predicate over event_type / exact cents / event_id residues,
  * with or without a `within` window.
  *
  * Strict `next` steps under `AfterMatchSkip.SkipToNext` (greedy branch
  * per anchor, every start position tried) make the match set exactly
  * restatable with LEAD window functions — including when adjacent
  * predicates OVERLAP (e.g. step 0 `cents >= 2500` and step 1
  * `cents >= 7500` both true of one row), the case the default
  * skip-past-last-row strategy would consume rows across and no
  * windowed restatement could express. The restatement runs on DuckDB
  * (promoted rows / dump sweeps) and as a Spark window plan
  * (`CepFuzzSpec`), so the NFA is checked engine-vs-engine AND
  * cross-engine per seed.
  */
object CepFuzzGen {

  /** Event shape fed to the NFA: ts epoch-micros, money as exact cents
    * (doubles never enter a predicate).
    */
  case class CE(user_id: Long, ts: Long, event_type: String,
      event_id: Long, cents: Long)

  /** One step predicate — a data value, so cases compare/replay
    * deterministically; `sql(suffix)` renders the SHARED restatement
    * text for the step's LEAD offset and `fn` the NFA-side closure.
    */
  sealed trait StepPred {
    def sql(suffix: String): String
    def fn: CE => Boolean
  }
  final case class TypeIs(t: String) extends StepPred {
    def sql(suffix: String): String = s"event_type$suffix = '$t'"
    def fn: CE => Boolean = _.event_type == t
  }
  final case class TypeIn(ts: Seq[String]) extends StepPred {
    def sql(suffix: String): String =
      s"event_type$suffix IN (${ts.map(t => s"'$t'").mkString(", ")})"
    def fn: CE => Boolean = e => ts.contains(e.event_type)
  }
  final case class CentsGe(c: Long) extends StepPred {
    def sql(suffix: String): String = s"cents$suffix >= $c"
    def fn: CE => Boolean = _.cents >= c
  }
  final case class IdMod(m: Long, r: Long) extends StepPred {
    def sql(suffix: String): String = s"(event_id$suffix % $m) = $r"
    def fn: CE => Boolean = e => e.event_id % m == r
  }

  case class Case(
      seed: Long,
      steps: Seq[StepPred], // 2 or 3, strict next contiguity
      withinMinutes: Option[Int]) {

    /** DuckDB restatement: per-user (ts, event_id) order, step i reads
      * the LEAD-i columns; a NULL lead (stream tail) nulls its
      * predicate and WHERE drops the row — exactly the NFA's
      * can't-complete behavior.
      */
    def oracleSql: String = {
      val k = steps.length
      val leadCols = (1 until k).flatMap { i =>
        Seq(
          s"lead(event_type, $i) OVER w AS event_type_$i",
          s"lead(event_id, $i) OVER w AS event_id_$i",
          s"lead(cents, $i) OVER w AS cents_$i",
          s"lead(us, $i) OVER w AS us_$i")
      }
      val preds = steps.zipWithIndex.map { case (p, i) =>
        p.sql(if (i == 0) "" else s"_$i")
      }
      val withinPred = withinMinutes.map(m =>
        s"us_${k - 1} <= us + ${m * 60000000L}").toSeq
      s"""WITH o AS (
         |  SELECT user_id, event_id,
         |    epoch_us(make_timestamp(epoch_ns(ts) // 1000)) AS us,
         |    event_type,
         |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         |    ${leadCols.mkString(",\n    ")}
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id
         |    ORDER BY make_timestamp(epoch_ns(ts) // 1000), event_id))
         |SELECT user_id, event_id AS a_id, event_id_${k - 1} AS z_id
         |FROM o
         |WHERE ${(preds ++ withinPred).mkString("\n  AND ")}""".stripMargin
    }
  }

  private val eventTypes =
    Seq("click", "purchase", "view", "signup", "error")

  private def stepOf(r: Random): StepPred = r.nextInt(4) match {
    case 0 => TypeIs(eventTypes(r.nextInt(eventTypes.length)))
    case 1 =>
      val n = 2 + r.nextInt(2)
      TypeIn(r.shuffle(eventTypes).take(n).sorted)
    // cents thresholds stay inside the ~0–33000 testdata range so
    // every arm keeps matches; coarse steps make cross-step overlap
    // (both preds true of one row) common — the SkipToNext case
    case 2 => CentsGe((1 + r.nextInt(12)) * 2500L)
    case 3 =>
      val m = 2 + r.nextInt(4)
      IdMod(m, r.nextInt(m))
  }

  /** The case for a seed — a pure function of the seed. */
  def gen(seed: Long): Case = {
    val r = new Random(StreamFuzzGen.scramble(seed ^ 0xcef0225L))
    val k = 2 + r.nextInt(2)
    val steps = Seq.fill(k)(stepOf(r))
    val within =
      if (r.nextInt(3) == 0) None
      else Some(Seq(30, 60, 120, 240)(r.nextInt(4)))
    Case(seed, steps, within)
  }
}
