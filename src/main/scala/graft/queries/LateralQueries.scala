package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Q._

/** UDTF / lateral / UNNEST parity — reference `StreamExecCorrelate`
  * (/root/reference/flink-table/flink-table-planner/src/main/java/org/apache/flink/table/planner/plan/nodes/exec/stream/StreamExecCorrelate.java:53),
  * UNNEST rewrite (LogicalUnnestRule.java), `$UNNEST_ROWS$1` and
  * `$REPLICATE_ROWS$1` internals (SURVEY.md §2.2). Spark-first: Catalyst
  * `Generate` via explode/posexplode — codegen'd, no UDF.
  *
  * Scale notes: Generate multiplies rows before any shuffle; the follow-up
  * aggregations do map-side partial agg on the expanded stream, so the
  * shuffle carries only group buffers. LATERAL-with-aggregation is
  * expressed as explode + groupBy rather than a correlated subquery per
  * row — the plan Spark would anyway rewrite to, and the only shape that
  * scales.
  */
object LateralQueries {

  val queries: Map[String, QFn] = Map(
    // UNNEST: explode words of each document (inner — empty arrays drop).
    "q_unnest" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", explode(split($"text", " ")).as("word"))
        .groupBy($"word")
        .agg(count(lit(1)).as("n"), countDistinct($"doc_id").as("n_docs"))
        .filter($"n" > 5)
        .orderBy($"word")
    }),

    // UNNEST WITH ORDINALITY: posexplode (1-based to match SQL ordinality).
    "q_unnest_ordinal" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .filter($"doc_id" < 10)
        .select($"doc_id", posexplode(split($"text", " ")))
        .select($"doc_id", ($"pos" + 1).cast(LongType).as("ord"), $"col".as("word"))
        .filter($"ord" <= 5)
        .orderBy($"doc_id", $"ord")
    }),

    // Outer correlate: LEFT JOIN LATERAL — rows with no matches survive
    // with NULLs (Flink's `leftOuterJoinLateral`, Table.java).
    "q_lateral_outer" -> ((s, dir) => {
      import s.implicits._
      val words = filter(split($"text", " "), w => w.startsWith("z"))
      t(s, dir, "documents")
        .select($"doc_id", explode_outer(words).as("zword"))
        .orderBy($"doc_id", $"zword".asc_nulls_first)
    }),

    // Correlate + aggregate: per-document word-frequency top word.
    "q_lateral_agg" -> ((s, dir) => {
      import s.implicits._
      val exploded = t(s, dir, "documents")
        .select($"doc_id", explode(split($"text", " ")).as("word"))
        .groupBy($"doc_id", $"word")
        .agg(count(lit(1)).as("freq"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"freq".desc, $"word")
      exploded
        .select($"doc_id", $"word", $"freq", row_number().over(w).as("rn"))
        .filter($"rn" === 1)
        .select($"doc_id", $"word".as("top_word"), $"freq")
        .orderBy($"doc_id")
    }),

    // REPLICATE_ROWS: each row duplicated n times (n = p_size capped at 3)
    // via explode(sequence(...)) — the reference's $REPLICATE_ROWS$1
    // internal (used by its EXCEPT ALL/INTERSECT ALL rewrites).
    "q_replicate_rows" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .filter($"p_partkey" <= 50)
        .select($"p_partkey", least($"p_size", lit(3)).as("n"))
        .select($"p_partkey", explode(sequence(lit(1), $"n")).as("copy_id"))
        .select($"p_partkey", $"copy_id".cast(LongType).as("copy_id"))
        .orderBy($"p_partkey", $"copy_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_unnest" ->
      """SELECT word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word HAVING COUNT(*) > 5 ORDER BY word""".stripMargin,

    "q_unnest_ordinal" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS ord, w[i] AS word
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 10),
        |     UNNEST(generate_series(1, len(w))) AS u(i)
        |WHERE i <= 5 ORDER BY doc_id, ord""".stripMargin,

    "q_lateral_outer" ->
      """SELECT doc_id, CASE WHEN len(zw) = 0 THEN NULL ELSE unnest(zw) END AS zword
        |FROM (SELECT doc_id,
        |        CASE WHEN len(list_filter(string_split(text, ' '), w -> w LIKE 'z%')) = 0
        |             THEN [NULL]
        |             ELSE list_filter(string_split(text, ' '), w -> w LIKE 'z%') END AS zw
        |      FROM documents)
        |ORDER BY doc_id, zword NULLS FIRST""".stripMargin,

    "q_lateral_agg" ->
      """WITH wf AS (
        |  SELECT doc_id, word, COUNT(*) AS freq
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY doc_id, word)
        |SELECT doc_id, word AS top_word, freq FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY freq DESC, word) AS rn
        |  FROM wf)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q_replicate_rows" ->
      """SELECT p_partkey, CAST(copy_id AS BIGINT) AS copy_id
        |FROM (SELECT p_partkey, least(p_size, 3) AS n FROM part WHERE p_partkey <= 50),
        |     UNNEST(generate_series(1, n)) AS u(copy_id)
        |ORDER BY p_partkey, copy_id""".stripMargin
  )
}
