package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThan, IsNotNull}

import graft.SparkSuite

/** DSv2 contract: filter pushdown reaches the custom scan (and is removed
  * from the post-scan), column pruning reaches the reader, multi-split
  * reads work, and the two-phase BatchWrite commits atomically — a failed
  * task leaves no partial output.
  */
class GraftMemSourceSpec extends SparkSuite {
  import spark.implicits._

  private def seed(table: String, rows: Vector[(Long, String, Long)]): Unit =
    MemTables.tables.put(table, rows)

  private def read(table: String) =
    spark.read.format("graftmem").option("table", table).load()

  test("filter and column pushdown reach the custom scan") {
    MemTables.reset()
    seed("t_read", (1L to 10L).map(i => (i, s"n$i", i * 100L)).toVector)
    val df = read("t_read").filter($"id" > 5).select($"name")
    val out = df.as[String].collect().toSet
    assert(out == (6L to 10L).map(i => s"n$i").toSet)
    // the scan itself received the filter and the pruned column set
    assert(MemTables.lastPushedFilters.contains(GreaterThan("id", 5L)))
    assert(MemTables.lastReadSchema.fieldNames.toSeq == Seq("name"))
    // and the plan shows it pushed at the scan node
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,5"))
  }

  test("unsupported filters stay as residuals above the scan") {
    MemTables.reset()
    seed("t_resid", Vector((1L, "abc", 10L), (2L, "xyz", 20L)))
    val df = read("t_resid").filter($"name".startsWith("a")) // not pushable
    assert(df.select($"id").as[Long].collect().toSeq == Seq(1L))
    assert(!MemTables.lastPushedFilters.exists {
      case IsNotNull(_) => false
      case _ => true
    })
  }

  test("batch write publishes atomically on commit") {
    MemTables.reset()
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "v")
      .repartition(2)
      .write.format("graftmem").option("table", "t_w").mode("append").save()
    assert(MemTables.tables.get("t_w").toSet ==
      Set((1L, "a", 10L), (2L, "b", 20L)))
    assert(MemTables.commits == 1 && MemTables.aborts == 0)
    // second append accumulates (merge, not replace)
    Seq((3L, "c", 30L)).toDF("id", "name", "v")
      .write.format("graftmem").option("table", "t_w").mode("append").save()
    assert(MemTables.tables.get("t_w").size == 3)
  }

  test("failed task aborts the write with no partial output") {
    MemTables.reset()
    seed("t_fail", Vector((99L, "pre", 0L)))
    val err = intercept[Exception] {
      Seq((1L, "ok", 1L), (2L, "POISON", 2L), (3L, "ok2", 3L))
        .toDF("id", "name", "v")
        .write.format("graftmem").option("table", "t_fail").mode("append").save()
    }
    assert(err.getMessage != null)
    // two-phase: nothing was published, pre-existing rows untouched
    assert(MemTables.tables.get("t_fail") == Vector((99L, "pre", 0L)))
    assert(MemTables.commits == 0 && MemTables.aborts == 1)
  }

  test("pushed IS NOT NULL is honored by the reader (no null-name rows leak)") {
    MemTables.reset()
    seed("t_nn", Vector((1L, "a", 10L), (2L, null, 20L), (3L, "c", 30L),
      (4L, null, 40L)))
    val df = read("t_nn").filter($"name".isNotNull)
    // Spark removes fully-pushed filters from the post-scan, so the scan
    // itself must drop the null-name rows — the round-5 bug returned all 4
    assert(df.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(MemTables.lastPushedFilters.contains(IsNotNull("name")))
    // and nothing re-filters above the scan: pushed means pushed
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IsNotNull(name)"))
  }

  test("multi-split scan covers all rows") {
    MemTables.reset()
    seed("t_split", (1L to 7L).map(i => (i, null: String, i)).toVector)
    val df = read("t_split")
    assert(df.rdd.getNumPartitions == 2) // two enumerated splits
    assert(df.agg(sum($"v")).as[Long].head() == 28L)
  }
}
