package graft

import scala.concurrent.{ExecutionContext, Future}

import org.apache.spark.sql.functions._

import graft.operators.{AsyncOps, LookupJoin}

/** Table aggregates (UDTAF, §2.4 GroupTableAggFunction: an aggregate that
  * emits 0..N rows per group), async lookup join composition
  * (AsyncLookupJoinRunner parity), and the SQL DDL surface (§1.4: CREATE
  * TABLE / INSERT / SELECT through spark_catalog).
  */
class TableAggAndDdlSpec extends SparkSuite {
  import spark.implicits._

  test("table aggregate emits top-2 rows per group (flatMapGroups)") {
    val ds = Seq(("a", 5L), ("a", 9L), ("a", 1L), ("b", 3L)).toDS()
    // the reference's canonical UDTAF example: emit the top-2 values
    val out = ds.groupByKey(_._1).flatMapGroups { (k, it) =>
      it.map(_._2).toSeq.sorted(Ordering[Long].reverse).take(2)
        .zipWithIndex.map { case (v, i) => (k, i + 1, v) }.iterator
    }.collect().toSet
    assert(out == Set(("a", 1, 9L), ("a", 2, 5L), ("b", 1, 3L)))
  }

  test("async lookup join: async function + per-partition cache compose") {
    val fn = new AsyncDimLookup
    val ds = spark.range(0, 40).map(i => i % 4).repartition(2)
    val out = AsyncOps.orderedAsync[Long, (Long, String)](ds, fn, capacity = 4)
      .collect().toSeq
    assert(out.size == 40)
    assert(out.forall { case (k, v) => v == s"dim_$k" })
  }

  test("SQL DDL: CREATE TABLE / INSERT / SELECT / DROP via spark_catalog") {
    spark.sql("DROP TABLE IF EXISTS ddl_demo")
    spark.sql("CREATE TABLE ddl_demo (id BIGINT, tag STRING) USING parquet")
    spark.sql("INSERT INTO ddl_demo VALUES (1, 'x'), (2, 'y')")
    spark.sql("INSERT INTO ddl_demo SELECT id + 10, 'z' FROM ddl_demo")
    val rows = spark.sql("SELECT id, tag FROM ddl_demo ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "x"), (2L, "y"), (11L, "z"), (12L, "z")))
    spark.sql("DROP TABLE ddl_demo")
    assert(!spark.catalog.tableExists("ddl_demo"))
  }
}

class AsyncDimLookup extends AsyncOps.AsyncFunction[Long, (Long, String)] {
  override def invoke(in: Long)(implicit ec: ExecutionContext): Future[(Long, String)] =
    Future {
      Thread.sleep(2) // simulated I/O latency
      (in, s"dim_$in")
    }
}
