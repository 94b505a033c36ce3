package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Batch iteration loop semantics (DataSet.iterate / iterateDelta):
  * exact round counts, convergence early-exit, keyed solution-set merge,
  * workset-driven termination, and the loud non-convergence error.
  */
class IterateSpec extends SparkSuite {
  import spark.implicits._

  test("bulk iterate runs exactly n rounds") {
    val out = Iterate.iterate(Seq(1L).toDF("x"), 4) { df =>
      df.select((col("x") * 2).as("x"))
    }
    assert(out.as[Long].collect().toSeq == Seq(16L))
  }

  test("bulk iterate stops early on the done predicate") {
    var steps = 0
    val out = Iterate.iterate(Seq(1L).toDF("x"), 100,
      done = (_, next) => next.agg(max("x")).as[Long].head() >= 8L) { df =>
      steps += 1
      df.select((col("x") * 2).as("x"))
    }
    assert(out.as[Long].collect().toSeq == Seq(8L) && steps == 3)
  }

  test("iterateDelta merges delta rows keyed and stops on empty workset") {
    // decrement each key's value toward zero; improved rows re-enter the
    // workset, settled keys are never touched again
    val init = Seq(("a", 3L), ("b", 1L), ("c", 0L)).toDF("k", "v")
    var touched = List.empty[Long]
    val out = Iterate.iterateDelta(init, init.filter(col("v") > 0),
      Seq("k"), maxRounds = 10) { (_, ws) =>
      touched :+= ws.count()
      val delta = ws.select(col("k"), (col("v") - 1).as("v"))
      (delta, delta.filter(col("v") > 0))
    }
    assert(out.as[(String, Long)].collect().toMap ==
      Map("a" -> 0L, "b" -> 0L, "c" -> 0L))
    // round worksets shrink: (a,b) then a twice — settled keys excluded
    assert(touched == List(2L, 1L, 1L))
  }

  test("iterateDelta throws loudly when the workset never drains") {
    val init = Seq(("a", 1L)).toDF("k", "v")
    val e = intercept[IllegalStateException] {
      Iterate.iterateDelta(init, init, Seq("k"), maxRounds = 3) { (_, ws) =>
        (ws, ws) // never drains
      }
    }
    assert(e.getMessage.contains("did not drain"))
  }

  test("shortestPaths relaxes multi-path graphs to the true distances") {
    // 0 -1-> 1 -1-> 2 -1-> 3 ; 0 -10-> 3 ; 2 -1-> 4 (skip edge beats direct)
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (0L, 3L, 10L),
      (2L, 4L, 1L)).toDF("src", "dst", "w")
    val d = Iterate.shortestPaths(edges, 0L).as[(Long, Long)].collect().toMap
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L))
  }

  test("minLabelSpread: after k rounds the label is the k-hop upstream min") {
    // chain 10 -> 11 -> 12 -> 13; with 2 rounds node 13 sees 11, not 10
    val nodes = Seq(10L, 11L, 12L, 13L).toDF("id")
    val edges = Seq((10L, 11L), (11L, 12L), (12L, 13L)).toDF("src", "dst")
    val l2 = Iterate.minLabelSpread(nodes, edges, 2)
      .as[(Long, Long)].collect().toMap
    assert(l2 == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 11L))
    val l3 = Iterate.minLabelSpread(nodes, edges, 3)
      .as[(Long, Long)].collect().toMap
    assert(l3(13L) == 10L)
  }
}
