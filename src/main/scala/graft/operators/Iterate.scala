package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch iterations — the reference's DataSet bulk iteration
  * (`DataSet.iterate`, flink-java/.../DataSet.java:1189, run by
  * `BulkIterationBase`) and delta iteration (`DataSet.iterateDelta`,
  * DataSet.java:1242, `DeltaIterationBase` with solution set + workset).
  * Spark has no native cyclic dataflow (SURVEY §2.10 listed this as a
  * non-goal for STREAMING; the batch form is a driver-side loop over
  * declarative rounds — exactly how Spark's own GraphX/MLlib iterate):
  *
  *   - each round is one Catalyst-optimized job over the previous
  *     round's materialized result — Tungsten plans the per-round work,
  *     the loop only sequences rounds;
  *   - every round cuts lineage with an eager `localCheckpoint` (a step
  *     typically references its input several times — without the cut
  *     the logical plan grows exponentially and OOMs the driver; the
  *     [[graft.operators.DedupOps.dupClusters]] lesson). On a real
  *     cluster the same call materializes to executor block storage
  *     (MEMORY_AND_DISK), so each round's shuffle reads a compact
  *     cached input rather than recomputing the chain;
  *   - superseded rounds release their checkpoint blocks explicitly —
  *     live storage is bounded by two round images, not O(rounds);
  *   - termination is a driver-side boolean over round output (the
  *     reference's convergence-criterion aggregator): bulk mode runs a
  *     caller predicate or a fixed round count; delta mode stops when
  *     the WORKSET drains — the defining property of
  *     `DeltaIterationBase`, which touches only changing elements.
  *
  * 100 TB: per-round cost is the step's own plan (one keyed shuffle for
  * the canonical join-with-solution step); rounds multiply it, so the
  * algorithm choice (log-round star contraction, delta worksets that
  * shrink geometrically) matters more than the loop plumbing. The
  * emptiness/convergence probes are single lightweight jobs on
  * checkpointed leaves, not `collect()`s of the data.
  */
object Iterate {

  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Bulk iteration: apply `step` to the full dataset `rounds` times, or
    * until `done(previous, next)` (checked AFTER each round) returns
    * true. The returned frame is the last round's checkpoint (caller
    * drops it when done with the result).
    */
  def iterate(initial: DataFrame, rounds: Int,
      done: (DataFrame, DataFrame) => Boolean = (_, _) => false)
      (step: DataFrame => DataFrame): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    var cur = initial.localCheckpoint(true)
    var r = 0
    var stop = rounds == 0
    while (!stop) {
      val next = step(cur).localCheckpoint(true)
      r += 1
      stop = r >= rounds || done(cur, next)
      releaseCheckpoint(cur)
      cur = next
    }
    cur
  }

  /** Delta iteration: `solution` is keyed by `keys`; each round maps
    * (solution, workset) to (delta, nextWorkset). Delta rows MERGE into
    * the solution keyed (same-key rows are replaced — the reference's
    * solution-set update), and the loop ends when the workset is empty
    * or `maxRounds` is hit (then it throws loudly — a silent partial
    * fixpoint would look like a converged answer).
    *
    * The solution merge is one anti-join + union per round, shuffling on
    * `keys` both sides; at scale, pre-partitioning solution and delta on
    * the same keys keeps it co-located round over round.
    */
  def iterateDelta(solution: DataFrame, workset: DataFrame,
      keys: Seq[String], maxRounds: Int)
      (step: (DataFrame, DataFrame) => (DataFrame, DataFrame)): DataFrame = {
    require(keys.nonEmpty, "delta iteration needs solution keys")
    var sol = solution.localCheckpoint(true)
    var ws = workset.localCheckpoint(true)
    var r = 0
    while (!ws.isEmpty && r < maxRounds) {
      val (delta, nextWs) = step(sol, ws)
      val d = delta.localCheckpoint(true)
      val nextSol = sol.join(d.select(keys.map(col): _*), keys, "left_anti")
        .unionByName(d)
        .localCheckpoint(true)
      // delta-equals-workset is the common shape (improvements ARE the
      // next frontier) — don't pay a second materialization for it
      val nw = if (nextWs eq delta) d else nextWs.localCheckpoint(true)
      releaseCheckpoint(sol); releaseCheckpoint(ws)
      if (!(nw eq d)) releaseCheckpoint(d)
      sol = nextSol
      ws = nw
      r += 1
    }
    if (!ws.isEmpty)
      throw new IllegalStateException(
        s"iterateDelta did not drain its workset in $maxRounds rounds")
    sol
  }

  /** Single-source shortest paths over a weighted edge list — the
    * reference's canonical delta-iteration example (Flink DataSet docs'
    * `iterateDelta` walk-through). Solution: (id, dist); workset: nodes
    * whose distance improved last round. Each round relaxes only edges
    * OUT OF the workset (the delta property: settled regions are never
    * re-scanned), keeps candidates that beat the current solution, and
    * those improvements become the next workset. Terminates on any graph
    * with non-negative weights.
    */
  def shortestPaths(edges: DataFrame, sourceId: Long,
      src: String = "src", dst: String = "dst", weight: String = "w",
      maxRounds: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val init = Seq((sourceId, 0L)).toDF("id", "dist")
    // the edge set is loop-invariant: materialize it ONCE — without
    // this every round re-scans and re-plans the edge source (and
    // rebuilds its broadcast), which dominates round latency
    val e = edges.localCheckpoint(true)
    val out = iterateDelta(init, init, Seq("id"), maxRounds) { (sol, ws) =>
      // relax edges leaving nodes that just improved
      val cand = ws.join(e, ws("id") === e(src))
        .select(col(dst).as("id"),
          (ws("dist") + col(weight)).as("cand"))
        .groupBy("id").agg(min("cand").as("cand"))
      val improved = cand.join(sol, Seq("id"), "left")
        .filter(col("dist").isNull || col("cand") < col("dist"))
        .select(col("id"), col("cand").as("dist"))
      (improved, improved)
    }
    releaseCheckpoint(e)
    out
  }

  /** Bounded min-label spread — a bulk-iteration shape: every node
    * adopts the min label among itself and its in-neighbors, repeated a
    * FIXED number of rounds (the reference's iterate(n) with no
    * termination criterion). After k rounds a node's label is the min
    * node id within ≤ k hops upstream — exactly recursive-CTE
    * expressible, which is what the oracle pins.
    */
  def minLabelSpread(nodes: DataFrame, edges: DataFrame, roundsN: Int,
      id: String = "id", src: String = "src", dst: String = "dst"): DataFrame = {
    val e = edges.localCheckpoint(true) // loop-invariant, materialize once
    val out = iterate(nodes.select(col(id), col(id).as("label")), roundsN) { cur =>
      val fromNbrs = cur.join(e, cur(id) === e(src))
        .select(col(dst).as(id), col("label"))
      cur.select(col(id), col("label")).unionByName(fromNbrs)
        .groupBy(id).agg(min("label").as("label"))
    }
    releaseCheckpoint(e)
    out
  }
}
