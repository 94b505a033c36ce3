package graft.queries

import scala.util.Random

/** Seeded random-query generator for differential testing against the
  * DuckDB oracle — a property-based layer the reference does not have
  * (SURVEY §5 records the absence of any property-based testing in the
  * Flink tree; this puts the engine AHEAD of the reference's own
  * coverage). Every query is a deterministic function of its seed, so
  * any mismatch is replayable from the seed alone.
  *
  * The grammar walks the TPC-H-ish star schema (joins along real FK
  * edges, inner and null-generating LEFT OUTER), and composes the §2.9
  * scalar surface (arithmetic, CASE, COALESCE/NULLIF, substr/length/
  * upper, date EXTRACT), aggregation (COUNT/COUNT DISTINCT/MIN/MAX +
  * exact-decimal SUM), GROUP BY/HAVING, set operations (UNION/INTERSECT/
  * EXCEPT, ALL and DISTINCT), window functions over unique sort keys,
  * and IN/EXISTS/scalar subqueries (correlated and uncorrelated).
  *
  * Cross-engine determinism is baked into the grammar, using the same
  * conventions the hand-written corpus settled on (SqlQueries scaladoc):
  * every SUM is over an exact DECIMAL or integer CASE (cast to BIGINT —
  * DuckDB's HUGEINT reaches the comparator as float otherwise), doubles
  * only appear as single IEEE ops or casts of exact values, EXTRACT is
  * cast to BIGINT, string concat uses `||` (both engines null-propagate;
  * DuckDB's concat() skips nulls), division only over NULLIF-guarded
  * doubles, and window ORDER BY keys are unique per partition. No
  * ORDER BY/LIMIT is emitted — the comparator sorts rows — so results
  * are compared as sets of fully-deterministic rows.
  */
object FuzzGen {

  private case class Col(name: String, kind: String) // int | dec | str | ts
  private case class Tab(name: String, cols: Seq[Col], pk: Seq[String])

  private val lineitem = Tab("lineitem", Seq(
    Col("l_orderkey", "int"), Col("l_partkey", "int"),
    Col("l_suppkey", "int"), Col("l_linenumber", "int"),
    Col("l_quantity", "dec"), Col("l_extendedprice", "dec"),
    Col("l_discount", "dec"), Col("l_tax", "dec"),
    Col("l_returnflag", "str"), Col("l_linestatus", "str"),
    Col("l_shipdate", "ts")), Seq("l_orderkey", "l_linenumber"))
  private val orders = Tab("orders", Seq(
    Col("o_orderkey", "int"), Col("o_custkey", "int"),
    Col("o_orderstatus", "str"), Col("o_totalprice", "dec"),
    Col("o_orderdate", "ts"), Col("o_orderpriority", "str")),
    Seq("o_orderkey"))
  private val customer = Tab("customer", Seq(
    Col("c_custkey", "int"), Col("c_name", "str"),
    Col("c_nationkey", "int"), Col("c_acctbal", "dec"),
    Col("c_mktsegment", "str")), Seq("c_custkey"))
  private val supplier = Tab("supplier", Seq(
    Col("s_suppkey", "int"), Col("s_name", "str"),
    Col("s_nationkey", "int"), Col("s_acctbal", "dec")), Seq("s_suppkey"))
  private val part = Tab("part", Seq(
    Col("p_partkey", "int"), Col("p_name", "str"), Col("p_brand", "str"),
    Col("p_type", "str"), Col("p_size", "int"),
    Col("p_retailprice", "dec")), Seq("p_partkey"))
  private val nation = Tab("nation", Seq(
    Col("n_nationkey", "int"), Col("n_name", "str"),
    Col("n_regionkey", "int")), Seq("n_nationkey"))
  private val region = Tab("region", Seq(
    Col("r_regionkey", "int"), Col("r_name", "str")), Seq("r_regionkey"))

  private val tabs = Seq(lineitem, orders, customer, supplier, part,
    nation, region)

  /** FK edges: (from, fromCol, to, toCol). A join chain follows these. */
  private val edges = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  // value domains observed in the generated testdata (TESTDATA.md)
  private val strDomain: Map[String, Seq[String]] = Map(
    "l_returnflag" -> Seq("A", "N", "R"),
    "l_linestatus" -> Seq("O", "F"),
    "o_orderstatus" -> Seq("O", "F", "P"),
    "o_orderpriority" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM"),
    "c_mktsegment" -> Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "MACHINERY", "HOUSEHOLD"),
    "p_type" -> Seq("ECONOMY", "MEDIUM", "SMALL", "LARGE", "STANDARD",
      "PROMO"),
    "p_brand" -> Seq("Brand#1", "Brand#7", "Brand#13", "Brand#20"),
    "n_name" -> Seq("NATION_3", "NATION_7", "NATION_11", "NATION_16"),
    "r_name" -> Seq("AMERICA", "EUROPE", "ASIA", "AFRICA", "MIDDLE EAST"),
    "c_name" -> Seq("Customer#1"), "s_name" -> Seq("Supplier#1"),
    "p_name" -> Seq("Part#1"))
  private def intRange(c: String): (Long, Long) = c match {
    case "l_linenumber" => (1, 7)
    case "p_size" => (1, 50)
    case c if c.endsWith("nationkey") => (0, 24)
    case c if c.endsWith("regionkey") => (0, 4)
    case _ => (1, 1500) // key columns: selective but non-empty at sf0.001+
  }
  private def decRange(c: String): (Int, Int) = c match {
    case "l_quantity" => (1, 50)
    case "l_discount" | "l_tax" => (0, 0) // compare vs 0.05 etc below
    case "l_extendedprice" => (1000, 90000)
    case "o_totalprice" => (2000, 400000)
    case _ => (0, 9000) // acctbal, retailprice
  }
  private val years = Seq(1995, 1996, 1997, 1998, 1999, 2000)

  private def pick[T](r: Random, xs: Seq[T]): T = xs(r.nextInt(xs.length))

  /** One aliased table instance in the FROM clause. */
  private case class Inst(tab: Tab, alias: String, nullable: Boolean) {
    def cols(kind: String): Seq[String] =
      tab.cols.filter(_.kind == kind).map(c => s"$alias.${c.name}")
    def allCols: Seq[(String, String)] =
      tab.cols.map(c => (s"$alias.${c.name}", c.kind))
  }

  /** A generated FROM clause: instances + join SQL text. */
  private case class From(insts: Seq[Inst], sql: String)

  /** Random FK join chain of 1..4 tables; LEFT joins mark the right side
    * nullable (null-generating — the interesting differential surface).
    */
  private def genFrom(r: Random, maxTables: Int = 4): From = {
    val start = pick(r, Seq(lineitem, lineitem, orders, orders, customer,
      part, supplier, nation))
    var insts = Vector(Inst(start, "t0", nullable = false))
    var sql = s"${start.name} t0"
    val n = 1 + r.nextInt(maxTables)
    var tries = 0
    while (insts.length < n && tries < 8) {
      tries += 1
      val fromCandidates = for {
        inst <- insts
        e <- edges if e._1 == inst.tab.name &&
          !insts.exists(_.tab.name == e._3) // each table at most once
      } yield (inst, e)
      if (fromCandidates.nonEmpty) {
        val (src, (_, fc, toName, tc)) = pick(r, fromCandidates)
        val to = tabs.find(_.name == toName).get
        val alias = s"t${insts.length}"
        // 1/8 FULL OUTER (both sides null-generating), 1/3 LEFT
        val kind = r.nextInt(24)
        val kw = if (kind < 3) "FULL JOIN"
          else if (kind < 11) "LEFT JOIN" else "JOIN"
        sql += s"\n  $kw ${to.name} $alias ON ${src.alias}.$fc = $alias.$tc"
        if (kw == "FULL JOIN") insts = insts.map(i => i.copy(nullable = true))
        insts :+= Inst(to, alias,
          nullable = kw != "JOIN" || src.nullable)
      }
    }
    From(insts, sql)
  }

  // -------- scalar expressions --------

  /** Integer-valued expression over the instances (always BIGINT-safe). */
  private def intExpr(r: Random, from: From, depth: Int): String = {
    val cols = from.insts.flatMap(_.cols("int"))
    if (depth <= 0 || r.nextInt(3) == 0) pick(r, cols)
    else r.nextInt(5) match {
      case 0 => s"(${intExpr(r, from, depth - 1)} % ${2 + r.nextInt(9)})"
      case 1 => s"(${intExpr(r, from, depth - 1)} + ${intExpr(r, from, depth - 1)})"
      case 2 =>
        val ts = from.insts.flatMap(_.cols("ts"))
        if (ts.isEmpty) pick(r, cols)
        else s"CAST(EXTRACT(${pick(r, Seq("YEAR", "MONTH", "QUARTER"))} FROM ${pick(r, ts)}) AS BIGINT)"
      case 3 => s"LENGTH(${strExpr(r, from, 0)})"
      case 4 =>
        s"(CASE WHEN ${pred(r, from, 0)} THEN ${pick(r, cols)} ELSE ${-1 + r.nextInt(5)} END)"
    }
  }

  /** String-valued expression (`||` only — DuckDB concat() skips NULLs,
    * `||` null-propagates identically in both engines).
    */
  private def strExpr(r: Random, from: From, depth: Int): String = {
    val cols = from.insts.flatMap(_.cols("str"))
    if (depth <= 0 || r.nextInt(2) == 0) pick(r, cols)
    else r.nextInt(4) match {
      case 0 => s"UPPER(${strExpr(r, from, depth - 1)})"
      case 1 => s"SUBSTR(${strExpr(r, from, depth - 1)}, 1, ${1 + r.nextInt(4)})"
      case 2 => s"(${strExpr(r, from, depth - 1)} || '_' || ${strExpr(r, from, depth - 1)})"
      case 3 =>
        val c = pick(r, cols)
        val dom = strDomain.getOrElse(c.split('.').last, Seq("X"))
        s"NULLIF($c, '${pick(r, dom)}')"
    }
  }

  // -------- predicates --------

  private def pred(r: Random, from: From, depth: Int): String = {
    val leaf = r.nextInt(8) match {
      case 0 =>
        val c = pick(r, from.insts.flatMap(_.cols("int")))
        val (lo, hi) = intRange(c.split('.').last)
        val v = lo + (if (hi > lo) r.nextLong(hi - lo) else 0L)
        s"$c ${pick(r, Seq("<", "<=", ">", ">=", "=", "<>"))} $v"
      case 1 =>
        val c = pick(r, from.insts.flatMap(_.cols("str")))
        val dom = strDomain.getOrElse(c.split('.').last, Seq("X"))
        if (r.nextBoolean()) s"$c = '${pick(r, dom)}'"
        else s"$c IN (${r.shuffle(dom).take(1 + r.nextInt(2)).map(v => s"'$v'").mkString(", ")})"
      case 2 if from.insts.exists(_.cols("dec").nonEmpty) =>
        val c = pick(r, from.insts.flatMap(_.cols("dec")))
        val (lo, hi) = decRange(c.split('.').last)
        if (c.endsWith("discount") || c.endsWith("tax"))
          s"$c ${pick(r, Seq("<", ">="))} 0.0${1 + r.nextInt(8)}"
        else if (r.nextBoolean()) {
          val a = lo + r.nextInt(math.max(1, hi - lo))
          s"$c BETWEEN $a AND ${a + 1 + r.nextInt(math.max(1, hi - lo))}"
        } else s"$c ${pick(r, Seq("<", ">"))} ${lo + r.nextInt(math.max(1, hi - lo))}"
      case 3 =>
        val ts = from.insts.flatMap(_.cols("ts"))
        if (ts.isEmpty) s"1 = 1"
        else s"${pick(r, ts)} ${pick(r, Seq("<", ">="))} TIMESTAMP '${pick(r, years)}-0${1 + r.nextInt(9)}-15 00:00:00'"
      case 4 =>
        val nullable = from.insts.filter(_.nullable)
        if (nullable.isEmpty) s"(${intExpr(r, from, 1)} % 2) = 0"
        else s"${pick(r, pick(r, nullable).allCols.map(_._1))} IS ${if (r.nextBoolean()) "" else "NOT "}NULL"
      case 5 => s"(${intExpr(r, from, 1)} % ${2 + r.nextInt(5)}) = ${r.nextInt(2)}"
      case 6 =>
        // ts-vs-ts interval arithmetic (both engines: ts + INTERVAL n DAY)
        val ts = from.insts.flatMap(_.cols("ts"))
        if (ts.length < 2) s"(${intExpr(r, from, 1)} % 3) = 1"
        else s"${ts.head} ${pick(r, Seq("<", ">"))} ${ts(1)} + INTERVAL ${1 + r.nextInt(90)} DAY"
      case 7 =>
        // IN list carrying a NULL member: ANSI three-valued logic — a
        // non-match yields UNKNOWN, filtered identically by both engines
        val c = pick(r, from.insts.flatMap(_.cols("int")))
        s"$c IN (${1 + r.nextInt(500)}, ${1 + r.nextInt(500)}, NULL)"
      case _ => s"(${intExpr(r, from, 1)} % 2) = 0" // dec-less fallback
    }
    if (depth <= 0 || r.nextInt(2) == 0) leaf
    else {
      val op = pick(r, Seq("AND", "OR"))
      s"($leaf $op ${pred(r, from, depth - 1)})"
    }
  }

  // -------- aggregates (cross-engine-deterministic forms only) --------

  private def agg(r: Random, from: From, i: Int): (String, String) = {
    val name = s"agg_$i"
    val e = r.nextInt(6) match {
      case 0 => "COUNT(*)"
      case 1 => s"COUNT(DISTINCT ${intExpr(r, from, 1)})"
      case 2 if from.insts.exists(_.cols("dec").nonEmpty) =>
        val c = pick(r, from.insts.flatMap(_.cols("dec")))
        s"CAST(SUM(CAST($c AS DECIMAL(12,2))) AS DOUBLE)"
      case 3 =>
        val k = pick(r, Seq("MIN", "MAX"))
        s"$k(${intExpr(r, from, 1)})"
      case 4 => s"CAST(SUM(CASE WHEN ${pred(r, from, 0)} THEN 1 ELSE 0 END) AS BIGINT)"
      case 5 =>
        val k = pick(r, Seq("MIN", "MAX"))
        s"$k(${strExpr(r, from, 1)})"
      case _ => "COUNT(*)" // dec-less fallback
    }
    (s"$e AS $name", name)
  }

  // -------- query shapes --------

  /** Aggregating join: GROUP BY low-cardinality exprs + HAVING. */
  private def aggJoin(r: Random): String = {
    val from = genFrom(r)
    val nKeys = 1 + r.nextInt(2)
    val keys = (0 until nKeys).map { i =>
      val e = r.nextInt(3) match {
        case 0 =>
          val c = pick(r, from.insts.flatMap(_.cols("str")))
          if (r.nextBoolean()) c else s"SUBSTR($c, 1, ${1 + r.nextInt(3)})"
        case 1 => s"(${intExpr(r, from, 1)} % ${2 + r.nextInt(8)})"
        case 2 =>
          val ts = from.insts.flatMap(_.cols("ts"))
          if (ts.isEmpty) s"(${intExpr(r, from, 1)} % 5)"
          else s"CAST(EXTRACT(${pick(r, Seq("YEAR", "MONTH"))} FROM ${pick(r, ts)}) AS BIGINT)"
      }
      (s"$e AS k_$i", s"k_$i", e)
    }
    val aggs = (0 until (1 + r.nextInt(3))).map(i => agg(r, from, i))
    val where = if (r.nextInt(3) > 0) s"\nWHERE ${pred(r, from, 1)}" else ""
    // 1/4 of the time a multi-level grouping (ROLLUP / CUBE / explicit
    // GROUPING SETS) with GROUPING() markers in the output — the Expand
    // surface; otherwise a plain GROUP BY with an occasional HAVING
    val keyExprs = keys.map(_._3)
    val grouping = if (nKeys >= 1 && r.nextInt(4) == 0) {
      val kind = r.nextInt(3) match {
        case 0 => s"ROLLUP (${keyExprs.mkString(", ")})"
        case 1 => s"CUBE (${keyExprs.mkString(", ")})"
        case 2 =>
          val sets = (keyExprs.map(e => s"($e)") :+ "()").mkString(", ")
          s"GROUPING SETS ($sets)"
      }
      Some(kind)
    } else None
    val gCols = grouping.toSeq.flatMap(_ => keyExprs.zipWithIndex.map {
      case (e, i) => s"CAST(GROUPING($e) AS BIGINT) AS g_$i"
    })
    // Grouping-sets queries carry HAVING COUNT(*) > 0: over an EMPTY
    // input ANSI (and DuckDB) emit one grand-total row for the () set
    // with COUNT(*)=0, while Spark's Expand-based grouping sets emit no
    // rows (found by seeds 204/349/380; pinned in FuzzSpec). The guard
    // removes exactly that row on the ANSI side and nothing else — every
    // group over a non-empty input has COUNT(*) >= 1.
    val having =
      if (grouping.isDefined) "\nHAVING COUNT(*) > 0"
      else if (r.nextInt(3) == 0)
        if (r.nextBoolean()) s"\nHAVING COUNT(*) > ${r.nextInt(4)}"
        else s"\nHAVING MIN(${intExpr(r, from, 1)}) >= ${r.nextInt(3)}"
      else ""
    s"""SELECT ${(keys.map(_._1) ++ gCols ++ aggs.map(_._1)).mkString(",\n  ")}
       |FROM ${from.sql}$where
       |GROUP BY ${grouping.getOrElse(keyExprs.mkString(", "))}$having""".stripMargin
  }

  /** SELECT DISTINCT over derived expressions (dedup semantics incl.
    * NULL equality in DISTINCT — identical ANSI rules both engines).
    */
  private def distinctSelect(r: Random): String = {
    val from = genFrom(r, maxTables = 3)
    val es = Seq(
      s"(${intExpr(r, from, 1)} % ${5 + r.nextInt(20)}) AS d_0",
      s"SUBSTR(${strExpr(r, from, 1)}, 1, ${1 + r.nextInt(3)}) AS d_1")
    s"""SELECT DISTINCT ${es.mkString(",\n  ")}
       |FROM ${from.sql}
       |WHERE ${pred(r, from, 1)}""".stripMargin
  }

  /** Derived-table join: a grouped subquery in FROM joined to a dim —
    * aggregate-below-join placement both optimizers must agree on.
    */
  private def derivedJoin(r: Random): String = {
    val inner = pick(r, Seq(
      ("lineitem", "l_suppkey", "supplier", "s_suppkey", "s_name",
        "l_quantity"),
      ("orders", "o_custkey", "customer", "c_custkey", "c_name",
        "o_totalprice")))
    val (fact, fk, dim, dk, dname, measure) = inner
    val t = tabs.find(_.name == fact).get
    s"""SELECT d.$dname AS name, agg.n AS n,
       |  agg.total AS total
       |FROM (SELECT $fk AS k, COUNT(*) AS n,
       |        CAST(SUM(CAST($measure AS DECIMAL(12,2))) AS DOUBLE) AS total
       |      FROM $fact
       |      WHERE ${predSingle(r, t)}
       |      GROUP BY $fk) agg
       |  ${if (r.nextBoolean()) "JOIN" else "LEFT JOIN"} $dim d ON agg.k = d.$dk""".stripMargin
  }

  /** Row-level select: PK columns + derived expressions, row-identified. */
  private def plainSelect(r: Random): String = {
    val from = genFrom(r, maxTables = 3)
    val pks = from.insts.filterNot(_.nullable)
      .flatMap(i => i.tab.pk.map(k => s"${i.alias}.$k"))
    val exprs = (0 until (1 + r.nextInt(3))).map { i =>
      val e = r.nextInt(4) match {
        case 0 => intExpr(r, from, 2)
        case 1 => strExpr(r, from, 2)
        case 2 => s"COALESCE(${intExpr(r, from, 1)}, -1)"
        case 3 if from.insts.exists(_.cols("dec").nonEmpty) =>
          // DOUBLE, not DECIMAL, in the output: the python comparators
          // read DuckDB decimals as float64 — the corpus-wide convention
          val c = pick(r, from.insts.flatMap(_.cols("dec")))
          s"CAST(CAST($c AS DECIMAL(12,2)) AS DOUBLE)"
        case _ => intExpr(r, from, 1)
      }
      s"$e AS e_$i"
    }
    s"""SELECT ${(pks.map(c => s"$c AS pk_${c.replace('.', '_')}") ++ exprs).mkString(",\n  ")}
       |FROM ${from.sql}
       |WHERE ${pred(r, from, 2)}""".stripMargin
  }

  /** Set operation over two same-schema branches. */
  private def setop(r: Random): String = {
    def branch(): String = {
      val from = genFrom(r, maxTables = 2)
      val key = intExpr(r, from, 1)
      val s = strExpr(r, from, 1)
      s"""SELECT ($key % 100) AS k, SUBSTR($s, 1, 2) AS s
         |FROM ${from.sql}
         |WHERE ${pred(r, from, 1)}""".stripMargin
    }
    val op = pick(r, Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT",
      "INTERSECT ALL", "EXCEPT ALL"))
    val two = s"${branch()}\n$op\n${branch()}"
    // 1/4: a third branch under a second operator (left-assoc in both
    // engines for same-precedence set ops; INTERSECT binds tighter in
    // both per ANSI)
    if (r.nextInt(4) == 0) {
      val op2 = pick(r, Seq("UNION", "UNION ALL", "EXCEPT"))
      s"$two\n$op2\n${branch()}"
    } else two
  }

  /** Window functions over a unique in-partition sort key. */
  private def window(r: Random): String = {
    val base = pick(r, Seq(lineitem, orders, customer, part))
    val pk = base.pk.mkString(", ")
    val partExpr = base.name match {
      case "lineitem" => pick(r, Seq("l_returnflag", "l_linestatus",
        "(l_suppkey % 5)"))
      case "orders" => pick(r, Seq("o_orderstatus", "o_orderpriority",
        "(o_custkey % 7)"))
      case "customer" => pick(r, Seq("c_mktsegment", "c_nationkey"))
      case _ => pick(r, Seq("p_brand", "p_type", "(p_size % 5)"))
    }
    val fn = r.nextInt(8) match {
      case 0 => s"CAST(ROW_NUMBER() OVER w AS BIGINT)"
      case 1 => s"CAST(RANK() OVER w AS BIGINT)"
      case 2 => s"CAST(DENSE_RANK() OVER w AS BIGINT)"
      case 3 => s"LAG(${base.pk.head}, 1) OVER w"
      case 4 => s"CAST(COUNT(*) OVER (PARTITION BY $partExpr) AS BIGINT)"
      case 5 =>
        // exact integer running sum over an explicit ROWS frame
        s"CAST(SUM(${base.pk.head}) OVER (PARTITION BY $partExpr ORDER BY $pk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
      case 6 => s"CAST(NTILE(${2 + r.nextInt(4)}) OVER w AS BIGINT)"
      case 7 => s"LEAD(${base.pk.head}, ${1 + r.nextInt(2)}, -1) OVER w"
    }
    s"""SELECT $pk, $partExpr AS part_key, $fn AS w_val
       |FROM ${base.name}
       |WHERE ${predSingle(r, base)}
       |WINDOW w AS (PARTITION BY $partExpr ORDER BY $pk)""".stripMargin
  }

  /** Single-table predicate (for shapes that alias the table by name). */
  private def predSingle(r: Random, t: Tab): String = {
    val from = From(Seq(Inst(t, t.name, nullable = false)), t.name)
    pred(r, from, 1)
  }

  /** IN / EXISTS / scalar-subquery filters over the fact tables. */
  private def subquery(r: Random): String = {
    r.nextInt(3) match {
      case 0 => // [NOT] IN over an uncorrelated grouped/filtered subquery
        val not = if (r.nextBoolean()) "NOT " else ""
        val inner = r.nextInt(2) match {
          case 0 =>
            s"SELECT o_orderkey FROM orders WHERE ${predSingle(r, orders)}"
          case 1 =>
            s"SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > ${1 + r.nextInt(4)}"
        }
        s"""SELECT l_returnflag AS flag, COUNT(*) AS n,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
           |FROM lineitem
           |WHERE l_orderkey ${not}IN ($inner)
           |  AND ${predSingle(r, lineitem)}
           |GROUP BY l_returnflag""".stripMargin
      case 1 => // correlated [NOT] EXISTS
        val not = if (r.nextBoolean()) "NOT " else ""
        s"""SELECT c_mktsegment AS seg, COUNT(*) AS n,
           |  MIN(c_custkey) AS min_key
           |FROM customer
           |WHERE ${not}EXISTS (SELECT 1 FROM orders
           |    WHERE o_custkey = c_custkey AND ${predSingle(r, orders)})
           |GROUP BY c_mktsegment""".stripMargin
      case 2 => // scalar MIN/MAX subquery comparison (exact decimals —
        // never a divided average: decimal-division scale rules differ
        // between the engines)
        val cmp = pick(r, Seq("<", ">"))
        val k = pick(r, Seq("MIN", "MAX"))
        s"""SELECT o_orderstatus AS st, COUNT(*) AS n
           |FROM orders
           |WHERE CAST(o_totalprice AS DECIMAL(12,2)) $cmp
           |  (SELECT $k(CAST(o_totalprice AS DECIMAL(12,2)))
           |   FROM orders WHERE ${predSingle(r, orders)})
           |GROUP BY o_orderstatus""".stripMargin
    }
  }

  /** The generated query for a seed — a pure function of the seed. */
  def sql(seed: Long): String = {
    val r = new Random(seed)
    val q = r.nextInt(13) match {
      case 0 | 1 | 2 => aggJoin(r)
      case 3 | 4 => plainSelect(r)
      case 5 => setop(r)
      case 6 | 7 => window(r)
      case 8 | 9 => subquery(r)
      case 10 => distinctSelect(r)
      case 11 | 12 => derivedJoin(r)
    }
    q
  }
}
