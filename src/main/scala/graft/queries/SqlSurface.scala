package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Modern SQL surface — the Spark 4 SQL-language features a reference user
  * would reach for from the SQL side of the API, each with a DuckDB oracle
  * twin (QUERIES.md "sql/set surface" rows).
  *
  * These are deliberately *language*-level coverage: every one of them
  * plans to the same relational operators the DataFrame twins elsewhere in
  * this repo pin (hash aggregate, broadcast join, TakeOrdered), so the
  * scale story is inherited — the point here is that the declarative
  * surface itself round-trips through Catalyst unchanged (parameter
  * binding happens at parse time, SQL UDFs inline into the plan, pipe
  * stages fold into one logical plan — none of them adds a barrier, a
  * driver loop, or an un-pushable black box).
  */
object SqlSurface {
  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SQL pipe syntax (Spark 4, SPARK-49555): the linear `|>` form of the
    // classic filter→aggregate→order query. Each stage is sugar — the
    // parser folds the chain into the very same logical plan as the
    // nested form, so pushdown/pruning/partial-agg all apply untouched;
    // there is no per-stage materialization. Coverage matters because a
    // pipe-first user must get bit-identical results to the ANSI twin
    // (which is exactly what the DuckDB oracle asserts).
    "sql_pipe_syntax" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("graft_pipe_li")
      s.sql(
        """FROM graft_pipe_li
          ||> WHERE l_shipdate >= DATE '1995-01-01'
          ||> SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice
          ||> AGGREGATE count(*) AS n_rows,
          |             round(sum(l_quantity), 2) AS sum_qty,
          |             round(avg(l_extendedprice), 2) AS avg_price
          |   GROUP BY l_returnflag, l_linestatus
          ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
    }),

    // DISTRIBUTE BY / SORT BY — the SQL surface for Hive-style physical
    // layout control: DISTRIBUTE BY hashes rows to partitions on the
    // key, SORT BY orders WITHIN each partition (not globally). The
    // combination plans a RepartitionByExpression + partition-local
    // sort and must be value-transparent — the outer aggregate sees the
    // same rows whatever the distribution (the oracle asserts exactly
    // that; the spec pins the repartition node in the plan). This is
    // the pre-bucketing trick for a downstream writer that wants
    // co-located, locally-ordered partitions without a global sort.
    "sql_distribute_cluster_by" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("graft_dist_li")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |       count(*) AS n_rows,
          |       round(sum(l_quantity), 2) AS sum_qty
          |FROM (
          |  SELECT l_returnflag, l_linestatus, l_quantity
          |  FROM graft_dist_li
          |  DISTRIBUTE BY l_returnflag SORT BY l_linestatus
          |)
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    }),

    // Named WINDOW clause — one window definition shared by a rank and
    // a running sum (the deduplication every hand-written analytics SQL
    // wants; the parser substitutes the definition, so the plan is the
    // identical single Window node a repeated-OVER spelling gets).
    // o_orderkey in the ORDER BY makes the ordering total, so the
    // default RANGE frame equals ROWS and the running sum is
    // deterministic on both engines.
    "sql_named_window" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("graft_nw_orders")
      s.sql(
        """SELECT * FROM (
          |  SELECT o_custkey, o_orderkey,
          |         rank() OVER w AS rk,
          |         round(sum(o_totalprice) OVER w, 2) AS run_total
          |  FROM graft_nw_orders
          |  WINDOW w AS (PARTITION BY o_custkey
          |               ORDER BY o_orderdate, o_orderkey)
          |) WHERE rk <= 3
          |ORDER BY o_custkey, rk""".stripMargin)
    }),

    // SQL-standard correlated LATERAL subquery (Spark 3.2+) — the
    // per-row dependent subquery form of join_lateral_topk's DataFrame
    // pipeline: each customer's two largest orders, written the way an
    // analyst ports it from Postgres. Catalyst decorrelates it into the
    // same rank-window + join shape — no per-row re-execution, no
    // CartesianProduct (the DataFrame twin's spec pins that class of
    // plan).
    "sql_lateral_subquery" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("graft_lat_cust")
      t(s, d, "orders").createOrReplaceTempView("graft_lat_orders")
      s.sql(
        """SELECT c_custkey, o.o_orderkey,
          |       round(o.o_totalprice, 2) AS o_totalprice
          |FROM graft_lat_cust,
          |LATERAL (SELECT o_orderkey, o_totalprice
          |         FROM graft_lat_orders
          |         WHERE o_custkey = c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey
          |         LIMIT 2) o
          |ORDER BY c_custkey, o.o_orderkey""".stripMargin)
    }),

    // Table-valued functions in FROM position — range() generating a
    // relation from thin air and posexplode() flattening an array WITH
    // ordinality, joined back onto a real table. The generator runs as
    // a leaf Range/Generate node (splittable, no driver
    // materialization): range(N) parallelizes like a scan, which is
    // how synthetic dimensions (calendars, grids, epoch axes) are
    // built at scale instead of collecting a driver Seq. Values are
    // pure arithmetic → deterministic cross-engine.
    "sql_tvf_family" -> ((s, d) => {
      t(s, d, "nation").createOrReplaceTempView("graft_tvf_nation")
      s.sql(
        """SELECT n.n_regionkey,
          |       g.id AS grid_id,
          |       p.pos AS elem_pos,
          |       p.col AS elem_val,
          |       count(*) AS n_rows,
          |       CAST(sum(g.id * p.col) AS BIGINT) AS weighted
          |FROM range(0, 4) g
          |JOIN graft_tvf_nation n ON n.n_nationkey % 4 = g.id
          |LATERAL VIEW posexplode(array(10, 20, 30)) p AS pos, col
          |GROUP BY n.n_regionkey, g.id, p.pos, p.col
          |ORDER BY n_regionkey, grid_id, elem_pos""".stripMargin)
    }),

    // Named-parameter SQL (Spark 3.4+ `spark.sql(text, args)`): the
    // injection-safe prepared-statement shape. Binding happens in the
    // parser (a `NamedParameter` resolves to a literal before analysis),
    // so the optimizer sees a constant — the predicate pushes into the
    // parquet scan exactly as if it were written inline, which the
    // SqlSurfaceSpec plan assertion pins. At 100 TB this is the
    // difference between a pruned scan and none: parameters that bound
    // as opaque variables would defeat partition pruning; these don't.
    "sql_parameterized" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("graft_param_orders")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n_orders,
          |       round(sum(o_totalprice), 2) AS sum_price
          |FROM graft_param_orders
          |WHERE o_totalprice > :minprice AND o_orderstatus = :status
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin,
        Map("minprice" -> 150000.0, "status" -> "O"))
    }),

    // SQL session variables (Spark 4, SPARK-42849: DECLARE / SET
    // VARIABLE): the sanctioned "compute a scalar once, reuse it as a
    // constant" surface — here the filter cut is derived FROM a query
    // (half the max order value) and bound into the session, so the
    // main query's predicate is an ordinary foldable literal at
    // analysis time: it pushes into the parquet scan like any constant,
    // and the derivation subquery ran exactly once instead of once per
    // use. The cut derives from max() — an order-free exact fold times
    // an exact IEEE literal — so the row membership can't flip between
    // engines (the round(avg)-cut variant is exactly the banned
    // merge-order class).
    "sql_session_variables" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("graft_var_orders")
      s.sql("DECLARE OR REPLACE VARIABLE graft_cut DOUBLE")
      s.sql("""SET VARIABLE graft_cut =
              |  (SELECT max(o_totalprice) * 0.5 FROM graft_var_orders)"""
        .stripMargin)
      s.sql(
        """SELECT o_orderstatus, count(*) AS n_orders,
          |       round(sum(o_totalprice), 2) AS rev
          |FROM graft_var_orders
          |WHERE o_totalprice > graft_cut
          |GROUP BY o_orderstatus
          |ORDER BY o_orderstatus""".stripMargin)
    }),

    // EXECUTE IMMEDIATE (Spark 4, SPARK-44837): dynamic SQL with
    // positional parameter binding — the surface a metadata-driven
    // pipeline uses to run generated statements (per-table quality
    // checks, templated rollups) without string-splicing values into
    // SQL (the injection-unsafe alternative). The statement text rides
    // a session variable, the parameter binds at parse time, and the
    // resulting plan is indistinguishable from the static query — same
    // pushdown, same aggregate.
    "sql_execute_immediate" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("graft_exec_orders")
      s.sql("DECLARE OR REPLACE VARIABLE graft_stmt STRING")
      s.sql(
        """SET VARIABLE graft_stmt =
          |  'SELECT o_orderpriority, count(*) AS n_orders,
          |          round(sum(o_totalprice), 2) AS rev
          |   FROM graft_exec_orders WHERE o_orderstatus = ?
          |   GROUP BY o_orderpriority ORDER BY o_orderpriority'"""
          .stripMargin)
      s.sql("EXECUTE IMMEDIATE graft_stmt USING 'F'")
    }),

    // SQL-declared scalar UDF (Spark 4, SPARK-51278: CREATE FUNCTION ...
    // RETURN <expr>): the sanctioned way to share a business formula
    // across SQL users WITHOUT the codegen penalty of a JVM/Python UDF —
    // the body is parsed once and INLINED into the caller's plan as an
    // ordinary expression tree, so it stays inside whole-stage codegen
    // and remains pushable/foldable (the spec asserts no UDF node
    // survives in the optimized plan). Contrast with `udf_scalar`
    // (B40), which pins the opaque-JVM-function path.
    "udf_sql_declared" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("graft_sqludf_li")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_net_price(
              |  price DOUBLE, disc DOUBLE, tax DOUBLE)
              |RETURNS DOUBLE
              |RETURN price * (1.0 - disc) * (1.0 + tax)""".stripMargin)
      s.sql(
        """SELECT l_returnflag,
          |       round(sum(graft_net_price(l_extendedprice, l_discount,
          |                                 l_tax)), 2) AS net_revenue,
          |       count(*) AS n_rows
          |FROM graft_sqludf_li
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    }),

    // Position-independent union (unionByName + allowMissingColumns):
    // the schema-drift-tolerant append a multi-source ingest needs —
    // two extracts whose column ORDER differs and one of which lacks a
    // column entirely union by NAME (missing side null-filled), where
    // positional UNION ALL would silently misalign values. Pure map-side
    // (no shuffle added by the union itself); the only exchange is the
    // final rollup's.
    "set_union_by_name" -> ((s, d) => {
      val a = t(s, d, "customer")
        .select(col("c_custkey").as("custkey"),
          col("c_mktsegment").as("segment"),
          col("c_acctbal").as("acctbal"))
      // second extract: different column order, no acctbal
      val b = t(s, d, "customer")
        .filter(col("c_acctbal") < 0)
        .select(col("c_mktsegment").as("segment"),
          col("c_custkey").as("custkey"))
      a.unionByName(b, allowMissingColumns = true)
        .groupBy("segment")
        .agg(count(lit(1)).as("n_rows"),
          count(col("acctbal")).as("n_with_bal"),
          round(sum(col("acctbal")), 2).as("sum_bal"))
        .orderBy("segment")
    }),

    // The subquery family in one statement: an uncorrelated SCALAR
    // subquery (global average), a correlated EXISTS, a NOT EXISTS, and
    // an IN-subquery. Catalyst DECORRELATES all four — scalar becomes a
    // broadcast of one row, EXISTS/IN become left-semi joins, NOT
    // EXISTS a left-anti join — so none of them re-executes per outer
    // row (the spec pins zero per-row subquery nodes and the join-based
    // shapes). This is the surface analysts actually write; the engine
    // contract is that it plans to the same keyed joins the DataFrame
    // twins elsewhere pin.
    "sql_subquery_family" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("graft_sq_cust")
      t(s, d, "orders").createOrReplaceTempView("graft_sq_orders")
      t(s, d, "nation").createOrReplaceTempView("graft_sq_nation")
      s.sql(
        """SELECT c_mktsegment,
          |  count(*) AS n_cust,
          |  CAST(count_if(c_acctbal >
          |    (SELECT round(avg(c_acctbal)) FROM graft_sq_cust))
          |    AS BIGINT) AS n_above_avg,
          |  CAST(count_if(EXISTS (
          |    SELECT 1 FROM graft_sq_orders
          |    WHERE o_custkey = c_custkey
          |      AND o_orderpriority = '1-URGENT')) AS BIGINT)
          |    AS n_with_urgent,
          |  CAST(count_if(NOT EXISTS (
          |    SELECT 1 FROM graft_sq_orders
          |    WHERE o_custkey = c_custkey)) AS BIGINT) AS n_no_orders,
          |  CAST(count_if(c_nationkey IN (
          |    SELECT n_nationkey FROM graft_sq_nation
          |    WHERE n_name LIKE 'A%')) AS BIGINT) AS n_a_nations
          |FROM graft_sq_cust
          |GROUP BY c_mktsegment
          |ORDER BY c_mktsegment""".stripMargin)
    }),

    // GROUP BY ALL / ORDER BY ALL (Spark 3.4+): every non-aggregate
    // select item becomes a grouping key, every output column an order
    // key — the "don't repeat the column list" form analysts write.
    // Resolved entirely in the analyzer; the plan is the ordinary
    // partial→final hash aggregate on the inferred keys.
    "sql_group_order_all" -> ((s, d) => {
      t(s, d, "part").createOrReplaceTempView("graft_all_part")
      s.sql(
        """SELECT p_brand, split_part(p_type, ' ', 1) AS type_family,
          |       count(*) AS n_parts,
          |       round(avg(p_retailprice), 2) AS avg_price
          |FROM graft_all_part
          |WHERE p_size <= 15
          |GROUP BY ALL
          |ORDER BY ALL""".stripMargin)
    }),

    // IDENTIFIER() clause (SQL:2023 / Spark 4): table AND column names
    // supplied as bound parameters without string-splicing SQL — the
    // injection-proof way templated jobs pick their target table and
    // measure. The analyzer resolves IDENTIFIER(:p) to a real reference
    // before optimization, so the plan is indistinguishable from the
    // hard-coded spelling (same pushdown, same pruning); the oracle IS
    // that hard-coded spelling.
    "sql_identifier_clause" -> ((s, d) => {
      t(s, d, "supplier").createOrReplaceTempView("graft_ident_supp")
      s.sql(
        """SELECT s_nationkey, count(*) AS n_supp,
          |       round(sum(IDENTIFIER(:measure)), 2) AS total_bal
          |FROM IDENTIFIER(:tbl)
          |GROUP BY s_nationkey
          |ORDER BY s_nationkey""".stripMargin,
        Map("tbl" -> "graft_ident_supp", "measure" -> "s_acctbal"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // the ANSI twin of the pipe chain — same filter, keys, rounding
    "sql_pipe_syntax" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1995-01-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // distribution is physical-only — the value twin is the plain
    // aggregate
    "sql_distribute_cluster_by" ->
      """SELECT l_returnflag, l_linestatus,
        |       count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // DuckDB shares the WINDOW clause — near-verbatim twin
    "sql_named_window" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |         rank() OVER w AS rk,
        |         round(sum(o_totalprice) OVER w, 2) AS run_total
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey)
        |) WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,
    // DuckDB shares SQL-standard LATERAL — near-verbatim twin
    "sql_lateral_subquery" ->
      """SELECT c_custkey, o.o_orderkey,
        |       round(o.o_totalprice, 2) AS o_totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) o
        |ORDER BY c_custkey, o.o_orderkey""".stripMargin,
    "sql_tvf_family" ->
      """SELECT n.n_regionkey,
        |       g.id AS grid_id,
        |       p.pos AS elem_pos,
        |       p.col AS elem_val,
        |       count(*) AS n_rows,
        |       CAST(sum(g.id * p.col) AS BIGINT) AS weighted
        |FROM range(0, 4) g(id)
        |JOIN nation n ON n.n_nationkey % 4 = g.id
        |CROSS JOIN (VALUES (0, 10), (1, 20), (2, 30)) p(pos, col)
        |GROUP BY n.n_regionkey, g.id, p.pos, p.col
        |ORDER BY n_regionkey, grid_id, elem_pos""".stripMargin,
    // parameters inlined as the constants the Spark parser bound
    "sql_parameterized" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // the variable's derivation inlined as a scalar subquery — max() is
    // an exact fold, so the cut is bit-identical in both engines
    "sql_session_variables" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS rev
        |FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) * 0.5 FROM orders)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // the dynamic statement with its parameter bound
    "sql_execute_immediate" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS rev
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the function body inlined — exactly what Spark's analyzer does
    "udf_sql_declared" ->
      """SELECT l_returnflag,
        |       round(sum(l_extendedprice * (1.0 - l_discount)
        |                 * (1.0 + l_tax)), 2) AS net_revenue,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // DuckDB's UNION ALL BY NAME has the same null-fill semantics
    "set_union_by_name" ->
      """WITH u AS (
        |  SELECT c_custkey AS custkey, c_mktsegment AS segment,
        |         c_acctbal AS acctbal
        |  FROM customer
        |  UNION ALL BY NAME
        |  SELECT c_mktsegment AS segment, c_custkey AS custkey
        |  FROM customer WHERE c_acctbal < 0
        |)
        |SELECT segment, count(*) AS n_rows,
        |       count(acctbal) AS n_with_bal,
        |       round(sum(acctbal), 2) AS sum_bal
        |FROM u GROUP BY segment ORDER BY segment""".stripMargin,
    // identical subquery text (integer-rounded scalar threshold keeps the
    // float-average boundary engine-stable); DuckDB decorrelates the
    // same way
    "sql_subquery_family" ->
      """SELECT c_mktsegment,
        |  count(*) AS n_cust,
        |  CAST(count_if(c_acctbal >
        |    (SELECT round(avg(c_acctbal)) FROM customer))
        |    AS BIGINT) AS n_above_avg,
        |  CAST(count_if(EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderpriority = '1-URGENT')) AS BIGINT)
        |    AS n_with_urgent,
        |  CAST(count_if(NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey)) AS BIGINT) AS n_no_orders,
        |  CAST(count_if(c_nationkey IN (
        |    SELECT n_nationkey FROM nation
        |    WHERE n_name LIKE 'A%')) AS BIGINT) AS n_a_nations
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    // DuckDB supports GROUP BY ALL / ORDER BY ALL with the same
    // inference rule (non-aggregated select items)
    // the hard-coded spelling IDENTIFIER() must resolve to
    "sql_identifier_clause" ->
      """SELECT s_nationkey, count(*) AS n_supp,
        |       round(sum(s_acctbal), 2) AS total_bal
        |FROM supplier
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin,
    "sql_group_order_all" ->
      """SELECT p_brand, split_part(p_type, ' ', 1) AS type_family,
        |       count(*) AS n_parts,
        |       round(avg(p_retailprice), 2) AS avg_price
        |FROM part
        |WHERE p_size <= 15
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin
  )
}
