package graft

import org.apache.spark.sql.functions._

/** The Spark 4 SQL-language surface (pipe syntax, named parameters,
  * SQL-declared UDFs, by-name union, GROUP/ORDER BY ALL): each feature is
  * checked for result-equality against its explicit/classic twin, and the
  * two plan-shape claims the Scaladoc makes (parameters bind to pushable
  * literals; SQL UDF bodies inline, leaving no UDF node) are pinned on the
  * actual plans.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("sql_pipe_syntax folds to the same result as the nested ANSI form") {
    val pipe = q("sql_pipe_syntax").collect()
    val ansi = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("date"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect()
    assert(pipe.toSeq === ansi.toSeq)
  }

  test("sql_parameterized binds to literals the scan can push — the " +
    "totalprice predicate reaches PushedFilters") {
    val df = q("sql_parameterized")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters"),
      "no parquet pushdown section in the plan")
    val pushed = formatted.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("o_totalprice") && pushed.contains("150000"),
      s"bound parameter did not push into the scan:\n$pushed")
    // and the values equal the inline-constant twin
    val inline = spark.sql(
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM graft_param_orders
        |WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    assert(df.collect().toSeq === inline.collect().toSeq)
  }

  test("sql_session_variables folds the bound variable to a literal the " +
    "scan can push, and equals the scalar-subquery twin") {
    val df = q("sql_session_variables")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = formatted.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    // the variable's VALUE (half the max price) must appear as a pushed
    // constant — a variable that stayed symbolic would block pushdown
    assert(pushed.contains("o_totalprice"),
      s"variable-bound predicate did not push into the scan:\n$pushed")
    val twin = spark.sql(
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS rev
        |FROM graft_var_orders
        |WHERE o_totalprice >
        |      (SELECT max(o_totalprice) * 0.5 FROM graft_var_orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    assert(df.collect().toSeq === twin.collect().toSeq)
  }

  test("sql_execute_immediate: the dynamic statement with a bound USING " +
    "parameter equals the static query") {
    val df = q("sql_execute_immediate")
    val twin = spark.sql(
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS rev
        |FROM graft_exec_orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    assert(df.collect().toSeq === twin.collect().toSeq)
    assert(df.collect().nonEmpty)
  }

  test("udf_sql_declared inlines the function body — no UDF node in the " +
    "optimized plan, and values match the hand-inlined expression") {
    val df = q("udf_sql_declared")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("UDF") && !optimized.contains("ScalaUDF"),
      s"SQL UDF did not inline:\n$optimized")
    val twin = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * (lit(1.0) + col("l_tax"))), 2).as("net_revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
    assert(df.collect().toSeq === twin.collect().toSeq)
  }

  test("set_union_by_name aligns by NAME: no positional misalignment, " +
    "missing column null-fills, and the counts reconcile") {
    val rows = q("set_union_by_name").collect()
    val cust = Tables.customer(spark, sf)
    val total = cust.count()
    val neg = cust.filter(col("c_acctbal") < 0).count()
    assert(rows.map(_.getLong(1)).sum === total + neg)
    // acctbal exists only on the first extract: exactly `total` non-nulls
    assert(rows.map(_.getLong(2)).sum === total)
    // misalignment guard: had the union been positional, custkeys and
    // segments would have swapped on the second extract; segment values
    // must all be real market segments
    val segs = cust.select("c_mktsegment").distinct().collect()
      .map(_.getString(0)).toSet
    assert(rows.forall(r => segs.contains(r.getString(0))))
  }

  test("GROUP BY ALL / ORDER BY ALL infers exactly the explicit keys") {
    val all = q("sql_group_order_all").collect()
    val explicit = Tables.part(spark, sf)
      .filter(col("p_size") <= 15)
      .groupBy(col("p_brand"),
        split_part(col("p_type"), lit(" "), lit(1)).as("type_family"))
      .agg(count(lit(1)).as("n_parts"),
        round(avg("p_retailprice"), 2).as("avg_price"))
      .orderBy("p_brand", "type_family", "n_parts", "avg_price")
      .collect()
    assert(all.toSeq === explicit.toSeq)
  }
}
