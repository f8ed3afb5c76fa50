package graft

import org.apache.spark.sql.functions._

/** The Spark-4 SQL-surface wave (ops/Sql4.scala): beyond the DuckDB
  * differential, pin the properties that make these surfaces scale-safe —
  * a SQL UDF must INLINE into the expression tree (not plan as an opaque
  * call), a session variable must fold to a pushable literal, and a
  * collated group-by must merge case variants inside the aggregate.
  */
class Sql4Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("SQL UDFs inline into the aggregate — no opaque call in the plan") {
    val df = SparkEntry.queries("m_sql_udf")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the nested g_blabel∘g_bucket body must appear as plain FLOOR
    // arithmetic under the HashAggregate, keeping codegen + partial agg
    assert(plan.toUpperCase.contains("FLOOR"),
      s"SQL UDF body not inlined:\n$plan")
    assert(!plan.contains("Invoke") && !plan.contains("BatchEvalPython"),
      s"SQL UDF planned as an opaque call:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"aggregate lost map-side combine under the UDF:\n$plan")
  }

  test("session variable folds to a literal filter") {
    val df = SparkEntry.queries("m_sql_variable")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    // after SET VAR the reference must be a foldable literal, i.e. the
    // filter line shows a numeric constant, not a variable lookup
    assert(!plan.contains("variablereference") &&
      !plan.contains("g_thresh"),
      s"session variable survived into the optimized plan:\n$plan")
  }

  test("collated grouping merges case variants inside the aggregate") {
    val rows = SparkEntry.queries("m_collation")(spark, sf).collect()
    // 5 event types in the fixture → exactly 5 case-merged groups, and
    // every key is fully lower-case
    assert(rows.length == 5, s"expected 5 merged groups, got ${rows.length}")
    assert(rows.forall(r => r.getString(0) == r.getString(0).toLowerCase))
    // cross-check: counts equal the plain lower()-grouped counts
    val plain = graft.Tables.events(spark, sf)
      .groupBy(lower(col("event_type")).as("etype")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(plain(r.getString(0)) == r.getLong(1),
      s"collated count diverges for ${r.getString(0)}"))
  }

  test("listagg WITHIN GROUP returns the ordered member list") {
    val rows = SparkEntry.queries("m_listagg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val members = r.getString(1).split(",").toSeq
      assert(members == members.sorted,
        s"listagg order violated for ${r.getString(0)}: $members")
      assert(members.length == r.getLong(2),
        "member count disagrees with count(*)")
    }
  }

  test("table UDF body inlines — the threshold reaches the scan") {
    val df = SparkEntry.queries("m_sql_table_udf")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the RETURNS TABLE body must plan as the inlined filter-aggregate:
    // the value >= 400 predicate pushed into the parquet scan, no
    // lateral/nested evaluation node
    assert(plan.contains("400"),
      s"table UDF threshold missing from the physical plan:\n$plan")
    assert(!plan.contains("LateralJoin") && !plan.contains("Invoke"),
      s"table UDF planned as a per-row call:\n$plan")
  }

  test("EXECUTE IMMEDIATE binds named parameters as literals") {
    val df = SparkEntry.queries("m_exec_immediate")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("click"),
      s"bound string parameter missing from the plan:\n$plan")
    assert(!plan.contains("parameter"),
      s"unbound parameter marker left in the plan:\n$plan")
  }

  test("m_sql_script restores spark.sql.scripting.enabled after use") {
    val key = "spark.sql.scripting.enabled"
    val prior = spark.conf.getOption(key)
    val rows = SparkEntry.queries("m_sql_script")(spark, sf).collect()
    assert(rows.length == 1 && rows(0).getInt(1) == 4)
    assert(spark.conf.getOption(key) == prior,
      s"scripting flag leaked: was $prior, now ${spark.conf.getOption(key)}")
  }
}
