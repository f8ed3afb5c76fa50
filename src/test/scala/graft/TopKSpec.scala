package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom TopKPerKey operator (graft.plans) against the window
  * formulation it replaces: identical rows on every (key count, k)
  * shape including k larger than a group, plus the physical-plan
  * properties that make it the scale path — both custom exec phases
  * present, exactly one exchange between them, no sort.
  */
class TopKSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("TopKPerKey equals the row_number window formulation") {
    val orders = Tables.orders(spark, sf)
    for (k <- Seq(1, 3, 10, 100000)) {
      val native = graft.plans.TopKPerKey
        .perKey(orders, Seq("o_orderstatus"), "o_totalprice", "o_orderkey", k)
        .select("o_orderstatus", "o_orderkey", "o_totalprice")
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      val windowed = orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select("o_orderstatus", "o_orderkey", "o_totalprice")
      assert(native.exceptAll(windowed).isEmpty &&
        windowed.exceptAll(native).isEmpty,
        s"k=$k: native and window top-k differ")
    }
  }

  test("property: equals window top-k on generated data (dup keys, " +
    "skew, ties in the order column)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val s = spark
    import s.implicits._
    // few keys + coarse values force duplicate keys and order-value ties,
    // the cases where only the tie-break keeps the answer unique
    val rowGen = for {
      key <- Gen.chooseNum(0, 4)
      v <- Gen.chooseNum(0, 9)
    } yield (key, v)
    val prop = Prop.forAll(
      Gen.nonEmptyListOf(rowGen).map(_.take(200)),
      Gen.chooseNum(1, 6)) { (rows, k) =>
      val df = rows.zipWithIndex
        .map { case ((key, v), i) => (key, v, i.toLong) }
        .toDF("key", "v", "uid")
        .repartition(5)
      val native = graft.plans.TopKPerKey
        .perKey(df, Seq("key"), "v", "uid", k)
      val w = Window.partitionBy(col("key"))
        .orderBy(desc("v"), col("uid"))
      val windowed = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
      native.exceptAll(windowed).isEmpty &&
        windowed.exceptAll(native).isEmpty
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("plan: two TopKPerKey phases, one exchange, no sort, no window") {
    val native = graft.plans.TopKPerKey
      .perKey(Tables.orders(spark, sf), Seq("o_orderstatus"),
        "o_totalprice", "o_orderkey", 3)
    val plan = native.queryExecution.executedPlan.toString
    assert("TopKPerKey".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("Exchange"), plan)
    assert(!plan.toLowerCase.contains("sortexec") &&
      !plan.contains("Window"), plan)
  }
}
