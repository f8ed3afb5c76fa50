package graft.ops

import graft.Tables
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The typed `Dataset[T]` surface (SURVEY §1.2): case-class rows with
  * product Encoders, `groupByKey` on a typed key, and a custom
  * `Aggregator[IN, BUF, OUT]` — the API a library consumer reaches for
  * when the aggregation state doesn't fit `functions._` but full
  * Catalyst `TypedImperativeAggregate` machinery (CorrMatrixAgg) is
  * overkill. The trade is explicit: the Aggregator's reduce/merge run
  * on JVM objects behind Tungsten encoders (no whole-stage codegen for
  * the lambda itself), but Spark still plans PARTIAL aggregation —
  * `merge` makes the state map-side-combinable, so the shuffle carries
  * one buffer per (partition, key), not the rows. That contract is
  * exactly what keeps it viable at 100 TB, and the spec pins the
  * partial-aggregate plan shape. Exactness: all buffer fields are
  * floor-quantized integers (JVM `math.floor` on the identical double
  * = Spark/DuckDB `floor`), so the result is engine-exact.
  */
object Typed {

  final case class LineSlice(l_orderkey: Long, l_quantity: Double,
                             l_extendedprice: Double)
  final case class OrderProfile(n_lines: Long, qty_sum: Long,
                                cents_sum: Long, cents_max: Long)

  /** Exact per-order profile: count / quantity sum / money sum+max in
    * integer cents. `merge` is associative+commutative — the property
    * the partial-aggregation plan (and any batch-split) relies on. */
  val orderProfile: Aggregator[LineSlice, OrderProfile, OrderProfile] =
    new Aggregator[LineSlice, OrderProfile, OrderProfile] {
      def zero: OrderProfile = OrderProfile(0L, 0L, 0L, Long.MinValue)
      def reduce(b: OrderProfile, a: LineSlice): OrderProfile = {
        val cents = math.floor(a.l_extendedprice * 100.0).toLong
        OrderProfile(b.n_lines + 1L,
          b.qty_sum + math.floor(a.l_quantity).toLong,
          b.cents_sum + cents, math.max(b.cents_max, cents))
      }
      def merge(x: OrderProfile, y: OrderProfile): OrderProfile =
        OrderProfile(x.n_lines + y.n_lines, x.qty_sum + y.qty_sum,
          x.cents_sum + y.cents_sum,
          math.max(x.cents_max, y.cents_max))
      def finish(r: OrderProfile): OrderProfile = r
      def bufferEncoder: Encoder[OrderProfile] =
        Encoders.product[OrderProfile]
      def outputEncoder: Encoder[OrderProfile] =
        Encoders.product[OrderProfile]
    }

  val all: Seq[Q] = Seq(

    // ----- Typed-Dataset aggregation: the case-class pipeline end to
    // end — `.as[LineSlice]`, typed `groupByKey`, custom Aggregator,
    // flattened back to columns. Top-20 orders by money total.
    Q("m_typed_agg",
      (s, d) => {
        implicit val sliceEnc: Encoder[LineSlice] =
          Encoders.product[LineSlice]
        implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
        val ds = Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_extendedprice")
          .as[LineSlice]
        ds.groupByKey(_.l_orderkey)
          .agg(orderProfile.toColumn.name("p"))
          .toDF("l_orderkey", "p")
          .select(col("l_orderkey"), col("p.n_lines").as("n_lines"),
            col("p.qty_sum").as("qty_sum"),
            col("p.cents_sum").as("cents_sum"),
            col("p.cents_max").as("cents_max"))
          .orderBy(desc("cents_sum"), col("l_orderkey"))
          .limit(20)
      },
      Some(
        """SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
          |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
          |    AS qty_sum,
          |  CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT))
          |    AS BIGINT) AS cents_sum,
          |  CAST(max(CAST(floor(l_extendedprice * 100.0) AS BIGINT))
          |    AS BIGINT) AS cents_max
          |FROM lineitem GROUP BY l_orderkey
          |ORDER BY cents_sum DESC, l_orderkey LIMIT 20"""
          .stripMargin)),

    // ----- Skyline (Pareto frontier) query (Börzsönyi et al., ICDE
    // 2001) — per return flag, the parts that are Pareto-optimal on
    // (minimize best unit-price proxy, maximize best quantity): no
    // other part is at-least-as-good on both axes and strictly better
    // on one. The textbook dominance formulation is an O(n²)
    // self-join; the scale form exploits the staircase structure:
    // sort by price, and a point survives iff its quantity beats the
    // running maximum over all STRICTLY cheaper points, with
    // equal-price groups resolved against their own maximum (ties on
    // both axes are mutually non-dominating and all survive). Two
    // windows over the per-part AGGREGATE table — which is item-
    // cardinality, not corpus-cardinality: the 100-TB cost is the one
    // map-side-combinable per-part aggregation; the staircase scan
    // runs over the distilled item table (and partitions by flag).
    Q("m_skyline",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val items = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag").as("flag"),
            col("l_partkey").as("part"))
          .agg(min(floor(col("l_extendedprice") * 100.0).cast("long"))
            .as("price"),
            max(floor(col("l_quantity")).cast("long")).as("qty"))
        val wStrict = Window.partitionBy("flag").orderBy("price")
          .rangeBetween(Window.unboundedPreceding, -1L)
        val wSame = Window.partitionBy("flag", "price")
        items
          .withColumn("max_cheaper", max(col("qty")).over(wStrict))
          .withColumn("max_same", max(col("qty")).over(wSame))
          .filter((col("max_cheaper").isNull ||
            col("qty") > col("max_cheaper")) &&
            col("qty") === col("max_same"))
          .select(col("flag").as("l_returnflag"), col("part"),
            col("price"), col("qty"))
          .orderBy("l_returnflag", "price", "part")
      },
      Some(
        """WITH items AS (
          |  SELECT l_returnflag AS flag, l_partkey AS part,
          |    CAST(min(floor(l_extendedprice * 100.0)) AS BIGINT)
          |      AS price,
          |    CAST(max(floor(l_quantity)) AS BIGINT) AS qty
          |  FROM lineitem GROUP BY 1, 2
          |)
          |SELECT a.flag AS l_returnflag, a.part, a.price, a.qty
          |FROM items a
          |WHERE NOT EXISTS (
          |  SELECT 1 FROM items b
          |  WHERE b.flag = a.flag
          |    AND b.price <= a.price AND b.qty >= a.qty
          |    AND (b.price < a.price OR b.qty > a.qty))
          |ORDER BY l_returnflag, price, part""".stripMargin)),
  )
}
