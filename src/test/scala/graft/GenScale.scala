package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 bench-fixture generator (round-7 scale audit): replicates the
  * driver's read-only sf0.1 fixture 10× with disjoint key ranges per
  * copy — every key column is shifted by copy·(max+1), so referential
  * structure (orders↔lineitem↔part/supplier, events→users) is
  * preserved per copy and cardinalities scale exactly 10×. Documents
  * get a per-copy text marker and embeddings a per-copy first-element
  * perturbation so the corpus isn't 10 EXACT copies of itself (which
  * would quadratically inflate dedup candidate sets instead of scaling
  * them linearly). region/nation stay fixed (TPC-H convention).
  *
  * Output: /root/repo/scaledata/sf1/<table>.parquet — used ONLY for
  * the PERF.md sf1/sf0.1 scaling audit, never for correctness (the
  * driver's DuckDB gate runs at sf0.01 on its own fixture).
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // args: [copies] [outDir] — default the 10x sf1 fixture; the
    // round-12 4-point scaling fit generates 30x into scaledata/sf3
    // the same way (disjoint key ranges per copy, marker-perturbed
    // documents/embeddings), so every scale point shares one
    // construction
    val in = "/root/testdata/sf0.1"
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val out =
      if (args.length > 1) args(1) else "/root/repo/scaledata/sf1"

    // per-copy key shifts COMPUTED from the fixture (round-8 fix:
    // hardcoded constants silently collide if the fixture's key
    // ranges ever grow, breaking the "10x exact cardinality,
    // preserved referential structure" premise with no error). A
    // shared key domain (orders<->lineitem etc.) takes the max over
    // every table carrying it, +1.
    def shiftOf(cols: (String, String)*): Long =
      cols.map { case (f, c) =>
        spark.read.parquet(s"$in/$f.parquet")
          .agg(max(col(c)).cast("long")).head.getLong(0)
      }.max + 1
    val orderShift = shiftOf("orders" -> "o_orderkey",
      "lineitem" -> "l_orderkey")
    val partShift = shiftOf("part" -> "p_partkey",
      "lineitem" -> "l_partkey")
    val suppShift = shiftOf("supplier" -> "s_suppkey",
      "lineitem" -> "l_suppkey")
    val custShift = shiftOf("customer" -> "c_custkey",
      "orders" -> "o_custkey")
    val eventShift = shiftOf("events" -> "event_id")
    val userShift = shiftOf("events" -> "user_id")
    val docShift = shiftOf("documents" -> "doc_id")
    val vecShift = shiftOf("embeddings" -> "vec_id")

    def tenfold(df: DataFrame)(shift: (DataFrame, Int) => DataFrame)
        : DataFrame =
      (0 until copies).map(i => shift(df, i)).reduce(_ unionByName _)

    def land(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[genscale] $name: done")
    }

    val li = spark.read.parquet(s"$in/lineitem.parquet")
    land("lineitem", tenfold(li) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + i * orderShift)
        .withColumn("l_partkey", col("l_partkey") + i * partShift)
        .withColumn("l_suppkey", col("l_suppkey") + i * suppShift)
    })
    land("orders", tenfold(spark.read.parquet(s"$in/orders.parquet")) {
      (d, i) =>
        d.withColumn("o_orderkey", col("o_orderkey") + i * orderShift)
          .withColumn("o_custkey", col("o_custkey") + i * custShift)
    })
    land("customer",
      tenfold(spark.read.parquet(s"$in/customer.parquet")) { (d, i) =>
        d.withColumn("c_custkey", col("c_custkey") + i * custShift)
      })
    land("part", tenfold(spark.read.parquet(s"$in/part.parquet")) {
      (d, i) => d.withColumn("p_partkey", col("p_partkey") + i * partShift)
    })
    land("supplier",
      tenfold(spark.read.parquet(s"$in/supplier.parquet")) { (d, i) =>
        d.withColumn("s_suppkey", col("s_suppkey") + i * suppShift)
      })
    land("events", tenfold(spark.read.parquet(s"$in/events.parquet")) {
      (d, i) =>
        d.withColumn("event_id", col("event_id") + i * eventShift)
          .withColumn("user_id", col("user_id") + i * userShift)
    })
    land("documents",
      tenfold(spark.read.parquet(s"$in/documents.parquet")) { (d, i) =>
        val t = if (i == 0) col("text")
          else concat(col("text"), lit(s" sc$i"))
        // n_chars from col("text") AFTER the replacement — reusing `t`
        // here re-applies the concat to the already-marked text and
        // lands n_chars 4 over-length for every shifted copy, which
        // the round-11 sf1 differential caught through the multimodal
        // codec oracles (n_chars-derived expectations vs real bytes)
        d.withColumn("doc_id", col("doc_id") + i * docShift)
          .withColumn("text", t)
          .withColumn("n_chars", length(col("text")).cast("long"))
      })
    land("embeddings",
      tenfold(spark.read.parquet(s"$in/embeddings.parquet")) { (d, i) =>
        val e = if (i == 0) col("embedding")
          else concat(
            array((element_at(col("embedding"), 1) +
              lit(i * 1e-4f)).cast("float")),
            slice(col("embedding"), 2, 63))
        d.withColumn("vec_id", col("vec_id") + i * vecShift)
          .withColumn("embedding", e)
      })
    land("region", spark.read.parquet(s"$in/region.parquet"))
    land("nation", spark.read.parquet(s"$in/nation.parquet"))
    spark.stop()
  }
}
