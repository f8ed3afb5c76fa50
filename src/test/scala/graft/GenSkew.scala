package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial-skew bench fixture (round-8, VERDICT item 7): derives
  * /root/repo/scaledata/sf1skew from the uniform sf1 replication with
  * three deterministic hot-key injections, so the AQE-skew / salting /
  * hot-shingle-cap patterns are PROVEN against real skew rather than
  * argued from uniform data:
  *
  *   - events:   ~20% of all events (pmod(event_id, 5) = 0) are
  *               reassigned to ONE user — every
  *               Window.partitionBy(user_id) query gets a partition
  *               holding a fifth of the table, and every user-keyed
  *               aggregate gets one massive group;
  *   - documents: ~25% of docs (pmod(doc_id, 4) = 0) get the same
  *               12-token phrase appended — each phrase shingle's
  *               posting list covers a quarter of the corpus, the
  *               worst case for shingle-join dedup candidate
  *               generation (quadratic without a cap);
  *   - lineitem: ~20% of lines (pmod(l_orderkey, 5) = 0) point at ONE
  *               part — part-side equi-joins and partkey aggregates
  *               get a single hot build/probe key. This SAME injection
  *               hubs the related-video graph (videoEdges =
  *               v·l_orderkey → v·l_partkey distinct): the hot part
  *               becomes one vertex with in-degree 294,556 — 5.8% of
  *               all 5.09 M distinct edges, vs a uniform max of 53 —
  *               the round-9 graph-family skew audit's power-law hub
  *               (PERF.md: no super-linear response in any of the
  *               top-5 graph queries).
  *
  * All other tables (and all other columns) are byte-identical to sf1,
  * so a uniform-vs-skew bench delta isolates the skew response.
  * Bench-only, never a correctness gate.
  */
object GenSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val in = "/root/repo/scaledata/sf1"

    // `mid` variant (round-11, VERDICT item 3): re-seed ONLY the
    // lineitem hub so the hot part carries a MID-RANGE id instead of
    // the minimum — the adversarial case for ID-oriented triangle
    // enumeration, where the canonical a<b orientation centres every
    // hot edge's wedges ON the hub instead of pointing them outward.
    // sf1skew's min-id hub made k25 look skew-safe by accident; this
    // fixture is the one that separates k25 from k25b. Only lineitem
    // lands (the truss/triangle queries read nothing else).
    if (args.headOption.contains("mid")) {
      val out = "/root/repo/scaledata/sf1skewmid"
      val li = spark.read.parquet(s"$in/lineitem.parquet")
      val midPart = li.stat.approxQuantile("l_partkey", Array(0.5), 0.001)
        .head.toLong
      li.withColumn("l_partkey",
          when(pmod(col("l_orderkey"), lit(5)) === 0, lit(midPart))
            .otherwise(col("l_partkey")))
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      println(s"[genskew] mid-id hub lineitem: done (hub part $midPart)")
      spark.stop()
      return
    }

    val out = "/root/repo/scaledata/sf1skew"

    def land(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[genskew] $name: done")
    }

    val ev = spark.read.parquet(s"$in/events.parquet")
    val hotUser = ev.agg(min(col("user_id")).cast("long")).head.getLong(0)
    land("events", ev.withColumn("user_id",
      when(pmod(col("event_id"), lit(5)) === 0, lit(hotUser))
        .otherwise(col("user_id"))))

    val docs = spark.read.parquet(s"$in/documents.parquet")
    val phrase = " the quick brown fox jumps over the lazy dog every day"
    val skewText = when(pmod(col("doc_id"), lit(4)) === 0,
      concat(col("text"), lit(phrase))).otherwise(col("text"))
    land("documents", docs
      .withColumn("text", skewText)
      .withColumn("n_chars", length(col("text")).cast("long")))

    val li = spark.read.parquet(s"$in/lineitem.parquet")
    val hotPart = li.agg(min(col("l_partkey")).cast("long")).head.getLong(0)
    land("lineitem", li.withColumn("l_partkey",
      when(pmod(col("l_orderkey"), lit(5)) === 0, lit(hotPart))
        .otherwise(col("l_partkey"))))

    Seq("orders", "customer", "part", "supplier", "embeddings",
      "region", "nation").foreach { t =>
      land(t, spark.read.parquet(s"$in/$t.parquet"))
    }
    spark.stop()
  }
}
