package graft

import org.apache.spark.sql.functions._

/** Local brute-force differentials for the round-12 curation additions:
  * m_stratified_sample (k-per-stratum hash draw on the TopKPerKey
  * native operator) and t_ngram_novelty (corpus-order first-occurrence
  * novelty).
  */
class CurationOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("stratified sample = k smallest-rank-by-hash-desc per stratum") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("doc_id"),
        conv(substring(md5(concat(lit("strat_"), col("doc_id"))),
          1, 12), 16, 10).cast("long").as("skey"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.sortBy { case (_, id, k) => (-k, id) }.take(5).zipWithIndex
        .map { case ((_, id, _), i) => (src, i + 1, id) }
    }.toSet
    val got = SparkEntry.queries("m_stratified_sample")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want)
    // every stratum is fully represented: min(5, |stratum|) rows
    val bySrc = docs.groupBy(_._1).map { case (s0, r) => s0 -> r.size }
    got.groupBy(_._1).foreach { case (s0, rows) =>
      assert(rows.size == math.min(5, bySrc(s0)))
    }
  }

  test("ngram novelty matches a sequential first-occurrence scan") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    val grams = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      id -> toks.sliding(3).filter(_.length == 3).map(_.mkString(" "))
        .toSet
    }.filter { case (_, g) => g.nonEmpty }
    val firstSeen = scala.collection.mutable.Map[String, Long]()
    grams.foreach { case (id, gs) =>
      gs.foreach(g => if (!firstSeen.contains(g)) firstSeen(g) = id)
    }
    val want = grams.map { case (id, gs) =>
      id -> ((gs.size.toLong, gs.count(g => firstSeen(g) == id).toLong))
    }.toMap
    val got = SparkEntry.queries("t_ngram_novelty")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == want.size)
    got.foreach { case (id, n, nv, frac) =>
      val (wn, wnv) = want(id)
      assert(n == wn, s"doc $id n_grams $n != $wn")
      assert(nv == wnv, s"doc $id n_novel $nv != $wnv")
      assert(math.abs(frac - wnv.toDouble / wn) < 1e-4 + 1e-9)
    }
  }
}
