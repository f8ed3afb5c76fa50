package graft

import org.apache.spark.sql.functions._

/** Pins winnowing's defining guarantee (Schleimer/Wilkerson/Aiken,
  * MOSS): with k-gram size 5 and window 4, any two documents sharing a
  * contiguous token run of length >= k + w - 1 = 8 MUST share at least
  * one selected fingerprint — that is what makes the selected subset
  * (~1/w of all grams) safe for plagiarism/near-dup detection. Also
  * pins the density bound: at most one NEW fingerprint per window
  * position, and disjoint texts share nothing.
  */
class WinnowSpec extends SparkSpec {

  private def fps(texts: Seq[String]): Map[Long, Set[String]] = {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    ops.Text.winnowed(docs)
      .select(col("doc_id"), col("fp"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getString(1)).toSet }
  }

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("a shared run of k+w-1=8 tokens forces a common fingerprint") {
    val shared = words("s", 8)
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      // bury the same 8-token run at random offsets in two unrelated docs
      val a = (words("a", 3 + rnd.nextInt(9)) ++ shared ++
        words("x", 3 + rnd.nextInt(9))).mkString(" ")
      val b = (words("b", 3 + rnd.nextInt(9)) ++ shared ++
        words("y", 3 + rnd.nextInt(9))).mkString(" ")
      val m = fps(Seq(a, b))
      assert((m(0L) & m(1L)).nonEmpty,
        s"trial $trial: shared 8-run produced no common fingerprint")
    }
  }

  test("disjoint documents share no fingerprints") {
    val m = fps(Seq(words("p", 20).mkString(" "),
      words("q", 20).mkString(" ")))
    assert((m(0L) & m(1L)).isEmpty)
  }

  test("selection compresses: fingerprints <= window positions") {
    val m = fps(Seq(words("w", 40).mkString(" ")))
    // 40 tokens -> 36 grams -> 33 full windows; distinct minima must be
    // well under the gram count (that's the point of winnowing)
    assert(m(0L).size <= 33)
    assert(m(0L).nonEmpty)
  }
}
