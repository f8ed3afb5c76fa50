package graft

import org.apache.spark.sql.functions._

/** Invariants of the greedy token-budget packer (`m_pack_sequences`)
  * that hold for ANY corpus, checked from the operator's own output:
  *
  *  1. conservation — per source, the bins' token counts sum to the
  *     source's total tokens (no doc lost or double-packed);
  *  2. boundary identity — a bin's first doc has cum-before equal to
  *     the sum of all earlier bins, so floor(that / 4096) must equal
  *     the bin's own index (this also stays true when an oversized doc
  *     makes the packer skip bin indices).
  */
class PackSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("m_pack_sequences conserves tokens and respects bin boundaries") {
    val out = SparkEntry.queries("m_pack_sequences")(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getLong(3)))
    assert(out.nonEmpty)

    val totals = Tables.documents(spark, sf)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " "))).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    out.groupBy(_._1).foreach { case (src, bins) =>
      val sorted = bins.sortBy(_._2)
      assert(sorted.map(_._4).sum == totals(src),
        s"$src: bins lose tokens")
      var before = 0L
      sorted.foreach { case (_, bin, nDocs, toks) =>
        assert(nDocs >= 1)
        assert(before / 4096 == bin,
          s"$src bin $bin starts at cum-before $before")
        before += toks
      }
    }
  }
}
