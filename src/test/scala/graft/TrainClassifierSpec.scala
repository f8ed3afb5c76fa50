package graft

/** t_train_classifier vs a local (driver-side, single-threaded) replica
  * of the exact 3-iteration full-batch GD trajectory at sf0.001. The
  * distributed pipeline must reproduce the sequential math to float
  * noise — the aggregation tree only reorders the gradient sums.
  */
class TrainClassifierSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("distributed GD matches the sequential trajectory") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    def feats(text: String, lang: String): (Array[Double], Int) = {
      val len = text.length.toDouble
      def without(sub: String) = text.replace(sub, "").length
      (Array(
        1.0,
        len / 1000.0,
        (len - without("e")) / (len + 1.0),
        (len - without("th")) / (2.0 * (len + 1.0)),
        (len - without(" ")) / (len + 1.0)),
        if (lang == "en") 1 else 0)
    }
    val xy = docs.map { case (_, t, l) => feats(t, l) }
    val w = Array.fill(5)(0.0)
    for (_ <- 1 to 3) {
      val g = Array.fill(5)(0.0)
      xy.foreach { case (x, y) =>
        val p = 1.0 / (1.0 + math.exp(-x.zip(w).map(t => t._1 * t._2).sum))
        for (j <- 0 until 5) g(j) += (p - y) * x(j)
      }
      for (j <- 0 until 5) w(j) -= g(j) / xy.length
    }
    val want = docs.zip(xy).map { case ((id, _, _), (x, y)) =>
      val p = 1.0 / (1.0 + math.exp(-x.zip(w).map(t => t._1 * t._2).sum))
      (id, p, if (p >= 0.5) 1 else 0, y)
    }

    val got = SparkEntry.queries("t_train_classifier")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getInt(3)))
    assert(got.length == want.length)
    got.zip(want).foreach { case ((gi, gs, gp, gy), (wi, wp, wpred, wy)) =>
      assert(gi == wi)
      // got is rounded at 1e-4 (HALF_UP); compare against the raw
      // sequential p with half-quantum tolerance
      assert(math.abs(gs - wp) <= 5.0001e-5, s"doc $gi score $gs vs $wp")
      // pred is defined as a pure function of the ROUNDED score
      assert((gp == 1) == (gs >= 0.5), s"doc $gi pred $gp vs score $gs")
      assert(gp == wpred || math.abs(wp - 0.5) <= 5.0001e-5,
        s"doc $gi pred $gp vs sequential $wpred (p=$wp)")
      assert(gy == wy, s"doc $gi label")
    }
    // sanity: three GD steps must beat the w=0 coin-flip log-loss
    val n = xy.length.toDouble
    val loss = docs.zip(xy).map { case (_, (x, y)) =>
      val p = 1.0 / (1.0 + math.exp(-x.zip(w).map(t => t._1 * t._2).sum))
      -(y * math.log(p) + (1 - y) * math.log(1 - p))
    }.sum / n
    assert(loss < math.log(2.0), s"log-loss $loss did not improve on 0.693")
  }
}
