package graft

import org.apache.spark.sql.functions._

/** Mathematical invariants of the fourth-wave operators — bounds and
  * conservation laws that hold for ANY input, pinned at sf0.001 so a
  * formula regression (a sign slip, a swapped operand, an off-by-one
  * rank) breaks a test even when the DuckDB oracle would faithfully
  * reproduce the same mistake on both engines. The oracle proves
  * Spark ≡ DuckDB; these prove the shared formula is the RIGHT one.
  */
class WaveInvariantsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("clustering coefficient and assortativity stay in their ranges") {
    val cc = q("k17_clustering_coeff").head()
    val coeff = cc.getAs[Double]("global_coeff")
    assert(coeff >= 0.0 && coeff <= 1.0, s"C=$coeff outside [0,1]")
    // 3T ≤ wedges: every triangle corner is a wedge
    assert(cc.getAs[Long]("tri_memberships") <=
      cc.getAs[Long]("n_wedges"))
    val r = q("k18_assortativity").head().getAs[Double]("assortativity")
    assert(r >= -1.0 && r <= 1.0, s"assortativity $r outside [-1,1]")
  }

  test("modularity is bounded and its integer identity reassembles") {
    val m = q("k16_modularity").head()
    val qv = m.getAs[Double]("modularity")
    assert(qv >= -0.5 && qv <= 1.0, s"Q=$qv outside [-1/2,1]")
    val twoM = m.getAs[Long]("two_m")
    assert(m.getAs[Long]("q_num") ==
      twoM * m.getAs[Long]("in_sum") - m.getAs[Long]("sum_d2"),
      "q_num does not reassemble from its parts")
    assert(m.getAs[Long]("in_sum") <= twoM,
      "more intra-community edge endpoints than edges")
  }

  test("bow-tie classes partition the vertex set") {
    val parts = q("k19_bowtie").collect()
      .map(r => r.getAs[String]("bowtie_class") ->
        r.getAs[Long]("n_vertices")).toMap
    val verts = Tables.orders(spark, sf)
      .filter(col("o_orderkey") < 2000).count()
    assert(parts.values.sum == verts,
      s"classes sum to ${parts.values.sum}, vertex set holds $verts")
    assert(parts.values.forall(_ >= 0))
  }

  test("AUC is inside [0,1] and its pair counts conserve") {
    val a = q("m_auc").head()
    val auc = a.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0, s"AUC $auc outside [0,1]")
    val total = a.getAs[Long]("n_pos") * a.getAs[Long]("n_neg")
    assert(a.getAs[Long]("gt_pairs") + a.getAs[Long]("tie_pairs")
      <= total, "ordered + tied pairs exceed the pair universe")
  }

  test("curation funnel counts are monotone non-increasing") {
    val counts = q("t_curation_funnel").orderBy("stage_no").collect()
      .map(_.getAs[Long]("n_docs"))
    assert(counts.zip(counts.drop(1)).forall { case (a, b) => b <= a },
      s"funnel grew between stages: ${counts.mkString(" -> ")}")
    assert(counts.head > 0 && counts.last > 0,
      "funnel is vacuous end-to-end")
  }

  test("link-prediction candidates are genuinely unlinked pairs with " +
      "consistent Jaccard") {
    val rows = q("k15_link_predict").collect()
    assert(rows.nonEmpty, "no candidates at fixture scale")
    rows.foreach { r =>
      val (c, du, dv) = (r.getAs[Long]("common"),
        r.getAs[Long]("deg_u"), r.getAs[Long]("deg_v"))
      assert(c <= math.min(du, dv),
        "more common neighbors than the smaller degree")
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0 &&
        math.abs(j - c.toDouble / (du + dv - c)) == 0.0,
        "jaccard does not reassemble from its integer parts")
    }
  }

  test("Theil-Sen medians are actual pairwise slopes") {
    // the nearest-rank selection must return one of the COMPUTED
    // slopes (no interpolation) — recompute the day-pair slope set
    // per type and check membership
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("day"),
        floor(col("value") * 100.0).cast("long").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").as("r"))
      .as[(String, Int, Long)].collect()
      .groupBy(_._1)
    val med = q("m_theil_sen").collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("slope_med")).toMap
    med.foreach { case (t, s) =>
      val pts = daily(t).sortBy(_._2)
      val slopes = for {
        (_, d1, r1) <- pts; (_, d2, r2) <- pts if d1 < d2
      } yield (r2 - r1).toDouble / (d2 - d1)
      assert(slopes.contains(s),
        s"$t median $s is not one of the ${slopes.length} slopes")
    }
  }

  test("interarrival burstiness stays in (-1, 1) and quantiles are " +
      "ordered") {
    q("m_interarrival").collect().foreach { r =>
      val b = r.getAs[Double]("burstiness")
      assert(b > -1.0 && b < 1.0, s"burstiness $b outside (-1,1)")
      assert(r.getAs[Long]("gap_med") <= r.getAs[Long]("gap_p90"),
        "median above P90")
    }
  }

  test("moments match a brute-force computation") {
    import spark.implicits._
    val vals = Tables.events(spark, sf)
      .select(col("event_type"),
        floor(col("value") * 100.0).cast("long").as("c"))
      .as[(String, Long)].collect().groupBy(_._1)
    q("m_moments").collect().foreach { r =>
      val xs = vals(r.getAs[String]("event_type")).map(_._2.toDouble)
      val n = xs.length.toDouble
      val mu = xs.sum / n
      val m2 = xs.map(x => (x - mu) * (x - mu)).sum / n
      val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mu, 4)).sum / n
      assert(math.abs(r.getAs[Double]("variance") - m2) / m2 < 1e-9)
      assert(math.abs(r.getAs[Double]("skewness") -
        m3 / (m2 * math.sqrt(m2))) < 1e-6)
      assert(math.abs(r.getAs[Double]("kurtosis_excess") -
        (m4 / (m2 * m2) - 3.0)) < 1e-6)
    }
  }

  test("reciprocity and condensation conserve the edge census") {
    val rec = q("k20_reciprocity").head()
    assert(rec.getAs[Long]("n_reciprocal") <= rec.getAs[Long]("n_edges"))
    // reciprocal edges come in pairs
    assert(rec.getAs[Long]("n_reciprocal") % 2 == 0,
      "odd count of mutually-reciprocal edges")
    val c = q("k21_condensation").head()
    assert(c.getAs[Long]("n_components") > 0 &&
      c.getAs[Long]("n_intra_edges") >= 0 &&
      c.getAs[Long]("n_condensed_edges") >= 0)
  }

  test("centroid distances obey the triangle inequality") {
    val d = q("m_embed_centroids").collect()
      .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")) ->
        r.getAs[Double]("dist")).toMap
    def dist(a: Int, b: Int): Double =
      if (a == b) 0.0 else d(math.min(a, b) -> math.max(a, b))
    val labels = d.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct
    for (a <- labels; b <- labels; c <- labels if a < b && b < c) {
      assert(dist(a, c) <= dist(a, b) + dist(b, c) + 1e-9,
        s"triangle inequality violated on ($a,$b,$c)")
    }
    assert(d.values.forall(_ >= 0.0))
  }
}
