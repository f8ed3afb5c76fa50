package graft

/** Pins the landed-ANN-index lifecycle (FAISS build-once/probe-many):
  * the IVF and PQ probe queries must READ the index tables landed by
  * ivfIndex/pqIndex — never re-run the Lloyd step or re-encode the
  * corpus inside the probe plan.
  */
class AnnIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("m_ann_ivf_nprobe probes the landed centroids and lists") {
    val plan = SparkEntry.queries("m_ann_ivf_nprobe")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_ivf_cent"),
      s"probe does not read the landed centroids:\n${plan.take(2000)}")
    assert(plan.contains("graft_ivf_lists"),
      s"probe does not read the landed inverted lists:\n${plan.take(2000)}")
    // the Lloyd recompute (per-(cell, pos) element mean via
    // posexplode) must not appear in the probe plan
    assert(!plan.contains("posexplode"),
      "the probe plan re-runs the centroid training pass")
  }

  test("m_ann_ivfpq reads all five landed index tables") {
    val plan = SparkEntry.queries("m_ann_ivfpq")(spark, sf)
      .queryExecution.executedPlan.toString
    Seq("graft_ivf_cent", "graft_ivf_lists", "graft_pqr_rcent",
        "graft_pqr_codebook", "graft_pqr_codes").foreach { t =>
      assert(plan.contains(t), s"composed probe does not read $t")
    }
    // the probe side splits its OWN query vectors into subspaces
    // (posexplode is legitimate there); the training pass's marker is
    // the per-(cell, pos) Lloyd mean — no avg() may survive routing
    assert(!plan.contains("avg("),
      "the composed probe re-runs the centroid training pass")
  }

  test("m_ann_pq probes the landed codebook and codes") {
    val plan = SparkEntry.queries("m_ann_pq")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_pq_codebook"),
      "probe does not read the landed codebook")
    assert(plan.contains("graft_pq_codes"),
      "probe does not read the landed codes")
    // corpus re-encode would add a FULL-corpus embeddings scan (the
    // per-(vec_id, s) nearest-centroid pass) on top of the probe
    // side's bounded reads — bound the number of embeddings scans
    // instead of matching a formatting-dependent predicate string
    val embScans =
      "embeddings\\.parquet".r.findAllIn(plan).size
    assert(embScans <= 2,
      s"$embScans embeddings scans in the probe plan — the encode " +
        "pass leaked back in")
  }
}
