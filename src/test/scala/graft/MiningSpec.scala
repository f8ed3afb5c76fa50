package graft

import org.apache.spark.sql.functions._

/** Properties of the drift/mining family that the DuckDB differential
  * cannot show — it only proves both engines compute the same formula;
  * these prove the formula is the RIGHT one:
  *
  *   - m_ks_drift's integer numerator equals a from-scratch driver-side
  *     KS computation over the raw values (exactness, not just
  *     cross-engine agreement), and the rejection boolean re-derives
  *     from each row's own integers;
  *   - m_psi_drift is non-negative (it is a Jensen–Shannon-style
  *     f-divergence) and its drift flag is exactly `psi > 0.25`;
  *   - m_assoc_rules: lift is symmetric in (ante, cons), and
  *     conf/lift floor-scaled integers re-derive from the row's own
  *     support counts.
  */
class MiningSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val SplitUs = 1705363200000000L

  test("m_ks_drift numerator matches a brute-force KS over raw values") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("value"),
        (unix_micros(col("ts")) >= lit(SplitUs)).as("cur"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    val got = SparkEntry.queries("m_ks_drift")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(5)))
      .toMap
    assert(got.nonEmpty)
    for ((etype, per) <- rows.groupBy(_._1)) {
      val a = per.filter(!_._3).map(_._2).sorted
      val b = per.filter(_._3).map(_._2).sorted
      val cuts = (a ++ b).distinct.sorted
      val dNum = cuts.map { x =>
        val ca = a.count(_ <= x).toLong
        val cb = b.count(_ <= x).toLong
        math.abs(ca * b.length - cb * a.length)
      }.max
      val (nA, nB, gotD, rejected) = got(etype)
      assert(nA == a.length && nB == b.length, s"$etype sample sizes")
      assert(gotD == dNum, s"$etype KS numerator: got $gotD, want $dNum")
      val wantReject = 1000000.0 * dNum * dNum >
        1844164.0 * (nA + nB) * nA * nB
      assert(rejected == wantReject, s"$etype rejection flag")
    }
  }

  test("m_psi_drift is a non-negative divergence with an exact flag") {
    val out = SparkEntry.queries("m_psi_drift")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val psi = r.getDouble(3)
      assert(psi >= 0.0, s"${r.getString(0)}: PSI $psi negative")
      assert(r.getBoolean(4) == (psi > 0.25))
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
  }

  test("m_benford flags the synthetic generator and re-derives exactly") {
    val out = SparkEntry.queries("m_benford")(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 9))
    val n = out.head.getLong(2)
    assert(out.map(_.getLong(1)).sum == n, "digit counts partition n")
    // χ² is one value repeated per row; the uniform fixture violates
    // Benford by orders of magnitude (critical value at α=0.05, 8 df,
    // is 15.51) — the detector must actually detect
    val chi2 = out.map(_.getDouble(4)).distinct
    assert(chi2.length == 1 && chi2.head > 15.51,
      s"fixture should violate Benford, chi2=${chi2.toSeq}")
    // exp_e4 re-derives from the row's own n and the Benford literal
    val p1 = 0.30102999566398120
    assert(out.head.getLong(3) == math.floor(n * p1 * 10000.0).toLong)
  }

  test("m_assoc_rules: symmetric lift, conf/lift re-derive from supports") {
    // sf0.001 has too few users to clear the support floor; use sf0.01
    val out = SparkEntry.queries("m_assoc_rules")(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))
      .toMap
    assert(out.nonEmpty)
    for (((ante, cons), (sxy, sx, sy, n, confBp, liftE4)) <- out) {
      assert(confBp == math.floor(sxy * 10000.0 / sx).toLong,
        s"$ante->$cons confidence")
      assert(liftE4 == math.floor(sxy * n * 10000.0 / (sx * sy)).toLong,
        s"$ante->$cons lift")
      assert(sxy <= sx && sxy <= sy && sx <= n && sy <= n,
        s"$ante->$cons support sanity")
      // lift is symmetric; the mirrored rule (same unordered pair seen
      // from the other side) must agree when it cleared the floor too
      out.get((cons, ante)).foreach { case (sxy2, sx2, sy2, _, _, lift2) =>
        assert(sxy2 == sxy && sx2 == sy && sy2 == sx)
        assert(lift2 == liftE4, s"lift asymmetry $ante<->$cons")
      }
    }
  }
}
