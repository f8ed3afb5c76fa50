package graft

/** m_entity_resolution vs an ALL-PAIRS brute force (no blocking) at
  * sf0.001 — proves the deletion-neighborhood blocking loses nothing:
  * the accept threshold (8) is unreachable without the name-agreement
  * points (max 5 without), name agreement means Levenshtein ≤ 1, and
  * FastSS deletion neighborhoods have exact recall at distance 1, so
  * the blocked pipeline must reproduce the unblocked edge set — and
  * therefore the same clusters — exactly.
  *
  * The dirtying rules are REIMPLEMENTED here with independent literals
  * (not shared vals) so a constant drift in the main source is a test
  * failure, not a silently co-moving pair.
  */
class EntityResolutionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private case class Rec(id: Long, name: String, nation: Int,
                         bal: Double, seg: String)

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteRecords(): Seq[Rec] = {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getDouble(3), r.getString(4)))
    val base = cust.map { case (k, n, na, b, sg) =>
      Rec(k * 2, n, na, b, sg)
    }
    val dups = cust.filter(_._1 % 3 == 1).map { case (k, n, na, b, sg) =>
      val p = (10 + k % 8).toInt // 0-based typo index, inside the digits
      val nd = ((n(p) - '0') + 1) % 10
      Rec(k * 2 + 1,
        n.substring(0, p) + ('0' + nd).toChar + n.substring(p + 1),
        na,
        b + (k % 19 - 9) * 0.01,
        if (k % 9 == 1) "UNKNOWN" else sg)
    }
    (base ++ dups).toSeq
  }

  private def bruteClusters(recs: Seq[Rec]): Map[Long, Long] = {
    // union-find over ALL pairs scoring >= 8 — no blocking anywhere
    val parent = scala.collection.mutable.Map(
      recs.map(r => r.id -> r.id): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- recs.indices; j <- (i + 1) until recs.size) {
      val (x, y) = (recs(i), recs(j))
      val score =
        (if (lev(x.name, y.name) <= 1) 4 else 0) +
          (if (x.nation == y.nation) 2 else 0) +
          (if (x.seg == y.seg) 1 else 0) +
          (if (math.abs(x.bal - y.bal) <= 0.15) 2 else 0)
      if (score >= 8) {
        val (rx, ry) = (find(x.id), find(y.id))
        if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
      }
    }
    recs.map(r => r.id -> find(r.id)).toMap
  }

  test("pipeline matches the all-pairs brute force at sf0.001") {
    val recs = bruteRecords()
    val want = bruteClusters(recs)
    val got = SparkEntry.queries("m_entity_resolution")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(got.length == recs.size)
    val wantSizes = want.values.groupBy(identity).map {
      case (l, vs) => l -> vs.size
    }
    got.foreach { case (id, cl, n, canon) =>
      assert(want(id) == cl, s"rec $id: cluster $cl, want ${want(id)}")
      assert(wantSizes(cl) == n, s"cluster $cl size $n != ${wantSizes(cl)}")
      assert((canon == 1) == (id == cl), s"rec $id canonical flag $canon")
    }
  }

  test("every duplicate is re-united with its base record") {
    val recs = bruteRecords()
    val want = bruteClusters(recs)
    recs.filter(_.id % 2 == 1).foreach { dup =>
      assert(want(dup.id) == want(dup.id - 1),
        s"dup ${dup.id} not linked to base ${dup.id - 1}")
    }
  }

  test("accepted pairs always carry name agreement (blocking is lossless)") {
    val recs = bruteRecords()
    for (i <- recs.indices; j <- (i + 1) until recs.size) {
      val (x, y) = (recs(i), recs(j))
      val noName = (if (x.nation == y.nation) 2 else 0) +
        (if (x.seg == y.seg) 1 else 0) +
        (if (math.abs(x.bal - y.bal) <= 0.15) 2 else 0)
      assert(noName < 8)
      // and the name points require lev <= 1, the deletion-recall class
    }
  }
}
