package graft

import org.apache.spark.sql.functions._

/** Toy-graph pins for the degree-oriented 4-clique enumeration
  * (k26_clique4): known clique structure on hand-checkable graphs,
  * including a mid-(deg,id)-order hub — the case where naive
  * id-oriented enumeration centres the work on the hub and the degree
  * orientation must still count every clique exactly once.
  */
class Clique4Spec extends SparkSpec {

  private def counts(pairs: (Int, Int)*): Map[Int, Long] = {
    val s = spark
    import s.implicits._
    graft.ops.Graph.clique4Counts(pairs.toDF("src", "dst"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  private def kN(n: Int, vs: Seq[Int]): Seq[(Int, Int)] =
    for { i <- vs.indices; j <- vs.indices if i < j } yield (vs(i), vs(j))

  test("K5: every vertex sits in C(4,3)=4 of the 5 4-cliques") {
    assert(counts(kN(5, 1 to 5): _*) == (1 to 5).map(_ -> 4L).toMap)
  }

  test("K4 plus pendant tail: only the K4 counts, once") {
    val g = kN(4, 1 to 4) ++ Seq((4, 5), (5, 6))
    assert(counts(g: _*) == (1 to 4).map(_ -> 1L).toMap)
  }

  test("triangle-free and sub-4-clique graphs emit nothing") {
    assert(counts((1, 2), (2, 3), (3, 4), (4, 1)) == Map.empty)
    // a triangle has no 4-clique either
    assert(counts((1, 2), (2, 3), (1, 3)) == Map.empty)
  }

  test("two K4s sharing one triangle, hub-ordered mid-range") {
    // vertices {1,2,3,50} and {1,2,3,99}: vertex 3... shared triangle
    // (1,2,3); 50 and 99 are NOT adjacent, so exactly two 4-cliques.
    // Vertices 1,2,3 carry MAX degree (4) with mid/low ids; the
    // duplicate-free double count is the regression the ordered
    // z-extension must get right.
    val g = kN(4, Seq(1, 2, 3, 50)) ++ kN(4, Seq(1, 2, 3, 99))
    assert(counts(g.distinct: _*) ==
      Map(1 -> 2L, 2 -> 2L, 3 -> 2L, 50 -> 1L, 99 -> 1L))
  }

  test("fixture query is NON-VACUOUS and keeps the top-20 contract") {
    val rows = SparkEntry.queries("k26_clique4")(
      spark, "/root/testdata/sf0.001").collect()
    // the co-purchase projection guarantees clique structure (every
    // multi-part basket is one) — an empty result would mean the
    // query degenerated back to the near-bipartite raw graph
    assert(rows.nonEmpty && rows.length <= 20)
    val pairs = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(pairs.forall(_._1 > 0))
    assert(pairs.sameElements(pairs.sortBy(p => (-p._1, p._2))))
  }
}
