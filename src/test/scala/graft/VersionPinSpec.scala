package graft

/** The Spark-version compatibility contract (VERDICT r11 item 7):
  * NOTES.md records the exact validated build and the
  * version-sensitive behaviors the board's hashes depend on; this
  * spec makes a drift fail loudly at suite start instead of
  * hash-diverging mid-board.
  */
class VersionPinSpec extends SparkSpec {

  test("session runs the pinned Spark line") {
    VersionPin.assertCompat(spark)
    assert(spark.version.startsWith(VersionPin.pinnedLine + "."),
      s"Spark ${spark.version} is not on the pinned " +
        s"${VersionPin.pinnedLine}.x line")
  }

  test("pinned behavior: localCheckpoint FORGETS hash partitioning " +
    "(why Graph.cachedBySrc persists instead)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 64L).toDF("src").repartition(4, col("src"))
    def outPart(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.executedPlan.outputPartitioning
    // the persisted frame keeps HashPartitioning through
    // InMemoryRelation; the localCheckpoint'd one degrades to an
    // opaque LogicalRDD partitioning. If a future Spark build starts
    // PRESERVING it, cachedBySrc's persist() becomes a choice rather
    // than a necessity — this test failing is the signal to revisit.
    val cp = df.localCheckpoint()
    val kept = outPart(cp).toString.contains("hashpartitioning")
    cp.unpersist()
    assert(!kept,
      "this Spark build preserves hash partitioning through " +
        "localCheckpoint — revisit Graph.cachedBySrc (see NOTES.md " +
        "compatibility contract)")
  }
}
