package graft

/** Cross-PROCESS artifact-catalog race: the in-process StorageSpec pins
  * (stale-lock break, single-winner swap, manifest reuse) cover one
  * JVM, but production is separate JVMs racing to land the same
  * artifact through `.build_lock` + `_GRAFT_MANIFEST`. This spec
  * spawns a REAL second JVM (same classpath, its own SparkSession on
  * the same warehouse) and races it against the test JVM on 20 fresh
  * landings, rendezvousing per iteration through a filesystem barrier.
  *
  * Proven per iteration: exactly ONE process ran the build (the shared
  * build log has one line), and BOTH processes read the published
  * landing back intact (asserted inside [[LandRaceChild.loop]] — a
  * half-published or nested tree fails the read in whichever process
  * sees it). That is the catalog's contract: one build, no sticky
  * corruption, the loser reusing the winner's manifest.
  */
class LandRaceSpec extends SparkSpec {

  test("two JVMs racing on one landing: one build, both read it back") {
    val runId = java.lang.Long.toHexString(System.nanoTime)
    val tmp = java.nio.file.Files.createTempDirectory("landrace")
    val barrier = tmp.resolve("barrier").toString
    val log = tmp.resolve("builds.log").toString
    val childOut = tmp.resolve("child.out").toFile
    val iters = 20
    val base = "/root/testdata/sf0.001"
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")

    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g", "-cp",
      System.getProperty("java.class.path"), "graft.LandRaceChild",
      warehouse, base, barrier, log, runId, iters.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(childOut)
    val child = pb.start()

    try {
      LandRaceChild.loop(spark, base, barrier, log, runId, iters, "parent")
      assert(child.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
        "child JVM did not finish")
      assert(child.exitValue == 0, {
        val out = new String(java.nio.file.Files.readAllBytes(
          childOut.toPath), "UTF-8").takeRight(2000)
        s"child JVM failed (exit ${child.exitValue}):\n$out"
      })
    } finally if (child.isAlive) child.destroyForcibly()

    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(log)), "UTF-8").linesIterator.toSeq
    for (i <- 1 to iters) {
      val builds = lines.count(_.split(" ")(1) == i.toString)
      assert(builds == 1,
        s"iteration $i: expected exactly 1 build, saw $builds " +
          s"(${lines.filter(_.endsWith(s" $i")).mkString(", ")})")
    }
    // both sides won some races — otherwise the barrier isn't racing
    val whoBuilt = lines.map(_.split(" ")(0)).toSet
    info(s"builders seen across $iters iterations: $whoBuilt")
  }
}
