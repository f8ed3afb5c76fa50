package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Child half of the cross-PROCESS artifact-catalog race
  * ([[LandRaceSpec]]): a second JVM contending with the test JVM on
  * the same landing locations through [[Tables.landedDirWith]]. Both
  * processes run [[loop]]; a filesystem barrier lines them up per
  * iteration so every iteration is a genuine two-JVM race on a fresh
  * landing. Each build appends one line to a shared log (O_APPEND —
  * atomic for short writes), so the spec can count builds per
  * iteration; each process then READS the landing back, so a corrupt
  * publish (e.g. the nested-rename failure mode the fenced publish
  * guards) fails loudly in whichever process hits it.
  */
object LandRaceChild {

  def loop(s: SparkSession, baseDir: String, barrierDir: String,
           logFile: String, runId: String, iters: Int, who: String): Unit = {
    val barrier = java.nio.file.Paths.get(barrierDir)
    java.nio.file.Files.createDirectories(barrier)
    val other = if (who == "parent") "child" else "parent"
    for (i <- 1 to iters) {
      java.nio.file.Files.write(barrier.resolve(s"${who}_$i"),
        Array.emptyByteArray)
      val peer = barrier.resolve(s"${other}_$i")
      val deadline = System.nanoTime + 240L * 1000000000L
      while (!java.nio.file.Files.exists(peer)) {
        if (System.nanoTime > deadline)
          sys.error(s"$who: peer never reached barrier $i")
        Thread.sleep(5)
      }
      val loc = Tables.landedDirWith(s, s"race_${runId}_$i", baseDir) {
        tmp =>
          java.nio.file.Files.write(java.nio.file.Paths.get(logFile),
            s"$who $i\n".getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.APPEND)
          Thread.sleep(100) // widen the build window the lock must cover
          s.range(5).withColumn("who", lit(who))
            .write.parquet(tmp + "/data")
      }
      val n = s.read.parquet(loc + "/data").count()
      require(n == 5, s"$who: landing $i read $n rows, expected 5")
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(warehouse, baseDir, barrierDir, logFile, runId, iters) = args
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try loop(s, baseDir, barrierDir, logFile, runId, iters.toInt, "child")
    finally s.stop()
    sys.exit(0) // don't let lingering non-daemon threads hang the race
  }
}
