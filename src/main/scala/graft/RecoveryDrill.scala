package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession

/** Executor-loss recovery drill (VERDICT r11 item 3): runs one
  * iterative graph query on a MULTI-PROCESS cluster — by default
  * Spark's `local-cluster[2,8,6144]` master, which launches two real
  * standalone Worker/Executor JVMs, the same process topology as the
  * reference's docker-compose deployment — and writes the result's
  * canonical hash + timing to a JSON file.
  *
  * `tools/recovery_drill.sh` orchestrates the A/B the spec suite
  * cannot (at `local[32]` an executor loss is impossible by
  * construction):
  *
  *   1. baseline leg — reliable checkpointing on, no interference;
  *   2. kill leg — reliable checkpointing on, one executor JVM
  *      `kill -9`'d mid-loop (after the first checkpoint lands);
  *      the standalone Master relaunches the executor, lost shuffle /
  *      cached blocks recompute from the RELIABLE checkpoint files,
  *      and the run must complete with the SAME hash.
  *
  * Identical hashes across both legs converts ReliableCkptSpec's
  * bit-equality claim ("the knob routes and does not change results")
  * into a recovery claim ("the knob survives what it exists for").
  * The measured kill-leg overhead lands in PERF.md next to the +4.1%
  * steady-state cost of reliable checkpointing.
  */
object RecoveryDrill {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RecoveryDrill <sfDir> <outFile> [queryName]")
    val (sfDir, outFile) = (args(0), args(1))
    val qname = if (args.length > 2) args(2) else "k9_wcc"
    // spark-submit supplies the master (local-cluster[...] from the
    // drill script); default here only for ad-hoc runs
    val spark = SparkSession.builder()
      .appName(s"graft-recovery-drill-$qname")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    VersionPin.assertCompat(spark)
    val t0 = System.nanoTime()
    val rows = SparkEntry.queries(qname)(spark, sfDir).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    // canonical hash: sorted row renderings, engine-order independent
    val md = MessageDigest.getInstance("SHA-256")
    rows.map(_.toString).sorted.foreach { r =>
      md.update(r.getBytes(StandardCharsets.UTF_8)); md.update(0.toByte)
    }
    val hash = md.digest().map("%02x".format(_)).mkString
    val reliable = Ckpt.reliableDir.getOrElse("")
    val json =
      s"""{"query":"$qname","rows":${rows.length},"sec":$sec,""" +
        s""""hash":"$hash","master":"${spark.sparkContext.master}",""" +
        s""""reliable_ckpt_dir":"$reliable"}"""
    Files.write(Paths.get(outFile),
      (json + "\n").getBytes(StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
