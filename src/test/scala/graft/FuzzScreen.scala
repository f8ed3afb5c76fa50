package graft

import graft.ops.Fuzz
import org.apache.spark.sql.SparkSession

/** Screening harness for driver-facing fuzz seeds: dumps each candidate
  * seed's Spark result and generated DuckDB SQL in the Verify layout so
  * compare.py can adjudicate them. Seeds that pass here (and at both
  * gate scales) are pinned as z_fuzz_* in SparkEntry.
  *
  * Usage: Test/runMain graft.FuzzScreen <sfDir> <outDir> <from> <to>
  */
object FuzzScreen {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, from, to) = args.take(4)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sqls = Seq.newBuilder[(String, String)]
    (from.toInt to to.toInt).foreach { seed =>
      val plan = Fuzz.gen(seed.toLong)
      val name = f"z_fuzz_$seed%03d"
      try {
        val df = Fuzz.toDF(spark, sfDir, plan)
        val n = df.count()
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        sqls += name -> Fuzz.toSql(plan)
        System.err.println(s"[fuzzscreen] $name rows=$n")
      } catch {
        case e: Exception =>
          System.err.println(
            s"[fuzzscreen] $name SPARK-FAIL ${e.getMessage.take(120)}")
      }
    }
    val json = sqls.result().map { case (n, q) =>
      s""""$n": ${ujsonStr(q)}"""
    }.mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }

  private def ujsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c    => c.toString
    } + "\""
}
