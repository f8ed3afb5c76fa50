package graft

import graft.ops.Fuzz

/** Randomized differential plan fuzzing (VERDICT r7 item 5): for each
  * pinned seed, generate a random composition of the §2 relational
  * operators, execute it as a Spark DataFrame, and compare the full
  * result multiset bit-exactly against [[Fuzz.interp]] — an independent
  * collection interpreter that shares no Catalyst code. Failures report
  * the seed, the plan, and the equivalent DuckDB SQL for one-line repro.
  *
  * 500 seeds per CI pass (override with GRAFT_FUZZ_CASES); the same
  * generator also feeds the driver's DuckDB hash-differential through
  * the screened z_fuzz_* SparkEntry queries.
  */
class FuzzSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val base: Map[String, Seq[Fuzz.Row]] =
    Fuzz.tableSchemas.keys.map { t =>
      t -> Fuzz.toDF(spark, sf, Fuzz.Scan(t)).collect()
        .map(r => r.toSeq.toVector: Fuzz.Row).toSeq
    }.toMap

  private val cases =
    sys.env.get("GRAFT_FUZZ_CASES").map(_.toInt).getOrElse(500)

  test(s"$cases random plans match the reference interpreter bit-exactly") {
    val failures = Seq.newBuilder[String]
    var checked = 0
    var nonEmpty = 0
    (1 to cases).foreach { seed =>
      val plan = Fuzz.gen(seed.toLong)
      val want = Fuzz.canon(plan.schema, Fuzz.interp(plan, base))
      val got = Fuzz.canon(plan.schema,
        Fuzz.toDF(spark, sf, plan).collect()
          .map(r => r.toSeq.toVector: Fuzz.Row).toSeq)
      checked += 1
      if (want.nonEmpty) nonEmpty += 1
      if (got != want) {
        val diff =
          (got.diff(want).take(3).map("spark-only: " + _) ++
            want.diff(got).take(3).map("interp-only: " + _))
            .mkString("\n  ")
        failures += s"""seed=$seed rows(spark)=${got.size} rows(interp)=${want.size}
                       |  $diff
                       |  plan: $plan
                       |  sql:  ${Fuzz.toSql(plan)}""".stripMargin
      }
    }
    val fs = failures.result()
    info(s"checked $checked plans, $nonEmpty with non-empty results")
    assert(fs.isEmpty,
      s"${fs.size}/$checked fuzzed plans diverged:\n${fs.mkString("\n")}")
  }

  test("pipe-rendered linear plans match the reference interpreter") {
    // the |> surface is parser-level: every linear chain the generator
    // emits must produce the SAME multiset through spark.sql(pipe) as
    // through the DataFrame rendering and the interpreter
    Fuzz.pipeViews(spark, sf)
    val failures = Seq.newBuilder[String]
    var rendered = 0
    var nonEmpty = 0
    (1 to cases).foreach { seed =>
      val plan = Fuzz.gen(seed.toLong)
      Fuzz.toPipe(plan).foreach { pipe =>
        rendered += 1
        val want = Fuzz.canon(plan.schema, Fuzz.interp(plan, base))
        val got = Fuzz.canon(plan.schema,
          spark.sql(pipe).collect()
            .map(r => r.toSeq.toVector: Fuzz.Row).toSeq)
        if (want.nonEmpty) nonEmpty += 1
        if (got != want) {
          val diff =
            (got.diff(want).take(3).map("spark-only: " + _) ++
              want.diff(got).take(3).map("interp-only: " + _))
              .mkString("\n  ")
          failures += s"""seed=$seed rows(spark)=${got.size} rows(interp)=${want.size}
                         |  $diff
                         |  pipe:
                         |${pipe}""".stripMargin
        }
      }
    }
    val fs = failures.result()
    info(s"$rendered/$cases plans pipe-renderable, $nonEmpty non-empty")
    assert(rendered >= cases / 20,
      s"pipe coverage too thin: $rendered/$cases linear chains")
    assert(fs.isEmpty,
      s"${fs.size}/$rendered pipe plans diverged:\n${fs.mkString("\n")}")
  }

  test("EXECUTE IMMEDIATE wrapped plans match the reference interpreter") {
    // the dynamic-SQL session surface (VERDICT r10 item 4): the same
    // linear chains, rendered as nested Spark SQL with the scan bound
    // lifted into a :bnd named parameter, run through
    // EXECUTE IMMEDIATE ... USING — parse-from-string + parameter
    // binding must be invisible to results. Failures report the seed
    // and the exact statement for one-line repro.
    Fuzz.pipeViews(spark, sf)
    val failures = Seq.newBuilder[String]
    var rendered = 0
    var nonEmpty = 0
    (1 to cases).foreach { seed =>
      val plan = Fuzz.gen(seed.toLong)
      Fuzz.toExecImmediate(plan).foreach { case (text, bnd) =>
        rendered += 1
        val esc = text.replace("'", "''")
        val stmt = bnd match {
          case Some(b) => s"EXECUTE IMMEDIATE '$esc' USING ${b}L AS bnd"
          case None    => s"EXECUTE IMMEDIATE '$esc'"
        }
        val want = Fuzz.canon(plan.schema, Fuzz.interp(plan, base))
        val got = Fuzz.canon(plan.schema,
          spark.sql(stmt).collect()
            .map(r => r.toSeq.toVector: Fuzz.Row).toSeq)
        if (want.nonEmpty) nonEmpty += 1
        if (got != want) {
          val diff =
            (got.diff(want).take(3).map("spark-only: " + _) ++
              want.diff(got).take(3).map("interp-only: " + _))
              .mkString("\n  ")
          failures += s"""seed=$seed rows(spark)=${got.size} rows(interp)=${want.size}
                         |  $diff
                         |  stmt:
                         |$stmt""".stripMargin
        }
      }
    }
    val fs = failures.result()
    info(s"$rendered/$cases plans exec-immediate-renderable, " +
      s"$nonEmpty non-empty")
    assert(rendered >= cases / 20,
      s"exec-immediate coverage too thin: $rendered/$cases")
    assert(fs.isEmpty,
      s"${fs.size}/$rendered wrapped plans diverged:\n${fs.mkString("\n")}")
  }
}
