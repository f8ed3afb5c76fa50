package graft

import graft.ops.Ingest
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties (SURVEY §5): TSV round-trip and dedup
  * idempotence, driven through the real Spark operators. Runs the
  * checker manually (scalatest+scalacheck bridge isn't a dependency)
  * with few-but-large cases — each case is a Spark job.
  */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop, cases: Int = 5): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  private val fieldGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8))

  private case class Rec(id: String, uploader: String, age: Long,
    cat: String, len: Long, views: Long, rating: Double, nr: Long,
    nc: Long, related: List[String])

  private val recGen: Gen[Rec] = for {
    id <- fieldGen; up <- fieldGen; cat <- fieldGen
    age <- Gen.chooseNum(0L, 5000L); len <- Gen.chooseNum(1L, 10000L)
    views <- Gen.chooseNum(0L, 10000000L)
    rating <- Gen.chooseNum(0, 50).map(_ / 10.0)
    nr <- Gen.chooseNum(0L, 99999L); nc <- Gen.chooseNum(0L, 99999L)
    nRel <- Gen.chooseNum(0, 4)
    rel <- Gen.listOfN(nRel, fieldGen)
  } yield Rec(id, up, age, cat, len, views, rating, nr, nc, rel)

  test("TSV round-trip: record -> line -> parse recovers every field") {
    val s = spark
    import s.implicits._
    val prop = Prop.forAll(Gen.nonEmptyListOf(recGen).map(_.take(20))) {
      recs =>
        val lines = recs.map { r =>
          (("d1"), (Seq(r.id, r.uploader, r.age, r.cat, r.len, r.views,
            r.rating, r.nr, r.nc).map(_.toString) ++ r.related)
            .mkString("\t"))
        }.toDF("dirname", "line")
        val parsed = Ingest.parse(lines).collect()
        parsed.length == recs.length && parsed.zip(recs).forall {
          case (row, r) =>
            row.getAs[String]("id") == r.id &&
            row.getAs[Long]("age_days") == r.age &&
            row.getAs[Long]("views") == r.views &&
            row.getAs[Double]("rating") == r.rating &&
            row.getSeq[String](row.fieldIndex("related_ids")).toList ==
              r.related
        }
    }
    check(prop)
  }

  test("first-wins dedup is idempotent and keeps one row per key") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val pairGen = Gen.nonEmptyListOf(for {
      k <- Gen.chooseNum(0, 5); v <- Gen.chooseNum(0, 100)
    } yield (k.toLong, v.toLong)).map(_.take(50))
    val prop = Prop.forAll(pairGen) { pairs =>
      val df = pairs.toDF("k", "v")
      def dedup(d: org.apache.spark.sql.DataFrame) = {
        val w = Window.partitionBy(col("k")).orderBy(col("v"))
        d.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
      }
      val once = dedup(df)
      val twice = dedup(once)
      val got = once.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = pairs.groupBy(_._1).map { case (k, vs) =>
        (k, vs.map(_._2).min)
      }.toSet
      got == want &&
        twice.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == want
    }
    check(prop)
  }

  test("PNG codec round-trip recovers dimensions and pixel checksum") {
    val s = spark
    import s.implicits._
    // arbitrary printable-ASCII documents, not just the fixture's —
    // the decode stage must recover exactly what the contract says the
    // encoder rendered (width n%64+1, height n%48+1, pixels = cycled
    // code points) from genuinely compressed PNG bytes
    val textGen = Gen.chooseNum(0, 600).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toChar)).map(_.mkString))
    val prop = Prop.forAll(Gen.nonEmptyListOf(textGen).map(_.take(16))) {
      texts =>
        val docs = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val got = graft.ops.Multimodal.decodePartitions(
            graft.ops.Multimodal.encodePartitions(docs))
          .collect().map(r => (r.getLong(0),
            (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
        texts.zipWithIndex.forall { case (t, i) =>
          val n = t.length
          val (w, h) = (n % 64 + 1, n % 48 + 1)
          // empty text renders as one black pixel
          val sum = if (n == 0) 0L
            else (0 until w * h).map(p => t(p % n).toLong).sum
          got(i.toLong) == ((w, h, w * h, sum % 1000003L))
        }
    }
    check(prop)
  }
}
