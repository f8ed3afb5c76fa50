package graft

import graft.ops.Ingest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2 L2/L3/A7 — the reference's post-load validation surface
  * (`validate_data.py`), minus its L3 bug (it checks flat field names
  * that never exist in the nested documents; we assert the REAL nested
  * schema instead, per SURVEY §7.4 item 5).
  */
class ValidationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("L2: row-count reconciliation — parsed + rejects == raw lines") {
    val lines = Ingest.tsvLines(spark, sf)
    val raw = lines.count()
    val parsed = Ingest.parse(lines).count()
    val rejects = Ingest.rejects(lines).count()
    assert(parsed + rejects == raw)
    assert(rejects > 0) // the synthesis plants rejects; they must surface
  }

  test("L3: nested document schema matches the canonical videos shape " +
    "and required fields are non-null") {
    val nested = Ingest.toNested(Ingest.parse(Ingest.tsvLines(spark, sf)))
    val expected = StructType(Seq(
      StructField("id", StringType, true),
      StructField("video_desc", StructType(Seq(
        StructField("uploader", StringType, true),
        StructField("age_days", LongType, true),
        StructField("category", StringType, true))), false),
      StructField("video_attri", StructType(Seq(
        StructField("length", LongType, true),
        StructField("rating", DoubleType, true))), false),
      StructField("video_engagement", StructType(Seq(
        StructField("views", LongType, true),
        StructField("num_ratings", LongType, true),
        StructField("num_comments", LongType, true))), false),
      StructField("related_ids", ArrayType(StringType, false), false),
      StructField("upload_date", DateType, true)))
    assert(nested.schema == expected)
    val nulls = nested.filter(col("id").isNull ||
      col("video_desc.uploader").isNull ||
      col("video_engagement.views").isNull).count()
    assert(nulls == 0)
  }

  test("A7: result read-back — a written result round-trips") {
    val out = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "readback_").toString
    val res = SparkEntry.queries("f1_groupby_agg")(spark, sf)
    res.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == res.count())
    assert(back.columns.sorted.sameElements(res.columns.sorted))
  }
}
