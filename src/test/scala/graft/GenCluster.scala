package graft

import org.apache.spark.sql.SparkSession

/** Deterministic mixture-of-Gaussians embedding fixture —
  * scaledata/clustered/embeddings.parquet.
  *
  * The driver's embedding fixtures are UNIFORM random vectors: the
  * structural worst case for IVF-family indexes, where visited-cell
  * recall is capped at 0.467 (nprobe=3) no matter how good the ADC is
  * (PqRecallSpec). Production embeddings are CLUSTERED — that is the
  * regime inverted-list pruning exists for — so the honest recall
  * measurement needs a clustered fixture: 2000 vectors in 64 dims,
  * 12 Gaussian clusters with unit-norm random-direction centers
  * (near-orthogonal in 64-d, so clusters are separated in the cosine
  * metric the coarse quantizer assigns by) and per-coordinate noise
  * σ=0.05 (noise norm ≈ 0.4 ≪ inter-center angle). Cluster membership
  * and coordinates both derive from fixed-seed java.util.Random
  * streams keyed by cluster / vec_id, so regeneration is bit-identical.
  * Schema matches the driver fixture (vec_id int64, embedding
  * list<float>, label int32 = cluster), so every existing embedding
  * reader works unchanged. Used by IvfPqClusteredRecallSpec's
  * nprobe=2 recall pin; uniform-fixture pins are unchanged.
  */
object GenCluster {
  val dir = "/root/repo/scaledata/clustered"

  val nVecs = 2000
  val dims = 64
  val nClusters = 12

  /** Generate (idempotent): returns the fixture dir, building it on
    * first use. Deterministic, so a stale half-written dir is repaired
    * by the _SUCCESS check. */
  def ensure(s: SparkSession): String = {
    val success = new java.io.File(s"$dir/embeddings.parquet/_SUCCESS")
    if (!success.exists()) {
      val centers = Array.tabulate(nClusters) { c =>
        val rng = new java.util.Random(9000L + c)
        val v = Array.fill(dims)(rng.nextGaussian())
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(x => x / n)
      }
      val rows = (0 until nVecs).map { id =>
        val rng = new java.util.Random(7700000L + id)
        val c = rng.nextInt(nClusters)
        val e = centers(c).map(x =>
          (x + 0.05 * rng.nextGaussian()).toFloat)
        (id.toLong, e.toSeq, c)
      }
      import s.implicits._
      s.createDataset(rows).toDF("vec_id", "embedding", "label")
        .repartition(4)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    dir
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    println(s"[gencluster] landed: ${ensure(s)}")
    s.stop()
  }
}
