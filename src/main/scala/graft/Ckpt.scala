package graft

import org.apache.spark.sql.Dataset

/** The single lineage-truncation point for every iterative loop (SCC,
  * WCC, k-core, k-truss, LPA, PageRank, FPS, incremental dedup, BPE
  * rounds, …).
  *
  * Default: `localCheckpoint()` — blocks live in EXECUTOR storage
  * memory, truncation is free of any filesystem round-trip, and at
  * `local[32]` (one JVM) an "executor loss" cannot happen, so this is
  * the right local-mode trade.
  *
  * Cluster mode: executor-stored blocks die with the executor AND the
  * lineage is gone, so one lost executor kills a multi-hour loop
  * unrecoverably. Setting `SPARK_GRAFT_RELIABLE_CKPT=<dir>` (env) or
  * `graft.reliable.ckpt` (system property, checked first so tests can
  * flip it per-JVM) routes every loop's truncation through RELIABLE
  * `checkpoint()` into that directory (HDFS/S3 on a real cluster):
  * recomputation after executor loss re-reads the checkpoint files
  * instead of dying. The knob is one switch for all ~80 sites because
  * the correct choice is a property of the DEPLOYMENT, not of any one
  * operator; results are bit-identical either way (ReliableCkptSpec
  * pins `k1_scc`/`k9_wcc` equality, and the A/B cost is recorded in
  * PERF.md round-11).
  *
  * Both paths stay EAGER (the Spark default): every loop here counts
  * or reuses the staged frame immediately, and eager truncation is
  * what bounds the lineage before the next round builds on it.
  *
  * RETENTION (cluster deployments): under the reliable knob every
  * loop iteration across ~80 call sites writes a permanent checkpoint
  * directory, and Spark deletes none of them by default
  * (`spark.cleaner.referenceTracking.cleanCheckpoints` is false) — a
  * long multi-loop run accumulates unbounded HDFS/S3 data. Set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` AT
  * SESSION BUILD TIME (ContextCleaner reads it once at SparkContext
  * startup — setting it later is a no-op, which is why this object
  * cannot set it for you) so the cleaner removes checkpoint data once
  * its RDD is GC'd — recovery only needs checkpoints whose RDDs are
  * still reachable — or sweep the configured directory between
  * applications. `tools/recovery_drill.sh` passes it in its
  * spark-submit conf as the reference shape for cluster deployments.
  */
object Ckpt {
  private val propKey = "graft.reliable.ckpt"
  private val envKey = "SPARK_GRAFT_RELIABLE_CKPT"

  /** Reliable-checkpoint directory, if the knob is set. */
  private[graft] def reliableDir: Option[String] =
    sys.props.get(propKey).orElse(sys.env.get(envKey)).filter(_.nonEmpty)

  /** Truncate `ds`'s lineage at the deployment-appropriate durability:
    * local blocks by default, reliable files under the configured
    * directory when the knob is set.
    */
  def stage[T](ds: Dataset[T]): Dataset[T] = reliableDir match {
    case Some(dir) =>
      val sc = ds.sparkSession.sparkContext
      // setCheckpointDir creates a fresh UUID subdir on every call —
      // only (re)set it when the PARENT of the resolved checkpoint
      // dir differs from the configured value (path-normalized
      // equality, not substring containment: `/ckpt/a` → `/ckpt`
      // or sibling dirs where one name prefixes the other must not
      // be treated as "already set" — r11 ADVICE).
      val current = sc.getCheckpointDir
        .map(p => new org.apache.hadoop.fs.Path(p))
      val want = new org.apache.hadoop.fs.Path(dir)
      val matches = current.exists { p =>
        Option(p.getParent).exists { parent =>
          // URI-component comparison so `/x/./y`, trailing slashes,
          // and scheme-less forms normalize identically. When the
          // knob value CARRIES a scheme/authority, both must match
          // the resolved parent's — `/data/ckpt` (local) vs
          // `hdfs://nn/data/ckpt` share a path but are different
          // filesystems, and treating them as equal would keep
          // "reliable" checkpoints on the node-local disk the knob
          // was switched to escape.
          val (pu, wu) = (parent.toUri, want.toUri)
          pu.getPath == wu.getPath &&
            (wu.getScheme == null || wu.getScheme == pu.getScheme) &&
            (wu.getAuthority == null ||
              wu.getAuthority == pu.getAuthority)
        }
      }
      if (!matches) sc.setCheckpointDir(dir)
      ds.checkpoint()
    case None => ds.localCheckpoint()
  }

  /** Postfix form so call sites read like the `Dataset` API:
    * `df.stageCkpt()` — localCheckpoint by default, reliable under the
    * knob. Import `graft.Ckpt.StageOps`.
    */
  implicit class StageOps[T](private val ds: Dataset[T]) extends AnyVal {
    def stageCkpt(): Dataset[T] = stage(ds)
  }
}
