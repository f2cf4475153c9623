package graft.api

import graft.meta.InodeCatalog
import graft.sources.KvStore
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The user-facing engine facade — what a user of the reference would
  * switch to. One object exposes fairy's three surfaces (SURVEY §3):
  *
  *  - the KV data plane (`get`/`put`/`putChunked`/`scanPrefix`/`compact`,
  *    mirroring GET /get/{id} and PUT /put/{id},
  *    /root/reference/common/src/h2/h2_service.rs:57-123);
  *  - the POSIX metadata plane (`fs`: lookup/readdir/rename/xattr…,
  *    mirroring the FUSE impls under /root/reference/fuse/src/);
  *  - the analytics plane (`query`/`sql`: the declared operator registry
  *    plus free-form SQL with graft's functions and optimizer rule
  *    registered).
  *
  * The reference's etcd service registry (worker/src/service_registry/
  * etcd.rs) has no analog here by design: Spark's cluster manager owns
  * membership (SURVEY §1.1 "Service list").
  */
class GraftEngine(
    val spark: SparkSession,
    storeRoot: String,
    numBuckets: Int = 1024) {

  /** Config-driven construction: the KV plane takes its root and bucket
    * count from [[graft.config.LocalKvOptions]] (the FromConfig surface),
    * so defaults live in ONE place instead of drifting per call site. */
  def this(spark: SparkSession, options: graft.config.LocalKvOptions) =
    this(spark, options.rootPath, options.numBucket)

  graft.plans.GraftExtensions.register(spark)

  /** Hash-bucketed KV object store (the data plane). */
  val kv: KvStore = new KvStore(spark, storeRoot, numBuckets)

  /** Mutable handle on the metadata catalog (the FUSE-semantics plane).
    * Ops are snapshot-in/snapshot-out; this handle just tracks the
    * latest snapshot the way the reference's worker owns its inode maps. */
  @volatile private var catalog: InodeCatalog = InodeCatalog.empty(spark)
  def fs: InodeCatalog = catalog
  def updateFs(f: InodeCatalog => InodeCatalog): InodeCatalog = {
    catalog = f(catalog)
    // the mutation is opaque here, so drop every cached listing — the
    // reference patches its ls_cache in place on create because the FUSE
    // loop knows exactly which directory changed (uring_fs/mod.rs:195-200)
    lsCache.invalidateAll()
    catalog
  }

  /** TTL'd readdir cache over the metadata plane (list_cache.rs analog);
    * 30 s mirrors the FUSE attr-timeout order of magnitude. */
  val lsCache = new graft.meta.ListingCache(ttlMillis = 30000L)
  def readdirCached(parent: Long, offset: Int = 0,
      limit: Int = Int.MaxValue): Seq[org.apache.spark.sql.Row] =
    lsCache.readdir(catalog, parent, offset, limit)

  /** Run a declared operator from the registry against a data dir. */
  def query(name: String, sfDir: String): DataFrame =
    graft.SparkEntry.queries
      .getOrElse(name, sys.error(s"unknown query '$name'; known: ${
          graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      .apply(spark, sfDir)

  /** Free-form SQL with graft functions (vec_dot, hist_buckets) and the
    * hash-rewrite optimizer rule active. */
  def sql(text: String): DataFrame = spark.sql(text)

  /** Corpus-curation plane: column-parameterized sampling / dedup /
    * quality operators over the USER's own DataFrames (the library form
    * of the oracle-gated q_sample_* / q_dedup_groups / q_text_* queries).
    */
  val corpus: graft.operators.CorpusOps.type = graft.operators.CorpusOps
}
