package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.stableHash60
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-gated (oracle-checked) queries exercising the reference's
  * metadata/KV semantics over a filesystem DERIVED deterministically from
  * the `documents` table: root(ino 1) → one dir per `source`
  * (ino = 2 + srcnum) → one file per doc (ino = 100 + doc_id,
  * name = 'doc_<id>.txt', size = n_chars, mode/uid/gid derived from
  * doc_id). Both dialects derive the identical tree, so J1/J2/O2/P6/F2-F4
  * semantics are hash-checked end-to-end; the imperative engine API lives
  * in [[graft.meta.InodeCatalog]] with its own specs.
  */
object FsQueries {

  /** Shared Spark-side derivation of the inode table. */
  private def inodes(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val dirs = docs
      .select(substring($"source", 4, 10).cast("int").as("srcnum"), $"source")
      .distinct()
      .select(
        ($"srcnum" + 2).cast("long").as("ino"),
        lit(1L).as("parent"),
        $"source".as("name"),
        concat(lit("/"), $"source").as("full_path"),
        lit("dir").as("kind"),
        lit(0L).as("size"),
        lit(0x1ed).as("mode"), // 0755
        lit(0).as("uid"),
        lit(0).as("gid"))
    val files = docs.select(
      ($"doc_id" + 100).as("ino"),
      (substring($"source", 4, 10).cast("int") + 2).cast("long").as("parent"),
      concat(lit("doc_"), $"doc_id", lit(".txt")).as("name"),
      concat(lit("/"), $"source", lit("/doc_"), $"doc_id", lit(".txt"))
        .as("full_path"),
      lit("file").as("kind"),
      $"n_chars".as("size"),
      // mode: even docs 0644, odd docs 0600
      when($"doc_id" % 2 === 0, 0x1a4).otherwise(0x180).as("mode"),
      ($"doc_id" % 3).cast("int").as("uid"),
      ($"doc_id" % 2).cast("int").as("gid"))
    dirs.unionByName(files)
  }

  /** The same derivation in DuckDB SQL. */
  private val duckInodes =
    """(SELECT CAST(CAST(substr(source, 4, 10) AS INT) + 2 AS BIGINT) AS ino,
      |        CAST(1 AS BIGINT) AS parent, source AS name,
      |        '/' || source AS full_path, 'dir' AS kind,
      |        CAST(0 AS BIGINT) AS size, 493 AS mode, 0 AS uid, 0 AS gid
      | FROM (SELECT DISTINCT source FROM documents)
      | UNION ALL
      | SELECT doc_id + 100 AS ino,
      |        CAST(CAST(substr(source, 4, 10) AS INT) + 2 AS BIGINT) AS parent,
      |        'doc_' || doc_id || '.txt' AS name,
      |        '/' || source || '/doc_' || doc_id || '.txt' AS full_path,
      |        'file' AS kind, n_chars AS size,
      |        CASE WHEN doc_id % 2 = 0 THEN 420 ELSE 384 END AS mode,
      |        CAST(doc_id % 3 AS INT) AS uid, CAST(doc_id % 2 AS INT) AS gid
      | FROM documents)""".stripMargin

  /** J1: (parent, name) lookup — resolve every '/srcN/doc_*.txt' through
    * the two-step parent join exactly as the FUSE lookup does
    * (uring_fs/inode.rs:83-110), for a sample of names. */
  val qFsLookup = QueryDef.sql(
    "q_fs_lookup",
    s"""WITH ino AS $duckInodes
       |SELECT f.full_path, f.ino, f.size, p.name AS parent_name
       |FROM ino f JOIN ino p ON f.parent = p.ino
       |WHERE f.kind = 'file' AND f.ino % 37 = 0
       |ORDER BY f.full_path""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val ino = inodes(s, d)
    ino
      .as("f")
      .join(ino.as("p"), $"f.parent" === $"p.ino")
      .filter($"f.kind" === "file" && $"f.ino" % 37 === 0)
      .select($"f.full_path", $"f.ino", $"f.size", $"p.name".as("parent_name"))
      .orderBy($"full_path")
  }

  /** O1+O2: name-sorted readdir with offset pagination — page 2
    * (entries 6..10) of every directory (uring_fs/mod.rs:126-152). */
  val qFsReaddirPage = QueryDef.sql(
    "q_fs_readdir_page",
    s"""WITH ino AS $duckInodes,
       |listing AS (
       |  SELECT parent, name, ino, kind,
       |         CAST(row_number() OVER (PARTITION BY parent ORDER BY name) AS INT) AS off
       |  FROM ino)
       |SELECT parent, off, name, ino, kind
       |FROM listing
       |WHERE off > 5 AND off <= 10
       |ORDER BY parent, off""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val w = Window.partitionBy($"parent").orderBy($"name")
    inodes(s, d)
      .withColumn("off", row_number().over(w))
      .filter($"off" > 5 && $"off" <= 10)
      .select($"parent", $"off", $"name", $"ino", $"kind")
      .orderBy($"parent", $"off")
  }

  /** A5/A7/F9 rollup: per-directory entry count, total size, and block
    * accounting ((size+511)/512, filesystem.rs:221). */
  val qFsDu = QueryDef.sql(
    "q_fs_du",
    s"""WITH ino AS $duckInodes
       |SELECT p.name AS dir_name,
       |       count(*) AS n_entries,
       |       CAST(sum(f.size) AS BIGINT) AS total_size,
       |       CAST(sum((f.size + 511) // 512) AS BIGINT) AS total_blocks
       |FROM ino f JOIN ino p ON f.parent = p.ino
       |WHERE f.kind = 'file'
       |GROUP BY p.name
       |ORDER BY dir_name""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val ino = inodes(s, d)
    ino
      .as("f")
      .join(ino.as("p"), $"f.parent" === $"p.ino")
      .filter($"f.kind" === "file")
      .groupBy($"p.name".as("dir_name"))
      .agg(
        count(lit(1)).as("n_entries"),
        sum($"f.size").as("total_size"),
        sum(floor(($"f.size" + 511) / 512)).as("total_blocks"))
      .orderBy($"dir_name")
  }

  /** P6: POSIX access-bit filter — which files can (uid=1, gid=1) read?
    * Owner bits >> 6, group bits >> 3, other bits >> 0, mask 4
    * (filesystem.rs:1870-1904). */
  val qFsAccess = QueryDef.sql(
    "q_fs_access",
    s"""WITH ino AS $duckInodes
       |SELECT ino, full_path,
       |       CASE WHEN uid = 1 THEN (mode // 64) % 8
       |            WHEN gid = 1 THEN (mode // 8) % 8
       |            ELSE mode % 8 END AS eff_bits
       |FROM ino
       |WHERE kind = 'file'
       |  AND (CASE WHEN uid = 1 THEN (mode // 64) % 8
       |            WHEN gid = 1 THEN (mode // 8) % 8
       |            ELSE mode % 8 END & 4) = 4
       |ORDER BY ino""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val effBits = when($"uid" === 1, expr("(mode div 64) % 8"))
      .when($"gid" === 1, expr("(mode div 8) % 8"))
      .otherwise($"mode" % 8)
      .cast("int")
    inodes(s, d)
      .filter($"kind" === "file")
      .withColumn("eff_bits", effBits)
      .filter($"eff_bits".bitwiseAND(lit(4)) === 4)
      .select($"ino", $"full_path", $"eff_bits")
      .orderBy($"ino")
  }

  /** setattr as a BULK relation (filesystem.rs:545-739): every file gets
    * a derived request — op 0 = chmod to 06755, op 1 = truncate to
    * size/2, op 2 = touch mtime-to-Now — from a derived requester
    * (req_uid = ino%4, req_gid = ino%2), and the output is the post-state
    * under the reference's permission matrix:
    *  - chmod: owner-or-root; non-root caller outside the file's group
    *    loses SGID from the requested mode (:571-591);
    *  - truncate: W_OK access; applied truncate SETS the size and clears
    *    suid/sgid (:399-431);
    *  - touch-to-Now: owner, or W_OK for non-owners (:665-737).
    * Input modes are salted with (ino%4)<<10 so suid/sgid bits actually
    * occur. The Spark side runs the REAL column functions
    * ([[graft.meta.InodeCatalog.checkAccess]] / [[graft.meta.InodeCatalog.clearSuidSgid]])
    * that power the imperative setattr; the oracle re-derives the bit
    * arithmetic longhand — so the catalog's permission matrix is itself
    * hash-gated. Scale: one scan, pure codegen'd bit math, no shuffle
    * before the output sort. */
  val qFsSetattr = QueryDef.sql(
    "q_fs_setattr",
    s"""WITH ino AS $duckInodes,
       |pre AS (
       |  SELECT ino, size,
       |         CAST(mode | ((ino % 4) * 1024) AS INT) AS mode,
       |         uid, gid,
       |         CAST(ino % 4 AS INT) AS req_uid,
       |         CAST(ino % 2 AS INT) AS req_gid,
       |         CAST(ino % 3 AS INT) AS op
       |  FROM ino WHERE kind = 'file'),
       |ap AS (
       |  SELECT *,
       |    CASE WHEN op = 0 THEN (req_uid = 0 OR req_uid = uid)
       |         WHEN op = 1 THEN (req_uid = 0 OR
       |           (2 & (CASE WHEN uid = req_uid THEN mode // 64
       |                      WHEN gid = req_gid THEN mode // 8
       |                      ELSE mode END) & 7) = 2)
       |         ELSE (uid = req_uid OR req_uid = 0 OR
       |           (2 & (CASE WHEN uid = req_uid THEN mode // 64
       |                      WHEN gid = req_gid THEN mode // 8
       |                      ELSE mode END) & 7) = 2)
       |    END AS ok
       |  FROM pre)
       |SELECT ino, op, ok,
       |       CAST(CASE WHEN NOT ok THEN mode
       |            WHEN op = 0 THEN
       |              CASE WHEN req_uid != 0 AND req_gid != gid
       |                   THEN 2541 ELSE 3565 END
       |            WHEN op = 1 THEN
       |              CASE WHEN ((mode & 2047) & 8) != 0
       |                   THEN mode & 2047 & 3071
       |                   ELSE mode & 2047 END
       |            ELSE mode END AS INT) AS new_mode,
       |       CAST(CASE WHEN ok AND op = 1 THEN size // 2 ELSE size END
       |            AS BIGINT) AS new_size
       |FROM ap ORDER BY ino""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.meta.InodeCatalog
    val pre = inodes(s, d)
      .filter($"kind" === "file")
      .select($"ino", $"size",
        $"mode".bitwiseOR((($"ino" % 4) * 1024).cast("int")).as("mode"),
        $"uid", $"gid",
        ($"ino" % 4).cast("int").as("req_uid"),
        ($"ino" % 2).cast("int").as("req_gid"),
        ($"ino" % 3).cast("int").as("op"))
    val w = InodeCatalog.checkAccess($"uid", $"gid", $"mode",
      $"req_uid", $"req_gid", lit(2))
    val ok = when($"op" === 0, $"req_uid" === 0 || $"req_uid" === $"uid")
      .when($"op" === 1, w)
      .otherwise($"uid" === $"req_uid" || w)
    val chmodTarget = 0xded // 06755
    pre
      .withColumn("ok", ok)
      .select($"ino", $"op", $"ok",
        when(!$"ok", $"mode")
          .when($"op" === 0,
            when($"req_uid" =!= 0 && $"req_gid" =!= $"gid",
              lit(chmodTarget & ~0x400)).otherwise(lit(chmodTarget)))
          .when($"op" === 1, InodeCatalog.clearSuidSgid($"mode"))
          .otherwise($"mode")
          .cast("int").as("new_mode"),
        when($"ok" && $"op" === 1, floor($"size" / 2).cast("long"))
          .otherwise($"size").as("new_size"))
      .orderBy($"ino")
  }

  /** F1-F4 + P1 + S3: stable-hash bucket placement, data_path formatting,
    * and URI route dispatch — the KV layout surface as one query.
    * bucket = stableHash60(key) % 1024 mirrors
    * local_file_kv_store.rs:62-70 with the documented stable-hash
    * divergence (SURVEY §2.8 F1). */
  val qKvLayout = QueryDef.sql(
    "q_kv_bucket_layout",
    """WITH kv AS (
      |  SELECT 'doc/' || doc_id AS key,
      |         CAST(concat('0x', substr(md5('doc/' || doc_id), 1, 15)) AS BIGINT)
      |           % 1024 AS bucket
      |  FROM documents),
      |routed AS (
      |  SELECT key, bucket,
      |         '/store/' || bucket || '/' || replace(key, '/', '_') AS data_path,
      |         string_split('/get/' || key, '/')[3] AS routed_op
      |  FROM kv)
      |SELECT bucket, count(*) AS n_keys,
      |       min(data_path) AS first_path
      |FROM routed
      |WHERE routed_op = 'doc'
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val kv = Tables
      .documents(s, d)
      .select(concat(lit("doc/"), $"doc_id").as("key"))
      .withColumn("bucket", pmod(stableHash60($"key"), lit(1024)))
    val routed = kv
      .withColumn(
        "data_path",
        concat(lit("/store/"), $"bucket", lit("/"),
          regexp_replace($"key", "/", "_")))
      // URI split dispatch (h2_service.rs:74-87): '/get/doc/<id>' → parts
      .withColumn("routed_op", element_at(split(concat(lit("/get/"), $"key"), "/"), 3))
    routed
      .filter($"routed_op" === "doc")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_keys"), min($"data_path").as("first_path"))
      .orderBy($"bucket")
  }

  /** F6 + F7 + F8 in one pass: synthesize a full st_mode per doc (all 7
    * S_IFMT types, suid/sgid/perm varied), decode the file type via the
    * complete S_IFMT chain (passthrough_fs.rs:28-41), extract the perm
    * bits (stat_to_fuse, passthrough_fs.rs:46), and apply the
    * write-path suid/sgid clear (filesystem.rs:110-116 — SGID survives
    * unless group-execute is set). */
  val qFsModeDecode = QueryDef.sql(
    "q_fs_mode_decode",
    """WITH m AS (
      |  SELECT doc_id,
      |         ([4096,8192,16384,24576,32768,40960,49152][CAST(doc_id % 7 AS INT) + 1]
      |          + CASE WHEN doc_id % 4 = 1 THEN 2048 ELSE 0 END
      |          + CASE WHEN doc_id % 3 = 0 THEN 1024 ELSE 0 END
      |          + CASE WHEN doc_id % 2 = 0 THEN 420 ELSE 489 END) AS st_mode
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(st_mode AS INT) AS st_mode,
      |       CASE st_mode & 61440
      |            WHEN 16384 THEN 'dir'      WHEN 32768 THEN 'file'
      |            WHEN 40960 THEN 'symlink'  WHEN 24576 THEN 'blockdev'
      |            WHEN 8192  THEN 'chardev'  WHEN 4096  THEN 'fifo'
      |            WHEN 49152 THEN 'socket' END AS filetype,
      |       CAST(st_mode & 4095 AS INT) AS perm,
      |       CAST((CASE WHEN ((st_mode - (st_mode & 2048)) & 8) != 0
      |                  THEN (st_mode - (st_mode & 2048))
      |                       - ((st_mode - (st_mode & 2048)) & 1024)
      |                  ELSE st_mode - (st_mode & 2048) END) & 4095 AS INT)
      |         AS perm_after_write
      |FROM m
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.meta.InodeCatalog
    val ifmt = element_at(
      array(Seq(4096, 8192, 16384, 24576, 32768, 40960, 49152).map(lit): _*),
      ($"doc_id" % 7).cast("int") + 1)
    val stMode = (ifmt
      + when($"doc_id" % 4 === 1, 2048).otherwise(0)
      + when($"doc_id" % 3 === 0, 1024).otherwise(0)
      + when($"doc_id" % 2 === 0, 420).otherwise(489)).cast("int")
    Tables
      .documents(s, d)
      .select($"doc_id", stMode.as("st_mode"))
      .select(
        $"doc_id",
        $"st_mode",
        InodeCatalog.modeToFiletype($"st_mode").as("filetype"),
        $"st_mode".bitwiseAND(lit(4095)).as("perm"),
        InodeCatalog.clearSuidSgid($"st_mode").bitwiseAND(lit(4095))
          .as("perm_after_write"))
      .orderBy($"doc_id")
  }

  /** P7: the xattr namespace access policy (filesystem.rs:74-174) over
    * synthesized requests against the derived file inodes — every
    * namespace (user/system/trusted/security/invalid), both access masks
    * (R_OK=4, W_OK=2), and requester ids sweeping root/owner/group/other. */
  val qFsXattrAccess = QueryDef.sql(
    "q_fs_xattr_access",
    s"""WITH ino AS $duckInodes,
       |req AS (
       |  SELECT ino, uid, gid, mode,
       |         ['user.tag', 'system.posix_acl_access', 'system.quota',
       |          'trusted.overlay', 'security.selinux', 'badns.x']
       |           [CAST(ino % 6 AS INT) + 1] AS key,
       |         CASE WHEN ino % 2 = 0 THEN 4 ELSE 2 END AS mask,
       |         CAST((ino // 7) % 3 AS INT) AS req_uid,
       |         CAST((ino // 5) % 2 AS INT) AS req_gid
       |  FROM ino WHERE kind = 'file'),
       |cls AS (
       |  SELECT *,
       |         CASE WHEN starts_with(key, 'user.') THEN 'user'
       |              WHEN starts_with(key, 'system.') THEN 'system'
       |              WHEN starts_with(key, 'trusted.') THEN 'trusted'
       |              WHEN starts_with(key, 'security') THEN 'security'
       |              END AS ns,
       |         CASE WHEN req_uid = 0 THEN
       |                (mask & 1) = 0 OR ((((mode // 64) | (mode // 8) | mode) & 1) = 1)
       |              WHEN req_uid = uid THEN ((mode // 64) & 7 & mask) = mask
       |              WHEN req_gid = gid THEN ((mode // 8) & 7 & mask) = mask
       |              ELSE (mode & 7 & mask) = mask END AS posix
       |  FROM req)
       |SELECT ino, key, CAST(mask AS INT) AS mask, req_uid, req_gid, ns,
       |       CASE WHEN ns IS NULL THEN false
       |            WHEN ns = 'security' THEN mask = 4 OR req_uid = 0
       |            WHEN ns = 'trusted' THEN req_uid = 0
       |            WHEN ns = 'system' AND key <> 'system.posix_acl_access'
       |              THEN req_uid = 0
       |            ELSE posix END AS allowed
       |FROM cls
       |ORDER BY ino""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.meta.InodeCatalog
    val req = inodes(s, d)
      .filter($"kind" === "file")
      .select(
        $"ino", $"uid", $"gid", $"mode",
        element_at(
          array(Seq("user.tag", "system.posix_acl_access", "system.quota",
            "trusted.overlay", "security.selinux", "badns.x").map(lit): _*),
          ($"ino" % 6).cast("int") + 1).as("key"),
        when($"ino" % 2 === 0, 4).otherwise(2).as("mask"),
        expr("(ino div 7) % 3").cast("int").as("req_uid"),
        expr("(ino div 5) % 2").cast("int").as("req_gid"))
    req
      .select(
        $"ino", $"key", $"mask", $"req_uid", $"req_gid",
        InodeCatalog.xattrNamespace($"key").as("ns"),
        InodeCatalog.xattrAccessAllowed($"key", $"mask",
          $"uid", $"gid", $"mode", $"req_uid", $"req_gid").as("allowed"))
      .orderBy($"ino")
  }

  /** Symlink resolution as a distributed query (filesystem.rs:727
    * readlink + 1019 symlink): every 9th doc owns a symlink whose target
    * names another doc file by its unique basename; resolution is a left
    * join of the link table against the file inodes — dangling targets
    * (the modulus points past the corpus) surface as status='dangling'
    * with a NULL ino instead of an error, and `link_size` mirrors the
    * reference's size = target-string length. */
  val qFsSymlinkResolve = QueryDef.sql(
    "q_fs_symlink_resolve",
    s"""WITH ino AS $duckInodes,
       |links AS (
       |  SELECT 'ln_' || doc_id AS link_name,
       |         'doc_' || ((doc_id * 7 + 3) % 750) || '.txt' AS target
       |  FROM documents WHERE doc_id % 9 = 0)
       |SELECT l.link_name, l.target,
       |       CAST(length(l.target) AS BIGINT) AS link_size,
       |       f.ino AS target_ino,
       |       CASE WHEN f.ino IS NULL THEN 'dangling' ELSE 'ok' END AS status
       |FROM links l
       |  LEFT JOIN (SELECT name, ino FROM ino WHERE kind = 'file') f
       |    ON f.name = l.target
       |ORDER BY link_name""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val files = inodes(s, d)
      .filter($"kind" === "file")
      .select($"name".as("tname"), $"ino".as("target_ino"))
    val links = Tables
      .documents(s, d)
      .filter($"doc_id" % 9 === 0)
      .select(
        concat(lit("ln_"), $"doc_id").as("link_name"),
        concat(lit("doc_"), ($"doc_id" * 7 + 3) % 750, lit(".txt"))
          .as("target"))
    links
      .join(files, $"target" === $"tname", "left")
      .select(
        $"link_name",
        $"target",
        length($"target").cast("long").as("link_size"),
        $"target_ino",
        when($"target_ino".isNull, "dangling").otherwise("ok").as("status"))
      .orderBy($"link_name")
  }

  /** copy_file_range size arithmetic (filesystem.rs:1812-1858) as a
    * distributed query: every 13th doc copies a 100-byte range from its
    * successor — bytes copied saturate at the source EOF
    * (`min(size, file_size - src_offset)`, zero if the offset is past
    * EOF) and the destination size follows the A7 rule
    * max(size, dst_offset + written). The imperative two-plane op lives
    * in GraftEngine.copyFileRange (spec-gated); this oracles the same
    * saturation + accounting arithmetic end-to-end. */
  val qFsCopyRange = QueryDef.sql(
    "q_fs_copy_range",
    """WITH ops AS (
      |  SELECT d.doc_id AS dst_doc, s.doc_id AS src_doc,
      |         d.n_chars AS dst_size, s.n_chars AS src_size,
      |         (d.doc_id * 37) % 4000 AS src_off,
      |         d.n_chars // 2 AS dst_off,
      |         100 AS req
      |  FROM documents d JOIN documents s ON s.doc_id = d.doc_id + 1
      |  WHERE d.doc_id % 13 = 0),
      |sized AS (
      |  SELECT dst_doc, src_doc, dst_size, dst_off,
      |         greatest(0, least(req, src_size - src_off)) AS copied
      |  FROM ops)
      |SELECT dst_doc, src_doc,
      |       CAST(copied AS BIGINT) AS copied,
      |       CAST(greatest(dst_size, dst_off + copied) AS BIGINT) AS new_size
      |FROM sized
      |ORDER BY dst_doc""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val ops = docs
      .as("d")
      .join(docs.as("s"), $"s.doc_id" === $"d.doc_id" + 1)
      .filter($"d.doc_id" % 13 === 0)
      .select(
        $"d.doc_id".as("dst_doc"),
        $"s.doc_id".as("src_doc"),
        $"d.n_chars".as("dst_size"),
        $"s.n_chars".as("src_size"),
        (($"d.doc_id" * 37) % 4000).as("src_off"),
        expr("d.n_chars div 2").as("dst_off"),
        lit(100L).as("req"))
    ops
      .withColumn("copied",
        greatest(lit(0L), least($"req", $"src_size" - $"src_off")))
      .select(
        $"dst_doc",
        $"src_doc",
        $"copied",
        greatest($"dst_size", $"dst_off" + $"copied").as("new_size"))
      .orderBy($"dst_doc")
  }

  /** statfs analog (filesystem.rs:1559-1572): the reference STUBS the
    * reply with fixed capacity constants (10 000 blocks / 10 000 inodes)
    * and TODOs the real accounting — this query computes the real thing
    * the stub promises: filesystem-wide used-block (F9 rule:
    * (size+511)/512) and live-inode accounting over the catalog, against
    * the stub's advertised capacities, plus the BLOCK_SIZE /
    * MAX_NAME_LENGTH constants (filesystem.rs:33-34). One global
    * map-side-combined aggregate — a single scan at any catalog size. */
  val qFsStatfs = QueryDef.sql(
    "q_fs_statfs",
    s"""WITH ino AS $duckInodes
       |SELECT CAST(512 AS INT) AS bsize,
       |       CAST(255 AS INT) AS name_max,
       |       CAST(10000 AS BIGINT) AS blocks_total,
       |       CAST(sum((size + 511) // 512) AS BIGINT) AS blocks_used,
       |       CAST(greatest(0, 10000 - sum((size + 511) // 512)) AS BIGINT)
       |         AS blocks_free,
       |       CAST(10000 AS BIGINT) AS inodes_total,
       |       CAST(count(*) AS BIGINT) AS inodes_used,
       |       CAST(greatest(0, 10000 - count(*)) AS BIGINT) AS inodes_free,
       |       CAST(sum(CASE WHEN kind = 'file' THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_files,
       |       CAST(sum(CASE WHEN kind = 'dir' THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_dirs
       |FROM ino""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val used = sum(floor(($"size" + 511) / 512)).cast("long")
    inodes(s, d)
      .agg(
        used.as("blocks_used"),
        count(lit(1)).as("inodes_used"),
        sum(when($"kind" === "file", 1L).otherwise(0L)).as("n_files"),
        sum(when($"kind" === "dir", 1L).otherwise(0L)).as("n_dirs"))
      .select(
        lit(512).as("bsize"),
        lit(graft.meta.InodeCatalog.MaxNameLength).as("name_max"),
        lit(10000L).as("blocks_total"),
        $"blocks_used",
        greatest(lit(0L), lit(10000L) - $"blocks_used").as("blocks_free"),
        lit(10000L).as("inodes_total"),
        $"inodes_used",
        greatest(lit(0L), lit(10000L) - $"inodes_used").as("inodes_free"),
        $"n_files",
        $"n_dirs")
  }

  /** rename as a BULK two-sided edge-move census (filesystem.rs:1086-1291):
    * every file gets a derived rename request — move to directory
    * `(srcnum + 1 + ino%3) % n_src`, new name `doc_<id+13>.txt` (which
    * collides with a real entry iff doc id+13 lives in the target dir,
    * exercising the `lookup_name(new_parent, new_name)` overwrite path) —
    * from a derived requester (req_uid = ino%4, req_gid = ino%2).
    * Directory attrs are salted (uid = srcnum%4, gid = srcnum%2, sticky on
    * every third dir) so the reference's full denial cascade occurs:
    *  1. W_OK on the old parent (:1112-1122) → eacces_w_old;
    *  2. sticky bit on the old parent: non-root requester who owns
    *     neither the dir nor the file (:1124-1132) → eacces_sticky_old;
    *  3. W_OK on the new parent (:1141-1151) → eacces_w_new;
    *  4. sticky bit on the new parent when the target name exists and the
    *     requester owns neither dir nor target (:1153-1164)
    *     → eacces_sticky_new;
    *  5. otherwise ok; an existing target is unlinked (hardlink decrement,
    *     :1246-1261) — counted as an overwrite.
    * (ENOTEMPTY/dir-move W_OK branches are dir-target-only; this census
    * moves files, and [[graft.meta.InodeCatalog.rename]] carries those
    * branches under InodeCatalogSpec.) The Spark side gates with the REAL
    * [[graft.meta.InodeCatalog.checkAccess]] column function; the oracle
    * re-derives the bit math longhand. Scale: files join two broadcast
    * dir relations + one equi-join target lookup on (parent, name) —
    * the lookup shuffle is the only corpus-sized exchange. */
  val qFsRename = QueryDef.sql(
    "q_fs_rename",
    s"""WITH ino AS $duckInodes,
       |dirs AS (
       |  SELECT ino, name,
       |         CAST((ino - 2) % 4 AS INT) AS d_uid,
       |         CAST((ino - 2) % 2 AS INT) AS d_gid,
       |         CAST(493 + CASE WHEN (ino - 2) % 3 = 0 THEN 512 ELSE 0 END
       |              AS INT) AS d_mode
       |  FROM ino WHERE kind = 'dir'),
       |req AS (
       |  SELECT f.ino, f.uid AS f_uid, f.parent AS old_parent,
       |         CAST((f.parent - 2 + 1 + f.ino % 3)
       |              % (SELECT count(*) FROM dirs) + 2 AS BIGINT) AS new_parent,
       |         'doc_' || (f.ino - 100 + 13) || '.txt' AS new_name,
       |         CAST(f.ino % 4 AS INT) AS req_uid,
       |         CAST(f.ino % 2 AS INT) AS req_gid
       |  FROM ino f WHERE f.kind = 'file'),
       |j AS (
       |  SELECT r.*,
       |         po.name AS old_dir, po.d_uid AS po_uid, po.d_gid AS po_gid,
       |         po.d_mode AS po_mode,
       |         pn.name AS new_dir, pn.d_uid AS pn_uid, pn.d_gid AS pn_gid,
       |         pn.d_mode AS pn_mode,
       |         t.ino AS t_ino, t.uid AS t_uid
       |  FROM req r
       |  JOIN dirs po ON r.old_parent = po.ino
       |  JOIN dirs pn ON r.new_parent = pn.ino
       |  LEFT JOIN ino t
       |    ON t.parent = r.new_parent AND t.name = r.new_name),
       |cls AS (
       |  SELECT old_dir, new_dir,
       |    CASE
       |      WHEN NOT (req_uid = 0 OR
       |        (2 & (CASE WHEN po_uid = req_uid THEN po_mode // 64
       |                   WHEN po_gid = req_gid THEN po_mode // 8
       |                   ELSE po_mode END) & 7) = 2)
       |        THEN 'eacces_w_old'
       |      WHEN (po_mode & 512) != 0 AND req_uid != 0
       |           AND req_uid != po_uid AND req_uid != f_uid
       |        THEN 'eacces_sticky_old'
       |      WHEN NOT (req_uid = 0 OR
       |        (2 & (CASE WHEN pn_uid = req_uid THEN pn_mode // 64
       |                   WHEN pn_gid = req_gid THEN pn_mode // 8
       |                   ELSE pn_mode END) & 7) = 2)
       |        THEN 'eacces_w_new'
       |      WHEN (pn_mode & 512) != 0 AND t_ino IS NOT NULL AND req_uid != 0
       |           AND req_uid != pn_uid AND req_uid != t_uid
       |        THEN 'eacces_sticky_new'
       |      ELSE 'ok' END AS outcome,
       |    CASE WHEN t_ino IS NOT NULL THEN 1 ELSE 0 END AS has_target
       |  FROM j)
       |SELECT old_dir, new_dir, outcome, count(*) AS n,
       |       CAST(sum(CASE WHEN outcome = 'ok' THEN has_target ELSE 0 END)
       |            AS BIGINT) AS n_overwrites
       |FROM cls
       |GROUP BY old_dir, new_dir, outcome
       |ORDER BY old_dir, new_dir, outcome""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.meta.InodeCatalog
    val ino = inodes(s, d)
    val dirs = ino
      .filter($"kind" === "dir")
      .select($"ino", $"name",
        (($"ino" - 2) % 4).cast("int").as("d_uid"),
        (($"ino" - 2) % 2).cast("int").as("d_gid"),
        (lit(493) + when(($"ino" - 2) % 3 === 0, 512).otherwise(0))
          .cast("int").as("d_mode"))
    val nDirs = dirs.agg(count(lit(1)).as("n_dirs"))
    val req = ino
      .filter($"kind" === "file")
      .crossJoin(broadcast(nDirs))
      .select($"ino", $"uid".as("f_uid"), $"parent".as("old_parent"),
        (($"parent" - 2 + 1 + $"ino" % 3) % $"n_dirs" + 2)
          .cast("long").as("new_parent"),
        concat(lit("doc_"), $"ino" - 100 + 13, lit(".txt")).as("new_name"),
        ($"ino" % 4).cast("int").as("req_uid"),
        ($"ino" % 2).cast("int").as("req_gid"))
    val target = ino.select($"parent".as("t_parent"), $"name".as("t_name"),
      $"ino".as("t_ino"), $"uid".as("t_uid"))
    val j = req.as("r")
      .join(broadcast(dirs.as("po")), $"r.old_parent" === $"po.ino")
      .join(broadcast(dirs.as("pn")), $"r.new_parent" === $"pn.ino")
      .join(target,
        $"r.new_parent" === $"t_parent" && $"r.new_name" === $"t_name",
        "left")
    val wOld = InodeCatalog.checkAccess($"po.d_uid", $"po.d_gid",
      $"po.d_mode", $"r.req_uid", $"r.req_gid", lit(2))
    val wNew = InodeCatalog.checkAccess($"pn.d_uid", $"pn.d_gid",
      $"pn.d_mode", $"r.req_uid", $"r.req_gid", lit(2))
    val outcome = when(!wOld, "eacces_w_old")
      .when($"po.d_mode".bitwiseAND(512) =!= 0 && $"r.req_uid" =!= 0 &&
        $"r.req_uid" =!= $"po.d_uid" && $"r.req_uid" =!= $"r.f_uid",
        "eacces_sticky_old")
      .when(!wNew, "eacces_w_new")
      .when($"pn.d_mode".bitwiseAND(512) =!= 0 && $"t_ino".isNotNull &&
        $"r.req_uid" =!= 0 && $"r.req_uid" =!= $"pn.d_uid" &&
        $"r.req_uid" =!= $"t_uid",
        "eacces_sticky_new")
      .otherwise("ok")
    j.select($"po.name".as("old_dir"), $"pn.name".as("new_dir"),
        outcome.as("outcome"),
        when($"t_ino".isNotNull, 1).otherwise(0).as("has_target"))
      .groupBy($"old_dir", $"new_dir", $"outcome")
      .agg(count(lit(1)).as("n"),
        sum(when($"outcome" === "ok", $"has_target").otherwise(0))
          .cast("long").as("n_overwrites"))
      .orderBy($"old_dir", $"new_dir", $"outcome")
  }

  /** open/release handle lifecycle as a BULK census (filesystem.rs:
    * 199-214 `open_file_handles` refcount, :1322-1368 open's O_ACCMODE
    * decode + access gate, :1450-1462 release's decrement; gc only at
    * hardlinks == 0 AND handles == 0): every file gets 1 + ino%4 derived
    * open attempts — attempt j carries accmode (ino+j)%4 (RDONLY /
    * WRONLY / RDWR / invalid → EINVAL, :1341-1345), O_TRUNC when
    * (ino+j)%5 = 0 (EACCES with RDONLY, :1327-1330), and requester
    * ((ino+2j+1)%4 — decorrelated from accmode so every matrix cell
    * fires, (ino+j)%2) checked against the file's attrs with mask
    * R=4 / W=2 / R|W=6. Successful opens increment the refcount;
    * ino%3-capped releases decrement it; files with ino%7 = 0 are
    * unlinked — a file whose handles outlive the unlink is a zombie
    * (unlinked-but-open survives to last close, :199 comment + gc_inode),
    * gc'd now only when no handles remain. The Spark side gates opens
    * with the REAL [[graft.meta.InodeCatalog.checkAccess]]; the oracle
    * re-derives the matrix longhand. Scale: one explode of ≤5 attempt
    * rows per file, one groupBy(ino) — a single aggregate exchange. */
  val qFsHandleCensus = QueryDef.sql(
    "q_fs_handle_census",
    s"""WITH ino AS $duckInodes,
       |att AS (
       |  SELECT f.ino, f.mode, f.uid, f.gid, s.j
       |  FROM (SELECT * FROM ino WHERE kind = 'file') f,
       |       unnest(generate_series(0, CAST(f.ino % 4 AS BIGINT))) AS s(j)),
       |dec AS (
       |  SELECT ino,
       |         CAST((ino + j) % 4 AS INT) AS acc,
       |         ((ino + j) % 5 = 0) AS trunc,
       |         CAST((ino + 2 * j + 1) % 4 AS INT) AS req_uid,
       |         CAST((ino + j) % 2 AS INT) AS req_gid,
       |         mode, uid, gid
       |  FROM att),
       |o AS (
       |  SELECT ino,
       |    CASE
       |      WHEN acc = 3 THEN 'einval'
       |      WHEN acc = 0 AND trunc THEN 'eacces'
       |      WHEN req_uid = 0 THEN 'ok'
       |      WHEN ((CASE WHEN acc = 0 THEN 4 WHEN acc = 1 THEN 2 ELSE 6 END) &
       |            (CASE WHEN uid = req_uid THEN mode // 64
       |                  WHEN gid = req_gid THEN mode // 8
       |                  ELSE mode END) & 7) =
       |           (CASE WHEN acc = 0 THEN 4 WHEN acc = 1 THEN 2 ELSE 6 END)
       |        THEN 'ok'
       |      ELSE 'eacces' END AS outcome
       |  FROM dec),
       |g AS (
       |  SELECT ino,
       |         count(*) AS n_att,
       |         CAST(sum(CASE WHEN outcome = 'ok' THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_ok,
       |         CAST(sum(CASE WHEN outcome = 'einval' THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_einval,
       |         CAST(sum(CASE WHEN outcome = 'eacces' THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_eacces
       |  FROM o GROUP BY ino)
       |SELECT ino, n_att, n_ok, n_einval, n_eacces,
       |       CAST(least(n_ok, ino % 3) AS BIGINT) AS n_rel,
       |       CAST(n_ok - least(n_ok, ino % 3) AS BIGINT) AS open_handles,
       |       (ino % 7 = 0) AS unlinked,
       |       (ino % 7 = 0 AND n_ok - least(n_ok, ino % 3) > 0) AS zombie,
       |       (ino % 7 = 0 AND n_ok - least(n_ok, ino % 3) = 0) AS gc_now
       |FROM g ORDER BY ino""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.meta.InodeCatalog
    val att = inodes(s, d)
      .filter($"kind" === "file")
      .select($"ino", $"mode", $"uid", $"gid",
        explode(sequence(lit(0L), $"ino" % 4)).as("j"))
    val acc = ($"ino" + $"j") % 4
    // req_uid is DECORRELATED from acc ((ino+2j+1)%4 vs (ino+j)%4) so
    // every (accmode, requester) cell of the access matrix occurs —
    // with both keyed on (ino+j)%4, RDONLY opens were always root's and
    // the non-root read branch of checkAccess never fired.
    val reqUid = (($"ino" + lit(2) * $"j" + 1) % 4).cast("int")
    val reqGid = (($"ino" + $"j") % 2).cast("int")
    val mask = when(acc === 0, 4).when(acc === 1, 2).otherwise(6)
    val allowed =
      InodeCatalog.checkAccess($"uid", $"gid", $"mode", reqUid, reqGid, mask)
    val outcome = when(acc === 3, "einval")
      .when(acc === 0 && ($"ino" + $"j") % 5 === 0, "eacces")
      .when(allowed, "ok")
      .otherwise("eacces")
    val g = att
      .select($"ino", outcome.as("outcome"))
      .groupBy($"ino")
      .agg(count(lit(1)).as("n_att"),
        sum(when($"outcome" === "ok", 1).otherwise(0))
          .cast("long").as("n_ok"),
        sum(when($"outcome" === "einval", 1).otherwise(0))
          .cast("long").as("n_einval"),
        sum(when($"outcome" === "eacces", 1).otherwise(0))
          .cast("long").as("n_eacces"))
    val nRel = least($"n_ok", $"ino" % 3).cast("long")
    g.select($"ino", $"n_att", $"n_ok", $"n_einval", $"n_eacces",
        nRel.as("n_rel"),
        ($"n_ok" - nRel).cast("long").as("open_handles"),
        ($"ino" % 7 === 0).as("unlinked"),
        ($"ino" % 7 === 0 && $"n_ok" - nRel > 0).as("zombie"),
        ($"ino" % 7 === 0 && $"n_ok" - nRel === 0).as("gc_now"))
      .orderBy($"ino")
  }

  /** rmdir + mknod as a BULK census — the last spec-only FS semantics
    * given oracle twins, following the proven q_fs_rename /
    * q_fs_handle_census pattern (filesystem.rs:958-1017 rmdir: lookup →
    * ENOTEMPTY **before** any access check → W_OK on parent → sticky;
    * :740-812 mknod: S_IFMT gate (ENOSYS beyond reg/symlink/dir) →
    * EEXIST on (parent, name) → W_OK on parent → suid/sgid strip for
    * non-root creators). Three attempt families:
    *  1. rmdir of every REAL source dir from the root — all non-empty
    *     (dirs exist only because documents live in them), so the
    *     child-count join must land 'enotempty' for every row and the
    *     access cascade must NOT fire (the reference checks emptiness
    *     first);
    *  2. rmdir of 3 synthetic EMPTY subdirs per dir (sub-uid (ino+j)%4,
    *     requester (ino+2j+1)%4 — decorrelated per the handle-census
    *     lesson — and (ino+j)%2) against the salted dir attrs (uid
    *     (ino−2)%4, gid (ino−2)%2, sticky on every 3rd dir): W_OK
    *     denial, then the sticky owner rule, then ok;
    *  3. mknod of 'doc_<id+7>.txt' in each file's dir — type from
    *     ino%5 (0 reg / 1 symlink / 2 dir / 3–4 → 'enosys'), EEXIST iff
    *     doc id+7 lives in the same dir (the corpus-sized (parent,
    *     name) equi-join), then the parent W_OK, with the suid-strip
    *     census for non-root 'ok' creators (ino%6 requests suid).
    * The Spark side gates every W_OK with the REAL
    * [[graft.meta.InodeCatalog.checkAccess]]; the oracle re-derives the
    * permission math longhand so the two texts cannot share a bug.
    * Scale: dirs/kids are broadcast-sized; the mknod target lookup is
    * the only corpus-sized exchange (same shape as q_fs_rename). */
  val qFsRmdirMknod = QueryDef.sql(
    "q_fs_rmdir_mknod",
    s"""WITH ino AS $duckInodes,
       |dirs AS (
       |  SELECT ino, name,
       |         CAST((ino - 2) % 4 AS INT) AS d_uid,
       |         CAST((ino - 2) % 2 AS INT) AS d_gid,
       |         CAST(493 + CASE WHEN (ino - 2) % 3 = 0 THEN 512 ELSE 0 END
       |              AS INT) AS d_mode
       |  FROM ino WHERE kind = 'dir'),
       |kids AS (
       |  SELECT parent, count(*) AS n_kids
       |  FROM ino WHERE kind = 'file' GROUP BY parent),
       |rr AS (
       |  SELECT d.name AS dir_name, 'rmdir_real' AS op,
       |    CASE
       |      WHEN coalesce(k.n_kids, 0) > 0 THEN 'enotempty'
       |      WHEN NOT ((d.ino + 1) % 4 = 0 OR
       |        (2 & (CASE WHEN 0 = (d.ino + 1) % 4 THEN 493 // 64
       |                   WHEN 0 = d.ino % 2 THEN 493 // 8
       |                   ELSE 493 END) & 7) = 2)
       |        THEN 'eacces_w'
       |      ELSE 'ok' END AS outcome,
       |    0 AS suid_strip
       |  FROM dirs d LEFT JOIN kids k ON k.parent = d.ino),
       |sb AS (
       |  SELECT d.name AS dir_name,
       |         d.d_uid, d.d_gid, d.d_mode,
       |         CAST((d.ino + j.j) % 4 AS INT) AS s_uid,
       |         CAST((d.ino + 2 * j.j + 1) % 4 AS INT) AS r_uid,
       |         CAST((d.ino + j.j) % 2 AS INT) AS r_gid
       |  FROM dirs d, (SELECT unnest([0, 1, 2]) AS j) j),
       |re AS (
       |  SELECT dir_name, 'rmdir_empty' AS op,
       |    CASE
       |      WHEN NOT (r_uid = 0 OR
       |        (2 & (CASE WHEN d_uid = r_uid THEN d_mode // 64
       |                   WHEN d_gid = r_gid THEN d_mode // 8
       |                   ELSE d_mode END) & 7) = 2)
       |        THEN 'eacces_w'
       |      WHEN (d_mode & 512) != 0 AND r_uid != 0
       |           AND r_uid != d_uid AND r_uid != s_uid
       |        THEN 'eacces_sticky'
       |      ELSE 'ok' END AS outcome,
       |    0 AS suid_strip
       |  FROM sb),
       |mk AS (
       |  SELECT f.ino, f.parent,
       |         'doc_' || (f.ino - 100 + 7) || '.txt' AS new_name,
       |         CAST(f.ino % 5 AS INT) AS ftype,
       |         CAST((f.ino + 3) % 4 AS INT) AS r_uid,
       |         CAST((f.ino + 1) % 2 AS INT) AS r_gid,
       |         (f.ino % 6 = 0) AS wants_suid
       |  FROM ino f WHERE f.kind = 'file'),
       |mj AS (
       |  SELECT m.*, d.name AS dir_name, d.d_uid, d.d_gid, d.d_mode,
       |         t.ino AS t_ino
       |  FROM mk m
       |  JOIN dirs d ON m.parent = d.ino
       |  LEFT JOIN ino t ON t.parent = m.parent AND t.name = m.new_name),
       |mo AS (
       |  SELECT dir_name, wants_suid, r_uid,
       |    CASE
       |      WHEN ftype >= 3 THEN 'enosys'
       |      WHEN t_ino IS NOT NULL THEN 'eexist'
       |      WHEN NOT (r_uid = 0 OR
       |        (2 & (CASE WHEN d_uid = r_uid THEN d_mode // 64
       |                   WHEN d_gid = r_gid THEN d_mode // 8
       |                   ELSE d_mode END) & 7) = 2)
       |        THEN 'eacces'
       |      ELSE 'ok' END AS outcome
       |  FROM mj),
       |mo2 AS (
       |  SELECT dir_name, 'mknod' AS op, outcome,
       |         CASE WHEN outcome = 'ok' AND wants_suid AND r_uid != 0
       |              THEN 1 ELSE 0 END AS suid_strip
       |  FROM mo),
       |u AS (
       |  SELECT * FROM rr UNION ALL SELECT * FROM re
       |  UNION ALL SELECT * FROM mo2)
       |SELECT dir_name, op, outcome, count(*) AS n,
       |       CAST(sum(suid_strip) AS BIGINT) AS n_suid_stripped
       |FROM u GROUP BY dir_name, op, outcome
       |ORDER BY dir_name, op, outcome""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.meta.InodeCatalog
    val ino = inodes(s, d)
    val dirs = ino
      .filter($"kind" === "dir")
      .select($"ino", $"name",
        (($"ino" - 2) % 4).cast("int").as("d_uid"),
        (($"ino" - 2) % 2).cast("int").as("d_gid"),
        (lit(493) + when(($"ino" - 2) % 3 === 0, 512).otherwise(0))
          .cast("int").as("d_mode"))
    val files = ino.filter($"kind" === "file")
    val kids = files
      .groupBy($"parent".as("k_parent"))
      .agg(count(lit(1)).as("n_kids"))
    // 1. real dirs from the root (uid 0, gid 0, mode 0755, no sticky):
    //    ENOTEMPTY is checked BEFORE access, per the reference order
    val rootW = InodeCatalog.checkAccess(lit(0), lit(0), lit(493),
      $"r_uid", $"r_gid", lit(2))
    val rr = dirs
      .join(broadcast(kids), $"ino" === $"k_parent", "left")
      .select($"name".as("dir_name"),
        (($"ino" + 1) % 4).cast("int").as("r_uid"),
        ($"ino" % 2).cast("int").as("r_gid"),
        coalesce($"n_kids", lit(0L)).as("n_kids"))
      .select($"dir_name", lit("rmdir_real").as("op"),
        when($"n_kids" > 0, "enotempty")
          .when(!rootW, "eacces_w")
          .otherwise("ok").as("outcome"),
        lit(0L).as("suid_strip"))
    // 2. synthetic empty subdirs: full denial cascade on the salted dirs
    val sb = dirs
      .select($"name".as("dir_name"), $"ino", $"d_uid", $"d_gid", $"d_mode",
        explode(array(lit(0L), lit(1L), lit(2L))).as("j"))
      .select($"dir_name", $"d_uid", $"d_gid", $"d_mode",
        (($"ino" + $"j") % 4).cast("int").as("s_uid"),
        (($"ino" + lit(2) * $"j" + 1) % 4).cast("int").as("r_uid"),
        (($"ino" + $"j") % 2).cast("int").as("r_gid"))
    val wPar = InodeCatalog.checkAccess($"d_uid", $"d_gid", $"d_mode",
      $"r_uid", $"r_gid", lit(2))
    val re = sb.select($"dir_name", lit("rmdir_empty").as("op"),
      when(!wPar, "eacces_w")
        .when($"d_mode".bitwiseAND(512) =!= 0 && $"r_uid" =!= 0 &&
          $"r_uid" =!= $"d_uid" && $"r_uid" =!= $"s_uid",
          "eacces_sticky")
        .otherwise("ok").as("outcome"),
      lit(0L).as("suid_strip"))
    // 3. mknod: type gate → EEXIST target lookup (the one corpus-sized
    //    exchange) → parent W_OK → suid strip for non-root creators
    val mk = files.select($"ino", $"parent",
      concat(lit("doc_"), $"ino" - 100 + 7, lit(".txt")).as("new_name"),
      ($"ino" % 5).cast("int").as("ftype"),
      (($"ino" + 3) % 4).cast("int").as("r_uid"),
      (($"ino" + 1) % 2).cast("int").as("r_gid"),
      ($"ino" % 6 === 0).as("wants_suid"))
    // EEXIST target lookup joins ALL inodes (any kind), matching both the
    // oracle text and lookup_name semantics (filesystem.rs:740-812) — a
    // dir named like the target must also collide
    val target = ino.select($"parent".as("t_parent"),
      $"name".as("t_name"), $"ino".as("t_ino"))
    val mj = mk
      .join(broadcast(dirs.select($"ino".as("d_ino"),
        $"name".as("dir_name"), $"d_uid", $"d_gid", $"d_mode")),
        $"parent" === $"d_ino")
      .join(target,
        $"parent" === $"t_parent" && $"new_name" === $"t_name", "left")
    val wNew = InodeCatalog.checkAccess($"d_uid", $"d_gid", $"d_mode",
      $"r_uid", $"r_gid", lit(2))
    val moOut = when($"ftype" >= 3, "enosys")
      .when($"t_ino".isNotNull, "eexist")
      .when(!wNew, "eacces")
      .otherwise("ok")
    val mo = mj.select($"dir_name", lit("mknod").as("op"),
      moOut.as("outcome"),
      when(moOut === "ok" && $"wants_suid" && $"r_uid" =!= 0, 1L)
        .otherwise(0L).as("suid_strip"))
    rr.unionByName(re).unionByName(mo)
      .groupBy($"dir_name", $"op", $"outcome")
      .agg(count(lit(1)).as("n"),
        sum($"suid_strip").cast("long").as("n_suid_stripped"))
      .orderBy($"dir_name", $"op", $"outcome")
  }

  /** fallocate as a BULK census — the oracle twin of
    * [[graft.meta.InodeCatalog.fallocate]] (filesystem.rs:1781-1811),
    * completing the census line after q_fs_rename / q_fs_handle_census /
    * q_fs_rmdir_mknod. Three synthetic attempts per inode (files AND
    * dirs — dirs exercise the EBADF branch), parameters decorrelated
    * from each other per the handle-census lesson:
    *  - offset = −1 on every (ino+3j)%4 = 0 attempt, else
    *    (ino·37 + j·101) % 1000;
    *  - len = ((ino+j)%7)·64 — zero on every 7th, driving len ≤ 0;
    *  - keep_size (FALLOC_FL_KEEP_SIZE) on (ino+2j)%3 = 0;
    *  - every (ino+j)%5 = 4 attempt targets ino+10⁷ — absent from the
    *    catalog, so the target lookup (a REAL left join, the census's
    *    one corpus-sized exchange, same shape as the mknod EEXIST
    *    probe) misses and lands ENOENT.
    * The Spark side gates with the REAL engine decision tree —
    * [[graft.meta.InodeCatalog.fallocateOutcome]], the column twin that
    * FsSemanticsSpec sweeps against the imperative method over every
    * branch — while the oracle re-derives the precedence longhand:
    * EINVAL (offset<0 ∨ len≤0) is decided BEFORE the lookup (so a bad
    * range on a missing inode is einval, not enoent), then ENOENT, then
    * EBADF on non-files, then ok_keep (size unchanged) vs ok with the
    * A7 grow rule. (The reference method itself surfaces only ENOENT/ok
    * — it ignores the libc fallocate64 return — so the EINVAL/EBADF
    * tiers model POSIX fallocate(2) layered on that skeleton; the
    * precedence being gated is [[InodeCatalog.fallocate]]'s own
    * contract, which the census matches exactly.) The 'ok' branch
    * applies the A7 grow rule size' = max(size, offset+len). bytes_grown
    * sums the growth; blocks_after applies the F9 rule via the production
    * [[graft.meta.InodeCatalog.blocksOf]] on the Spark side while the
    * oracle re-derives ceil(size/512) longhand, so the two texts cannot
    * share a bug. */
  val qFsFallocate = QueryDef.sql(
    "q_fs_fallocate",
    s"""WITH ino AS $duckInodes,
       |att AS (
       |  SELECT i.ino, i.parent, i.kind, i.name, j.j,
       |         CASE WHEN (i.ino + 3 * j.j) % 4 = 0 THEN CAST(-1 AS BIGINT)
       |              ELSE (i.ino * 37 + j.j * 101) % 1000 END AS off,
       |         ((i.ino + j.j) % 7) * 64 AS len,
       |         ((i.ino + 2 * j.j) % 3 = 0) AS keep_size,
       |         CASE WHEN (i.ino + j.j) % 5 = 4 THEN i.ino + 10000000
       |              ELSE i.ino END AS target_ino
       |  FROM ino i, (SELECT unnest([0, 1, 2]) AS j) j),
       |lk AS (
       |  SELECT a.*, t.kind AS t_kind, t.size AS t_size
       |  FROM att a LEFT JOIN ino t ON a.target_ino = t.ino),
       |o AS (
       |  SELECT
       |    CASE WHEN lk.kind = 'dir' THEN lk.name ELSE p.name END
       |      AS dir_name,
       |    CASE
       |      WHEN off < 0 OR len <= 0 THEN 'einval'
       |      WHEN t_kind IS NULL THEN 'enoent'
       |      WHEN t_kind != 'file' THEN 'ebadf'
       |      WHEN keep_size THEN 'ok_keep'
       |      ELSE 'ok' END AS outcome,
       |    CASE WHEN off >= 0 AND len > 0 AND t_kind = 'file'
       |              AND NOT keep_size
       |         THEN greatest(CAST(0 AS BIGINT), off + len - t_size)
       |         ELSE CAST(0 AS BIGINT) END AS grown,
       |    CASE
       |      WHEN off < 0 OR len <= 0 OR t_kind IS NULL
       |           OR t_kind != 'file' THEN CAST(0 AS BIGINT)
       |      WHEN keep_size
       |        THEN CAST(ceil(t_size / 512.0) AS BIGINT)
       |      ELSE CAST(ceil(greatest(t_size, off + len) / 512.0) AS BIGINT)
       |      END AS blocks_after
       |  FROM lk LEFT JOIN (SELECT ino, name FROM ino WHERE kind = 'dir') p
       |    ON lk.parent = p.ino)
       |SELECT dir_name, outcome, count(*) AS n,
       |       CAST(sum(grown) AS BIGINT) AS bytes_grown,
       |       CAST(sum(blocks_after) AS BIGINT) AS blocks_after
       |FROM o GROUP BY dir_name, outcome
       |ORDER BY dir_name, outcome""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.meta.InodeCatalog
    val ino = inodes(s, d)
    val att = ino
      .select($"ino", $"parent", $"kind", $"name",
        explode(array(lit(0L), lit(1L), lit(2L))).as("j"))
      .select($"ino", $"parent", $"kind", $"name",
        when(($"ino" + lit(3) * $"j") % 4 === 0, lit(-1L))
          .otherwise(($"ino" * 37 + $"j" * 101) % 1000).as("off"),
        ((($"ino" + $"j") % 7) * 64).as("len"),
        (($"ino" + lit(2) * $"j") % 3 === 0).as("keep_size"),
        when(($"ino" + $"j") % 5 === 4, $"ino" + 10000000L)
          .otherwise($"ino").as("target_ino"))
    // the census's one corpus-sized exchange: the real target lookup
    val lk = att.join(
      ino.select($"ino".as("t_ino"), $"kind".as("t_kind"),
        $"size".as("t_size")),
      $"target_ino" === $"t_ino", "left")
    val dirName = when($"kind" === "dir", $"name").otherwise($"p_name")
    // the REAL engine decision tree (column twin of InodeCatalog.fallocate)
    val outcome =
      InodeCatalog.fallocateOutcome($"off", $"len", $"t_kind", $"keep_size")
    val grown = when(
      $"off" >= 0 && $"len" > 0 && $"t_kind" === "file" && !$"keep_size",
      greatest(lit(0L), $"off" + $"len" - $"t_size")).otherwise(0L)
    val blocksAfter = when(
      $"off" < 0 || $"len" <= 0 || $"t_kind".isNull || $"t_kind" =!= "file",
      lit(0L))
      .when($"keep_size", InodeCatalog.blocksOf($"t_size"))
      .otherwise(InodeCatalog.blocksOf(greatest($"t_size", $"off" + $"len")))
    lk
      .join(broadcast(ino.filter($"kind" === "dir")
        .select($"ino".as("p_ino"), $"name".as("p_name"))),
        $"parent" === $"p_ino", "left")
      .select(dirName.as("dir_name"), outcome.as("outcome"),
        grown.as("grown"), blocksAfter.as("blocks_after_1"))
      .groupBy($"dir_name", $"outcome")
      .agg(count(lit(1)).as("n"),
        sum($"grown").cast("long").as("bytes_grown"),
        sum($"blocks_after_1").cast("long").as("blocks_after"))
      .orderBy($"dir_name", $"outcome")
  }

  /** opendir/releasedir as a BULK census (r10) — the LAST spec-only
    * catalog op pair given an oracle twin (filesystem.rs:1466-1558),
    * completing the census program begun with q_fs_rename. Every inode
    * (dirs AND files — files must land ENOTDIR) mounts (ino%3 + 1)
    * attempts with accmode (ino+j)%4 (3 = O_ACCMODE garbage → einval),
    * O_TRUNC on every 5th (ino+j) — which on a read-only opendir is
    * EACCES decided BEFORE the lookup, exactly the method's flags-first
    * order, so it wins even on the ghost rows — and the decorrelated
    * requester matrix ((ino+2j+1)%4, (ino+j)%2) from the handle-census
    * lesson; one extra GHOST attempt per inode targets ino+10⁶ and
    * lands 'enoent' through the same real left-join lookup the
    * fallocate census proved. releasedir accounting mirrors
    * q_fs_handle_census ((ino+1)%3-capped releases; the remainder stays
    * open — releasedir is [[graft.meta.InodeCatalog.releasedir]] =
    * release, the persisted decrement). The Spark side decides with
    * [[graft.meta.InodeCatalog.opendirOutcome]] (the REAL checkAccess
    * inside) while the oracle re-derives the mask math longhand, so the
    * two texts cannot share a bug.
    * Scale: one explode of ≤5 attempt rows per inode, ONE corpus-sized
    * exchange (the t_ino lookup join), one groupBy(ino) aggregate. */
  val qFsOpendir = QueryDef.sql(
    "q_fs_opendir",
    s"""WITH ino AS $duckInodes,
       |att AS (
       |  SELECT i.ino, s.j,
       |         CASE WHEN s.j = i.ino % 3 + 1
       |              THEN i.ino + 1000000 ELSE i.ino END AS t_ino,
       |         CAST((i.ino + s.j) % 4 AS INT) AS acc,
       |         ((i.ino + s.j) % 5 = 0) AS trunc,
       |         CAST((i.ino + 2 * s.j + 1) % 4 AS INT) AS req_uid,
       |         CAST((i.ino + s.j) % 2 AS INT) AS req_gid
       |  FROM ino i,
       |       unnest(generate_series(0, CAST(i.ino % 3 + 1 AS BIGINT)))
       |         AS s(j)),
       |look AS (
       |  SELECT a.ino, a.acc, a.trunc, a.req_uid, a.req_gid,
       |         t.kind AS t_kind, t.uid AS t_uid, t.gid AS t_gid,
       |         t.mode AS t_mode
       |  FROM att a LEFT JOIN ino t ON t.ino = a.t_ino),
       |o AS (
       |  SELECT ino,
       |    CASE
       |      WHEN trunc AND acc = 0 THEN 'eacces'
       |      WHEN t_kind IS NULL THEN 'enoent'
       |      WHEN t_kind <> 'dir' THEN 'enotdir'
       |      WHEN acc = 3 THEN 'einval'
       |      WHEN req_uid = 0 THEN 'ok'
       |      WHEN ((CASE WHEN acc = 0 THEN 4 WHEN acc = 1 THEN 2 ELSE 6 END) &
       |            (CASE WHEN t_uid = req_uid THEN t_mode // 64
       |                  WHEN t_gid = req_gid THEN t_mode // 8
       |                  ELSE t_mode END) & 7) =
       |           (CASE WHEN acc = 0 THEN 4 WHEN acc = 1 THEN 2 ELSE 6 END)
       |        THEN 'ok'
       |      ELSE 'eacces' END AS outcome
       |  FROM look),
       |g AS (
       |  SELECT ino, count(*) AS n_att,
       |         CAST(sum(CASE WHEN outcome = 'ok' THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_ok,
       |         CAST(sum(CASE WHEN outcome = 'enoent' THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_enoent,
       |         CAST(sum(CASE WHEN outcome = 'enotdir' THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_enotdir,
       |         CAST(sum(CASE WHEN outcome = 'einval' THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_einval,
       |         CAST(sum(CASE WHEN outcome = 'eacces' THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_eacces
       |  FROM o GROUP BY ino)
       |SELECT ino, CAST(n_att AS BIGINT) AS n_att, n_ok, n_enoent,
       |       n_enotdir, n_einval, n_eacces,
       |       CAST(least(n_ok, (ino + 1) % 3) AS BIGINT) AS n_rel,
       |       CAST(n_ok - least(n_ok, (ino + 1) % 3) AS BIGINT)
       |         AS open_dir_handles
       |FROM g ORDER BY ino""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.meta.InodeCatalog
    val all = inodes(s, d)
    val att = all
      .select($"ino", explode(sequence(lit(0L), $"ino" % 3 + 1)).as("j"))
      .select($"ino",
        when($"j" === $"ino" % 3 + 1, $"ino" + 1000000L)
          .otherwise($"ino").as("t_ino"),
        (($"ino" + $"j") % 4).cast("int").as("acc"),
        (($"ino" + $"j") % 5 === 0).as("trunc"),
        (($"ino" + lit(2) * $"j" + 1) % 4).cast("int").as("req_uid"),
        (($"ino" + $"j") % 2).cast("int").as("req_gid"))
    val look = att.join(
      all.select($"ino".as("l_ino"), $"kind".as("t_kind"),
        $"uid".as("t_uid"), $"gid".as("t_gid"), $"mode".as("t_mode")),
      $"t_ino" === $"l_ino", "left")
    val read = $"acc" === 0 || $"acc" === 2
    val write = $"acc" === 1 || $"acc" === 2
    val outcome = InodeCatalog.opendirOutcome(read, write, $"trunc",
      $"t_kind", $"t_uid", $"t_gid", $"t_mode", $"req_uid", $"req_gid")
    val g = look
      .select($"ino", outcome.as("outcome"))
      .groupBy($"ino")
      .agg(count(lit(1)).as("n_att"),
        sum(when($"outcome" === "ok", 1).otherwise(0))
          .cast("long").as("n_ok"),
        sum(when($"outcome" === "enoent", 1).otherwise(0))
          .cast("long").as("n_enoent"),
        sum(when($"outcome" === "enotdir", 1).otherwise(0))
          .cast("long").as("n_enotdir"),
        sum(when($"outcome" === "einval", 1).otherwise(0))
          .cast("long").as("n_einval"),
        sum(when($"outcome" === "eacces", 1).otherwise(0))
          .cast("long").as("n_eacces"))
    val nRel = least($"n_ok", ($"ino" + 1) % 3).cast("long")
    g.select($"ino", $"n_att", $"n_ok", $"n_enoent", $"n_enotdir",
        $"n_einval", $"n_eacces", nRel.as("n_rel"),
        ($"n_ok" - nRel).cast("long").as("open_dir_handles"))
      .orderBy($"ino")
  }

  def defs: Seq[QueryDef] =
    Seq(qFsLookup, qFsReaddirPage, qFsDu, qFsAccess, qKvLayout,
      qFsModeDecode, qFsXattrAccess, qFsSymlinkResolve, qFsCopyRange,
      qFsStatfs, qFsSetattr, qFsRename, qFsHandleCensus, qFsRmdirMknod,
      qFsFallocate, qFsOpendir)
}
