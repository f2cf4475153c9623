package graft.meta

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** POSIX-style metadata catalog — the reference's FUSE semantic core
  * (SURVEY §2 P2-P9, J1-J3, O1-O2) re-expressed as snapshot DataFrames.
  *
  * Reference model (/root/reference):
  *  - inode maps: `inodes: HashMap<InodeNo, Inode>` +
  *    `path_index: HashMap<String, InodeNo>`,
  *    fuse/src/uring_fuse/uring_fs/inode.rs:64-69 — here both lookup
  *    directions are columns (`ino`, `full_path`) of ONE table;
  *  - lookup(parent, name) resolves via parent path + name join,
  *    inode.rs:83-110 (J1);
  *  - readdir enrichment + offset pagination, uring_fs/mod.rs:116-166
  *    (J2/O2);
  *  - rename moves an edge between parents (two-sided update),
  *    fuse/src/filesystem.rs:1086-1291 (J3);
  *  - unlink keeps the inode alive until `forget`,
  *    fuse/src/async_fuse/inode_table.rs:159-228;
  *  - attrs: FileAttr fields, fuse/src/uring_fuse/file_meta.rs:4-35;
  *    xattrs as a byte-keyed map, filesystem.rs:199-214;
  *  - access checks: mode-bit arithmetic, filesystem.rs:1870-1904 (P6);
  *    fh permission bits in the top 2 bits, filesystem.rs:39-41 (P8).
  *
  * Batch semantics (SURVEY §1.3): every mutation returns a NEW snapshot
  * (persistent-data-structure style) — the Spark analog of the reference's
  * `RwLock<HashMap>` mutation. Divergences, both documented in SURVEY §7:
  * ino numbers are never reused (no free-list; allocation is max+1 and
  * `generation` bumps on path reuse), and the snapshot is immutable
  * between ops.
  */
final case class InodeCatalog(df: DataFrame) {
  import InodeCatalog._

  private def spark: SparkSession = df.sparkSession

  /** P2: point lookup by ino. */
  def getattr(ino: Long): Option[Row] =
    df.filter(col("ino") === ino && col("nlink") > 0).collect().headOption

  /** J1: lookup by (parent ino, name). */
  def lookup(parent: Long, name: String): Option[Row] =
    df.filter(col("parent") === parent && col("name") === name && col("nlink") > 0)
      .collect()
      .headOption

  /** Path-index probe (the `path_index: HashMap<String, ino>` direction). */
  def resolve(path: String): Option[Row] =
    df.filter(col("full_path") === path && col("nlink") > 0).collect().headOption

  /** O1+O2: name-sorted directory listing with offset pagination
    * (skip/limit resume, uring_fs/mod.rs:126-152). */
  def readdir(parent: Long, offset: Int = 0, limit: Int = Int.MaxValue): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("parent"))
      .orderBy(col("name"))
    df.filter(col("parent") === parent && col("nlink") > 0)
      .withColumn("off", row_number().over(w))
      .filter(col("off") > offset && col("off") <= offset + limit)
      .select(col("off"), col("ino"), col("name"), col("kind"))
      .orderBy(col("off"))
  }

  private def nextIno: Long =
    df.agg(max(col("ino"))).head().getLong(0) + 1

  /** Create a child node (file or dir). Recreating a previously seen path
    * bumps `generation` — the reference bumps generation when an ino slot
    * is reused (inode_table.rs:92-101); we key the bump on path reuse
    * since inos are never reused here. */
  def create(
      parent: Long,
      name: String,
      kind: String,
      mode: Int = 0x1a4, // 0644
      uid: Int = 0,
      gid: Int = 0): InodeCatalog = {
    require(name.length <= MaxNameLength, s"name too long: $name") // P9
    require(lookup(parent, name).isEmpty, s"exists: $name")
    val parentPath = getattr(parent)
      .map(_.getAs[String]("full_path"))
      .getOrElse(sys.error(s"no such parent ino $parent"))
    val fullPath =
      if (parentPath == "/") s"/$name" else s"$parentPath/$name"
    val gen = df
      .filter(col("full_path") === fullPath)
      .agg(coalesce(max(col("generation")) + 1, lit(0L)))
      .head()
      .getLong(0)
    val row = spark.createDataFrame(
      java.util.List.of(
        Row(nextIno, parent, name, fullPath, kind, 0L, mode, uid, gid, gen,
          1L, Map.empty[String, Array[Byte]], null)),
      schema)
    InodeCatalog(df.unionByName(row))
  }

  def mkdir(parent: Long, name: String, mode: Int = 0x1ed): InodeCatalog =
    create(parent, name, "dir", mode) // 0755

  /** Symlink (filesystem.rs:1019-1078): a new inode of kind `symlink`
    * with mode 0777, size = target length, the target string stored as
    * the link content. The target is NOT resolved or validated —
    * dangling links are legal, exactly as in the reference (readlink
    * just returns the stored bytes). */
  def symlink(parent: Long, name: String, target: String): InodeCatalog = {
    require(name.length <= MaxNameLength, s"name too long: $name") // P9
    require(lookup(parent, name).isEmpty, s"exists: $name") // EEXIST
    val parentPath = getattr(parent)
      .map(_.getAs[String]("full_path"))
      .getOrElse(sys.error(s"no such parent ino $parent"))
    val fullPath =
      if (parentPath == "/") s"/$name" else s"$parentPath/$name"
    val gen = df
      .filter(col("full_path") === fullPath)
      .agg(coalesce(max(col("generation")) + 1, lit(0L)))
      .head()
      .getLong(0)
    val row = spark.createDataFrame(
      java.util.List.of(
        Row(nextIno, parent, name, fullPath, "symlink", target.length.toLong,
          0x1ff, 0, 0, gen, 1L, Map.empty[String, Array[Byte]], target)),
      schema)
    InodeCatalog(df.unionByName(row))
  }

  /** Readlink (filesystem.rs:727-739): the stored target of a live
    * symlink inode; None for missing inodes or non-symlinks (EINVAL in
    * the kernel protocol — an engine surfaces absence, not a panic). */
  def readlink(ino: Long): Option[String] =
    getattr(ino)
      .filter(_.getAs[String]("kind") == "symlink")
      .map(_.getAs[String]("symlink_target"))

  /** Hardlink (filesystem.rs:1293-1320): a second directory entry for an
    * EXISTING inode — the new row shares ino/kind/size/mode/owner/xattrs
    * with the source, and the link count bumps on every row of that ino
    * (nlink is an inode attribute, mirrored across its entries).
    * Directories refuse (EPERM) as in POSIX. */
  def link(ino: Long, newParent: Long, newName: String): InodeCatalog = {
    require(newName.length <= MaxNameLength, s"name too long: $newName") // P9
    require(lookup(newParent, newName).isEmpty, s"exists: $newName") // EEXIST
    val src = getattr(ino).getOrElse(sys.error(s"no such ino $ino"))
    require(src.getAs[String]("kind") != "dir", "EPERM: hardlink to directory")
    val parentPath = getattr(newParent)
      .map(_.getAs[String]("full_path"))
      .getOrElse(sys.error(s"no such parent ino $newParent"))
    val fullPath =
      if (parentPath == "/") s"/$newName" else s"$parentPath/$newName"
    val gen = df
      .filter(col("full_path") === fullPath)
      .agg(coalesce(max(col("generation")) + 1, lit(0L)))
      .head()
      .getLong(0)
    val newCount = src.getAs[Long]("nlink") + 1
    val row = spark.createDataFrame(
      java.util.List.of(
        Row(ino, newParent, newName, fullPath, src.getAs[String]("kind"),
          src.getAs[Long]("size"), src.getAs[Int]("mode"),
          src.getAs[Int]("uid"), src.getAs[Int]("gid"), gen, newCount,
          src.getAs[Map[String, Array[Byte]]]("xattrs"),
          src.getAs[String]("symlink_target"))),
      schema)
    val bumped = df.withColumn(
      "nlink",
      when(col("ino") === ino && col("nlink") > 0, col("nlink") + 1)
        .otherwise(col("nlink")))
    InodeCatalog(bumped.unionByName(row))
  }

  /** J3: two-sided rename — the node moves to (newParent, newName) and
    * every descendant's full_path is rewritten (subtree prefix swap).
    * POSIX semantics: an existing destination entry is atomically
    * replaced (unlinked), never left as a live duplicate; only live
    * rows (nlink > 0) move — tombstones keep their generation history
    * at the old path. */
  def rename(
      oldParent: Long,
      oldName: String,
      newParent: Long,
      newName: String): InodeCatalog = {
    val node = lookup(oldParent, oldName)
      .getOrElse(sys.error(s"no such entry $oldName"))
    val oldPath = node.getAs[String]("full_path")
    val newParentPath = getattr(newParent)
      .map(_.getAs[String]("full_path"))
      .getOrElse(sys.error(s"no such parent ino $newParent"))
    val newPath =
      if (newParentPath == "/") s"/$newName" else s"$newParentPath/$newName"
    val live = col("nlink") > 0
    // replace an existing destination entry (rename-over semantics):
    // a directory target zeroes outright, a file target decrements its
    // link count — filesystem.rs:1253-1257 (hardlinks = 0 vs -= 1)
    val cleared = lookup(newParent, newName) match {
      case Some(dest) if dest.getAs[Long]("ino") != node.getAs[Long]("ino") =>
        if (dest.getAs[String]("kind") == "dir")
          df.withColumn(
            "nlink",
            when(col("full_path") === newPath && live, lit(0L))
              .otherwise(col("nlink")))
        else
          dropEntry(df, dest.getAs[Long]("ino"),
            col("full_path") === newPath)
      case _ => df
    }
    val moved = cleared
      .withColumn(
        "parent",
        when(col("full_path") === oldPath && live, lit(newParent))
          .otherwise(col("parent")))
      .withColumn(
        "name",
        when(col("full_path") === oldPath && live, lit(newName))
          .otherwise(col("name")))
      .withColumn(
        "full_path",
        when(col("full_path") === oldPath && live, lit(newPath))
          .when(
            col("full_path").startsWith(oldPath + "/") && live,
            concat(lit(newPath), expr(s"substring(full_path, ${oldPath.length + 1})")))
          .otherwise(col("full_path")))
    InodeCatalog(moved)
  }

  /** Remove one directory entry of `ino` and decrement its link count
    * (filesystem.rs:946 `hardlinks -= 1`): while other links remain the
    * removed entry becomes a tombstone immediately (the NAME is gone from
    * its directory; the inode lives on through its siblings, which mirror
    * the decremented count); the LAST link drops to 0 and survives until
    * [[forget]], the unlink→forget two-step of inode_table.rs:159-186. */
  private def dropEntry(d: DataFrame, ino: Long,
      isEntry: Column): DataFrame = {
    val links = d
      .filter(col("ino") === ino && col("nlink") > 0)
      .agg(max(col("nlink")))
      .head()
      .getLong(0)
    if (links > 1)
      d.withColumn(
        "nlink",
        when(col("ino") === ino && isEntry && col("nlink") > 0, lit(-1L))
          .when(col("ino") === ino && col("nlink") > 0, col("nlink") - 1)
          .otherwise(col("nlink")))
    else
      d.withColumn(
        "nlink",
        when(col("ino") === ino && isEntry && col("nlink") > 0, lit(0L))
          .otherwise(col("nlink")))
  }

  /** Unlink: the entry's link count decrements (hardlink-aware); the last
    * link drops to 0 but the row survives until [[forget]] — mirrors
    * inode_table.rs:159-186 (unlink keeps ino until forget). */
  def unlink(parent: Long, name: String): InodeCatalog =
    lookup(parent, name) match {
      case Some(node) =>
        InodeCatalog(
          dropEntry(df, node.getAs[Long]("ino"),
            col("parent") === parent && col("name") === name))
      case None => this
    }

  /** Forget: the unlinked inode becomes a tombstone (nlink = -1) —
    * invisible to every lookup (which all require nlink > 0) but
    * retaining the (full_path → generation) history that [[create]]
    * consults for its generation bump, the way the reference's slot
    * allocator retains per-slot generations (inode_table.rs:188-228). */
  def forget(ino: Long): InodeCatalog =
    InodeCatalog(
      df.withColumn(
        "nlink",
        when(col("ino") === ino && col("nlink") === 0, lit(-1L))
          .otherwise(col("nlink"))))

  /** Write-path size accounting: size = max(size, offset + len)
    * (filesystem.rs:1429-1432, A7). */
  def recordWrite(ino: Long, offset: Long, len: Long): InodeCatalog =
    InodeCatalog(
      df.withColumn(
        "size",
        when(col("ino") === ino, greatest(col("size"), lit(offset + len)))
          .otherwise(col("size"))))

  /** fallocate analog (filesystem.rs:1781-1811): preallocate
    * [offset, offset+len) WITHOUT writing content — unless the
    * FALLOC_FL_KEEP_SIZE mode bit is set, the size follows the A7 rule
    * size = max(size, offset+len) (the reference's
    * `if (offset + length) > attrs.size { attrs.size = offset + length }`
    * under `mode & FALLOC_FL_KEEP_SIZE == 0`). Errors mirror the
    * reference/POSIX: unknown inode → ENOENT (the content-path open
    * fails), non-file → EBADF (only regular files preallocate), bad
    * range → EINVAL. */
  def fallocate(ino: Long, offset: Long, len: Long,
      keepSize: Boolean = false): Either[String, InodeCatalog] =
    if (offset < 0 || len <= 0) Left(s"EINVAL: offset=$offset len=$len")
    else getattr(ino) match {
      case None => Left(s"ENOENT: ino $ino")
      case Some(r) if r.getAs[String]("kind") != "file" =>
        Left(s"EBADF: ino $ino is a ${r.getAs[String]("kind")}")
      case Some(_) if keepSize => Right(this) // space reserved, size kept
      case Some(_) => Right(recordWrite(ino, offset, len))
    }

  /** statfs analog (filesystem.rs:1559-1572): the reference stubs the
    * reply with fixed capacities and TODOs the accounting; here the
    * accounting is real — live-inode count and 512-byte block usage
    * (F9 rule) aggregated over the catalog, reported against the stub's
    * advertised 10 000/10 000 capacities with the BLOCK_SIZE /
    * MAX_NAME_LENGTH constants (filesystem.rs:33-34). One global
    * map-side-combined aggregate; the catalog-wide oracle twin is
    * q_fs_statfs. */
  def statfs(): Statfs = {
    val r = df
      .filter(col("nlink") > 0)
      .agg(
        count(lit(1)),
        coalesce(sum(blocksOf(col("size"))), lit(0L)))
      .head()
    val inodesUsed = r.getLong(0)
    val blocksUsed = r.getLong(1)
    Statfs(
      blocksTotal = StatfsBlockCapacity,
      blocksUsed = blocksUsed,
      blocksFree = math.max(0L, StatfsBlockCapacity - blocksUsed),
      inodesTotal = StatfsInodeCapacity,
      inodesUsed = inodesUsed,
      inodesFree = math.max(0L, StatfsInodeCapacity - inodesUsed),
      blockSize = 512,
      nameMax = MaxNameLength)
  }

  // -- xattrs (filesystem.rs xattr surface, string-keyed MapType) --------
  def setxattr(ino: Long, key: String, value: Array[Byte]): InodeCatalog =
    InodeCatalog(
      df.withColumn(
        "xattrs",
        when(
          col("ino") === ino,
          map_concat(
            map_filter(col("xattrs"), (k, _) => k =!= key),
            map(lit(key), lit(value)))).otherwise(col("xattrs"))))

  def getxattr(ino: Long, key: String): Option[Array[Byte]] =
    getattr(ino).flatMap(r =>
      r.getAs[Map[String, Array[Byte]]]("xattrs").get(key))

  def listxattr(ino: Long): Seq[String] =
    getattr(ino)
      .map(_.getAs[Map[String, Array[Byte]]]("xattrs").keys.toSeq.sorted)
      .getOrElse(Seq.empty)

  /** P7-enforced xattr read: the namespace policy (xattr_access_check,
    * filesystem.rs:126-174) evaluated against the inode's owner/mode for
    * the requesting (uid, gid) before the raw lookup runs. */
  def getxattrChecked(ino: Long, key: String, reqUid: Int,
      reqGid: Int): Either[String, Option[Array[Byte]]] =
    if (xattrOpAllowed(ino, key, mask = 4, reqUid, reqGid))
      Right(getxattr(ino, key))
    else Left(s"EPERM: $key")

  /** P7-enforced xattr write (mask W_OK). */
  def setxattrChecked(ino: Long, key: String, value: Array[Byte],
      reqUid: Int, reqGid: Int): Either[String, InodeCatalog] =
    if (xattrOpAllowed(ino, key, mask = 2, reqUid, reqGid))
      Right(setxattr(ino, key, value))
    else Left(s"EPERM: $key")

  /** Evaluate the xattr policy for one inode. Uses the scalar twin of the
    * column expression (spec-checked equivalent) — the policy is pure bit
    * arithmetic, so only the getattr point read touches Spark. */
  private def xattrOpAllowed(ino: Long, key: String, mask: Int,
      reqUid: Int, reqGid: Int): Boolean =
    getattr(ino).exists { r =>
      xattrAccessAllowedScalar(key, mask, r.getAs[Int]("uid"),
        r.getAs[Int]("gid"), r.getAs[Int]("mode"), reqUid, reqGid)
    }

  def removexattr(ino: Long, key: String): InodeCatalog =
    InodeCatalog(
      df.withColumn(
        "xattrs",
        when(col("ino") === ino, map_filter(col("xattrs"), (k, _) => k =!= key))
          .otherwise(col("xattrs"))))

  /** Persist the catalog snapshot — the analog of SimpleFS serializing
    * its inode table to `$data_dir/inodes` (filesystem.rs:241-242,
    * 356-380), except parquet instead of bincode so the stored catalog
    * is itself queryable. Materializes first so a catalog loaded from
    * `dir` can save back to the SAME `dir` (writing straight from the
    * lineage would hit Spark's cannot-overwrite-path-being-read-from
    * check — the load→mutate→save cycle is the whole point). */
  def save(dir: String): Unit =
    df.localCheckpoint(true).write.mode("overwrite").parquet(dir)

  /** Force computation of the snapshot (long op chains otherwise build
    * ever-deeper plans — the batch analog of flushing the write log). */
  def checkpointed(): InodeCatalog = {
    val mat = df.localCheckpoint(true)
    InodeCatalog(mat)
  }
}

object InodeCatalog {
  val MaxNameLength = 255 // filesystem.rs:34 (P9)

  /** The stub capacities the reference's statfs reply advertises
    * (filesystem.rs:1562-1566). */
  val StatfsBlockCapacity = 10000L
  val StatfsInodeCapacity = 10000L

  /** statfs reply fields (ReplyStatfs, filesystem.rs:1561-1571). */
  final case class Statfs(
      blocksTotal: Long,
      blocksUsed: Long,
      blocksFree: Long,
      inodesTotal: Long,
      inodesUsed: Long,
      inodesFree: Long,
      blockSize: Int,
      nameMax: Int)

  val schema: StructType = StructType(Seq(
    StructField("ino", LongType, nullable = false),
    StructField("parent", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("full_path", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("mode", IntegerType, nullable = false),
    StructField("uid", IntegerType, nullable = false),
    StructField("gid", IntegerType, nullable = false),
    StructField("generation", LongType, nullable = false),
    StructField("nlink", LongType, nullable = false),
    StructField("xattrs", MapType(StringType, BinaryType), nullable = false),
    // symlink inodes store their target here (filesystem.rs:1062 keeps it
    // as the inode's content); NULL for every other kind
    StructField("symlink_target", StringType, nullable = true)))

  /** Reload a persisted catalog (schema-checked: names AND types, so a
    * wrong-typed parquet fails here rather than deep inside a later
    * operation). */
  def load(spark: SparkSession, dir: String): InodeCatalog = {
    val df = spark.read.parquet(dir)
    val got = df.schema.fields.map(f => f.name -> f.dataType).sortBy(_._1)
    val want = schema.fields.map(f => f.name -> f.dataType).sortBy(_._1)
    require(
      got.sameElements(want),
      s"not a catalog snapshot: got ${got.mkString(",")}")
    InodeCatalog(df.select(schema.fieldNames.map(col): _*))
  }

  /** Fresh catalog containing only the root directory (ino 1). */
  def empty(spark: SparkSession): InodeCatalog =
    InodeCatalog(
      spark.createDataFrame(
        java.util.List.of(
          Row(1L, 0L, "", "/", "dir", 0L, 0x1ed, 0, 0, 0L, 1L,
            Map.empty[String, Array[Byte]], null)),
        schema))

  /** P6: POSIX access predicate — mode-bit arithmetic over (uid, gid,
    * mask), mirroring filesystem.rs:1870-1904: root passes everything,
    * owner bits shift 6, group bits shift 3, other bits shift 0. */
  def accessAllowed(uid: Column, gid: Column, mode: Column,
      reqUid: Int, reqGid: Int, mask: Int): Column = {
    if (reqUid == 0) lit(true)
    else {
      val eff = when(uid === reqUid, shiftright(mode, 6))
        .when(gid === reqGid, shiftright(mode, 3))
        .otherwise(mode)
      (eff.bitwiseAND(lit(7)).bitwiseAND(lit(mask))) === mask
    }
  }

  /** Column-form POSIX check (filesystem.rs:1870-1903) for requester ids
    * carried in columns: F_OK (mask 0) always passes, root reads/writes
    * anything but execs only if SOME x bit is set; otherwise exactly one
    * tier (owner/group/other) must cover the mask. */
  def checkAccess(fileUid: Column, fileGid: Column, mode: Column,
      reqUid: Column, reqGid: Column, mask: Column): Column = {
    val anyX = (shiftright(mode, 6).bitwiseOR(shiftright(mode, 3)).bitwiseOR(mode))
      .bitwiseAND(lit(1))
    val rootOk = (mask.bitwiseAND(lit(1)) === 0) || (anyX === 1)
    val eff = when(fileUid === reqUid, shiftright(mode, 6))
      .when(fileGid === reqGid, shiftright(mode, 3))
      .otherwise(mode)
    when(reqUid === 0, rootOk)
      .otherwise(mask.bitwiseAND(eff).bitwiseAND(lit(7)) === mask)
  }

  /** P7: xattr namespace classification (filesystem.rs:74-107) — dotted
    * `user.` / `system.` / `trusted.` prefixes, the bare `security`
    * prefix (no dot, as in the reference), anything else unsupported
    * (ENOTSUP → NULL). */
  def xattrNamespace(key: Column): Column =
    when(key.startsWith("user."), "user")
      .when(key.startsWith("system."), "system")
      .when(key.startsWith("trusted."), "trusted")
      .when(key.startsWith("security"), "security")
      .otherwise(lit(null).cast(StringType))

  /** P7: the xattr access policy (filesystem.rs:126-174): security is
    * world-readable but root-writable; trusted is root-only; system is
    * root-only except `system.posix_acl_access` which follows the POSIX
    * file bits; user follows the POSIX file bits; unknown namespaces are
    * denied (ENOTSUP). */
  def xattrAccessAllowed(key: Column, mask: Column,
      fileUid: Column, fileGid: Column, mode: Column,
      reqUid: Column, reqGid: Column): Column = {
    val ns = xattrNamespace(key)
    val posix = checkAccess(fileUid, fileGid, mode, reqUid, reqGid, mask)
    when(ns === "security", (mask === 4) || (reqUid === 0))
      .when(ns === "trusted", reqUid === 0)
      .when(ns === "system",
        when(key === "system.posix_acl_access", posix).otherwise(reqUid === 0))
      .when(ns === "user", posix)
      .otherwise(lit(false))
  }

  /** Scalar twin of [[checkAccess]] for driver-side point ops (an xattr
    * permission check is pure bit arithmetic over seven scalars — running
    * a Spark job per check would make every CRUD call O(job launch)).
    * FsSemanticsSpec asserts equivalence with the column form over a
    * combinatorial sweep. */
  def checkAccessScalar(fileUid: Int, fileGid: Int, mode: Int,
      reqUid: Int, reqGid: Int, mask: Int): Boolean =
    if (reqUid == 0) (mask & 1) == 0 || (((mode >> 6) | (mode >> 3) | mode) & 1) == 1
    else {
      val eff =
        if (fileUid == reqUid) mode >> 6
        else if (fileGid == reqGid) mode >> 3
        else mode
      (mask & eff & 7) == mask
    }

  /** Scalar twin of [[xattrAccessAllowed]] (same spec-checked equivalence). */
  def xattrAccessAllowedScalar(key: String, mask: Int, fileUid: Int,
      fileGid: Int, mode: Int, reqUid: Int, reqGid: Int): Boolean = {
    val posix = checkAccessScalar(fileUid, fileGid, mode, reqUid, reqGid, mask)
    if (key.startsWith("user.")) posix
    else if (key.startsWith("system."))
      if (key == "system.posix_acl_access") posix else reqUid == 0
    else if (key.startsWith("trusted.")) reqUid == 0
    else if (key.startsWith("security")) mask == 4 || reqUid == 0
    else false
  }

  /** F8: suid/sgid clear on write (filesystem.rs:110-116). SUID always
    * clears; SGID clears only when group-execute is set (otherwise the
    * bit means mandatory locking, not setgid). */
  def clearSuidSgid(mode: Column): Column = {
    val noSuid = mode - mode.bitwiseAND(lit(0x800))
    when(noSuid.bitwiseAND(lit(8)) =!= 0,
      noSuid - noSuid.bitwiseAND(lit(0x400)))
      .otherwise(noSuid)
  }

  /** F6: st_mode → file type via the full S_IFMT decode chain
    * (passthrough_fs.rs:28-41). The reference panics on an unknown
    * pattern; an analytic engine surfaces NULL so bad rows are
    * filterable instead of fatal. */
  def modeToFiletype(stMode: Column): Column = {
    val fmt = stMode.bitwiseAND(lit(0xF000))
    when(fmt === 0x4000, "dir")
      .when(fmt === 0x8000, "file")
      .when(fmt === 0xA000, "symlink")
      .when(fmt === 0x6000, "blockdev")
      .when(fmt === 0x2000, "chardev")
      .when(fmt === 0x1000, "fifo")
      .when(fmt === 0xC000, "socket")
      .otherwise(lit(null).cast(StringType))
  }

  // P8/F10: file-handle permission bits in the top 2 bits of the fh
  // (filesystem.rs:39-41,304-324).
  private val FhRead = 1L << 63
  private val FhWrite = 1L << 62
  def fhEncode(fh: Long, read: Boolean, write: Boolean): Long =
    fh | (if (read) FhRead else 0L) | (if (write) FhWrite else 0L)
  def fhAllowsRead(fh: Column): Column = fh.bitwiseAND(lit(FhRead)) =!= 0
  def fhAllowsWrite(fh: Column): Column = fh.bitwiseAND(lit(FhWrite)) =!= 0
  /** Scalar twins for driver-side point ops (check_file_handle_read/
    * write, filesystem.rs:380-386). */
  def fhAllowsReadScalar(fh: Long): Boolean = (fh & FhRead) != 0
  def fhAllowsWriteScalar(fh: Long): Boolean = (fh & FhWrite) != 0

  /** F9: block accounting, (size + 511) / 512 (filesystem.rs:221,33). */
  def blocksOf(size: Column): Column = ceil(size / lit(512.0)).cast("long")
}
