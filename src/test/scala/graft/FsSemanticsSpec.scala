package graft

import graft.meta.InodeCatalog
import org.apache.spark.sql.functions._

/** Golden-value specs for the POSIX/xattr bit semantics ported from the
  * reference (filesystem.rs:74-174 xattr policy, :110-116 suid/sgid clear,
  * passthrough_fs.rs:28-41 S_IFMT decode) — the same cases the reference's
  * own code paths encode.
  */
class FsSemanticsSpec extends SparkSpec {
  import spark.implicits._

  /** Evaluate the xattr rule for one request against one file. */
  private def xattr(key: String, mask: Int, fileUid: Int, fileGid: Int,
      mode: Int, reqUid: Int, reqGid: Int): Boolean =
    Seq((key, mask, fileUid, fileGid, mode, reqUid, reqGid))
      .toDF("key", "mask", "uid", "gid", "mode", "req_uid", "req_gid")
      .select(InodeCatalog.xattrAccessAllowed($"key", $"mask", $"uid",
        $"gid", $"mode", $"req_uid", $"req_gid").as("ok"))
      .head().getBoolean(0)

  private def evalInt(c: org.apache.spark.sql.Column, mode: Int): Int =
    Seq(mode).toDF("m").select(c.as("r")).head().getInt(0)

  private def filetype(stMode: Int): Option[String] =
    Seq(stMode).toDF("m")
      .select(InodeCatalog.modeToFiletype($"m").as("r"))
      .head() match { case r => Option(r.getString(0)) }

  val R = 4; val W = 2

  test("security namespace: world-readable, root-writable") {
    assert(xattr("security.selinux", R, 0, 0, 0x180, 5, 5))
    assert(!xattr("security.selinux", W, 0, 0, 0x1ff, 5, 5))
    assert(xattr("security.selinux", W, 0, 0, 0x180, 0, 0))
  }

  test("trusted namespace: root-only for any access") {
    assert(!xattr("trusted.overlay", R, 0, 0, 0x1ff, 5, 5))
    assert(!xattr("trusted.overlay", W, 0, 0, 0x1ff, 5, 5))
    assert(xattr("trusted.overlay", R, 0, 0, 0x180, 0, 0))
  }

  test("system namespace: root-only except posix_acl_access which follows file bits") {
    assert(!xattr("system.quota", R, 5, 5, 0x1ff, 5, 5))
    assert(xattr("system.quota", R, 5, 5, 0x180, 0, 0))
    // mode 0600: owner passes, other does not
    assert(xattr("system.posix_acl_access", R, 5, 5, 0x180, 5, 9))
    assert(!xattr("system.posix_acl_access", R, 5, 5, 0x180, 6, 9))
  }

  test("user namespace follows the POSIX file bits per tier") {
    val mode = 0x1a4 // 0644
    assert(xattr("user.tag", R, 5, 7, mode, 5, 0)) // owner read
    assert(xattr("user.tag", W, 5, 7, mode, 5, 0)) // owner write
    assert(xattr("user.tag", R, 5, 7, mode, 6, 7)) // group read
    assert(!xattr("user.tag", W, 5, 7, mode, 6, 7)) // group write denied
    assert(xattr("user.tag", R, 5, 7, mode, 8, 9)) // other read
    assert(!xattr("user.tag", W, 5, 7, mode, 8, 9)) // other write denied
  }

  test("unknown namespace is unsupported (denied)") {
    assert(!xattr("badns.x", R, 0, 0, 0x1ff, 0, 0))
    assert(!xattr("use", R, 0, 0, 0x1ff, 0, 0)) // shorter than any prefix
  }

  test("suid always clears; sgid clears only with group-execute") {
    def clear(m: Int) = evalInt(InodeCatalog.clearSuidSgid($"m"), m)
    assert(clear(0xDED) === 0x1ED) // 06755: suid+sgid+755, grp x → both clear
    assert(clear(0x9A4) === 0x1A4) // 04644: suid clears
    assert(clear(0x5A4) === 0x5A4) // 02644: grp has NO x → sgid survives
    assert(clear(0x5ED) === 0x1ED) // 02755: grp x → sgid clears
    assert(clear(0x1A4) === 0x1A4) // no bits set → unchanged
  }

  test("clearSuidSgid scalar twin agrees with the column form over all 4096 modes") {
    val got = spark.range(0x1000)
      .select($"id".cast("int").as("m"))
      .select($"m", InodeCatalog.clearSuidSgid($"m").as("c"))
      .collect()
      .map(r => r.getInt(0) -> r.getInt(1))
    got.foreach { case (m, c) =>
      assert(c === InodeCatalog.clearSuidSgidScalar(m), f"mode 0x$m%03x")
    }
  }

  test("S_IFMT decode covers all seven types and nulls unknowns") {
    assert(filetype(0x81A4).contains("file")) // 0100644
    assert(filetype(0x41ED).contains("dir")) // 0040755
    assert(filetype(0xA1FF).contains("symlink"))
    assert(filetype(0x61B0).contains("blockdev"))
    assert(filetype(0x21B0).contains("chardev"))
    assert(filetype(0x11B0).contains("fifo"))
    assert(filetype(0xC1FF).contains("socket"))
    assert(filetype(0x01A4).isEmpty) // no S_IFMT bits
  }

  test("scalar policy twins are equivalent to the column forms (full sweep)") {
    // combinatorial grid: 6 key namespaces × 3 masks × owner/group/other/
    // root requesters × permission shapes — every cell must agree between
    // the codegen'd column expression and the driver-side scalar
    val keys = Seq("user.tag", "system.posix_acl_access", "system.quota",
      "trusted.x", "security.s", "bad.x")
    val masks = Seq(0, 2, 4)
    val modes = Seq(0x000, 0x180, 0x1A4, 0x1ED, 0x1FF, 0x1B6)
    val ids = Seq((0, 0), (5, 5), (5, 7), (6, 7), (8, 9))
    val grid = for {
      k <- keys; m <- masks; mode <- modes; (ru, rg) <- ids
    } yield (k, m, 5, 7, mode, ru, rg)
    val df = grid.toDF("key", "mask", "uid", "gid", "mode", "req_uid", "req_gid")
    val colResults = df
      .select($"key", $"mask", $"mode", $"req_uid", $"req_gid",
        InodeCatalog.xattrAccessAllowed($"key", $"mask", $"uid", $"gid",
          $"mode", $"req_uid", $"req_gid").as("allowed"),
        InodeCatalog.checkAccess($"uid", $"gid", $"mode", $"req_uid",
          $"req_gid", $"mask").as("posix"))
      .collect()
    colResults.zip(grid).foreach { case (r, (k, m, u, g, mode, ru, rg)) =>
      assert(r.getBoolean(5) ===
        InodeCatalog.xattrAccessAllowedScalar(k, m, u, g, mode, ru, rg),
        s"xattr mismatch at key=$k mask=$m mode=$mode req=($ru,$rg)")
      assert(r.getBoolean(6) ===
        InodeCatalog.checkAccessScalar(u, g, mode, ru, rg, m),
        s"posix mismatch at mask=$m mode=$mode req=($ru,$rg)")
    }
  }

  test("catalog xattr CRUD enforces the namespace policy end-to-end") {
    // file owned by uid=5 gid=5, mode 0600
    val cat = InodeCatalog.empty(spark)
      .create(1, "f", "file", mode = 0x180, uid = 5, gid = 5)
    val ino = cat.lookup(1, "f").get.getAs[Long]("ino")
    // owner can write+read user.* on their 0600 file
    val set = cat.setxattrChecked(ino, "user.tag", "v".getBytes, 5, 5)
    assert(set.isRight)
    assert(set.toOption.get.getxattrChecked(ino, "user.tag", 5, 5)
      .toOption.get.map(new String(_)).contains("v"))
    // another uid cannot even read it (0600)
    assert(set.toOption.get.getxattrChecked(ino, "user.tag", 6, 6).isLeft)
    // trusted.* is root-only; security.* readable by anyone, root-writable
    assert(cat.setxattrChecked(ino, "trusted.x", "v".getBytes, 5, 5).isLeft)
    assert(cat.setxattrChecked(ino, "trusted.x", "v".getBytes, 0, 0).isRight)
    assert(cat.setxattrChecked(ino, "security.s", "v".getBytes, 5, 5).isLeft)
    assert(cat.getxattrChecked(ino, "security.s", 6, 6).isRight)
  }

  test("object listing enumerates keys with sizes through the Hadoop FS") {
    val dir = java.nio.file.Files.createTempDirectory("listing")
    java.nio.file.Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    java.nio.file.Files.createDirectory(dir.resolve("sub"))
    java.nio.file.Files.write(dir.resolve("sub/b.bin"), Array[Byte](9))
    val got = graft.sources.ObjectListing
      .list(spark, "file:" + dir.toString)
      .select($"key", $"size").as[(String, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(("a.bin", 3L), ("sub/b.bin", 1L)))
  }

  test("checkAccess root semantics: rw always, x needs some x bit") {
    def chk(mode: Int, mask: Int, uid: Int) =
      Seq((5, 5, mode, uid, 0, mask))
        .toDF("uid", "gid", "mode", "req_uid", "req_gid", "mask")
        .select(InodeCatalog.checkAccess($"uid", $"gid", $"mode",
          $"req_uid", $"req_gid", $"mask").as("ok"))
        .head().getBoolean(0)
    assert(chk(0x000, R | W, 0)) // root rw on 0000
    assert(!chk(0x1B6, 1, 0)) // 0666: root exec denied, no x anywhere
    assert(chk(0x1B7, 1, 0)) // 0667: some x bit → root exec ok
    assert(chk(0x000, 0, 7)) // F_OK always passes
  }

  test("fixture dir inos are dense in [2, 2+n_dirs): rename census relies on it") {
    // q_fs_rename derives new_parent arithmetically as
    // (parent-2+1+ino%3) % n_dirs + 2, which addresses dirs by POSITION
    // assuming srcnums (→ dir inos) are contiguous. With a sparse
    // fixture the inner join on the new parent would silently drop
    // those rename rows in BOTH engines — parity would hold while
    // coverage shrank with no signal. Pin the density here so a
    // testdata regeneration with gaps fails THIS spec loudly.
    val dirs = Tables
      .documents(spark, sf)
      .select((substring($"source", 4, 10).cast("int") + 2).cast("long")
        .as("ino"))
      .distinct()
    val r = dirs
      .agg(count(lit(1)).as("n"), min($"ino").as("lo"), max($"ino").as("hi"))
      .head()
    assert(r.getAs[Long]("lo") === 2L)
    assert(r.getAs[Long]("hi") === r.getAs[Long]("n") + 1L)
  }

  test("fallocateOutcome column twin agrees with the imperative fallocate on every branch") {
    // a catalog with one dir (ino 2) and two files under it: the grid
    // crosses offsets (incl. negative), lens (incl. 0), keep_size, and
    // targets (file / dir / missing), so every arm of the decision tree
    // — including EINVAL-before-ENOENT precedence — fires both ways
    val cat0 = InodeCatalog.empty(spark).mkdir(1L, "d")
    val dIno = cat0.lookup(1L, "d").get.getAs[Long]("ino")
    val withFile = cat0.create(dIno, "a.txt", "file")
    val fIno = withFile.lookup(dIno, "a.txt").get.getAs[Long]("ino")
    val catalog = withFile.recordWrite(fIno, 0L, 100L)
    val missing = 999999L
    val grid = for {
      target <- Seq(fIno, dIno, missing)
      off <- Seq(-1L, 0L, 50L, 200L)
      len <- Seq(0L, 64L)
      keep <- Seq(false, true)
    } yield (target, off, len, keep)
    // column twin over the grid: t_kind NULL models the lookup miss
    val kindOf = Map(fIno -> "file", dIno -> "dir")
    val rows = grid.map { case (t, o, l, k) =>
      (t, o, l, k, kindOf.get(t).orNull)
    }
    val colOut = rows
      .toDF("target", "off", "len", "keep", "t_kind")
      .select($"target", $"off", $"len", $"keep",
        InodeCatalog.fallocateOutcome($"off", $"len", $"t_kind", $"keep")
          .as("out"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
        -> r.getString(4))
      .toMap
    grid.foreach { case (t, o, l, k) =>
      val expected = catalog.fallocate(t, o, l, keepSize = k) match {
        case Left(e) if e.startsWith("EINVAL") => "einval"
        case Left(e) if e.startsWith("ENOENT") => "enoent"
        case Left(e) if e.startsWith("EBADF") => "ebadf"
        case Left(e) => fail(s"unexpected errno $e")
        case Right(_) if k => "ok_keep"
        case Right(_) => "ok"
      }
      assert(colOut((t, o, l, k)) === expected, s"target=$t off=$o len=$l keep=$k")
    }
    // the A7 grow rule end-to-end: crossing the end grows to off+len,
    // keep_size and within-size calls leave the size alone
    val grown = catalog.fallocate(fIno, 200L, 64L).toOption.get
    assert(grown.getattr(fIno).get.getAs[Long]("size") === 264L)
    val kept = catalog.fallocate(fIno, 200L, 64L, keepSize = true).toOption.get
    assert(kept.getattr(fIno).get.getAs[Long]("size") === 100L)
    val within = catalog.fallocate(fIno, 10L, 20L).toOption.get
    assert(within.getattr(fIno).get.getAs[Long]("size") === 100L)
  }

  test("opendirOutcome column twin agrees with the imperative opendir on every branch") {
    // grid crosses targets (dir / file / missing), all four O_ACCMODE
    // decodes (incl. the neither-bit EINVAL), O_TRUNC, and root vs
    // unprivileged requesters — so the flags-BEFORE-lookup EACCES, the
    // ENOENT/ENOTDIR ordering and the mask check all fire both ways
    val cat0 = InodeCatalog.empty(spark).mkdir(1L, "d")
    val dIno = cat0.lookup(1L, "d").get.getAs[Long]("ino")
    val withFile = cat0.create(dIno, "a.txt", "file")
    val fIno = withFile.lookup(dIno, "a.txt").get.getAs[Long]("ino")
    val missing = 999999L
    def attrsOf(i: Long) = withFile.getattr(i).map { r =>
      (r.getAs[String]("kind"), r.getAs[Int]("uid"),
        r.getAs[Int]("gid"), r.getAs[Int]("mode"))
    }
    val grid = for {
      target <- Seq(dIno, fIno, missing)
      rw <- Seq((true, false), (false, true), (true, true), (false, false))
      trunc <- Seq(false, true)
      req <- Seq((0, 0), (3, 1))
    } yield (target, rw._1, rw._2, trunc, req._1, req._2)
    val rows = grid.map { case (t, r, w, tr, ru, rg) =>
      val (kind, u, g, m) = attrsOf(t).getOrElse((null, 0, 0, 0))
      (t, r, w, tr, ru, rg, kind, u, g, m)
    }
    val colOut = rows
      .toDF("target", "read", "write", "trunc", "ru", "rg",
        "t_kind", "t_uid", "t_gid", "t_mode")
      .select($"target", $"read", $"write", $"trunc", $"ru", $"rg",
        InodeCatalog.opendirOutcome($"read", $"write", $"trunc",
          $"t_kind", $"t_uid", $"t_gid", $"t_mode", $"ru", $"rg")
          .as("out"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getInt(4), r.getInt(5)) -> r.getString(6))
      .toMap
    grid.foreach { case (t, r, w, tr, ru, rg) =>
      val expected =
        withFile.opendir(t, r, w, truncate = tr, reqUid = ru, reqGid = rg) match {
          case Left(e) if e.startsWith("EACCES") => "eacces"
          case Left(e) if e.startsWith("ENOENT") => "enoent"
          case Left(e) if e.startsWith("ENOTDIR") => "enotdir"
          case Left(e) if e.startsWith("EINVAL") => "einval"
          case Left(e) => fail(s"unexpected errno $e")
          case Right(_) => "ok"
        }
      assert(colOut((t, r, w, tr, ru, rg)) === expected,
        s"target=$t read=$r write=$w trunc=$tr req=($ru,$rg)")
    }
  }
}
