package graft.config

/** Engine configuration mirroring the reference's settings surface
  * (SURVEY §2.8 F11 / §2.10 FromConfig).
  *
  * The reference loads a layered config (file + environment) into a
  * `Settings` struct with per-field defaults
  * (/root/reference/common/src/settings.rs:16-99) and gives components a
  * `FromConfig` trait resolving prefixed keys with their own defaults
  * (settings.rs:103-124, local_kv_options.rs:15-44). Here the layered
  * source is a plain key→value map (caller merges file/env/spark-conf
  * layers however it likes — the precedence logic, not the file parsing,
  * is the semantics worth keeping).
  */
final case class GraftSettings(
    debug: Boolean,
    logLevel: String,
    hostname: String,
    localIp: String,
    httpPort: Int,
    http2Port: Int,
    socketPort: Int,
    serviceDiscoveryType: String,
    etcdUris: Seq[String],
    staticServiceList: Seq[String],
    metricsPushUri: Option[String])

object GraftSettings {

  /** Unparseable values fall back to the field default, exactly like the
    * reference's `config.get::<T>(key).unwrap_or(default)` — a malformed
    * layer entry must not abort settings load. */
  private[config] def intOr(c: Map[String, String], k: String, d: Int): Int =
    c.get(k).flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(d)
  private def boolOr(c: Map[String, String], k: String, d: Boolean): Boolean =
    c.get(k).flatMap(v => scala.util.Try(v.trim.toBoolean).toOption).getOrElse(d)

  /** Mirror of `Settings::from(Config)` (settings.rs:32-90): same keys,
    * same defaults, same conditional list resolution — static discovery
    * defaults its own list to `localhost:{http_port}`, etcd discovery
    * defaults to `localhost:2379`, and each populates ONLY its own list. */
  def fromMap(c: Map[String, String]): GraftSettings = {
    val httpPort = intOr(c, "http_port", 8080)
    val discovery = c.getOrElse("service_discovery_type", "static")
    GraftSettings(
      debug = boolOr(c, "is_debug", d = false),
      logLevel = c.getOrElse("log_level", "INFO"),
      hostname = c.getOrElse("graft_hostname",
        java.net.InetAddress.getLocalHost.getHostName),
      localIp = c.getOrElse("local_ip", "127.0.0.1"),
      httpPort = httpPort,
      http2Port = intOr(c, "http2_port", 5928),
      socketPort = intOr(c, "socket_port", 19090),
      serviceDiscoveryType = discovery,
      etcdUris =
        if (discovery == "etcd")
          c.getOrElse("etcd_uris", "localhost:2379").split(',').toSeq
        else Seq.empty,
      staticServiceList =
        if (discovery == "static")
          c.getOrElse("static_service_list", s"localhost:$httpPort")
            .split(',').toSeq
        else Seq.empty,
      metricsPushUri = c.get("metrics_push_uri"))
  }
}

/** FromConfig analog (settings.rs:103-124): components resolve their keys
  * under an optional prefix, falling back to per-field defaults. */
trait FromConfig[T] {
  def fromWithPrefix(prefix: String, c: Map[String, String]): T
  final def from(c: Map[String, String]): T = fromWithPrefix("", c)
}

/** KV store options (local_kv_options.rs:9-34): root path, bucket count,
  * chunk size — the values [[graft.sources.KvStore]] and the chunked
  * transfer path consume. (Reference default root is /tmp/fairy_store;
  * renamed for this engine, same placement semantics.) */
final case class LocalKvOptions(
    rootPath: String,
    numBucket: Int,
    chunkSize: Int)

object LocalKvOptions extends FromConfig[LocalKvOptions] {
  def fromWithPrefix(prefix: String, c: Map[String, String]): LocalKvOptions = {
    def key(k: String) = if (prefix.isEmpty) k else s"$prefix.$k"
    LocalKvOptions(
      rootPath = c.getOrElse(key("local_kv_root_path"), "/tmp/graft_store"),
      numBucket = GraftSettings.intOr(c, key("local_kv_num_bucket"), 1024),
      chunkSize = GraftSettings.intOr(c, key("local_kv_chunk_size"), 128 * 1024))
  }
}

/** Mount options with conflict validation (P10) — the reference models
  * FUSE mount options as an enum with a pairwise conflict relation and
  * rejects any option set whose conflict closure intersects the set
  * (mount_options.rs:10-131). The session has no kernel mount, but the
  * option grammar and validation are part of the engine surface.
  */
sealed trait MountOption
object MountOption {
  final case class FsName(name: String) extends MountOption
  final case class Subtype(name: String) extends MountOption
  final case class Custom(value: String) extends MountOption
  case object AllowOther extends MountOption
  case object AllowRoot extends MountOption
  case object AutoUnmount extends MountOption
  case object DefaultPermissions extends MountOption
  case object Dev extends MountOption
  case object NoDev extends MountOption
  case object Suid extends MountOption
  case object NoSuid extends MountOption
  case object RO extends MountOption
  case object RW extends MountOption
  case object Exec extends MountOption
  case object NoExec extends MountOption
  case object Atime extends MountOption
  case object NoAtime extends MountOption
  case object DirSync extends MountOption
  case object Sync extends MountOption
  case object Async extends MountOption

  /** mount_options.rs:65-90. Unrecognized strings become Custom (passed
    * through, like libfuse-specific flags). */
  def fromString(s: String): MountOption = s match {
    case "auto_unmount" => AutoUnmount
    case "allow_other" => AllowOther
    case "allow_root" => AllowRoot
    case "default_permissions" => DefaultPermissions
    case "dev" => Dev
    case "nodev" => NoDev
    case "suid" => Suid
    case "nosuid" => NoSuid
    case "ro" => RO
    case "rw" => RW
    case "exec" => Exec
    case "noexec" => NoExec
    case "atime" => Atime
    case "noatime" => NoAtime
    case "dirsync" => DirSync
    case "sync" => Sync
    case "async" => Async
    case x if x.startsWith("fsname=") => FsName(x.drop(7))
    case x if x.startsWith("subtype=") => Subtype(x.drop(8))
    case x => Custom(x)
  }

  /** mount_options.rs:135-163 (note AllowRoot stringifies as allow_other
    * there because fuser implements it by post-restriction; we keep the
    * faithful name so fromString∘asString is identity for every option). */
  def asString(o: MountOption): String = o match {
    case FsName(n) => s"fsname=$n"
    case Subtype(n) => s"subtype=$n"
    case Custom(v) => v
    case AutoUnmount => "auto_unmount"
    case AllowOther => "allow_other"
    case AllowRoot => "allow_root"
    case DefaultPermissions => "default_permissions"
    case Dev => "dev"
    case NoDev => "nodev"
    case Suid => "suid"
    case NoSuid => "nosuid"
    case RO => "ro"
    case RW => "rw"
    case Exec => "exec"
    case NoExec => "noexec"
    case Atime => "atime"
    case NoAtime => "noatime"
    case DirSync => "dirsync"
    case Sync => "sync"
    case Async => "async"
  }

  /** Pairwise conflict relation (mount_options.rs:108-131). */
  def conflictsWith(o: MountOption): Seq[MountOption] = o match {
    case AllowOther => Seq(AllowRoot)
    case AllowRoot => Seq(AllowOther)
    case Dev => Seq(NoDev)
    case NoDev => Seq(Dev)
    case Suid => Seq(NoSuid)
    case NoSuid => Seq(Suid)
    case RO => Seq(RW)
    case RW => Seq(RO)
    case Exec => Seq(NoExec)
    case NoExec => Seq(Exec)
    case Atime => Seq(NoAtime)
    case NoAtime => Seq(Atime)
    case Sync => Seq(Async)
    case Async => Seq(Sync)
    case _ => Seq.empty
  }

  /** mount_options.rs:94-106: fail iff the set intersects its own
    * conflict closure. */
  def checkOptionConflicts(options: Seq[MountOption]): Either[String, Unit] = {
    val set = options.toSet
    val conflicting = options.flatMap(conflictsWith).toSet
    val inter = conflicting.intersect(set)
    if (inter.nonEmpty)
      Left(s"Conflicting mount options found: ${inter.map(asString).toSeq.sorted.mkString(", ")}")
    else Right(())
  }

  /** mount_options.rs:169-186: parse `-o`-style args — `-o X`,
    * `-oX`, and comma-joined lists; anything else is an error. */
  def parseOptionsFromArgs(args: Seq[String]): Either[String, Seq[MountOption]] = {
    val out = Seq.newBuilder[MountOption]
    val it = args.iterator
    while (it.hasNext) {
      val opt = it.next() match {
        case "-o" =>
          if (!it.hasNext)
            return Left("Error parsing args: Expected option, reached end of args")
          it.next()
        case x if x.startsWith("-o") => x.drop(2)
        case x => return Left(s"Error parsing args: expected -o, got $x")
      }
      opt.split(',').foreach(o => out += fromString(o))
    }
    Right(out.result())
  }
}
