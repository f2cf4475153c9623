package graft

import graft.config._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's own settings/mount-option test cases
  * (settings.rs defaults, mount_options.rs:188-244 tests). Pure JVM —
  * no Spark session needed. */
class ConfigSpec extends AnyFunSuite {

  test("settings defaults mirror the reference field-for-field") {
    val s = GraftSettings.fromMap(Map.empty)
    assert(!s.debug)
    assert(s.logLevel === "INFO")
    assert(s.httpPort === 8080)
    assert(s.http2Port === 5928)
    assert(s.socketPort === 19090)
    assert(s.serviceDiscoveryType === "static")
    assert(s.staticServiceList === Seq("localhost:8080"))
    assert(s.etcdUris === Seq.empty)
    assert(s.metricsPushUri.isEmpty)
  }

  test("static service list default follows a configured http_port") {
    val s = GraftSettings.fromMap(Map("http_port" -> "9999"))
    assert(s.staticServiceList === Seq("localhost:9999"))
  }

  test("etcd discovery populates etcd uris and empties the static list") {
    val s = GraftSettings.fromMap(Map("service_discovery_type" -> "etcd"))
    assert(s.etcdUris === Seq("localhost:2379"))
    assert(s.staticServiceList === Seq.empty)
    val s2 = GraftSettings.fromMap(Map(
      "service_discovery_type" -> "etcd",
      "etcd_uris" -> "a:2379,b:2379"))
    assert(s2.etcdUris === Seq("a:2379", "b:2379"))
  }

  test("config file values override defaults (fairy_config.toml shape)") {
    val s = GraftSettings.fromMap(Map(
      "is_debug" -> "true",
      "http_port" -> "8080",
      "socket_port" -> "19090",
      "service_discovery_type" -> "static",
      "static_service_list" -> "localhost:8080"))
    assert(s.debug)
    assert(s.staticServiceList === Seq("localhost:8080"))
  }

  test("kv options: reference defaults and prefixed resolution") {
    val o = LocalKvOptions.from(Map.empty)
    assert(o.numBucket === 1024)
    assert(o.chunkSize === 128 * 1024)
    val p = LocalKvOptions.fromWithPrefix("worker1",
      Map("worker1.local_kv_num_bucket" -> "64",
        "local_kv_num_bucket" -> "32"))
    assert(p.numBucket === 64, "prefixed key wins; unprefixed is ignored")
  }

  test("unparseable values fall back to defaults like the reference's unwrap_or") {
    val s = GraftSettings.fromMap(Map(
      "http_port" -> "abc", "is_debug" -> "yes", "socket_port" -> ""))
    assert(s.httpPort === 8080)
    assert(!s.debug)
    assert(s.socketPort === 19090)
    assert(LocalKvOptions.from(Map("local_kv_num_bucket" -> "lots"))
      .numBucket === 1024)
  }

  test("option_checking: suid/nosuid conflict, suid/noexec fine") {
    import MountOption._
    assert(checkOptionConflicts(Seq(Suid, NoSuid)).isLeft)
    assert(checkOptionConflicts(Seq(Suid, NoExec)).isRight)
    assert(checkOptionConflicts(Seq(RO, RW)).isLeft)
    assert(checkOptionConflicts(Seq(AllowOther, AllowRoot)).isLeft)
    assert(checkOptionConflicts(Seq(Sync, Async)).isLeft)
    assert(checkOptionConflicts(Seq.empty).isRight)
  }

  test("option_round_trip: every option survives asString∘fromString") {
    import MountOption._
    val all: Seq[MountOption] = Seq(
      FsName("Blah"), Subtype("Bloo"), Custom("bongos"), AllowOther,
      AllowRoot, AutoUnmount, DefaultPermissions, Dev, NoDev, Suid, NoSuid,
      RO, RW, Exec, NoExec, Atime, NoAtime, DirSync, Sync, Async)
    all.foreach(o => assert(fromString(asString(o)) === o))
  }

  test("test_parse_options: -o forms, comma lists, and error cases") {
    import MountOption._
    assert(parseOptionsFromArgs(Seq.empty) === Right(Seq.empty))
    assert(
      parseOptionsFromArgs("-o suid -o ro,nodev,noexec -osync".split(' ').toSeq)
        === Right(Seq(Suid, RO, NoDev, NoExec, Sync)))
    assert(parseOptionsFromArgs(Seq("-o")).isLeft)
    assert(parseOptionsFromArgs(Seq("not o")).isLeft)
  }
}
