package graft

import graft.api.GraftEngine
import java.nio.file.Files

class GraftEngineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val engine =
    new GraftEngine(spark, Files.createTempDirectory("engine").toString, 64)

  test("kv plane: put/get through the facade") {
    engine.kv.put(Seq(("obj1", "payload".getBytes)).toDF("key", "value"))
    assert(new String(engine.kv.get("obj1").get) === "payload")
  }

  test("fs plane: stateful catalog ops through the facade") {
    engine.updateFs(_.mkdir(1, "data"))
    val dataIno = engine.fs.lookup(1, "data").get.getAs[Long]("ino")
    engine.updateFs(_.create(dataIno, "file.txt", "file"))
    assert(engine.fs.resolve("/data/file.txt").isDefined)
    engine.updateFs(_.rename(1, "data", 1, "archive"))
    assert(engine.fs.resolve("/archive/file.txt").isDefined)
    assert(engine.fs.resolve("/data/file.txt").isEmpty)
  }

  test("query plane: registry dispatch and helpful unknown-name error") {
    val df = engine.query("q1_agg", sf)
    assert(df.count() > 0)
    val err = intercept[RuntimeException](engine.query("nope", sf))
    assert(err.getMessage.contains("unknown query 'nope'"))
    assert(err.getMessage.contains("q1_agg"), "error must list known queries")
  }

  test("sql plane: graft functions are live") {
    val d = engine
      .sql("SELECT vec_dot(array(CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(d === 6.0)
  }
}
