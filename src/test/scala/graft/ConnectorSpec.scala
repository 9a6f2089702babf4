package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.config.ConnectorConfig
import graft.model.{ChangeEvent, ChangeEventId, Ns}
import graft.streaming.{Connector, StreamingCdc}

/** Embedded-library lifecycle (SURVEY.md §3.2): YAML config → provision →
  * fan-out → publish → await, like connector.New(...).Run().
  */
class ConnectorSpec extends SparkSuite {
  import spark.implicits._

  private def ev(i: Int, op: String, before: Option[String] = None): ChangeEvent =
    ChangeEvent(ChangeEventId(f"$i%06d"), op, None, None,
      Some(Ns("shop", "orders")), Some(s"""{"_id":$i}"""),
      Some(s"""{"_id":$i}"""), before, None)

  test("config-driven run: provision (D1/D3), publish, commit (§3.1/§3.2)") {
    val root = Files.createTempDirectory("graft-conn").toString
    val yaml =
      s"""connector:
         |  collections:
         |    - dbName: shop
         |      collName: orders
         |      tokensCollName: orders-tokens
         |      streamName: ORD
         |""".stripMargin
    val f = Files.createTempFile("conn", ".yaml")
    Files.writeString(f, yaml)
    val cfg = ConnectorConfig.load(f.toString, env = Map.empty)

    (1 to 8).map(ev(_, "insert")).toDF().coalesce(1)
      .write.mode("append").parquet(s"$root/shop/orders/changes")
    Connector.run(spark, cfg, root, availableNow = true)

    val msgs = spark.read.parquet(s"$root/streams/ORD/messages")
    assert(msgs.count() == 8)
    assert(msgs.select("subject").as[String].head() == "ORD.insert")
    assert(StreamingCdc.latestToken(
      spark, s"$root/resume-tokens/orders-tokens").contains("000008"))
  }

  test("CLI lifecycle: Main.runCli drives config -> provision -> publish " +
      "from env alone (cmd/connector/main.go analog)") {
    val root = Files.createTempDirectory("graft-cli").toString
    val yaml =
      s"""connector:
         |  server:
         |    addr: "127.0.0.1:0"
         |  collections:
         |    - dbName: shop
         |      collName: carts
         |""".stripMargin
    val f = Files.createTempFile("cli", ".yaml")
    Files.writeString(f, yaml)
    (1 to 6).map(ev(_, "insert")).toDF().coalesce(1)
      .write.mode("append").parquet(s"$root/shop/carts/changes")

    Main.runCli(
      env = Map("CONFIG_FILE" -> f.toString, "DATA_ROOT" -> root,
        "RUN_AVAILABLE_NOW" -> "true"),
      sparkBuilder = () => spark)
    val msgs = spark.read.parquet(s"$root/streams/CARTS/messages")
    assert(msgs.count() == 6)
  }

  test("D2: preAndPostImages=false suppresses fullDocumentBeforeChange " +
      "(client.go:166-173, update_test.go:52-56)") {
    val root = Files.createTempDirectory("graft-d2").toString
    val mk = (flag: Boolean, sub: String) => StreamingCdc.StreamConfig(
      s"d2-$sub", s"$root/in", s"$root/$sub/messages", s"$root/$sub/tokens",
      s"$root/$sub/ckpt", preAndPostImages = flag)
    Seq(ev(1, "update", before = Some("""{"_id":1,"v":0}""")))
      .toDF().coalesce(1).write.mode("append").parquet(s"$root/in")

    StreamingCdc.runAll(spark, Seq(mk(true, "on"), mk(false, "off")),
      availableNow = true)
    val on = spark.read.parquet(s"$root/on/messages")
      .select("data").as[String].head()
    val off = spark.read.parquet(s"$root/off/messages")
      .select("data").as[String].head()
    assert(on.contains("fullDocumentBeforeChange"))
    assert(!off.contains("fullDocumentBeforeChange"))
  }
}
