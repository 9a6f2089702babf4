package graft.config

import java.io.FileInputStream
import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml

/** Config surface (SURVEY.md §2 S3/P6), mirroring the reference's YAML
  * model (internal/config/config.go:25-63), env-var overrides
  * (cmd/connector/main.go:14-24,50-55) and option validation
  * (pkg/connector/connector.go:321-351):
  *
  *  - dbName/collName are required (ErrDbNameMissing/ErrCollNameMissing)
  *  - tokens (db, coll) must not equal the watched (db, coll),
  *    case-insensitively (ErrInvalidDbAndCollNames)
  *  - defaults: tokensDbName = "resume-tokens", tokensCollName = collName,
  *    streamName = upper(collName) (P5), capped tokens with 4096 bytes
  *    (connector.go:39-49 defaults)
  */
final case class CollectionConfig(
    dbName: String,
    collName: String,
    changeStreamPreAndPostImages: Boolean = false,
    tokensDbName: String = CollectionConfig.DefaultTokensDbName,
    tokensCollName: String = "",
    tokensCollCapped: Boolean = true,
    tokensCollSizeInBytes: Long = 4096L,
    streamName: String = "") {
  def resolvedTokensCollName: String =
    if (tokensCollName.nonEmpty) tokensCollName else collName
  def resolvedStreamName: String =
    if (streamName.nonEmpty) streamName else collName.toUpperCase
}

object CollectionConfig {
  val DefaultTokensDbName = "resume-tokens"
}

final case class ConnectorConfig(
    logLevel: String,
    mongoUri: String,
    natsUrl: String,
    serverAddr: String,
    collections: Seq[CollectionConfig])

object ConnectorConfig {

  final class ConfigException(msg: String) extends RuntimeException(msg)

  /** P6 — env-var override (cmd/connector/main.go:14-24). */
  def envOrDefault(name: String, default: String,
      env: Map[String, String] = sys.env): String =
    env.get(name).filter(_.nonEmpty).getOrElse(default)

  /** Validation per WithCollection (pkg/connector/connector.go:321-351). */
  def validate(c: CollectionConfig): CollectionConfig = {
    if (c.dbName.isEmpty) throw new ConfigException("dbName missing")
    if (c.collName.isEmpty) throw new ConfigException("collName missing")
    if (c.dbName.equalsIgnoreCase(c.tokensDbName) &&
        c.collName.equalsIgnoreCase(c.resolvedTokensCollName))
      throw new ConfigException(
        "tokens collection must differ from the watched collection")
    c
  }

  /** S3 — YAML load (internal/config/config.go:10-23), with env overrides
    * applied like cmd/connector/main.go:20-41.
    */
  def load(path: String, env: Map[String, String] = sys.env): ConnectorConfig = {
    val in = new FileInputStream(path)
    val root =
      try new Yaml().load[java.util.Map[String, Object]](in)
      finally in.close()
    if (root == null || !root.containsKey("connector"))
      throw new ConfigException("missing top-level 'connector' block")
    val conn = root.get("connector").asInstanceOf[java.util.Map[String, Object]]

    def section(name: String): Map[String, Object] =
      Option(conn.get(name))
        .map(_.asInstanceOf[java.util.Map[String, Object]].asScala.toMap)
        .getOrElse(Map.empty)
    def str(m: Map[String, Object], k: String, d: String = ""): String =
      m.get(k).map(String.valueOf).filter(_ != "null").getOrElse(d)

    val colls = Option(conn.get("collections")).toSeq
      .flatMap(_.asInstanceOf[java.util.List[Object]].asScala)
      .map(_.asInstanceOf[java.util.Map[String, Object]].asScala.toMap)
      .map { m =>
        validate(CollectionConfig(
          dbName = str(m, "dbName"),
          collName = str(m, "collName"),
          changeStreamPreAndPostImages =
            str(m, "changeStreamPreAndPostImages", "false").toBoolean,
          tokensDbName =
            str(m, "tokensDbName", CollectionConfig.DefaultTokensDbName),
          tokensCollName = str(m, "tokensCollName"),
          tokensCollCapped = str(m, "tokensCollCapped", "true").toBoolean,
          tokensCollSizeInBytes =
            str(m, "tokensCollSizeInBytes", "4096").toLong,
          streamName = str(m, "streamName")))
      }

    ConnectorConfig(
      logLevel = envOrDefault("LOG_LEVEL", str(section("log"), "level", "info"), env),
      mongoUri = envOrDefault("MONGO_URI", str(section("mongo"), "uri"), env),
      natsUrl = envOrDefault("NATS_URL", str(section("nats"), "url"), env),
      serverAddr = envOrDefault("SERVER_ADDR", str(section("server"), "addr"), env),
      collections = colls)
  }
}
