package graft

import org.apache.spark.sql.SparkSession

import graft.config.ConnectorConfig
import graft.streaming.Connector

/** CLI entry point (SURVEY.md §3.1; cmd/connector/main.go:14-55 analog):
  *
  *   CONFIG_FILE=connector.yaml DATA_ROOT=/data \
  *     spark-submit --class graft.Main graft.jar
  *
  * Env overrides (P6) are applied by ConnectorConfig.load; the run blocks
  * until every collection's stream terminates (or drains, with
  * RUN_AVAILABLE_NOW=true — the batch-drain mode used by tests/CI).
  * SIGTERM/SIGINT → graceful stop via the JVM shutdown hook (C4,
  * connector.go:102,180-198).
  */
object Main {

  def runCli(env: Map[String, String],
      sparkBuilder: () => SparkSession = defaultSession): Unit = {
    val configFile =
      ConnectorConfig.envOrDefault("CONFIG_FILE", "connector.yaml", env)
    val dataRoot = ConnectorConfig.envOrDefault("DATA_ROOT", "data", env)
    val availableNow =
      ConnectorConfig.envOrDefault("RUN_AVAILABLE_NOW", "false", env).toBoolean
    val cfg = ConnectorConfig.load(configFile, env)
    val spark = sparkBuilder()
    sys.addShutdownHook { // C4
      graft.streaming.StreamingCdc.stopAll(spark)
    }
    Connector.run(spark, cfg, dataRoot, availableNow)
  }

  private def defaultSession(): SparkSession =
    SparkSession.builder()
      .appName("graft-connector")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

  def main(args: Array[String]): Unit = runCli(sys.env)
}
