package graft.config

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Layered key-value configuration with the reference's precedence and env
  * translation semantics (Configs.java, ConfigUtils.java, the composite
  * stack in PrometheusPusher.java:92-118):
  *
  *   CLI/explicit overrides > config file > system properties >
  *   translated env (GRAFT_ prefix) > raw env > defaults
  *
  * Env translation = ConfigUtils.envToProp: strip prefix, lowercase,
  * `_` → `.` (`GRAFT_CONSUMER_TOPIC` → `consumer.topic`) — the
  * Docker-container convention the reference supports.
  */
final case class GraftConfig(entries: Map[String, String]) {

  def get(key: String): Option[String] = entries.get(key)
  def getOrElse(key: String, default: String): String = entries.getOrElse(key, default)
  def getInt(key: String, default: Int): Int =
    entries.get(key).map(_.trim.toInt).getOrElse(default)
  def getBoolean(key: String, default: Boolean): Boolean =
    entries.get(key).map(_.trim.toBoolean).getOrElse(default)

  /** Sub-configuration of keys under `prefix.` with the prefix stripped —
    * Configuration.subset parity (used for the consumer.* Kafka settings).
    */
  def subset(prefix: String): Map[String, String] =
    entries.collect {
      case (k, v) if k.startsWith(prefix + ".") => k.drop(prefix.length + 1) -> v
    }

  /** Later layers win. */
  def overlay(higher: Map[String, String]): GraftConfig =
    GraftConfig(entries ++ higher)
}

object GraftConfig {

  val EnvPrefix = "GRAFT_"

  /** Reference defaults (Configs.java static block), minus Kafka-client
    * constants that don't apply outside a broker deployment.
    */
  val Defaults: Map[String, String] = Map(
    "consumer.topic" -> "metrics.v1",
    "consumer.auto.offset.reset" -> "latest",
    "consumer.max.poll.records" -> "1000",
    "prometheus.job" -> "graft",
    "gauge.ttl.seconds" -> "600")

  /** ConfigUtils.envToProp parity. */
  def envToProp(env: Map[String, String], prefix: String = EnvPrefix): Map[String, String] =
    env.collect {
      case (k, v) if k.startsWith(prefix) =>
        k.drop(prefix.length).toLowerCase.replace('_', '.') -> v
    }

  /** `key=value` lines; blank lines and `#` comments ignored. */
  def parseProperties(text: String): Map[String, String] =
    text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
      .map { l =>
        val i = l.indexOf('=')
        l.take(i).trim -> l.drop(i + 1).trim
      }
      .toMap

  /** Build the full layered stack. */
  def layered(
      overrides: Map[String, String] = Map.empty,
      configFile: Option[Path] = None,
      env: Map[String, String] = sys.env,
      sysProps: Map[String, String] = sys.props.toMap): GraftConfig = {
    val fileLayer = configFile
      .filter(Files.isRegularFile(_))
      .map(p => parseProperties(Files.readString(p)))
      .getOrElse(Map.empty)
    GraftConfig(Defaults)
      .overlay(envToProp(env))
      .overlay(sysProps.filter(_._1.contains(".")))
      .overlay(fileLayer)
      .overlay(overrides)
  }
}
