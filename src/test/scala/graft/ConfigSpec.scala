package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.config.GraftConfig

class ConfigSpec extends AnyFunSuite {

  test("env translation strips prefix, lowercases, and maps _ to . (envToProp parity)") {
    val env = Map(
      "GRAFT_CONSUMER_TOPIC" -> "metrics.v2",
      "GRAFT_PROMETHEUS_JOB" -> "edge",
      "UNRELATED" -> "x")
    assert(GraftConfig.envToProp(env) ===
      Map("consumer.topic" -> "metrics.v2", "prometheus.job" -> "edge"))
  }

  test("layer precedence: overrides > file > sysprops > env > defaults") {
    val file = Files.createTempFile("graft", ".properties")
    Files.writeString(file, "# comment\nconsumer.topic=from-file\ngauge.ttl.seconds=120\n")
    val cfg = GraftConfig.layered(
      overrides = Map("gauge.ttl.seconds" -> "42"),
      configFile = Some(file),
      env = Map("GRAFT_CONSUMER_TOPIC" -> "from-env", "GRAFT_PROMETHEUS_JOB" -> "env-job"),
      sysProps = Map("prometheus.job" -> "sys-job"))
    assert(cfg.getOrElse("consumer.topic", "?") === "from-file")
    assert(cfg.getInt("gauge.ttl.seconds", -1) === 42)
    assert(cfg.getOrElse("prometheus.job", "?") === "sys-job")
    assert(cfg.getOrElse("consumer.auto.offset.reset", "?") === "latest") // default survives
  }

  test("subset extracts prefixed keys like Configuration.subset") {
    val cfg = GraftConfig(Map(
      "consumer.topic" -> "t", "consumer.group.id" -> "g", "prometheus.job" -> "j"))
    assert(cfg.subset("consumer") === Map("topic" -> "t", "group.id" -> "g"))
  }
}
