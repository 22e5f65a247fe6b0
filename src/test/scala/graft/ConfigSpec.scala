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

  test("kafka source options translate the consumer.* subset (contract, no broker)") {
    // the reference builds its consumer from the layered config's consumer.
    // subset (AbstractFirehose.java:63-75); the Spark source needs topic →
    // subscribe, auto.offset.reset → startingOffsets (Spark rejects it as a
    // kafka. passthrough), and everything else under the kafka. prefix —
    // including the env-translated Docker-style keys
    val cfg = GraftConfig.layered(
      env = Map(
        "GRAFT_CONSUMER_BOOTSTRAP_SERVERS" -> "broker:9092",
        "GRAFT_CONSUMER_GROUP_ID" -> "firehose",
        "GRAFT_CONSUMER_AUTO_OFFSET_RESET" -> "earliest"),
      sysProps = Map.empty)
    val opts = graft.streaming.FirehoseStream.kafkaSourceOptions(cfg)
    assert(opts("subscribe") === "metrics.v1") // default topic survives
    assert(opts("startingOffsets") === "earliest")
    assert(opts("kafka.bootstrap.servers") === "broker:9092")
    assert(opts("kafka.group.id") === "firehose")
    assert(opts("kafka.max.poll.records") === "1000") // reference default
    // the translated keys must NOT leak through as kafka. passthroughs
    assert(!opts.contains("kafka.topic") && !opts.contains("kafka.auto.offset.reset"))
    // a faithful reference config carries consumer properties Spark's
    // source manages itself and REJECTS — they must be dropped, not passed
    val full = GraftConfig.layered(
      env = Map(
        "GRAFT_CONSUMER_BOOTSTRAP_SERVERS" -> "broker:9092",
        "GRAFT_CONSUMER_KEY_DESERIALIZER" -> "org.apache.kafka.common.serialization.ByteArrayDeserializer",
        "GRAFT_CONSUMER_VALUE_DESERIALIZER" -> "org.apache.kafka.common.serialization.ByteArrayDeserializer",
        "GRAFT_CONSUMER_ENABLE_AUTO_COMMIT" -> "true"),
      sysProps = Map.empty)
    val fullOpts = graft.streaming.FirehoseStream.kafkaSourceOptions(full)
    assert(!fullOpts.contains("kafka.key.deserializer"))
    assert(!fullOpts.contains("kafka.value.deserializer"))
    assert(!fullOpts.contains("kafka.enable.auto.commit"))
    assert(fullOpts("kafka.bootstrap.servers") === "broker:9092")
  }
}
