package graft.spec

/** The reference's pipeline specification (/root/reference/src/lib.rs:62-72):
  * one input, an ordered processor chain, one output — deserialized from
  * YAML with a `type` tag per plugin (typetag registry ≈ the match in
  * [[SpecLoader]]/[[Compiler]]).
  */
final case class Spec(input: SourceConf, pipeline: Seq[ProcConf], output: SinkConf)

/** A source plugin config: `type` + free-form fields (sources.rs, kafka.rs).
  * `consumeCount` is the reference's KafkaIn.consume_count (kafka.rs:44-45:
  * stop after N messages; 0/absent = unbounded) — a bounded-drain read. */
final case class SourceConf(
    typ: String,
    address: Option[String] = None,
    path: Option[String] = None,
    topics: Seq[String] = Nil,
    config: Map[String, String] = Map.empty,
    consumeCount: Option[Long] = None)

/** A processor plugin config (processors.rs, regex.rs). `config` carries
  * the free-form options of the curation processors our engine adds
  * beyond the reference set (thresholds, weight tables). */
final case class ProcConf(
    typ: String,
    from: Option[String] = None,
    to: Option[String] = None,
    re: Option[String] = None,
    rep: Option[String] = None,
    name: Option[String] = None,
    args: Seq[String] = Nil,
    config: Map[String, String] = Map.empty)

/** A sink plugin config (sinks.rs, kafka.rs). */
final case class SinkConf(
    typ: String,
    topic: Option[String] = None,
    path: Option[String] = None,
    config: Map[String, String] = Map.empty)
