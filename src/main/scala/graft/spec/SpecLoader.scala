package graft.spec

import org.yaml.snakeyaml.Yaml
import scala.jdk.CollectionConverters._

/** YAML → [[Spec]], the analogue of the reference's serde_yaml + typetag
  * deserialization (/root/reference/src/lib.rs:115-117): the only
  * validation phase — unknown `type` tags fail here, exactly as an
  * unregistered typetag fails there. */
object SpecLoader {

  val sourceTypes = Set("stdin", "http_server", "kafka", "text_file",
    "csv", "json", "parquet", "orc", "xml", "binary_files")
  val processorTypes = Set("noop", "replace", "process",
    "regex_replace", "regex_split", "regex_select",
    // curation processors (our extension set — stateless map/filter
    // stages, so they run unchanged on batch AND streaming pipelines)
    "normalize_text", "strip_markup", "pii_redact",
    "quality_filter", "repetition_filter", "c4_filter", "keyword_filter",
    "domain_blocklist_gate", "linear_gate",
    // ingest gates (extension set): map-only flags against batch-trained
    // side inputs — blocklist/band-key/centroid loads happen at stage
    // build, so the stages run unchanged on batch AND streaming frames
    "contamination_gate", "exact_dup_gate", "near_dup_gate", "kmeans_serve",
    "bpe_tokenize", "semantic_gate", "chunk_tokens", "fim_transform",
    "perceptual_dup_gate", "audio_dup_gate")
  val sinkTypes = Set("stdout", "kafka", "parquet", "csv", "json", "orc", "xml",
    "upsert_parquet")

  def load(yaml: String): Spec = {
    val root = anyMap(new Yaml().load[Object](yaml))
    val input = sourceConf(anyMap(root("input")))
    val procs = anyMap(root.getOrElse("pipeline", new java.util.HashMap[String, Object]()))
      .get("processors") match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map(p => procConf(anyMap(p)))
      case _ => Nil
    }
    val output = sinkConf(anyMap(root("output")))
    Spec(input, procs, output)
  }

  def loadFile(path: String): Spec =
    load(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  private def anyMap(o: Any): Map[String, Any] = o match {
    case m: java.util.Map[_, _] => m.asScala.map { case (k, v) => k.toString -> v }.toMap
    case null => Map.empty
    case other => sys.error(s"expected mapping, got: $other")
  }

  private def strList(o: Any): Seq[String] = o match {
    case l: java.util.List[_] => l.asScala.toSeq.map(_.toString)
    case null => Nil
    case s => Seq(s.toString)
  }

  private def strMap(o: Any): Map[String, String] =
    anyMap(o).map { case (k, v) => k -> v.toString }

  private def sourceConf(m: Map[String, Any]): SourceConf = {
    val t = m("type").toString
    require(sourceTypes(t), s"unknown source type: $t")
    if (Set("text_file", "csv", "json", "parquet", "orc", "xml", "binary_files")(t))
      require(m.contains("path"), s"source type '$t' requires a path")
    if (t == "http_server")
      require(m.get("config").exists(anyMap(_).contains("spool_dir")),
        "source type 'http_server' requires config.spool_dir (durable handoff directory)")
    SourceConf(t,
      address = m.get("address").map(_.toString),
      path = m.get("path").map(_.toString),
      topics = m.get("topics").map(strList).getOrElse(Nil),
      config = m.get("config").map(strMap).getOrElse(Map.empty),
      consumeCount = m.get("consume_count").map(_.toString.toLong).filter(_ > 0))
  }

  private def procConf(m: Map[String, Any]): ProcConf = {
    val t = m("type").toString
    require(processorTypes(t), s"unknown processor type: $t")
    ProcConf(t,
      from = m.get("from").map(_.toString),
      to = m.get("to").map(_.toString),
      re = m.get("re").map(_.toString),
      rep = m.get("rep").map(_.toString),
      name = m.get("name").map(_.toString),
      args = m.get("args").map(strList).getOrElse(Nil),
      config = m.get("config").map(strMap).getOrElse(Map.empty))
  }

  private def sinkConf(m: Map[String, Any]): SinkConf = {
    val t = m("type").toString
    require(sinkTypes(t), s"unknown sink type: $t")
    if (Set("parquet", "csv", "json", "orc", "xml", "upsert_parquet")(t))
      require(m.contains("path"), s"sink type '$t' requires a path")
    SinkConf(t,
      topic = m.get("topic").map(_.toString),
      path = m.get("path").map(_.toString),
      config = m.get("config").map(strMap).getOrElse(Map.empty))
  }
}
