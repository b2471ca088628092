package graft.conf

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** YAML-driven job configuration mirroring the reference's
  * config.yaml.example + config.py: Spark session settings, JDBC
  * source, table list, target URI/dataset, sizing and worker knobs,
  * state files. Environment interpolation uses `${VAR}` /
  * `${VAR:default}` (the reference runs its YAML through a Jinja2
  * pass with `env`; same capability, plainer syntax).
  */
final case class SparkConf(
    master: String = "local[*]",
    threads: Int = 8,
    format: String = "json",
    compression: String = "gzip",
    timestampFormat: String = "yyyy-MM-dd HH:mm:ss",
    logLevel: String = "WARN",
    properties: Map[String, String] = Map.empty)

final case class JdbcConf(
    url: Option[String] = None,
    properties: Map[String, String] = Map.empty)

final case class TableConf(name: String, key: String)

final case class GraftConfig(
    spark: SparkConf = SparkConf(),
    jdbc: JdbcConf = JdbcConf(),
    /** Parquet source directory (CI stand-in for the JDBC source). */
    sourceDir: Option[String] = None,
    tables: Seq[TableConf] = Nil,
    targetUri: Option[String] = None,
    warehouseRoot: Option[String] = None,
    targetDataset: Option[String] = None,
    targetDatasetDescription: Option[String] = None,
    targetDatasetLocation: String = "US",
    targetDatasetPreLabels: Map[String, String] = Map.empty,
    targetDatasetPostLabels: Map[String, String] = Map.empty,
    targetDatasetAccessEntries: Seq[String] = Nil,
    targetPartitionSizeBytes: Long = 52428800L,
    defaultRowsPerPartition: Long = 1000000L,
    introspectionExpireS: Long = 0L,
    introspectWorkers: Int = 8,
    extractWorkers: Int = 8,
    loadWorkers: Int = 32,
    dropDataset: Boolean = false,
    stateFile: String = "graft_state.json",
    lastSuccessfulRun: Option[String] = None)

object GraftConfig {

  private val mapper = new ObjectMapper(new YAMLFactory())

  /** `${VAR}` / `${VAR:default}` interpolation before parsing. */
  private[conf] def interpolate(text: String, env: Map[String, String]): String =
    "\\$\\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\\}".r.replaceAllIn(text, m =>
      scala.util.matching.Regex.quoteReplacement(
        env.get(m.group(1)).orElse(Option(m.group(2))).getOrElse(
          throw new IllegalArgumentException(
            s"config references undefined env var ${m.group(1)} with no default"))))

  def fromYaml(text: String, env: Map[String, String] = sys.env): GraftConfig =
    fromNode(mapper.readTree(interpolate(text, env)))

  def fromYamlFile(path: String, env: Map[String, String] = sys.env): GraftConfig =
    fromYaml(Files.readString(Paths.get(path)), env)

  // -- node helpers (explicit mapping, defaults from the case class) --

  private def opt(n: JsonNode, k: String): Option[JsonNode] =
    Option(n.get(k)).filter(!_.isNull)
  private def str(n: JsonNode, k: String): Option[String] = opt(n, k).map(_.asText())
  private def lng(n: JsonNode, k: String): Option[Long] = opt(n, k).map(_.asLong())
  private def int(n: JsonNode, k: String): Option[Int] = opt(n, k).map(_.asInt())
  private def bool(n: JsonNode, k: String): Option[Boolean] = opt(n, k).map(_.asBoolean())
  private def strMap(n: JsonNode, k: String): Map[String, String] =
    opt(n, k).map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty)
  private def strSeq(n: JsonNode, k: String): Seq[String] =
    opt(n, k).map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)

  private def fromNode(n: JsonNode): GraftConfig = {
    val d = GraftConfig()
    val sparkConf = opt(n, "spark").map { s =>
      val sd = SparkConf()
      SparkConf(
        master = str(s, "master").getOrElse(sd.master),
        threads = int(s, "threads").getOrElse(sd.threads),
        format = str(s, "format").getOrElse(sd.format),
        compression = str(s, "compression").getOrElse(sd.compression),
        timestampFormat = str(s, "timestamp_format").getOrElse(sd.timestampFormat),
        logLevel = str(s, "log_level").getOrElse(sd.logLevel),
        properties = strMap(s, "properties"))
    }.getOrElse(SparkConf())
    val jdbcConf = opt(n, "jdbc").map { j =>
      JdbcConf(url = str(j, "url"), properties = strMap(j, "properties"))
    }.getOrElse(JdbcConf())
    val tables = opt(n, "tables").map(_.elements().asScala.map { t =>
      if (t.isTextual) TableConf(t.asText(), "id")
      else TableConf(str(t, "name").getOrElse(
        throw new IllegalArgumentException("table entry needs a name")),
        str(t, "key").getOrElse("id"))
    }.toSeq).getOrElse(Nil)
    GraftConfig(
      spark = sparkConf,
      jdbc = jdbcConf,
      sourceDir = str(n, "source_dir"),
      tables = tables,
      targetUri = str(n, "target_uri"),
      warehouseRoot = str(n, "warehouse_root"),
      targetDataset = str(n, "target_dataset"),
      targetDatasetDescription = str(n, "target_dataset_description"),
      targetDatasetLocation = str(n, "target_dataset_location").getOrElse(d.targetDatasetLocation),
      targetDatasetPreLabels = strMap(n, "target_dataset_pre_labels"),
      targetDatasetPostLabels = strMap(n, "target_dataset_post_labels"),
      targetDatasetAccessEntries = strSeq(n, "target_dataset_access_entries"),
      targetPartitionSizeBytes = lng(n, "target_partition_size_bytes").getOrElse(d.targetPartitionSizeBytes),
      defaultRowsPerPartition = lng(n, "default_rows_per_partition").getOrElse(d.defaultRowsPerPartition),
      introspectionExpireS = lng(n, "introspection_expire_s").getOrElse(d.introspectionExpireS),
      introspectWorkers = int(n, "introspect_workers").getOrElse(d.introspectWorkers),
      extractWorkers = int(n, "extract_workers").getOrElse(d.extractWorkers),
      loadWorkers = int(n, "load_workers").getOrElse(d.loadWorkers),
      dropDataset = bool(n, "drop_dataset").getOrElse(d.dropDataset),
      stateFile = str(n, "state_file").getOrElse(d.stateFile),
      lastSuccessfulRun = str(n, "last_successful_run"))
  }
}
