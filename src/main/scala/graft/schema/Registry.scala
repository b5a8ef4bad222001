package graft.schema

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Schema + rename-mapping registries, loaded from JSON config files.
  *
  * Reference shape:
  *  - `table_schema.json` — array of per-table entries with `table_name`,
  *    `column_names`, `column_types`, role lists, `last_id`
  *    (loader: `util/data_pushing.py:168-185`).
  *  - `rename_mapping.json` — object of `registryKey -> {rawHeader: canonical}`
  *    (loader: `util/data_processing.py:20-38`).
  *
  * Lookup in the reference is substring match of registry key against the
  * table/file name (`util/data_processing.py:34-36`,
  * `util/data_pushing.py:181-183`), with the `last24h__` filename prefix as an
  * alias for the campaign-events table (`main.py:112-113`). The reference's
  * routing has an UnboundLocalError for non-`last24h__` names (SURVEY.md §2.10);
  * we implement the *intended* contains-match routing.
  */
object Registry {

  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  private def parse(json: String): JsonNode = mapper.readTree(json)

  private def readFile(path: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")

  /** Parse a table-schema registry (array form, reference layout). */
  def parseTableSchemas(json: String): Seq[TableSchema] = {
    val root = parse(json)
    root.elements().asScala.map { e =>
      def strs(field: String): Seq[String] =
        Option(e.get(field)).map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
      TableSchema(
        tableName = e.get("table_name").asText(),
        columnNames = strs("column_names"),
        columnTypes = strs("column_types"),
        dateColumns = strs("date_columns"),
        intColumns = strs("int_columns"),
        floatColumns = strs("float_columns"),
        stringColumns = strs("string_columns"),
        dobColumns = strs("dob_columns"))
    }.toSeq
  }

  def loadTableSchemas(path: String): Seq[TableSchema] = parseTableSchemas(readFile(path))

  /** Parse a rename-mapping registry: `{registryKey: {rawHeader: canonical}}`. */
  def parseRenameMappings(json: String): Map[String, Map[String, String]] = {
    val root = parse(json)
    root.properties().asScala.map { entry =>
      val inner = entry.getValue.properties().asScala
        .map(kv => kv.getKey -> kv.getValue.asText())
        .toMap
      entry.getKey -> inner
    }.toMap
  }

  def loadRenameMappings(path: String): Map[String, Map[String, String]] =
    parseRenameMappings(readFile(path))

  /** Route a file name to a registry key: contains-match, with optional prefix
    * aliases (e.g. `last24h__` → campaign events). Longest matching key wins so
    * that a name containing both `events` and `events_v2` routes specifically.
    */
  def route(
      fileName: String,
      keys: Seq[String],
      prefixAliases: Map[String, String] = Map.empty): Option[String] = {
    val base = fileName.split('/').last
    prefixAliases
      .collectFirst { case (prefix, key) if base.startsWith(prefix) => key }
      .orElse(keys.filter(base.contains(_)).sortBy(-_.length).headOption)
  }
}
