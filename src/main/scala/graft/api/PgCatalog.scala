package graft.api

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** pg catalog shim: the reference's static catalog dataset
  * (`/root/reference/src/sydra/catalog.zig:60-112`, oid assignment
  * `compat/catalog.zig:6-7,232,267`) materialized as Spark local
  * DataFrames and registered as temp views (`pg_namespace`, `pg_class`,
  * `pg_attribute`, `pg_type`), so catalog SQL from real clients runs
  * through Spark SQL with full join/filter power — something the
  * reference's wire server cannot do (it only dumps the catalog as JSON
  * via `/debug/compat/catalog`, `http.zig:490-560`).
  *
  * Catalog rows are a handful of constants: `spark.createDataFrame` on a
  * local Seq is the right tool — these never shuffle and always broadcast.
  */
object PgCatalog {

  val NamespaceOidBase = 11000 // compat/catalog.zig:6
  val RelationOidBase = 22000  // compat/catalog.zig:7

  // (oid, nspname) — catalog.zig:60-63
  val namespaces: Seq[(Int, String)] = Seq(
    (NamespaceOidBase, "pg_catalog"),
    (NamespaceOidBase + 1, "public"))

  // (oid, relname, relnamespace, relkind, relpersistence, reltuples,
  //  relhaspkey, relispartition, reltoastrelid) — catalog.zig:65-67
  val classes: Seq[(Int, String, Int, String, String, Double, Boolean, Boolean, Int)] = Seq(
    (RelationOidBase, "pg_type", NamespaceOidBase, "r", "p", 0.0, false, false, 0))

  // (oid, typname, typlen, typbyval, typcategory, typelem, typarray) —
  // catalog.zig:69-98; typnamespace is always pg_catalog.
  val types: Seq[(Int, String, Int, Boolean, String, Int, Int)] = Seq(
    (16, "bool", 1, true, "B", 0, 1000),
    (21, "int2", 2, true, "N", 0, 1005),
    (20, "int8", 8, true, "N", 0, 1016),
    (23, "int4", 4, true, "N", 0, 1007),
    (700, "float4", 4, true, "N", 0, 1021),
    (701, "float8", 8, true, "N", 0, 1022),
    (1700, "numeric", -1, false, "N", 0, 1231),
    (25, "text", -1, false, "S", 0, 1009),
    (2950, "uuid", 16, true, "U", 0, 2951),
    (1114, "timestamp", 8, true, "D", 0, 1115),
    (1184, "timestamptz", 8, true, "D", 0, 1185),
    (1082, "date", 4, true, "D", 0, 1182),
    (1083, "time", 8, true, "D", 0, 1183),
    (3802, "jsonb", -1, false, "U", 0, 3807),
    (1000, "_bool", -1, false, "A", 16, 0),
    (1005, "_int2", -1, false, "A", 21, 0),
    (1016, "_int8", -1, false, "A", 20, 0),
    (1007, "_int4", -1, false, "A", 23, 0),
    (1021, "_float4", -1, false, "A", 700, 0),
    (1022, "_float8", -1, false, "A", 701, 0),
    (1231, "_numeric", -1, false, "A", 1700, 0),
    (1009, "_text", -1, false, "A", 25, 0),
    (2951, "_uuid", -1, false, "A", 2950, 0),
    (1115, "_timestamp", -1, false, "A", 1114, 0),
    (1185, "_timestamptz", -1, false, "A", 1184, 0),
    (1182, "_date", -1, false, "A", 1082, 0),
    (1183, "_time", -1, false, "A", 1083, 0),
    (3807, "_jsonb", -1, false, "A", 3802, 0))

  // (attname, atttypid, attnotnull) on pg_type, attnum 1.. in declaration
  // order — catalog.zig:100-112
  val pgTypeColumns: Seq[(String, Int, Boolean)] = Seq(
    ("oid", 23, true),
    ("typname", 25, true),
    ("typlen", 21, true),
    ("typbyval", 16, true),
    ("typtype", 25, false),
    ("typcategory", 25, false),
    ("typdelim", 25, false),
    ("typelem", 23, false),
    ("typarray", 23, false),
    ("typbasetype", 23, false),
    ("typcollation", 23, false))

  /** Register the catalog temp views once per session (idempotent).
    * Temp views are session-scoped, so the guard must be too — a
    * process-global flag would leave a second SparkSession without views.
    */
  def ensureViews(spark: SparkSession): Unit =
    if (!spark.catalog.tableExists("pg_type")) synchronized {
      if (!spark.catalog.tableExists("pg_type")) {
      import spark.implicits._
      namespaces.toDF("oid", "nspname").createOrReplaceTempView("pg_namespace")
      classes
        .toDF("oid", "relname", "relnamespace", "relkind", "relpersistence",
          "reltuples", "relhaspkey", "relispartition", "reltoastrelid")
        .createOrReplaceTempView("pg_class")
      types
        .map { case (oid, name, len, byval, cat, elem, arr) =>
          (oid, name, NamespaceOidBase, len, byval, "b", cat, ",", elem, arr, 0, 0)
        }
        .toDF("oid", "typname", "typnamespace", "typlen", "typbyval", "typtype",
          "typcategory", "typdelim", "typelem", "typarray", "typbasetype", "typcollation")
        .createOrReplaceTempView("pg_type")
      pgTypeColumns.zipWithIndex
        .map { case ((name, typeOid, notNull), i) =>
          (RelationOidBase, name, typeOid, (i + 1).toShort, notNull, false, false)
        }
        .toDF("attrelid", "attname", "atttypid", "attnum", "attnotnull",
          "atthasdef", "attisdropped")
        .createOrReplaceTempView("pg_attribute")
      }
    }

  private val CatalogTable = "(?i).*\\bpg_(?:type|class|namespace|attribute)\\b.*".r

  /** True when the SQL reads the pg catalog (or a connect-time builtin like
    * `version()`), so the wire server routes it to Spark SQL instead of the
    * sydraQL translator. Schema-qualified forms (`pg_catalog.version()`,
    * drivers qualify builtins) are normalized before matching.
    */
  def isCatalogQuery(sql: String): Boolean = {
    // blank out string literals first: a data query mentioning 'pg_class'
    // in a WHERE literal must not be routed to the catalog engine
    val t = sql.trim.replaceAll("[;\\s]+$", "")
      .replaceAll("'(?:[^']|'')*'", "''")
      .replaceAll("(?i)\\bpg_catalog\\.", "")
    val lower = t.toLowerCase
    CatalogTable.matches(t.replace('\n', ' ')) ||
      lower.startsWith("select version()") ||
      lower.startsWith("select current_schema")
  }

  /** Run a catalog query. Connect-time builtins are rewritten to literals;
    * everything else goes to Spark SQL over the registered views.
    */
  def execute(spark: SparkSession, sql: String, serverVersion: String): DataFrame = {
    ensureViews(spark)
    val t = sql.trim.replaceAll("[;\\s]+$", "")
    val rewritten = t
      .replaceAll("(?i)version\\(\\)",
        s"'PostgreSQL $serverVersion sydradb-spark' AS version")
      .replaceAll("(?i)current_schema\\(\\)", "'public' AS current_schema")
      .replaceAll("(?i)\\bpg_catalog\\.", "")
    spark.sql(rewritten)
  }

  /** JSON dump in the `/debug/compat/catalog` shape (`http.zig:490-560`). */
  def toJsonNode(mapper: com.fasterxml.jackson.databind.ObjectMapper): com.fasterxml.jackson.databind.node.ObjectNode = {
    val root = mapper.createObjectNode()
    val ns = root.putArray("namespaces")
    namespaces.foreach { case (oid, name) =>
      val o = ns.addObject(); o.put("oid", oid); o.put("name", name)
    }
    val cls = root.putArray("classes")
    classes.foreach { case (oid, name, nsOid, kind, pers, tuples, pkey, part, toast) =>
      val o = cls.addObject()
      o.put("oid", oid); o.put("name", name); o.put("namespace", nsOid)
      o.put("kind", kind); o.put("persistence", pers); o.put("tuples", tuples)
      o.put("has_pkey", pkey); o.put("is_partition", part); o.put("toast_oid", toast)
    }
    val attrs = root.putArray("attributes")
    pgTypeColumns.zipWithIndex.foreach { case ((name, typeOid, notNull), i) =>
      val o = attrs.addObject()
      o.put("rel_oid", RelationOidBase); o.put("name", name)
      o.put("type_oid", typeOid); o.put("attnum", i + 1)
      o.put("not_null", notNull); o.put("has_default", false); o.put("is_dropped", false)
    }
    val tys = root.putArray("types")
    types.foreach { case (oid, name, len, byval, cat, elem, arr) =>
      val o = tys.addObject()
      o.put("oid", oid); o.put("name", name); o.put("namespace", NamespaceOidBase)
      o.put("len", len); o.put("by_value", byval); o.put("category", cat)
      o.put("elem", elem); o.put("array", arr)
    }
    root
  }
}
