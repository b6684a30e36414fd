package graft.engine

import org.apache.spark.sql.SparkSession

/** `information_schema.{tables,columns,views,df_settings}` parity — the
  * reference enables DataFusion's information_schema so clients introspect
  * via SQL (lib.rs:92; its catalog-metadata RPCs are unimplemented,
  * lib.rs:382-482, which makes SQL introspection the *only* metadata
  * path). Spark has no information_schema database, so the engine
  * refreshes snapshot temp views on demand and rewrites the qualified
  * names — metadata-only, driver-side, a few hundred rows at most.
  */
object InfoSchema {
  private val Marker = "(?i)information_schema\\.".r

  def mentionsInfoSchema(sql: String): Boolean =
    Marker.findFirstIn(sql).isDefined

  def rewrite(sql: String): String = Marker.replaceAllIn(sql, "__infoschema_")

  def refresh(spark: SparkSession): Unit = {
    import spark.implicits._
    import scala.util.Try

    val sessionTables = spark.catalog.listTables().collect().toSeq.map { t =>
      (Option(t.catalog).getOrElse("spark_catalog"),
        Option(t.database).getOrElse(""),
        t.name, t.tableType, t.isTemporary)
    }

    // Configured DSv2 catalogs (spark.sql.catalog.<name> = impl class):
    // enumerate through public SQL so MetaCatalog tables introspect too.
    val v2CatalogNames = spark.conf.getAll.keys.toSeq.collect {
      case k if k.matches("""spark\.sql\.catalog\.[^.]+""") =>
        k.stripPrefix("spark.sql.catalog.")
    }.distinct
    val v2Tables = for {
      cat <- v2CatalogNames
      ns <- Try(spark.sql(s"SHOW NAMESPACES IN `$cat`").collect().toSeq)
        .getOrElse(Seq.empty).map(_.getString(0))
      t <- Try(spark.sql(s"SHOW TABLES IN `$cat`.$ns").collect().toSeq)
        .getOrElse(Seq.empty)
    } yield (cat, ns, t.getString(1), "MANAGED", false)
    val tables = sessionTables ++ v2Tables
    tables
      .toDF("table_catalog", "table_schema", "table_name", "table_type",
        "is_temporary")
      .createOrReplaceTempView("__infoschema_tables")

    tables.filter(_._4 == "VIEW")
      .map { case (c, s, n, _, tmp) => (c, s, n, tmp) }
      .toDF("table_catalog", "table_schema", "table_name", "is_temporary")
      .createOrReplaceTempView("__infoschema_views")

    // (table_catalog, table_schema) spellings MUST match the tables view
    // row for row — the standard introspection join is
    // tables JOIN columns USING (table_catalog, table_schema, table_name).
    val sessionCols = sessionTables.flatMap { case (cat, db, name, _, _) =>
      val ident = if (db.isEmpty) name else s"$db.$name"
      scala.util.Try(spark.catalog.listColumns(ident).collect()).toOption
        .getOrElse(Array.empty).zipWithIndex.map { case (c, i) =>
          (cat, db, name, c.name, i + 1, c.dataType, c.nullable)
        }
    }
    // v2 catalog tables: DESCRIBE is the public column surface (rows after
    // the first blank/# marker are partition/metadata sections).
    val v2Cols = v2Tables.flatMap { case (cat, ns, name, _, _) =>
      Try(spark.sql(s"DESCRIBE TABLE `$cat`.$ns.`$name`").collect().toSeq)
        .getOrElse(Seq.empty)
        .takeWhile(r => r.getString(0).nonEmpty && !r.getString(0).startsWith("#"))
        .zipWithIndex.map { case (r, i) =>
          (cat, ns, name, r.getString(0), i + 1, r.getString(1), true)
        }
    }
    val cols = sessionCols ++ v2Cols
    cols
      .toDF("table_catalog", "table_schema", "table_name", "column_name",
        "ordinal_position", "data_type", "is_nullable")
      .createOrReplaceTempView("__infoschema_columns")

    spark.conf.getAll.toSeq
      .toDF("name", "value")
      .createOrReplaceTempView("__infoschema_df_settings")
  }
}
