package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Table DDL + schema evolution — graft's equivalent of drune's
  * `create_table` / `update_table` (reference:
  * engines/spark/spark_engine.py:34-199), on Spark catalog tables.
  *
  * `create` builds the full CREATE TABLE from the pipeline spec:
  * column types and comments from the ColumnSpec list, SCD2 control
  * columns (data_hash / is_current / start_date / end_date) or a
  * created_at column, hash_key + updated_at, table comment,
  * PARTITIONED BY, and the primary keys recorded as a table property
  * (`graft.primary_keys`) — the catalog is the durable home of the PK
  * contract, since parquet itself enforces nothing.
  *
  * `update` is additive evolution: new spec columns are ALTER TABLE
  * ADD COLUMNS (never dropped — at 100 TB a drop is a rewrite, and an
  * accidental one is unrecoverable), comment drift is patched in
  * metadata only, and a PK change reprocesses the hash_key column for
  * every existing row — a single distributed projection + overwrite,
  * no driver-side loop.
  *
  * NOT NULL is deliberately not emitted into the DDL: the session
  * catalog's parquet tables don't enforce constraints, so graft keeps
  * enforcement where it actually runs — the Validator's not_null rule
  * at write time — instead of declaring a contract the storage layer
  * silently ignores.
  */
object Ddl {

  def tableExists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)

  private def targetTable(spec: PipelineSpec): String =
    spec.sink.flatMap(_.table).getOrElse(
      throw new IllegalArgumentException(
        s"pipeline ${spec.name}: sink has no catalog table name (sink.table)"))

  private def esc(s: String): String = s.replace("'", "''")

  /** Create the target table (idempotent) and, if configured, the
    * validation-log table (spark_engine.py:34-44).
    */
  def create(spark: SparkSession, spec: PipelineSpec): Unit = {
    val table = targetTable(spec)
    // A VERSIONED catalog table has no physical table to create: its
    // catalog face is a view over the current manifest snapshot,
    // published by the first versioned commit (Writer →
    // VersionedTable.syncCatalogView). Creating a managed table here
    // would wedge that publish (CREATE OR REPLACE VIEW refuses to
    // replace a table). And if the name ALREADY holds a physical table
    // (a plain sink being migrated to versioned: true), fail here —
    // not after the first commit's data has already landed.
    if (spec.sink.exists(_.versioned)) {
      // metastore lookup, not tableExists: a TEMP view under this name
      // satisfies tableExists but has no metastore entry — it shadows
      // reads but does not block the persistent-view publish, so it
      // must not trip (or crash) this guard
      val physicalTable =
        try spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(table)
        ).tableType != org.apache.spark.sql.catalyst.catalog.CatalogTableType.VIEW
        catch { case _: org.apache.spark.sql.AnalysisException => false }
      if (physicalTable)
        throw new IllegalStateException(
          s"'$table' exists as a physical table but the sink is versioned — " +
            "migrate explicitly: read the old table, write it as the first " +
            "versioned commit to the sink path, then DROP the table so the " +
            "catalog view can take the name")
    } else if (!tableExists(spark, table))
      createTarget(spark, spec, table)
    spec.validationLogTable
      .filterNot(tableExists(spark, _))
      .foreach(createValidationLog(spark, _))
  }

  private def isScd2(spec: PipelineSpec): Boolean =
    spec.sink.exists(_.mode.isInstanceOf[Scd2])

  private def columnDefs(spec: PipelineSpec): Seq[String] = {
    val t = spec.transformStep.getOrElse(Transform(Nil))
    val user = t.columns.map { c =>
      val typ = c.dataType.getOrElse("string")
      val comment = c.description.map(d => s" COMMENT '${esc(d)}'").getOrElse("")
      s"`${c.name}` $typ$comment"
    }
    val lifecycle =
      if (isScd2(spec)) Seq(
        "`data_hash` STRING COMMENT 'Hash of tracked columns for change detection.'",
        "`is_current` BOOLEAN COMMENT 'Active record flag.'",
        "`start_date` TIMESTAMP COMMENT 'Validity start.'",
        "`end_date` TIMESTAMP COMMENT 'Validity end (null while current).'")
      else Seq("`created_at` TIMESTAMP COMMENT 'Insert timestamp.'")
    user ++ lifecycle ++ Seq(
      "`hash_key` STRING COMMENT 'Hash of primary key columns.'",
      "`updated_at` TIMESTAMP COMMENT 'Last update timestamp.'")
  }

  private def createTarget(spark: SparkSession, spec: PipelineSpec, table: String): Unit = {
    val sink = spec.sink.get
    val cols = columnDefs(spec).mkString(", ")
    val comment = spec.description.map(d => s" COMMENT '${esc(d)}'").getOrElse("")
    val partition =
      if (sink.partitionBy.nonEmpty)
        s" PARTITIONED BY (${sink.partitionBy.map(c => s"`$c`").mkString(", ")})"
      else ""
    spark.sql(s"CREATE TABLE $table ($cols) USING ${sink.format}$comment$partition")
    val pks = spec.transformStep.map(_.primaryKey).getOrElse(Nil)
    if (pks.nonEmpty) setPrimaryKeys(spark, table, pks)
  }

  /** Fixed-schema warn-failure log (spark_engine.py:185-199), matching
    * Validator.failureLog so the Validate step can append directly.
    */
  def createValidationLog(spark: SparkSession, table: String): Unit =
    spark.sql(
      s"""CREATE TABLE $table (
         |  `pipeline_name` STRING,
         |  `validation_rule` STRING,
         |  `failed_column` STRING,
         |  `failed_value` STRING,
         |  `action` STRING,
         |  `log_timestamp` TIMESTAMP,
         |  `hash_key` STRING COMMENT 'Hash of the failed record primary keys.'
         |) USING parquet""".stripMargin)

  /** Recorded primary keys, from the `graft.primary_keys` property. */
  def primaryKeys(spark: SparkSession, table: String): Seq[String] = {
    val rows = spark.sql(s"SHOW TBLPROPERTIES $table ('graft.primary_keys')").collect()
    rows.headOption.map(_.getString(1)).toSeq
      .filterNot(_.contains("does not have property"))
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
  }

  private def setPrimaryKeys(spark: SparkSession, table: String, pks: Seq[String]): Unit =
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
      s"('graft.primary_keys' = '${pks.sorted.mkString(",")}')")

  /** Schema + metadata evolution (spark_engine.py:46-106): add missing
    * columns, refresh drifted comments, and reprocess hash_key when the
    * primary-key set changed.
    */
  def update(spark: SparkSession, spec: PipelineSpec): Unit = {
    val table = targetTable(spec)
    // Versioned catalog tables have no ALTER-able physical table: new
    // columns ride the next versioned commit (the re-published view
    // picks them up), and a PK change re-derives hash_key inside the
    // next merge. Refuse rather than ALTER the view and corrupt it.
    if (spec.sink.exists(_.versioned))
      throw new IllegalStateException(
        s"update does not apply to versioned catalog table '$table' — " +
          "schema evolves through versioned commits (write with the new " +
          "columns; the catalog view re-publishes per commit)")
    if (!tableExists(spark, table))
      throw new IllegalStateException(
        s"table '$table' does not exist — run create first")

    val existing = spark.table(table).schema
    val existingByName = existing.fields.map(f => f.name -> f).toMap
    val t = spec.transformStep.getOrElse(Transform(Nil))

    val missing = t.columns.filterNot(c => existingByName.contains(c.name))
    if (missing.nonEmpty) {
      val defs = missing.map { c =>
        val typ = c.dataType.getOrElse("string")
        val comment = c.description.map(d => s" COMMENT '${esc(d)}'").getOrElse("")
        s"`${c.name}` $typ$comment"
      }
      spark.sql(s"ALTER TABLE $table ADD COLUMNS (${defs.mkString(", ")})")
    }

    t.columns.filter(c => existingByName.contains(c.name)).foreach { c =>
      val existingComment = existingByName(c.name).getComment().getOrElse("")
      c.description.filter(d => d.nonEmpty && d != existingComment).foreach { d =>
        spark.sql(s"ALTER TABLE $table ALTER COLUMN `${c.name}` COMMENT '${esc(d)}'")
      }
    }

    val newPks = t.primaryKey.sorted
    if (newPks.nonEmpty && newPks != primaryKeys(spark, table).sorted) {
      reprocessHashKey(spark, table, newPks)
      setPrimaryKeys(spark, table, newPks)
    }
  }

  /** PK change ⇒ every row's hash_key is stale. One distributed
    * projection recomputes it; the eager local checkpoint cuts lineage
    * from the table's own files so the overwrite doesn't read what it
    * writes (on a lakehouse format this is a metadata-safe MERGE
    * instead).
    */
  private def reprocessHashKey(spark: SparkSession, table: String, pks: Seq[String]): Unit = {
    val cols = spark.table(table).columns
    val recomputed = spark.table(table)
      .withColumn("hash_key",
        sha2(concat_ws("||", pks.sorted.map(c => col(c).cast("string")): _*), 256))
      .select(cols.map(col): _*)
      .localCheckpoint(true)
    recomputed.write.mode(org.apache.spark.sql.SaveMode.Overwrite).insertInto(table)
  }
}
