package graft.engine

import org.apache.spark.sql.SparkSession

/** Env-driven object-store wiring, mirroring the reference's setup
  * (iceberg-datafusion-arrow-flight-sql/src/main.rs:46-71, with
  * `object_store` features aws AND gcp enabled, Cargo.toml:11):
  *
  *  - S3: BUCKET + AWS_ACCESS_KEY_ID + AWS_SECRET_ACCESS_KEY select S3,
  *    AWS_ENDPOINT overrides the endpoint (MinIO/localstack),
  *    AWS_ALLOW_HTTP=TRUE permits plain HTTP.
  *  - GCS: BUCKET + GOOGLE_SERVICE_ACCOUNT (path to a service-account
  *    JSON key, `object_store`'s env contract) select GCS; S3 wins when
  *    both credential sets are present (checked first, like the
  *    reference's aws-before-gcp builder order).
  *  - Neither: the reference falls back to an in-memory store — here,
  *    the local filesystem.
  *
  * Settings land on `sparkContext.hadoopConfiguration` (runtime
  * `spark.conf.set("spark.hadoop.*")` does NOT propagate to the
  * already-created Hadoop conf), so `s3a://` / `gs://` URIs work for
  * every subsequent read/write on the session. */
object ObjectStoreConf {

  /** Apply the env contract; returns the applied (key, value) pairs
    * (empty = local-filesystem fallback). */
  def applyEnv(spark: SparkSession,
      env: Map[String, String] = sys.env): Seq[(String, String)] = {
    val settings = (env.get("BUCKET"), env.get("AWS_ACCESS_KEY_ID"),
        env.get("AWS_SECRET_ACCESS_KEY")) match {
      case (Some(_), Some(key), Some(secret)) =>
        Seq(
          "fs.s3a.access.key" -> key,
          "fs.s3a.secret.key" -> secret) ++
          env.get("AWS_ENDPOINT").toSeq.flatMap(e => Seq(
            "fs.s3a.endpoint" -> e,
            "fs.s3a.path.style.access" -> "true")) ++
          (if (env.get("AWS_ALLOW_HTTP").contains("TRUE"))
            Seq("fs.s3a.connection.ssl.enabled" -> "false")
          else Seq.empty)
      case _ => (env.get("BUCKET"), env.get("GOOGLE_SERVICE_ACCOUNT")) match {
        case (Some(_), Some(keyfile)) =>
          Seq(
            "fs.gs.impl" ->
              "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem",
            "fs.AbstractFileSystem.gs.impl" ->
              "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFS",
            "fs.gs.auth.type" -> "SERVICE_ACCOUNT_JSON_KEYFILE",
            "fs.gs.auth.service.account.json.keyfile" -> keyfile)
        case _ => Seq.empty // reference: in-memory store; here: local FS
      }
    }
    val hc = spark.sparkContext.hadoopConfiguration
    settings.foreach { case (k, v) => hc.set(k, v) }
    settings
  }

  /** Warehouse root under the configured bucket, or a local dir when the
    * store is the local-FS fallback. Uses the SAME credential contract as
    * [[applyEnv]] — a remote root must never be returned when applyEnv
    * configured nothing. */
  def warehouseRoot(env: Map[String, String] = sys.env): String =
    (env.get("BUCKET"), env.get("AWS_ACCESS_KEY_ID"),
        env.get("AWS_SECRET_ACCESS_KEY")) match {
      case (Some(b), Some(_), Some(_)) => s"s3a://$b/warehouse"
      case _ => (env.get("BUCKET"), env.get("GOOGLE_SERVICE_ACCOUNT")) match {
        case (Some(b), Some(_)) => s"gs://$b/warehouse"
        case _ => sys.props("java.io.tmpdir") + "/graft_warehouse"
      }
    }
}
