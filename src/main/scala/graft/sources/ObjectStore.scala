package graft.sources

/** Object-store connector configuration (SURVEY.md S5) — the Spark-native
  * form of the reference's per-profile storage credentials (reference
  * `DuckDbConnectionFactory.scala:76-260`: S3/GCS/Azure secrets + endpoint
  * injected into DuckDB httpfs/azure sessions).
  *
  * On Spark the same job is done by Hadoop FileSystem connector settings
  * on the SparkConf/SparkSession (`spark.hadoop.fs.*`). These presets
  * carry the read-path tuning a 100 TB parquet scan wants:
  *
  *  - connection pool / thread counts sized for many concurrent range
  *    reads (one footer + several column-chunk reads per task);
  *  - random (positioned-read) input policy — parquet access is seek-heavy,
  *    the default sequential policy re-opens the stream per seek;
  *  - vectored-read coalescing (Hadoop 3.3.5+) so adjacent column chunks
  *    merge into one GET;
  *  - magic/manifest committers — rename-free commits on stores where
  *    rename is O(data).
  *
  * Credentials deliberately default to the provider *chain* (environment,
  * instance profile, workload identity) — never inline keys. All keys and
  * values here are public Hadoop/Spark connector documentation.
  */
object ObjectStore {

  /** AWS S3 via the s3a connector. `endpoint` supports S3-compatible
    * stores (MinIO, R2); path-style access is what most of those need. */
  def s3aConf(
      endpoint: Option[String] = None,
      region: Option[String] = None,
      pathStyleAccess: Boolean = false): Map[String, String] = {
    val base = Map(
      // credential chain: env vars → profile → EC2/IRSA instance creds
      "spark.hadoop.fs.s3a.aws.credentials.provider" ->
        ("org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider," +
          "com.amazonaws.auth.EnvironmentVariableCredentialsProvider," +
          "org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider"),
      // read path: parquet is seek-heavy → positioned reads + coalescing
      "spark.hadoop.fs.s3a.experimental.input.fadvise" -> "random",
      "spark.hadoop.fs.s3a.vectored.read.min.seek.size" -> "128K",
      "spark.hadoop.fs.s3a.vectored.read.max.merged.size" -> "2M",
      "spark.hadoop.fs.s3a.readahead.range" -> "1M",
      // concurrency: executors run many tasks × several streams each
      "spark.hadoop.fs.s3a.connection.maximum" -> "200",
      "spark.hadoop.fs.s3a.threads.max" -> "64",
      // write path: multipart + the magic committer (no rename)
      "spark.hadoop.fs.s3a.multipart.size" -> "128M",
      "spark.hadoop.fs.s3a.fast.upload" -> "true",
      "spark.hadoop.fs.s3a.committer.name" -> "magic",
      "spark.sql.parquet.output.committer.class" ->
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter",
      "spark.sql.sources.commitProtocolClass" ->
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol")
    base ++
      endpoint.map("spark.hadoop.fs.s3a.endpoint" -> _) ++
      region.map("spark.hadoop.fs.s3a.endpoint.region" -> _) ++
      (if (pathStyleAccess)
        Map("spark.hadoop.fs.s3a.path.style.access" -> "true")
      else Map.empty)
  }

  /** Google Cloud Storage via the gs connector (workload-identity /
    * application-default credentials). */
  def gcsConf(projectId: Option[String] = None): Map[String, String] = {
    val base = Map(
      "spark.hadoop.fs.gs.impl" ->
        "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem",
      "spark.hadoop.fs.AbstractFileSystem.gs.impl" ->
        "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFS",
      "spark.hadoop.google.cloud.auth.type" -> "APPLICATION_DEFAULT",
      // fadvise=RANDOM for parquet; AUTO flips on first backward seek
      "spark.hadoop.fs.gs.inputstream.fadvise" -> "RANDOM",
      "spark.hadoop.fs.gs.outputstream.upload.chunk.size" -> "16777216")
    base ++ projectId.map("spark.hadoop.fs.gs.project.id" -> _)
  }

  /** Azure Data Lake Gen2 via abfs (OAuth / managed identity by default;
    * pass an account key only for dev against Azurite). */
  def abfsConf(
      account: String,
      accountKey: Option[String] = None): Map[String, String] = {
    val base = Map(
      "spark.hadoop.fs.azure.readaheadqueue.depth" -> "8",
      "spark.hadoop.fs.azure.read.readahead.blocksize" -> "4194304",
      "spark.hadoop.fs.azure.write.request.size" -> "8388608")
    base ++ (accountKey match {
      case Some(key) =>
        Map(s"spark.hadoop.fs.azure.account.key.$account.dfs.core.windows.net" -> key)
      case None =>
        Map(s"spark.hadoop.fs.azure.account.auth.type.$account.dfs.core.windows.net" -> "OAuth")
    })
  }

  /** Scan-side session defaults that matter once segments live in an
    * object store: bigger open cost (a GET has latency), 128 MB split
    * targets, and summary-file/footer IO kept off the driver. */
  val scanConf: Map[String, String] = Map(
    "spark.sql.files.maxPartitionBytes" -> "134217728",
    "spark.sql.files.openCostInBytes" -> "8388608",
    "spark.sql.parquet.mergeSchema" -> "false",
    "spark.sql.parquet.filterPushdown" -> "true",
    "spark.sql.parquet.aggregatePushdown" -> "true")

  /** Apply a preset to a session builder. */
  def configure(builder: org.apache.spark.sql.SparkSession.Builder,
      conf: Map[String, String]): org.apache.spark.sql.SparkSession.Builder =
    conf.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
}
