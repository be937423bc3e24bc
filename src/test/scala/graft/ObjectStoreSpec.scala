package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ObjectStore

class ObjectStoreSpec extends AnyFunSuite {

  test("s3a preset: endpoint/region/path-style are optional, read tuning fixed") {
    val plain = ObjectStore.s3aConf()
    assert(!plain.contains("spark.hadoop.fs.s3a.endpoint"))
    assert(plain("spark.hadoop.fs.s3a.experimental.input.fadvise") == "random")
    assert(plain("spark.hadoop.fs.s3a.committer.name") == "magic")
    val minio = ObjectStore.s3aConf(
      endpoint = Some("http://minio:9000"), pathStyleAccess = true)
    assert(minio("spark.hadoop.fs.s3a.endpoint") == "http://minio:9000")
    assert(minio("spark.hadoop.fs.s3a.path.style.access") == "true")
    // never inline credentials — chain only
    assert(!minio.keys.exists(_.contains("secret.key")))
  }

  test("gcs/abfs presets select auth mode without inline secrets by default") {
    val gcs = ObjectStore.gcsConf(projectId = Some("p1"))
    assert(gcs("spark.hadoop.google.cloud.auth.type") == "APPLICATION_DEFAULT")
    assert(gcs("spark.hadoop.fs.gs.project.id") == "p1")
    val abfs = ObjectStore.abfsConf("acct")
    assert(abfs(
      "spark.hadoop.fs.azure.account.auth.type.acct.dfs.core.windows.net") == "OAuth")
    val dev = ObjectStore.abfsConf("acct", accountKey = Some("k"))
    assert(dev(
      "spark.hadoop.fs.azure.account.key.acct.dfs.core.windows.net") == "k")
  }

  test("presets apply cleanly to a session builder (no session started)") {
    val builder = org.apache.spark.sql.SparkSession.builder()
    val out = ObjectStore.configure(builder,
      ObjectStore.s3aConf() ++ ObjectStore.scanConf)
    assert(out eq builder) // fluent
  }
}
