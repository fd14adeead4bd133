package graft

import graft.sources.S3AConf

/** S5 config surface: SSE + committer + upload settings land on the
  * session Hadoop conf (the only testable part without an S3
  * endpoint; the write path itself is exercised against local FS by
  * every sink spec). */
class S3AConfSpec extends SparkSpec {

  test("settings: SSE-AES256, magic committer, bounded pools; endpoint optional") {
    val s = S3AConf.settings()
    assert(s("fs.s3a.server-side-encryption-algorithm") === "AES256")
    assert(s("fs.s3a.committer.name") === "magic")
    assert(!s.contains("fs.s3a.endpoint"))
    val e = S3AConf.settings(Some("s3.eu-west-1.amazonaws.com"))
    assert(e("fs.s3a.endpoint") === "s3.eu-west-1.amazonaws.com")
  }

  test("apply: every setting lands on the session's hadoopConfiguration") {
    S3AConf(spark)
    val hc = spark.sparkContext.hadoopConfiguration
    S3AConf.settings().foreach { case (k, v) =>
      assert(hc.get(k) === v, k)
    }
  }
}
