package graft.ops

import org.apache.spark.sql.DataFrame

/** Test-only bridge to the `private[ops]` hot-bucket cap, so expr-package
  * specs can assert retained-set equivalence with the window baseline.
  */
object DedupTestAccess {
  def capBucketsBy(df: DataFrame, keyCols: Seq[String], idCol: String,
                   bucketCap: Int, obsTag: Option[String]): DataFrame =
    Dedup.capBucketsBy(df, keyCols, idCol, bucketCap, obsTag)
}
