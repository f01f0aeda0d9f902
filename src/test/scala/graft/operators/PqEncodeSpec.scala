package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSessionSpec

/** Contract for the native [[graft.expressions.PqEncodeCodes]]
  * expression: code-for-code equality with the declarative
  * withBlockDists + array_position argmin it replaces on the
  * persisted-index encode path (same fold order, same strict-<
  * first-index tie-break), so the index build's oracle replay is
  * unchanged at every scale. */
class PqEncodeSpec extends SparkSessionSpec {
  import spark.implicits._

  test("native pq_encode equals the declarative per-block argmin " +
       "code-for-code on a real corpus") {
    val cb = Similarity.pqCodebook(spark, sf0001)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val native = emb
      .select(col("vec_id"),
        graft.expressions.PqEncodeCodes(col("v"), cb).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    val decl = Similarity.withBlockDists(emb, "v", cb, "ds_")
      .select(col("vec_id"),
        array(cb.indices.map(m =>
          (array_position(col(s"ds_$m"), array_min(col(s"ds_$m"))) - 1)
            .cast("int")): _*).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(native.size == decl.size && native == decl)
  }

  test("pq_encode tie-break keeps the first sub-centroid index") {
    // two identical sub-centroids per block: code must be the lower j
    val cb = Array.fill(2)(Array(Array(1.0, 1.0), Array(1.0, 1.0)))
    val out = Seq(Seq(1.0, 1.0, 1.0, 1.0)).toDF("v")
      .select(graft.expressions.PqEncodeCodes(col("v"), cb).as("codes"))
      .as[Seq[Int]].head()
    assert(out == Seq(0, 0))
  }
}
