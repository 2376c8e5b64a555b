package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.functions.{VectorFunctions => VF}
import graft.operators.Ann
object DebugAnn {
  def main(args: Array[String]): Unit = {
    val base = SparkSession.builder().master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    base.sparkContext.setLogLevel("ERROR")
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val ext = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[2]").config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    SparkSession.setDefaultSession(base); SparkSession.setActiveSession(base)
    val q = VF.syntheticQuery(64)
    ext.conf.set("graft.ann.rewrite", "true")
    val index = Ann.buildIndex(Tables.table(ext, "/root/testdata/sf0.001", "embeddings"), "embedding", 6)
    def topk() = index.orderBy(VF.cosine_sim(col("embedding"), VF.vecLit(q)).desc, col("vec_id").asc).limit(10)
    def filters(df: org.apache.spark.sql.DataFrame) = df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f }.size
    println("plan-check filters=" + filters(topk()))
    val annIds = topk().select("vec_id").collect().map(_.getLong(0)).toSet
    println("annIds=" + annIds.toSeq.sorted.mkString(","))
    val expected = Ann.search(index, "embedding", q, 10, 6, 2, "cosine", "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    println("expected=" + expected.toSeq.sorted.mkString(","))
    println("equal=" + (annIds == expected))
  }
}
