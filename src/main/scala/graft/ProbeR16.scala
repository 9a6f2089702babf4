package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch piecewise profiler for the round-16 decontam_overlap work —
  * NOT part of the shipped surface (deleted before the round closes).
  * Usage: sbt "runMain graft.ProbeR16 <sfdir> <stage...>"
  */
object ProbeR16 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val stages = args.tail.toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val toks = "split(text, ' ')"
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        explode(expr(s"array_distinct(word_ngrams($toks, 4))")).as("gram"))
    def docs = graft.queries.Tables.load(spark, dir, "documents")
    def corpus = grams(docs.filter(col("doc_id") % 37 =!= 0))
    def evalG = grams(docs.filter(col("doc_id") % 37 === 0))
      .withColumnRenamed("doc_id", "eval_doc_id")
    def joined = corpus.join(broadcast(evalG), "gram")
      .select(col("doc_id"), col("eval_doc_id"))
    def agged = corpus.join(broadcast(evalG), "gram")
      .groupBy(col("doc_id"), col("eval_doc_id"))
      .agg(count(lit(1)).as("n_shared"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (st <- stages; trial <- 1 to 2) {
      val t0 = System.nanoTime()
      st match {
        case "corpus" => noop(corpus)
        case "eval" => noop(evalG)
        case "joined" => noop(joined)
        case "agged" => noop(agged)
        case "sorted" => noop(agged.orderBy(col("doc_id"), col("eval_doc_id")))
        case "tokens" => noop(docs.filter(col("doc_id") % 37 =!= 0)
          .select(col("doc_id"), expr(s"word_ngrams($toks, 4)").as("g")))
        case "distinct" => noop(docs.filter(col("doc_id") % 37 =!= 0)
          .select(col("doc_id"),
            expr(s"array_distinct(word_ngrams($toks, 4))").as("g")))
      }
      println(f"[probe] $st trial$trial: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
