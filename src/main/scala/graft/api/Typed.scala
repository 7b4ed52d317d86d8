package graft.api

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Typed Dataset façade: case-class views over the engine's core row
  * shapes for callers who want compile-time column safety. The
  * implementations delegate to the untyped operators (Catalyst sees
  * the same plans; encoders only change the analysis-time contract).
  */
object Typed {

  final case class Document(doc_id: Long, text: String, lang: String)
  final case class NearDupPair(doc_a: Long, doc_b: Long, jaccard: Double)
  final case class FrescoRow(jobId: String, host: String, event: String,
                             value: Double, units: String,
                             timestamp: Timestamp)

  implicit val documentEnc: Encoder[Document] = Encoders.product[Document]
  implicit val pairEnc: Encoder[NearDupPair] = Encoders.product[NearDupPair]
  implicit val frescoEnc: Encoder[FrescoRow] = Encoders.product[FrescoRow]

  def documents(df: DataFrame): Dataset[Document] =
    df.select(col("doc_id").cast("long"), col("text"), col("lang"))
      .as[Document]

  /** FRESCO long rows with the space-free field names encoders need. */
  def frescoRows(df: DataFrame): Dataset[FrescoRow] =
    df.select(
      col("Job Id").as("jobId"), col("Host").as("host"),
      col("Event").as("event"), col("Value").as("value"),
      col("Units").as("units"), col("Timestamp").as("timestamp"))
      .as[FrescoRow]

  def nearDups(docs: Dataset[Document],
               threshold: Double): Dataset[NearDupPair] =
    graft.dedup.Dedup.jaccardPairs(docs.toDF(), threshold)
      .as[NearDupPair]

  def curate(docs: Dataset[Document], minChars: Int,
             maxStopwordRatio: Double, stopwords: Seq[String],
             jaccardThreshold: Double): Dataset[Document] =
    graft.pipeline.Curation.curate(docs.toDF(), minChars,
        maxStopwordRatio, stopwords, jaccardThreshold)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[Document]
}
