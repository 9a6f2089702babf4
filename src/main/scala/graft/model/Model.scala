package graft.model

import org.apache.spark.sql.types._

/** Core record types of the engine, mirroring the reference's contracts
  * (cited into /root/reference):
  *
  *  - ChangeEvent: the change-stream envelope. Fields per
  *    test/harness/harness.go:304-318 and README.md:70-78; only
  *    `_id._data` and `operationType` have a hard contract
  *    (internal/mongo/client.go:219-220). Open-ended document fields are
  *    kept as opaque JSON strings (relaxed MongoDB Extended JSON,
  *    internal/mongo/client.go:222).
  *  - ResumeToken: internal/mongo/client.go:268-270.
  *  - OutMessage: the sink row, internal/nats/client.go:36-40; msgId is
  *    the resume token of the event (dedup key, README.md:124-127).
  */
final case class ChangeEventId(_data: String)

final case class Ns(db: String, coll: String)

final case class ChangeEvent(
    _id: ChangeEventId,
    operationType: String,
    clusterTime: Option[java.sql.Timestamp],
    wallTime: Option[java.sql.Timestamp],
    ns: Option[Ns],
    documentKey: Option[String],
    fullDocument: Option[String],
    fullDocumentBeforeChange: Option[String],
    updateDescription: Option[String]
)

/** One committed token row (internal/mongo/client.go:268-270) — the
  * streaming runtime's tokens table (StreamingCdc.tokenSchema) extends
  * this with the batch id and publish count.
  */
final case class ResumeToken(_id: String, value: String)

final case class OutMessage(subject: String, msgId: String, data: String)

object Model {

  /** Publishable operation set — internal/mongo/client.go:33-38. */
  val PublishableOps: Seq[String] = Seq("insert", "update", "replace", "delete")

  /** operationType that terminates the watch — internal/mongo/client.go:232-236. */
  val InvalidateOp: String = "invalidate"

  /** Ops that are silently skipped (stream continues) — drop_test.go / rename_test.go. */
  val SkippedOps: Seq[String] = Seq("drop", "rename", "dropDatabase")

  /** Spark schema of the change-event envelope (SURVEY.md §1.3).
    * `_id._data`/`operationType` are the hard CONTRACT fields
    * (client.go:219-220) but the READ schema keeps them nullable: dirty
    * rows must drop at the publishable filter, not crash the scan.
    */
  val changeEventSchema: StructType = StructType(Seq(
    StructField("_id", StructType(Seq(
      StructField("_data", StringType, nullable = true))), nullable = true),
    StructField("operationType", StringType, nullable = true),
    StructField("clusterTime", TimestampType, nullable = true),
    StructField("wallTime", TimestampType, nullable = true),
    StructField("ns", StructType(Seq(
      StructField("db", StringType), StructField("coll", StringType))), nullable = true),
    StructField("documentKey", StringType, nullable = true),
    StructField("fullDocument", StringType, nullable = true),
    StructField("fullDocumentBeforeChange", StringType, nullable = true),
    StructField("updateDescription", StringType, nullable = true)
  ))

  /** Default stream name derivation — pkg/connector/connector.go:337. */
  def defaultStreamName(collName: String): String = collName.toUpperCase
}
