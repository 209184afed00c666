package graft.api

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.col

/** Internal record layout shared by every DSL node: a DataFrame with
  * columns (`key`, `value`, `ts`) — the reference's
  * `(key, value, timestamp)` record triple
  * (`clients/.../consumer/ConsumerRecord.java:37-47`). A null `value` is a
  * tombstone in changelog (KTable) context.
  *
  * Typed operators hop to `Dataset[(K, V, Timestamp)]` and back; columnar
  * fast-path operators stay on the DataFrame so Catalyst keeps whole-stage
  * codegen.
  */
private[graft] object Rec {
  val KeyCol = "key"
  val ValueCol = "value"
  val TsCol = "ts"

  /** Generic Option encoder (Spark has no public combinator): nullable
    * column of T — needed for buffers/joins where "absent" must encode
    * without boxing primitives to null. */
  def optionEnc[T](implicit e: Encoder[T]): Encoder[Option[T]] = {
    import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, AgnosticEncoders, ExpressionEncoder}
    val agnostic = e match {
      case a: AgnosticEncoder[T @unchecked] => a
      case ee: ExpressionEncoder[T @unchecked] => ee.encoder
    }
    ExpressionEncoder(AgnosticEncoders.OptionEncoder(agnostic))
  }

  /** Generic Seq encoder (same trick as [[optionEnc]]) — state buffers
    * holding a variable number of typed elements. */
  def seqEnc[T](implicit e: Encoder[T]): Encoder[Seq[T]] = {
    import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, AgnosticEncoders, ExpressionEncoder}
    val agnostic = e match {
      case a: AgnosticEncoder[T @unchecked] => a
      case ee: ExpressionEncoder[T @unchecked] => ee.encoder
    }
    ExpressionEncoder(AgnosticEncoders.IterableEncoder[Seq[T], T](
      scala.reflect.classTag[Seq[T]], agnostic, containsNull = false,
      lenientSerialization = false))
  }

  def tupleEnc[K, V](implicit k: Encoder[K], v: Encoder[V]): Encoder[(K, V, Timestamp)] =
    Encoders.tuple(k, v, Encoders.TIMESTAMP)

  def toTyped[K: Encoder, V: Encoder](df: DataFrame): Dataset[(K, V, Timestamp)] =
    df.select(col(KeyCol).as("_1"), col(ValueCol).as("_2"), col(TsCol).as("_3"))
      .as(tupleEnc[K, V])

  def fromTyped[K, V](ds: Dataset[(K, V, Timestamp)]): DataFrame =
    ds.toDF(KeyCol, ValueCol, TsCol)

  /** Watermark the record time when running as a stream (grace → lateness
    * bound, SURVEY.md §2.7); no-op in batch. */
  def withGrace(df: DataFrame, graceMs: Long): DataFrame =
    if (df.isStreaming) df.withWatermark(TsCol, s"$graceMs milliseconds") else df
}
