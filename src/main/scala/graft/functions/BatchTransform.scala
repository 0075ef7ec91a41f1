package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Batch multimodal transform stage — the Scala analog of the brief's
  * "Pandas UDFs over mapInPandas" plumbing: a mapPartitions stage that
  * consumes rows in batches, runs a per-batch decoder, and emits a
  * generator-shaped output (1 image -> N frames). The *decode* itself rides
  * the deterministic toy codec (no real media libs in the container, per the
  * brief — the Spark-side schema/partitioning/batch shape is the real part).
  *
  * Why mapPartitions and not per-row UDF: batch-at-a-time amortizes codec
  * setup, exactly like Arrow record batches do for Pandas UDFs — same
  * iterator-of-batches contract, narrow (no shuffle), partition-preserving.
  */
object BatchTransform {

  val frameSchema: StructType = StructType(Seq(
    StructField("image_id", StringType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_bytes", BinaryType, nullable = false),
    StructField("frame_brightness", DoubleType, nullable = false)))

  /** Sample every `stride`-th row-strip of each image as a standalone
    * "frame" payload (video frame-sample analog: image rows stand in for
    * frames). Output is one row per sampled frame. */
  def frameSample(images: DataFrame, stride: Int, batchSize: Int = 256): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val idIdx = images.schema.fieldIndex("image_id")
    val bytesIdx = images.schema.fieldIndex("bytes")
    val enc = RowEncoder.encoderFor(frameSchema)
    images.mapPartitions { rows =>
      // batch-at-a-time consumption (the Arrow-batch contract)
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { row =>
          val id = row.getString(idIdx)
          val bytes = row.getAs[Array[Byte]](bytesIdx)
          val w = ImageCodec.width(bytes)
          val h = ImageCodec.height(bytes)
          // trust the actual payload, not the declared dims: a truncated
          // payload whose header claims more strips than the bytes carry
          // would otherwise throw in arraycopy and kill the task
          val avail = math.max(0, bytes.length - ImageCodec.HeaderLen)
          val hEff = if (w > 0) math.min(h, avail / w) else 0
          (0 until hEff by stride).map { y =>
            val frame = new Array[Byte](ImageCodec.HeaderLen + w)
            System.arraycopy(bytes, 0, frame, 0, 4)
            frame(4) = ((w >> 8) & 0xff).toByte; frame(5) = (w & 0xff).toByte
            frame(6) = 0; frame(7) = 1 // h = 1 strip
            System.arraycopy(bytes, ImageCodec.HeaderLen + y * w, frame, ImageCodec.HeaderLen, w)
            Row(id, y / stride, frame, ImageCodec.meanBrightness(frame))
          }
        }
      }
    }(enc).toDF()
  }
}
