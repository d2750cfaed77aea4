package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §7.5): media payloads as opaque
  * `binary` columns with a typed metadata struct, and a decode/feature
  * stage that runs per-partition in batches.
  *
  * The decode kernel itself is a STUB — this container ships no image or
  * audio codecs — but it is a deterministic stub: features are derived
  * from the payload bytes, so the surrounding Spark plumbing (schema,
  * partitioning, batch shape, null handling) is fully real and testable.
  * Swapping in a true JNI/codec decoder changes only `decodeStub`.
  */
object Multimodal {

  /** Output schema of the feature stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("byte_length", IntegerType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType)))),
    StructField("features", ArrayType(FloatType))))

  /** STUBBED media decode: derives a fake-but-deterministic metadata
    * struct and an 8-dim feature vector from the payload bytes. A real
    * implementation would decode the image/audio here (per-partition so
    * any native handle is initialised once per task, the standard Spark
    * pattern for codec libraries).
    */
  private def decodeStub(id: Long, mediaType: String, payload: Array[Byte]): Row = {
    val n = payload.length
    val w = 64 + (if (n == 0) 0 else (payload(0) & 0x3f))
    val h = 64 + (if (n < 2) 0 else (payload(1) & 0x3f))
    val features = Array.tabulate(8) { i =>
      var acc = 0L
      var j = i
      while (j < n) { acc += (payload(j) & 0xff); j += 8 }
      (acc % 1000L).toFloat / 1000.0f
    }
    Row(id, mediaType, n, Row(w, h, 3), features.toSeq)
  }

  /** Output schema of the frame-sampling stage (passthrough column
    * appended when requested). */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_offset", IntegerType),
    StructField("frame_bytes", IntegerType),
    StructField("f0", FloatType)))

  /** Frame SAMPLING for video-like payloads: treat the binary payload as
    * a sequence of fixed-size frame blocks and emit `k` frames at the
    * uniform mid-stride offsets floor(nFrames·(2j+1) / 2k) — the
    * deterministic equivalent of ffmpeg's `fps=`-style uniform sampling.
    * Runs per-partition with a fan-OUT iterator (one input row → up to k
    * output rows), the flatMap batch shape a real codec integration
    * needs; the per-frame feature is the same deterministic byte stub as
    * [[decodeStub]]. Constant memory: only the sampled frames' offsets
    * and the running byte sum are held, never a decoded frame tensor.
    */
  def sampleFrames(
      df: DataFrame, idCol: String, payloadCol: String,
      frameSize: Int = 256, k: Int = 4,
      passthroughCol: Option[String] = None): DataFrame = {
    // `passthroughCol` rides each frame row as a string — metadata a
    // downstream census needs (source, shard, …) must travel WITH the
    // fan-out rather than join back on the id: ids may carry a null
    // sentinel shared across rows, and a join-back would cross-match
    // every sentinel row's frames (measured: doubled frame counts).
    val outSchema = passthroughCol.fold(frameSchema)(p =>
      StructType(frameSchema.fields.patch(1, Seq(StructField(p, StringType)), 0)))
    val input = df.select(
      (Seq(col(idCol).cast("long"), col(payloadCol).cast("binary")) ++
        passthroughCol.map(p => col(p).cast("string"))): _*)
    input.mapPartitions { rows =>
      rows.filter(!_.isNullAt(0)).flatMap { r =>
        val payload =
          if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val pass: Seq[Any] =
          if (r.length > 2) Seq(if (r.isNullAt(2)) null else r.getString(2))
          else Nil
        val nFrames = math.max(1, (payload.length + frameSize - 1) / frameSize)
        (0 until k).map(j => (nFrames * (2 * j + 1)) / (2 * k))
          .distinct.filter(_ < nFrames)
          .map { fi =>
            val off = fi * frameSize
            val len = math.max(0, math.min(frameSize, payload.length - off))
            var acc = 0L
            var i = off
            while (i < off + len) { acc += (payload(i) & 0xff); i += 1 }
            Row.fromSeq(Seq[Any](r.getLong(0)) ++ pass ++
              Seq[Any](fi, off, len, (acc % 1000L).toFloat / 1000.0f))
          }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** The feature-extraction stage: binary payloads → typed features, one
    * pass per partition, constant memory per row batch.
    *
    * Expects columns (idCol: long, typeCol: string, payloadCol: binary).
    */
  def extractFeatures(
      df: DataFrame, idCol: String, typeCol: String, payloadCol: String): DataFrame = {
    val input = df.select(
      col(idCol).cast("long"), col(typeCol).cast("string"),
      col(payloadCol).cast("binary"))
    input.mapPartitions { rows =>
      rows.filter(!_.isNullAt(0)).map { r =>
        val payload = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
        decodeStub(r.getLong(0), if (r.isNullAt(1)) "" else r.getString(1), payload)
      }
    }(RowEncoder.encoderFor(featureSchema))
  }
}
