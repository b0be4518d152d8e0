package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.Embedder

/** Multimodal (image/audio/video) columns: opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages, mirroring the reference's multimodal embedding inputs
  * (/root/reference/vechord/embedding.py:208-369: text|image-bytes|
  * image-url) re-expressed for batch Spark.
  *
  * The Spark-side plumbing — schema, partition-preserving mapPartitions
  * batch shape, stage signatures — is real and tested. The actual codec
  * work is STUBBED behind [[FakeCodec]] (no image/audio libraries ship in
  * this container): every stub is deterministic on the input bytes, so
  * pipelines built on these stages are testable end-to-end and the codec
  * swap is a one-class change.
  */
final case class MediaMeta(format: String, width: Int, height: Int,
                           channels: Int, durationMs: Long)
final case class MediaRow(id: Long, kind: String, data: Array[Byte],
                          meta: MediaMeta)
final case class MediaFeatures(id: Long, kind: String,
                               features: Array[Float])

/** The codec seat. [[FakeCodec]] = deterministic stand-in: "pixels" are
  * the raw bytes, features are a 64-bin byte histogram (L1-normalized),
  * resize truncates/repeats deterministically, frame-sample slices the
  * payload at fixed strides. */
trait MediaCodec extends Serializable {
  def decode(data: Array[Byte], meta: MediaMeta): Array[Byte]
  def features(pixels: Array[Byte]): Array[Float]
  def resize(pixels: Array[Byte], w: Int, h: Int): Array[Byte]
  def frames(data: Array[Byte], meta: MediaMeta, everyMs: Long): Seq[Array[Byte]]
}

final case class FakeCodec() extends MediaCodec {
  def decode(data: Array[Byte], meta: MediaMeta): Array[Byte] = data
  def features(pixels: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](64)
    pixels.foreach(b => hist((b & 0xFF) / 4) += 1f)
    val n = math.max(1, pixels.length).toFloat
    hist.map(_ / n)
  }
  def resize(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, w * h)
    Array.tabulate(target)(i => pixels(i % math.max(1, pixels.length)))
  }
  def frames(data: Array[Byte], meta: MediaMeta,
             everyMs: Long): Seq[Array[Byte]] = {
    val n = math.max(1, (meta.durationMs / math.max(1, everyMs)).toInt)
    val step = math.max(1, data.length / n)
    (0 until n).map(i => data.slice(i * step,
      math.min(data.length, (i + 1) * step)))
  }
}

object Multimodal {

  val mediaSchema = Encoders.product[MediaRow].schema

  /** Decode + feature-extract, batch-wise per partition (the Scala twin
    * of a pandas-batch UDF: one codec instance per partition, rows
    * streamed through it — no per-row setup cost, no shuffle). */
  def extractFeatures(media: Dataset[MediaRow],
                      codec: MediaCodec): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      it.map { m =>
        val px = codec.decode(m.data, m.meta)
        MediaFeatures(m.id, m.kind, codec.features(px))
      }
    }
  }

  /** Resize stage: image rows get `w`×`h` payloads, meta updated. */
  def resizeImages(media: Dataset[MediaRow], codec: MediaCodec,
                   w: Int, h: Int): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions { it =>
      it.map { m =>
        if (m.kind == "image")
          m.copy(data = codec.resize(codec.decode(m.data, m.meta), w, h),
            meta = m.meta.copy(width = w, height = h))
        else m
      }
    }
  }

  /** Frame sampling: one output row per sampled video frame (kind
    * becomes "image"); non-video rows pass through. */
  def sampleFrames(media: Dataset[MediaRow], codec: MediaCodec,
                   everyMs: Long): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions { it =>
      it.flatMap { m =>
        if (m.kind != "video") Iterator.single(m)
        else codec.frames(m.data, m.meta, everyMs).iterator.zipWithIndex
          .map { case (f, i) =>
            MediaRow(m.id * 1000 + i, "image", f,
              m.meta.copy(format = "frame", durationMs = 0))
          }
      }
    }
  }

  /** Multimodal embedding: bytes → feature histogram → padded/truncated
    * to the embedder's dim and L2-normalized. The
    * `SUPPORT_MULTI_MODAL` gate twin (embedding.py:46-59) is the kind
    * check. */
  def embedMedia(spark: SparkSession, media: Dataset[MediaRow],
                 codec: MediaCodec, dim: Int): DataFrame = {
    implicit val enc = Encoders.product[MediaFeatures]
    extractFeatures(media, codec).toDF()
      .withColumn("vec", {
        val padded = concat(col("features"),
          array_repeat(lit(0f), lit(dim)))
        val sliced = slice(padded, 1, dim)
        val norm = sqrt(aggregate(sliced, lit(0.0),
          (a, x) => a + x.cast("double") * x.cast("double")))
        transform(sliced, x =>
          when(norm > 0, (x.cast("double") / norm).cast("float"))
            .otherwise(lit(0f)))
      })
      .select("id", "kind", "vec")
  }
}

/** Multimodal embedder gate — text side delegates to any [[Embedder]],
  * media side goes through the codec histogram path. */
final case class MultimodalEmbedder(text: Embedder, codec: MediaCodec)
  extends Serializable {
  val supportsMultiModal = true
  def dim: Int = text.dim
  def embedText(s: String): Array[Float] = text.embedChunk(s)
  def embedImage(data: Array[Byte]): Array[Float] = {
    val f = codec.features(codec.decode(data,
      MediaMeta("raw", 0, 0, 0, 0)))
    val out = new Array[Float](dim)
    var i = 0
    var n2 = 0.0
    while (i < dim) {
      out(i) = if (i < f.length) f(i) else 0f
      n2 += out(i) * out(i)
      i += 1
    }
    val n = math.sqrt(n2)
    if (n > 0) out.map(x => (x / n).toFloat) else out
  }
}
