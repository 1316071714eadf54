package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-bit ENERGY-DELTA audio fingerprint of a PCM16 WAV payload — the
  * acoustic twin of `DHashBmp` (Haitsma–Kalker-style energy-difference
  * fingerprinting, collapsed to one band): the near-dup signal that
  * collapses re-encodes of the same recording (sample-rate conversions,
  * stereo remasters, gain changes) without an embedding model.
  *
  * Construction, exact integer arithmetic end to end so the DuckDB hex
  * replay (`graft.queries.MediaSql.wavFpCtes`) reproduces it bit for bit:
  *
  *  1. decode gate: `graft.operators.Multimodal.decodeWavPcm16`'s exact
  *     RIFF walk (latch-first fmt/data, complete PCM16) — anything else
  *     fingerprints to null, the quarantine discipline;
  *  2. VIRTUAL resample to `dstRate` by the mm13 nearest-frame mapping
  *     (output frame f reads source frame f·nFrames DIV outFrames) — no
  *     resampled buffer is materialized, the energy sums read the source
  *     picks directly, so two encodings of the same recording at
  *     different rates sample (near-)identical waveform positions;
  *  3. 65 equal time windows over the output frames (frame f → window
  *     f·65 DIV outFrames); window energy = Σ |sample| over every
  *     channel's 16-bit value — absolute amplitude, so a stereo duplicate
  *     doubles every window and a gain change scales every window:
  *     ORDER between windows survives both;
  *  4. bit w (0..63) = energy(w) > energy(w+1), the temporal envelope
  *     gradient sign — dHash's construction on the time axis.
  *
  * Bits fold MSB-first into two non-negative 32-bit halves (hi = bits
  * 0..31, lo = 32..63), `Dedup.hammingPairs64`'s input layout.
  *
  * Scale: a pure narrow codegen'd scalar, one static call per row inside
  * whole-stage codegen; the banded Hamming join downstream is linear.
  */
object AudioFpKernel {

  private val Windows = 65

  /** InternalRow(hi Long, lo Long), or null when the payload is not a
    * complete PCM16 WAV or yields zero output frames at `dstRate`.
    */
  def computeRow(b: Array[Byte], dstRate: Int): InternalRow =
    graft.operators.Multimodal.decodeWavPcm16(b) match {
      case None => null
      case Some((channels, srcRate, dataPos, nFrames)) =>
        val outFramesL = nFrames * dstRate / srcRate
        // same bound as Multimodal.resampleWavPcm16 / the shared wavpcm
        // oracle gate — the two replays must quarantine identically
        if (outFramesL <= 0 || outFramesL * channels * 2 > Int.MaxValue) return null
        val outFrames = outFramesL.toInt
        val energy = new Array[Long](Windows)
        var f = 0
        while (f < outFrames) {
          val sf = ((f.toLong * nFrames) / outFrames).toInt
          val w = ((f.toLong * Windows) / outFrames).toInt
          val base = dataPos + sf * channels * 2
          var c = 0
          while (c < channels) {
            val p = base + c * 2
            val v = ((b(p) & 0xff) | (b(p + 1) << 8)).toShort.toInt
            energy(w) += math.abs(v)
            c += 1
          }
          f += 1
        }
        var hi = 0L
        var lo = 0L
        var w = 0
        while (w < 64) {
          if (energy(w) > energy(w + 1)) {
            if (w < 32) hi |= 1L << (31 - w) else lo |= 1L << (63 - w)
          }
          w += 1
        }
        val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
        r.setLong(0, hi)
        r.setLong(1, lo)
        r
    }
}

object AudioFp {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(bin: Column, dstRate: Int): Column =
    ColumnBridge.column(AudioFp(ColumnBridge.expression(bin), dstRate))
}

/** `AudioFp(binary, dstRate)` ⇒ struct(hi long, lo long) — null for
  * payloads that are not a complete PCM16 WAV. Codegen'd static call.
  */
case class AudioFp(child: Expression, dstRate: Int) extends UnaryExpression {
  require(dstRate > 0, s"dstRate ($dstRate) must be positive")

  override def dataType: DataType = StructType(Seq(
    StructField("hi", LongType),
    StructField("lo", LongType)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    AudioFpKernel.computeRow(input.asInstanceOf[Array[Byte]], dstRate)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val r = ctx.freshName("afp")
      s"""
         |InternalRow $r = graft.plans.AudioFpKernel.computeRow($bytes, $dstRate);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
