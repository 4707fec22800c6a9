package graft.codec

/** Lossy int→byte quantization used for per-document field-length norms.
  *
  * Re-implements, from the published Lucene norm-encoding semantics (the
  * reference selects the Lucene 10.4 codec at
  * `solr/core/src/java/org/apache/solr/core/SchemaCodecFactory.java:100`;
  * see SURVEY.md §4.2), the 4-bit-mantissa floating-point scheme:
  * values below a "free" threshold are exact; above it the value is encoded
  * with a 3-bit mantissa + implicit leading bit and a 5-bit exponent.
  * There are only 256 representable lengths, so BM25 length normalization
  * sees a quantized document length — rank-identity with the reference
  * requires scoring through this exact quantization.
  *
  * Properties (tested in SmallFloatSpec):
  *  - monotone: a <= b  =>  decode(encode(a)) <= decode(encode(b))
  *  - idempotent: decode(encode(decode(encode(x)))) == decode(encode(x))
  *  - exact below the free-value threshold
  *  - decode(encode(x)) <= x  (rounds down)
  */
object SmallFloat {

  /** Encode a non-negative long with 4 significant bits (3 stored + implicit). */
  private[codec] def longToInt4(i: Long): Int = {
    require(i >= 0, s"only non-negative values accepted: $i")
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(i)
    if (numBits < 4) {
      // subnormal: value fits in 3 bits, stored exactly, exponent field = 0
      i.toInt
    } else {
      val shift = numBits - 4
      // keep the 4 most significant bits, drop the implicit leading one,
      // and store (shift + 1) in the exponent field (0 means subnormal)
      (((i >>> shift).toInt & 0x07)) | ((shift + 1) << 3)
    }
  }

  private[codec] def int4ToLong(i: Int): Long = {
    val bits = (i & 0x07).toLong
    val shift = (i >>> 3) - 1
    if (shift == -1) bits // subnormal
    else (bits | 0x08L) << shift
  }

  private val MaxInt4: Int = longToInt4(Int.MaxValue)

  /** Values in [0, NumFreeValues) are encoded exactly. */
  val NumFreeValues: Int = 255 - MaxInt4

  /** Quantize a non-negative int (document length) to one byte. */
  def intToByte4(i: Int): Byte = {
    require(i >= 0, s"only non-negative values accepted: $i")
    if (i < NumFreeValues) i.toByte
    else (NumFreeValues + longToInt4((i - NumFreeValues).toLong)).toByte
  }

  /** Inverse of [[intToByte4]] up to quantization (rounds down). */
  def byte4ToInt(b: Byte): Int = {
    val i = java.lang.Byte.toUnsignedInt(b)
    if (i < NumFreeValues) i
    else {
      val decoded = NumFreeValues + int4ToLong(i - NumFreeValues)
      Math.toIntExact(decoded)
    }
  }

  /** All 256 decoded lengths, indexed by unsigned byte value (score cache). */
  lazy val lengthTable: Array[Int] = Array.tabulate(256)(i => byte4ToInt(i.toByte))
}
