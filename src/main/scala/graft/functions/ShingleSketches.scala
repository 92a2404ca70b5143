package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Map-side sketch expressions over a shingle array.
  *
  * Both MinHash signatures and SimHash fingerprints are per-row folds over
  * the document's shingle set — there is no reason to explode the shingles
  * and shuffle them into a groupBy: these expressions compute the whole
  * sketch in one generated call, so signature generation is embarrassingly
  * parallel and the only shuffle left in near-dup detection is the
  * candidate bucket join. At 100 TB that removes a |corpus|·|shingles|-row
  * shuffle per signature build.
  */
object ShingleSketches {
  private[functions] val MersenneP = 2147483647L // 2^31 - 1

  /** zlib CRC32 of the shingle's UTF-8 bytes, folded mod p — the shared
    * base hash of the MinHash permutation family. */
  private def baseHash(s: UTF8String): Long = {
    val crc = new java.util.zip.CRC32
    crc.update(s.getBytes)
    crc.getValue % MersenneP
  }

  /** MinHash signature: sig[i] = min over shingles of (a_i·h + b_i) mod p
    * with a_i = 2i+1 (odd), b_i = 7919·(i+1). */
  def minhash(shingles: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val m = shingles.numElements()
    var s = 0
    while (s < m) {
      val h = baseHash(shingles.getUTF8String(s))
      var i = 0
      while (i < numHashes) {
        val v = (h * (2L * i + 1) + 7919L * (i + 1)) % MersenneP
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(v => if (v == Long.MaxValue) -1L else v))
  }

  /** 64-bit FNV-1a of the shingle bytes — the SimHash bit source. */
  private def fnv64(s: UTF8String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Engine-portable MinHash signature — BYTE-IDENTICAL to the interpreted
    * HOF formulation it replaces (Dedup.minhashPairsPortable): hash i of a
    * shingle is the 8-hex-char slice i%4 of `md5("<i/4>:" ++ shingle)`,
    * and sig[i] is the lexicographic min over the doc's shingles (hex is
    * ASCII, so Java String order == UTF8String binary order == the
    * engine's). One generated call per row replaces numHashes array_min ×
    * transform interpreter passes; the md5 work itself is identical, so
    * the win is the eliminated per-element lambda interpretation and
    * intermediate array churn. Empty shingle arrays yield all-null
    * elements exactly like `array_min(transform([], …))`. */
  def md5Minhash(shingles: ArrayData, numHashes: Int): ArrayData = {
    val numDigests = (numHashes + 3) / 4
    val prefixes = Array.tabulate(numDigests)(s =>
      (s.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // Fixed-width lowercase hex is ORDER-PRESERVING over the underlying
    // bytes, so "lexicographic min of the 8-hex-char slice" == "unsigned
    // min of the digest's corresponding 4 bytes" — the whole per-shingle
    // loop runs on primitive longs (zero allocations beyond the digest
    // arrays) and only the numHashes winners hex-encode, once per ROW.
    val mins = Array.fill(numHashes)(Long.MaxValue) // unsigned ints < MaxValue
    val md = java.security.MessageDigest.getInstance("MD5")
    val m = shingles.numElements()
    var s = 0
    while (s < m) {
      val bytes = shingles.getUTF8String(s).getBytes
      var d = 0
      while (d < numDigests) {
        md.reset()
        md.update(prefixes(d))
        md.update(bytes)
        val dig = md.digest()
        var k = 0
        while (k < 4) {
          val i = d * 4 + k
          if (i < numHashes) {
            val v = ((dig(4 * k) & 0xffL) << 24) | ((dig(4 * k + 1) & 0xffL) << 16) |
              ((dig(4 * k + 2) & 0xffL) << 8) | (dig(4 * k + 3) & 0xffL)
            if (v < mins(i)) mins(i) = v
          }
          k += 1
        }
        d += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map { v =>
      if (v == Long.MaxValue) null
      else {
        val out = new Array[Char](8)
        var j = 0
        while (j < 8) {
          out(j) = HexDigits(((v >>> (28 - 4 * j)) & 0xf).toInt)
          j += 1
        }
        UTF8String.fromString(new String(out))
      }
    })
  }

  /** Engine-portable 32-bit SimHash fingerprint — BYTE-IDENTICAL to the
    * HOF formulation in Dedup.simhashPairsPortable: per shingle, the
    * leading 8 hex chars of its md5 parse as one unsigned 32-bit value;
    * fingerprint char j is '1' iff the sum over shingles of ±1 votes from
    * bit 31−j is positive. Returns the 32-char '0'/'1' string the banding
    * and the DuckDB oracle replay positionally. */
  def md5Simhash32(shingles: ArrayData): UTF8String = {
    val votes = new Array[Int](32)
    val md = java.security.MessageDigest.getInstance("MD5")
    val m = shingles.numElements()
    var s = 0
    while (s < m) {
      md.reset()
      md.update(shingles.getUTF8String(s).getBytes)
      // == parseLong(hex.substring(0, 8), 16): hex chars 0-7 ARE bytes 0-3
      // big-endian — read them directly, no per-shingle hex string.
      val dig = md.digest()
      val v = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
        ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      var j = 0
      while (j < 32) {
        votes(j) += (((v >>> (31 - j)) & 1L).toInt * 2 - 1)
        j += 1
      }
      s += 1
    }
    val out = new Array[Char](32)
    var j = 0
    while (j < 32) {
      out(j) = if (votes(j) > 0) '1' else '0'
      j += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** SimHash: per-bit vote of every shingle's 64-bit hash; bit set iff the
    * vote is positive. */
  def simhash(shingles: ArrayData): Long = {
    val votes = new Array[Int](64)
    val m = shingles.numElements()
    var s = 0
    while (s < m) {
      val h = fnv64(shingles.getUTF8String(s))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      s += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** MinHash signature of an array<string> shingle column → array<long>. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override protected def nullSafeEval(input: Any): Any =
    ShingleSketches.minhash(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleSketches.minhash($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Portable md5 MinHash signature of an array<string> shingle column →
  * array<string> of 8-hex-char min slices (null elements iff no shingles). */
case class Md5MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_md5_minhash"
  override protected def nullSafeEval(input: Any): Any =
    ShingleSketches.md5Minhash(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleSketches.md5Minhash($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): Md5MinHashSig =
    copy(child = newChild)
}

/** Portable 32-bit md5 SimHash of an array<string> shingle column → the
  * 32-char '0'/'1' fingerprint string. */
case class Md5SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_md5_simhash"
  override protected def nullSafeEval(input: Any): Any =
    ShingleSketches.md5Simhash32(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleSketches.md5Simhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5SimHash32 =
    copy(child = newChild)
}

/** SimHash of an array<string> shingle column → long. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(input: Any): Any =
    ShingleSketches.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleSketches.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
